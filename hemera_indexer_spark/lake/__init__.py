from hemera_indexer_spark.lake.table import (
    ConcurrentCommitError,
    FormatVersionError,
    LakeTable,
)

__all__ = ["LakeTable", "ConcurrentCommitError", "FormatVersionError"]
