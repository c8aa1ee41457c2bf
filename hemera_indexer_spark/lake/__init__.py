from hemera_indexer_spark.lake.table import LakeTable, ConcurrentCommitError

__all__ = ["LakeTable", "ConcurrentCommitError"]
