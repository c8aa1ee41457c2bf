from hemera_indexer_spark.lake.catalog import CatalogTxnError, LakeCatalog
from hemera_indexer_spark.lake.table import (
    ConcurrentCommitError,
    FormatVersionError,
    LakeTable,
)

__all__ = [
    "LakeTable",
    "LakeCatalog",
    "CatalogTxnError",
    "ConcurrentCommitError",
    "FormatVersionError",
]
