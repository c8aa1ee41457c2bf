from hemera_indexer_spark.lake.catalog import CatalogTxnError, LakeCatalog
from hemera_indexer_spark.lake.maintenance import (
    MaintenancePolicy,
    run_maintenance,
)
from hemera_indexer_spark.lake.table import (
    CheckViolationError,
    ConcurrentCommitError,
    FormatVersionError,
    LakeTable,
)

__all__ = [
    "LakeTable",
    "LakeCatalog",
    "CatalogTxnError",
    "MaintenancePolicy",
    "run_maintenance",
    "CheckViolationError",
    "ConcurrentCommitError",
    "FormatVersionError",
]
