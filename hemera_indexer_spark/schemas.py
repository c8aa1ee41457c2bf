"""Declared schemas (never inferred) for the CDC engine.

The in-flight/at-rest dual-layer schema system of the reference (dataclass
annotations + SQLAlchemy models bridged by a converter,
/root/reference/common/models/__init__.py:45-78) maps to explicit StructTypes
here: CHANGE_EVENT is the in-flight record, SEQUENCES is the at-rest lake
table, MANIFEST is the checkpoint/lineage record
(/root/reference/indexer/utils/sync_recorder.py:41-67 extended to
per-partition lineage).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The target state table (FIXTURES.md §1). `is_deleted` is the engine's
# tombstone column — the analog of the reference's `reorg` boolean
# (/root/reference/common/models/blocks.py:42): deletes keep (key, seq) so
# replayed stale events lose the LWW race instead of resurrecting rows.
SEQUENCES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("seq", T.LongType(), False),
        T.StructField("is_deleted", T.BooleanType(), False),
    ]
)

# The change-event log record (FIXTURES.md §2); analog of one block-range
# item batch in the reference's buffer keyed by domain type
# (/root/reference/indexer/jobs/base_job.py:92-93).
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("rollback_to_seq", T.LongType(), True),
    ]
)

# Append-only event-history fact table (the reference's history/fact pair:
# `token_balances` history next to `current_token_balances` state,
# /root/reference/indexer/jobs/export_token_balances_job.py:66-86; inserted
# with ON CONFLICT DO NOTHING,
# /root/reference/indexer/exporters/postgres_item_exporter.py:126-130).
# Uniqueness key is (doc_id, seq); `op` is kept so the history also records
# deletes. Created with properties={"table_type": "fact"}.
FACTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("op", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
    ]
)

# Checkpoint manifest row (FIXTURES.md §3).
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("epoch_id", T.LongType(), False),
        T.StructField("rows_applied", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

OPS = ("insert", "update", "delete", "rollback")

# Metadata/bookkeeping columns of the state table that are not part of the
# user-facing payload. Everything else in SEQUENCES_SCHEMA (and any evolved
# column) is payload and participates in LWW replacement.
STATE_META_COLUMNS = ("doc_id", "seq", "is_deleted")

# Per-epoch processing journal (StreamController(metrics_dir=)): the
# queryable face of RunStats, one row per processed epoch per commit
# attempt. metric_id = "epoch@state_version" — unique per attempt, so a
# repair/restore re-drive journals again instead of deduping away; seq is
# the state table version (monotone), so fact-table retention verbs apply.
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("metric_id", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("events", T.LongType(), True),
        T.StructField("rollbacks", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("strategy", T.StringType(), True),
        T.StructField("quarantined", T.LongType(), True),
        T.StructField("tenant", T.StringType(), True),
    ]
)
