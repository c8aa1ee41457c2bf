"""Secondary index: value-range lookups off a CDC-maintained narrow index
(LWW maintenance table + value-sorted projection), never scanning the
corpus. Laws: lookup == source-filter at every staleness; the fresh
projection provably skips files; fetch (bucket-pruned or not) equals the
source filter."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hemera_indexer_spark.lake.table import LakeTable

SF = "/root/testdata/sf0.001"


def _schema():
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("n_chars", T.LongType()),
        ]
    )


def _mk_source(spark, root):
    t = LakeTable.create(
        spark, root, _schema(), num_buckets=4, key_col="doc_id",
        seq_col="seq",
    )
    t.bulk_load(
        spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "n_chars"
        )
    )
    return t


def _merge(t, spark, rows, epoch):
    df = spark.createDataFrame(
        rows, "doc_id long, seq long, n_chars long, op string"
    )
    assert t.merge_upsert(df, epoch_id=epoch)


def _expected(t, lo, hi):
    return {
        (r["doc_id"], r["n_chars"])
        for r in t.current_state()
        .where(F.col("n_chars").between(lo, hi))
        .collect()
    }


def test_build_maintain_lookup_skips_files(spark, tmp_path):
    from hemera_indexer_spark.operators.secondary_index import SecondaryIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    idx = SecondaryIndex.build_from_table(
        spark, str(tmp_path / "idx"), src, "n_chars", num_buckets=4
    )
    assert not idx.is_projection_fresh()  # no projection yet
    # correct even before the first maintain (narrow-scan path)
    got0 = {tuple(r) for r in idx.lookup(200, 260).collect()}
    assert got0 == _expected(src, 200, 260) and got0
    idx.maintain(n_files=8)
    assert idx.is_projection_fresh()
    got = {tuple(r) for r in idx.lookup(200, 260).collect()}
    assert got == got0
    kept, total = idx._proj_files(200, 260)
    assert total == 8 and 0 < len(kept) < total
    # one-sided bounds
    lo_only = {tuple(r) for r in idx.lookup(lo=500).collect()}
    assert lo_only == _expected(src, 500, 10**9)
    # empty range proves full skip
    kept, total = idx._proj_files(10**8, 10**9)
    assert kept == []
    assert idx.lookup(10**8, 10**9).count() == 0


def test_stale_projection_stays_correct_then_refreshes(spark, tmp_path):
    from hemera_indexer_spark.operators.secondary_index import SecondaryIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    idx = SecondaryIndex.build_from_table(
        spark, str(tmp_path / "idx"), src, "n_chars", num_buckets=4
    )
    idx.maintain()
    # pick one in-range live key to delete, one to move out of range,
    # and insert a new in-range key
    some = sorted(_expected(src, 200, 260))[:2]
    (kill, _), (move, _) = some
    _merge(
        src, spark,
        [(kill, 10_000, None, "delete"),
         (move, 10_001, 999, "update"),
         (90001, 10_002, 222, "update")],
        epoch=1,
    )
    assert idx.update_from_changes(src)
    assert not idx.is_projection_fresh()  # projection lags the sync cursor
    want = _expected(src, 200, 260)
    got = {tuple(r) for r in idx.lookup(200, 260).collect()}
    assert got == want
    assert (90001, 222) in got
    assert all(k != kill and k != move for k, _ in got)
    # refresh: projection path returns the identical answer and old
    # generations are GC'd
    idx.maintain()
    assert idx.is_projection_fresh()
    got2 = {tuple(r) for r in idx.lookup(200, 260).collect()}
    assert got2 == want
    proj = os.path.join(str(tmp_path / "idx"), "projection")
    assert len([d for d in os.listdir(proj) if d.startswith("v=")]) == 1
    # idempotent re-sync
    assert idx.update_from_changes(src) is False


def test_fetch_equals_source_filter(spark, tmp_path):
    from hemera_indexer_spark.operators.secondary_index import SecondaryIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    idx = SecondaryIndex.build_from_table(
        spark, str(tmp_path / "idx"), src, "n_chars", num_buckets=4
    )
    idx.maintain()
    want = _expected(src, 200, 260)
    plain = {
        (r["doc_id"], r["n_chars"])
        for r in idx.fetch(src, 200, 260).collect()
    }
    pruned = {
        (r["doc_id"], r["n_chars"])
        for r in idx.fetch(src, 200, 260, prune_buckets=True).collect()
    }
    assert plain == want and pruned == want


def test_secondary_index_sink_e2e(spark, tiny_log, tmp_path):
    """Full CDC replay (rollback + schema evolution included) with a
    SecondaryIndexSink over n_tok: after the run the index answers range
    lookups identical to filtering the state table, the projection is
    fresh (maintain_after=1 refreshes every sync round), the log fence
    tracks the last epoch, and a re-driven controller moves nothing."""
    from hemera_indexer_spark.operators.secondary_index import SecondaryIndex
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
    from hemera_indexer_spark.streaming import StreamController
    from hemera_indexer_spark.streaming.sinks import SecondaryIndexSink

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    idx = SecondaryIndex.build_from_table(
        spark, str(tmp_path / "idx"), table, "n_tok", num_buckets=4
    )
    sink = SecondaryIndexSink(table, idx, maintain_after=1)
    stats = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        sinks=[sink],
    ).run()
    last_epoch = max(e.epoch for e in stats.epochs)
    assert sink.committed_epoch() == last_epoch
    assert idx.synced_version() == table.snapshot["version"]
    assert idx.is_projection_fresh()
    want = {
        (r["doc_id"], r["n_tok"])
        for r in table.current_state()
        .where(F.col("n_tok").between(10, 25))
        .collect()
    }
    got = {tuple(r) for r in idx.lookup(10, 25).collect()}
    assert got == want and got
    # re-drive: fenced groups never reach the sink's merge
    v = idx.table.snapshot["version"]
    StreamController(
        spark, LakeTable.load(spark, str(tmp_path / "lake")),
        tiny_log.out_dir, tiny_log.spec.n_partitions,
        sinks=[SecondaryIndexSink(table, idx, maintain_after=1)],
    ).run()
    idx.table.refresh()
    assert idx.table.snapshot["version"] == v
    assert sink.committed_epoch() == last_epoch


def test_guards(spark, tmp_path):
    from hemera_indexer_spark.operators.dedup_index import IndexFamilyError
    from hemera_indexer_spark.operators.secondary_index import SecondaryIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    with pytest.raises(IndexFamilyError, match="not a SecondaryIndex"):
        SecondaryIndex(src)
    # non-orderable value column refused at build time
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("v", T.ArrayType(T.IntegerType())),
        ]
    )
    bad = LakeTable.create(
        spark, str(tmp_path / "bad"), schema, num_buckets=2,
        key_col="doc_id", seq_col="seq",
    )
    with pytest.raises(ValueError, match="non-orderable"):
        SecondaryIndex.build_from_table(
            spark, str(tmp_path / "idx2"), bad, "v"
        )
