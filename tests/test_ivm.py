"""Incremental view maintenance (IncrementalAggSink): the materialized
aggregate must equal a full GROUP BY over the state table after any
replay (including rollback + schema-evolution epochs), refresh must be
bucket-granular (metadata-driven), and a crash between the state fence
and the view flip must re-drive to convergence."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
from hemera_indexer_spark.streaming import StreamController
from hemera_indexer_spark.streaming.sinks import IncrementalAggSink


def _expected(table):
    return sorted(
        tuple(r)
        for r in table.current_state()
        .groupBy("source")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_tok").cast("long").alias("sum_n_tok"),
        )
        .collect()
    )


def _got(sink):
    return sorted(tuple(r) for r in sink.view().collect())


def test_view_matches_state_after_full_replay(spark, tiny_log, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    sink = IncrementalAggSink(table, str(tmp_path / "view"))
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions, sinks=[sink]
    ).run()
    # the log contains a rollback epoch and mid-stream schema evolution;
    # the view must track through both
    assert _got(sink) == _expected(table)
    assert sink.committed_epoch() == table.committed_epoch()


def test_refresh_is_metadata_driven_and_bucket_granular(spark, tiny_log, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    sink = IncrementalAggSink(table, str(tmp_path / "view"))
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions, sinks=[sink]
    ).run()
    # no state change -> refresh touches ZERO buckets (pure metadata check)
    sink.refresh(table.committed_epoch())
    assert sink.last_refresh_buckets == 0
    # delete one key -> exactly that key's bucket is rewritten and refreshed
    some_key = table.current_state().select("doc_id").first()[0]
    table.delete_keys_where(F.col("doc_id") == some_key, seq_at_least=0)
    sink.refresh(table.committed_epoch())
    assert sink.last_refresh_buckets == 1
    assert _got(sink) == _expected(table)
    # compaction rewrites files but preserves state: the fingerprint diff
    # triggers a recompute of the compacted buckets, view value unchanged
    before = _got(sink)
    if table.compact():
        sink.refresh(table.committed_epoch())
        assert sink.last_refresh_buckets >= 1
        assert _got(sink) == before == _expected(table)


def test_crash_between_state_fence_and_view_flip_redrives(spark, tiny_log, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    view_dir = str(tmp_path / "view")
    sink = IncrementalAggSink(table, view_dir)
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions, sinks=[sink]
    ).run()
    state_before = sorted(
        tuple(r) for r in table.current_state().select("doc_id", "seq").collect()
    )
    # simulate the crash window: state fenced, view flip lost
    os.remove(os.path.join(view_dir, "_current"))
    sink2 = IncrementalAggSink(table, view_dir)
    assert sink2.committed_epoch() == -1
    stats = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions, sinks=[sink2]
    ).run()
    # groups re-drove (committed floor = min(state, sinks) = -1) ...
    assert any(not s.skipped for s in stats.epochs)
    # ... idempotently: state unchanged, view converged
    state_after = sorted(
        tuple(r) for r in table.current_state().select("doc_id", "seq").collect()
    )
    assert state_after == state_before
    assert _got(sink2) == _expected(table)
    assert sink2.committed_epoch() == table.committed_epoch()
