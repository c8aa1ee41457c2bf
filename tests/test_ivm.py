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


# ---------------------------------------------------------- time travel
def test_time_travel_as_of(spark, tiny_log, tmp_path):
    """as_of(version) serves the table exactly as of a retained commit;
    as_of_epoch maps change-log coordinates to snapshots; pinned handles
    refuse mutation and refresh."""
    import pytest

    from hemera_indexer_spark.lake.table import ConcurrentCommitError

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    ctl = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        max_batch_epochs=1,  # one commit per epoch -> several snapshots
    )
    ctl.run(max_epochs=3)
    mid_version = table.snapshot["version"]
    mid_epoch = table.committed_epoch()
    mid_state = sorted(
        tuple(r) for r in table.current_state().select("doc_id", "seq").collect()
    )
    ctl.run()  # replay the rest (rollback + schema evolution included)
    assert table.snapshot["version"] > mid_version

    old = table.as_of(mid_version)
    got = sorted(
        tuple(r) for r in old.current_state().select("doc_id", "seq").collect()
    )
    assert got == mid_state
    # the historical schema is served, not the evolved one
    assert "lang" not in old.schema.fieldNames()
    assert "lang" in table.schema.fieldNames()
    # epoch-coordinate travel resolves to the same state
    by_epoch = table.as_of_epoch(mid_epoch)
    assert by_epoch.committed_epoch() == mid_epoch
    got2 = sorted(
        tuple(r)
        for r in by_epoch.current_state().select("doc_id", "seq").collect()
    )
    assert got2 == mid_state
    # pinned handles are read-only
    with pytest.raises(ConcurrentCommitError):
        old.refresh()
    with pytest.raises(ConcurrentCommitError):
        old.compact()
    # snapshot history is monotone and includes the pinned version
    versions = [s["version"] for s in table.snapshots()]
    assert versions == sorted(versions) and mid_version in versions
    # expiring retention makes old versions unreachable, loudly
    table.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        table.as_of(mid_version)


def test_changes_since_reconstructs_new_state(spark, tiny_log, tmp_path):
    """Incremental read: applying changes_since(v) to the state at v must
    reproduce the current state — across updates, deletes, a rollback
    epoch and mid-stream schema evolution."""
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    ctl = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        max_batch_epochs=1,
    )
    ctl.run(max_epochs=3)
    v = table.snapshot["version"]
    old_rows = {
        r["doc_id"]: r
        for r in table.current_state().collect()
    }
    ctl.run()
    changes = table.changes_since(v).collect()
    ops = {c["change_op"] for c in changes}
    assert ops <= {"insert", "update", "delete"}
    assert {"insert", "update"} <= ops  # the fixture produces both
    # apply the feed to the old state (schema-evolved columns default None)
    new_rows = {
        k: {**r.asDict(recursive=True), "lang": None} for k, r in old_rows.items()
    }
    for c in changes:
        d = c.asDict(recursive=True)
        op = d.pop("change_op")
        if op == "delete":
            assert d["doc_id"] in new_rows
            new_rows.pop(d["doc_id"])
        else:
            if op == "update":
                assert d["doc_id"] in new_rows
            else:
                assert d["doc_id"] not in new_rows
            new_rows[d["doc_id"]] = d
    live = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in table.current_state().collect()
    }
    assert new_rows == live
    # self-diff is empty
    assert table.changes_since(table.snapshot["version"]).count() == 0


def test_changes_since_fact_table(spark, tmp_path):
    """Fact tables feed the incremental read as a multiset diff: rows in
    files added since the version are inserts (the feed column is
    change_op — facts already carry an `op` payload column)."""
    from hemera_indexer_spark.schemas import FACTS_SCHEMA

    facts = LakeTable.create(
        spark, str(tmp_path / "facts"), FACTS_SCHEMA, num_buckets=4,
        properties={"table_type": "fact"},
    )
    b1 = spark.createDataFrame(
        [("d1", [1], 1, "web", "insert", 1), ("d2", [2], 1, "web", "insert", 2)],
        FACTS_SCHEMA,
    )
    facts.insert_if_absent(b1)
    v = facts.snapshot["version"]
    b2 = spark.createDataFrame(
        [("d2", [2], 1, "web", "insert", 2),  # redelivery: absorbed
         ("d3", [3], 1, "web", "insert", 3)],
        FACTS_SCHEMA,
    )
    facts.insert_if_absent(b2)
    ch = facts.changes_since(v).collect()
    assert [(c["change_op"], c["doc_id"], c["op"]) for c in ch] == [
        ("insert", "d3", "insert")
    ]


def test_rebucket_preserves_state_and_serves_reads(spark, tiny_log, tmp_path):
    """Partition-spec evolution: rewriting into a new bucket count keeps
    the resolved state bit-identical; lookups and subsequent merges use
    the new layout."""
    import pyspark.sql.functions as F2

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions
    ).run()
    before = sorted(
        tuple(r) for r in table.current_state().select("doc_id", "seq").collect()
    )
    assert table.rebucket(16) is True
    assert table.num_buckets == 16
    assert {f["bucket"] for f in table.snapshot["files"]} <= set(range(16))
    after = sorted(
        tuple(r) for r in table.current_state().select("doc_id", "seq").collect()
    )
    assert after == before
    # point lookup resolves through the new bucket hash
    k = before[0][0]
    assert table.lookup(k).collect()[0]["doc_id"] == k
    # a post-rebucket merge (change-event shape: payload + op + seq) lands
    # in the new layout and wins by seq
    top_seq = max(s for _, s in before)
    upd = spark.createDataFrame(
        [(k, [9, 9], 2, "web", "update", top_seq + 1)],
        "doc_id string, tokens array<int>, n_tok int, source string, op string, seq long",
    ).withColumn("lang", F2.lit(None).cast("string"))
    table.merge_upsert(upd)
    assert table.lookup(k).collect()[0]["tokens"] == [9, 9]
    # no-op when the count is unchanged
    assert table.rebucket(16) is False


def test_rebucket_mid_stream_then_resume(spark, tiny_log, tmp_path):
    """Operational resize scenario: ingest half the log, rebucket, resume
    ingest from the checkpoint — the manifest survives the rewrite and the
    final state matches the oracle fold."""
    from hemera_indexer_spark.oracle import expected_live_rows

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    ctl = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions
    )
    ctl.run(max_epochs=4)
    fence_before = table.committed_epoch()
    assert table.rebucket(16) is True
    assert table.committed_epoch() == fence_before  # manifest preserved
    # resume in a FRESH controller (checkpoint restart path)
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions
    ).run()
    exp = expected_live_rows(tiny_log.out_dir, tiny_log.spec.n_partitions)
    got = sorted(
        (r.asDict(recursive=True) for r in table.current_state().collect()),
        key=lambda d: d["doc_id"],
    )
    assert len(got) == len(exp)
    assert all(g["tokens"] == e["tokens"] for g, e in zip(got, exp))


def test_view_custom_decomposable_aggs(spark, tiny_log, tmp_path):
    """min/max aggregates ride the same bucket-partial machinery (any
    bucket-decomposable fn works — partials merge with the same fn)."""
    import pytest

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    sink = IncrementalAggSink(
        table, str(tmp_path / "view"),
        aggs={"max_n_tok": ("max", "n_tok"), "min_seq": ("min", "seq")},
    )
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions, sinks=[sink]
    ).run()
    got = sorted(
        (r["source"], r["n_rows"], r["sum_n_tok"], r["max_n_tok"], r["min_seq"])
        for r in sink.view().collect()
    )
    exp = sorted(
        tuple(r)
        for r in table.current_state()
        .groupBy("source")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_tok").cast("long").alias("sum_n_tok"),
            F.max("n_tok").alias("max_n_tok"),
            F.min("seq").alias("min_seq"),
        )
        .collect()
    )
    assert got == exp
    with pytest.raises(ValueError):
        IncrementalAggSink(
            table, str(tmp_path / "v2"), aggs={"bad": ("avg", "n_tok")}
        )


def test_reader_snapshot_isolation_across_commits(spark, tiny_log, tmp_path):
    """A reader's plan captures the snapshot's file list at construction:
    commits (and compactions) that land afterwards do not change what the
    reader sees — file immutability + snapshot metadata = snapshot
    isolation without locks. Files stay on disk until vacuum_orphans,
    which only deletes what NO retained snapshot references."""
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    ctl = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        max_batch_epochs=1,
    )
    ctl.run(max_epochs=3)
    reader_df = table.current_state()  # lazy: plan pins the current files
    expected = sorted(
        tuple(r) for r in reader_df.select("doc_id", "seq").collect()
    )
    ctl.run()  # more commits land (updates, deletes, a rollback epoch)
    # the OLD plan still serves the OLD snapshot
    got = sorted(tuple(r) for r in reader_df.select("doc_id", "seq").collect())
    assert got == expected
    # while a LIVE handle sees the new state
    live = sorted(
        tuple(r) for r in table.current_state().select("doc_id", "seq").collect()
    )
    assert live != expected


def test_bulk_load_then_cdc_tail(spark, tiny_log, tmp_path):
    """Backfill-then-tail adoption path: bulk-load an initial corpus at
    seq 0, then replay the CDC log on top — change events win LWW over
    the backfill, untouched backfill rows survive, and a second bulk_load
    on the non-empty table is refused."""
    import pytest

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    seed = spark.createDataFrame(
        [("doc_pre_a", [7, 7, 7], 3, "seed"), ("doc_pre_b", [8], 1, "seed")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    assert table.bulk_load(seed) is True
    assert table.stats_row_count() == 2
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions
    ).run()
    state = {r["doc_id"]: r for r in table.current_state().collect()}
    # untouched backfill rows survive the whole replay
    assert state["doc_pre_a"]["tokens"] == [7, 7, 7]
    assert state["doc_pre_b"]["source"] == "seed"
    # CDC rows live alongside (the log's docs all have higher seqs)
    assert len(state) > 2
    with pytest.raises(ValueError):
        table.bulk_load(seed)


def test_bulk_load_rejects_duplicates_and_loses_ties_to_changes(spark, tmp_path):
    """Review regressions: duplicate seed keys are refused (same-seq rows
    would resolve nondeterministically), and a change event with seq 0 —
    a 0-indexed external log's first event — beats the backfill (base
    files win ties, so the backfill sits strictly below at seq -1)."""
    import pytest
    import pyspark.sql.functions as F2

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    dup = spark.createDataFrame(
        [("doc_a", [1], 1, "s"), ("doc_a", [2], 1, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    with pytest.raises(ValueError):
        table.bulk_load(dup)
    seed = spark.createDataFrame(
        [("doc_a", [1], 1, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    assert table.bulk_load(seed) is True
    upd = spark.createDataFrame(
        [("doc_a", [5, 5], 2, "s", "update", 0)],  # seq 0: 0-indexed log
        "doc_id string, tokens array<int>, n_tok int, source string, op string, seq long",
    ).withColumn("lang", F2.lit(None).cast("string"))
    table.merge_upsert(upd)
    assert table.lookup("doc_a").collect()[0]["tokens"] == [5, 5]


def test_changes_since_empty_across_pure_reorganization(spark, tiny_log, tmp_path):
    """Net-change semantics: compaction and rebucket rewrite every touched
    file but change NO row, so the change feed across them must be EMPTY —
    the metadata diff flags the buckets, the key-level full-outer join
    proves nothing moved."""
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4,
        properties={"write_mode": "mor"},
    )
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        compact_max_deltas=10_000,
    ).run()
    v = table.snapshot["version"]
    assert table.compact() is True
    assert table.changes_since(v).count() == 0
    v2 = table.snapshot["version"]
    assert table.rebucket(16) is True
    assert table.changes_since(v2).count() == 0
    # and the combined span is still a no-op feed
    assert table.changes_since(v).count() == 0


def test_rebucket_fact_table_and_expired_changes_since(spark, tmp_path):
    """Fact tables rebucket as raw row rewrites (no LWW fold — history
    must survive verbatim); changes_since against an expired version
    raises with the retained list instead of guessing."""
    import pytest

    from hemera_indexer_spark.schemas import FACTS_SCHEMA

    facts = LakeTable.create(
        spark, str(tmp_path / "facts"), FACTS_SCHEMA, num_buckets=2,
        properties={"table_type": "fact"},
    )
    rows = [
        ("d1", [1], 1, "w", "insert", 1),
        ("d1", [2], 1, "w", "update", 2),  # TWO rows for d1: history
        ("d2", [3], 1, "w", "insert", 3),
    ]
    facts.insert_if_absent(spark.createDataFrame(rows, FACTS_SCHEMA))
    assert facts.rebucket(8) is True
    got = sorted(tuple(r) for r in facts.read().select("doc_id", "seq").collect())
    assert got == [("d1", 1), ("d1", 2), ("d2", 3)]  # no fold, no loss
    # expire history, then ask for changes since a dropped version
    v_old = 1
    facts.insert_if_absent(
        spark.createDataFrame([("d3", [4], 1, "w", "insert", 4)], FACTS_SCHEMA)
    )
    facts.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        facts.changes_since(v_old)
