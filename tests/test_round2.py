"""Round-2 features: append-only fact tables, catch-up epoch grouping,
transient-failure retry, snapshot expiry + orphan vacuum, hash-chain reorg
*detection*, the per-checkpoint streaming fence, the pluggable job DAG, and
the crash-safe period fold."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.oracle import expected_fact_rows, expected_live_rows
from hemera_indexer_spark.schemas import FACTS_SCHEMA, SEQUENCES_SCHEMA
from hemera_indexer_spark.sources.generator import ChangelogSpec, generate_changelog
from hemera_indexer_spark.streaming import StreamController


def _state_dicts(table):
    return sorted(
        (r.asDict(recursive=True) for r in table.current_state().collect()),
        key=lambda d: d["doc_id"],
    )


# --------------------------------------------------------------- fact table
def test_fact_table_history_and_fold(spark, tiny_log, tmp_path):
    """Dual-sink replay (the reference's token_balances history +
    current_token_balances state pair): the fact table must equal the
    insert-if-absent oracle fold, and the LWW fold OF the fact table must
    reproduce the state table."""
    state = LakeTable.create(
        spark, str(tmp_path / "state"), SEQUENCES_SCHEMA, num_buckets=8
    )
    facts = LakeTable.create(
        spark, str(tmp_path / "facts"), FACTS_SCHEMA, num_buckets=8,
        properties={"table_type": "fact"},
    )
    ctl = StreamController(
        spark, state, tiny_log.out_dir, tiny_log.spec.n_partitions,
        fact_table=facts,
    )
    ctl.run()

    exp = expected_fact_rows(tiny_log.out_dir, tiny_log.spec.n_partitions)
    got = sorted(
        ((r["doc_id"], r["seq"], r["op"], tuple(r["tokens"] or []))
         for r in facts.current_state().collect())
    )
    expt = sorted(
        (e["doc_id"], e["seq"], e["op"], tuple(e["tokens"] or [])) for e in exp
    )
    assert len(got) == len(expt)
    assert got == expt

    # fact -> state law: every live state row is the LWW fold of the doc's
    # history. (The reverse containment does not hold under rollbacks: a
    # rollback deletes the KEY from state — awaiting fork repair — while the
    # doc's pre-fork facts legitimately remain in history, exactly like the
    # reference's reorg delete leaves older token_balances rows in place.)
    from hemera_indexer_spark.operators.lww import lww_latest

    folded = lww_latest(
        facts.current_state(),
        keys=["doc_id"],
        version=F.col("seq"),
        payload=["seq", "op", "tokens", "n_tok"],
    ).where(F.col("op") != "delete")
    f = {r["doc_id"]: r for r in folded.collect()}
    s = {r["doc_id"]: r for r in state.current_state().collect()}
    assert set(s) <= set(f)
    for k in s:
        assert f[k]["seq"] == s[k]["seq"]
        assert f[k]["tokens"] == s[k]["tokens"]


def test_fact_fold_equals_state_without_rollbacks(spark, tmp_path):
    """With no reorgs in the log the fold-of-history law is exact:
    LWW(fact table) == state table."""
    spec = ChangelogSpec(
        n_docs=150, n_epochs=4, events_per_epoch=300, n_partitions=2,
        seed=13, schema_evolution_epoch=None, rollback_epochs=(),
    )
    log = str(tmp_path / "log")
    generate_changelog(log, spec)
    state = LakeTable.create(
        spark, str(tmp_path / "state"), SEQUENCES_SCHEMA, num_buckets=4
    )
    facts = LakeTable.create(
        spark, str(tmp_path / "facts"), FACTS_SCHEMA, num_buckets=4,
        properties={"table_type": "fact"},
    )
    StreamController(spark, state, log, 2, fact_table=facts).run()

    from hemera_indexer_spark.operators.lww import lww_latest

    folded = lww_latest(
        facts.current_state(),
        keys=["doc_id"],
        version=F.col("seq"),
        payload=["seq", "op", "tokens", "n_tok"],
    ).where(F.col("op") != "delete")
    f = {r["doc_id"]: (r["seq"], r["tokens"]) for r in folded.collect()}
    s = {r["doc_id"]: (r["seq"], r["tokens"]) for r in state.current_state().collect()}
    assert f == s
    # and the history is complete: one fact per generated event
    assert facts.current_state().count() == spec.n_epochs * spec.events_per_epoch


def test_insert_if_absent_redelivery_noop(spark, tmp_path):
    facts = LakeTable.create(
        spark, str(tmp_path / "facts"), FACTS_SCHEMA, num_buckets=4,
        properties={"table_type": "fact"},
    )
    batch = spark.createDataFrame(
        [("doc_1", [1, 2], 2, "web", "insert", 1),
         ("doc_2", [3], 1, "web", "insert", 2),
         ("doc_2", [3], 1, "web", "insert", 2)],  # in-batch duplicate
        "doc_id string, tokens array<int>, n_tok int, source string, op string, seq long",
    )
    facts.insert_if_absent(batch)
    assert facts.current_state().count() == 2
    # cross-commit redelivery + one genuinely new row
    batch2 = batch.unionByName(
        spark.createDataFrame(
            [("doc_3", [9], 1, "code", "insert", 3)],
            "doc_id string, tokens array<int>, n_tok int, source string, op string, seq long",
        )
    )
    facts.insert_if_absent(batch2)
    rows = {(r["doc_id"], r["seq"]) for r in facts.current_state().collect()}
    assert rows == {("doc_1", 1), ("doc_2", 2), ("doc_3", 3)}
    # fact tables never compact/fold
    assert facts.compact() is False


# ------------------------------------------------------------ epoch grouping
def test_grouped_equals_ungrouped(spark, tiny_log, tmp_path):
    """Catch-up batching must be replay-equivalent: the grouped run's final
    state matches the per-epoch run (and thus the oracle) even with the
    rollback + duplicate re-delivery epochs in the log."""
    a = LakeTable.create(spark, str(tmp_path / "a"), SEQUENCES_SCHEMA, num_buckets=8)
    StreamController(
        spark, a, tiny_log.out_dir, tiny_log.spec.n_partitions, max_batch_epochs=8
    ).run()
    b = LakeTable.create(spark, str(tmp_path / "b"), SEQUENCES_SCHEMA, num_buckets=8)
    StreamController(
        spark, b, tiny_log.out_dir, tiny_log.spec.n_partitions, max_batch_epochs=1
    ).run()
    assert _state_dicts(a) == _state_dicts(b)
    # grouped run commits fewer snapshots
    assert a.snapshot["version"] < b.snapshot["version"]


# -------------------------------------------------------------------- retry
def test_transient_failure_retries_and_converges(spark, tiny_log, tmp_path):
    """Chaos: the first merge attempt dies with a transient OSError; the
    controller retries the group (idempotent + fenced) and converges."""
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    real = table.merge_upsert
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # mid-run, after some state exists
            raise OSError("simulated transient I/O failure")
        return real(*a, **kw)

    table.merge_upsert = flaky
    ctl = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        max_retries=2, retry_backoff_s=0.01,
    )
    stats = ctl.run()
    assert any(s.retries > 0 for s in stats.epochs)
    expected = expected_live_rows(tiny_log.out_dir, tiny_log.spec.n_partitions)
    got = _state_dicts(table)
    assert len(got) == len(expected)
    assert all(g["tokens"] == e["tokens"] for g, e in zip(got, expected))


def test_deterministic_failure_crashes(spark, tiny_log, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )

    def boom(*a, **kw):
        raise ValueError("logic bug: not retriable")

    table.merge_upsert = boom
    ctl = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        max_retries=5, retry_backoff_s=0.01,
    )
    with pytest.raises(ValueError):
        ctl.run()


# ------------------------------------------------------- snapshot maintenance
def test_expire_snapshots_and_vacuum_orphans(spark, tiny_log, tmp_path):
    root = str(tmp_path / "lake")
    table = LakeTable.create(spark, root, SEQUENCES_SCHEMA, num_buckets=8)
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        max_batch_epochs=1,
    ).run()
    before = _state_dicts(table)

    # simulate a crashed commit: data files written, VERSION never flipped
    orphan_dir = os.path.join(root, "data", "commit-0000009999-deadbeef", "_bucket=0")
    os.makedirs(orphan_dir)
    pq.write_table(
        pa.table({"doc_id": ["zz"], "seq": [1]}),
        os.path.join(orphan_dir, "part-orphan.parquet"),
    )

    n_snaps_before = sum(
        1 for f in os.listdir(os.path.join(root, "meta")) if f.startswith("snap-")
    )
    assert n_snaps_before > 3
    removed_snaps = table.expire_snapshots(keep_last=2)
    assert removed_snaps == n_snaps_before - 2
    removed_files = table.vacuum_orphans()
    assert removed_files >= 1
    assert not os.path.exists(orphan_dir)

    # table unchanged, still fully readable after maintenance
    table2 = LakeTable.load(spark, root)
    assert _state_dicts(table2) == before
    # every referenced file still on disk
    for f in table2.snapshot["files"]:
        assert os.path.exists(os.path.join(root, f["path"]))


# ------------------------------------------------------------ reorg detection
def test_hash_chain_divergence_detected_and_repaired(spark, tmp_path):
    """A forked hash chain (check_block_consensus_job analog) is detected
    WITHOUT any explicit rollback event: the divergent event triggers a
    synthetic rollback to the fork point, and the fork's events repair the
    state."""
    h = [f"h{i}" for i in range(9)]
    rows = [
        # seq, doc, op, tokens, chain, parent      (partition 0 of 1)
        (1, "doc_1", "insert", [1], h[1], h[0]),
        (2, "doc_2", "insert", [2], h[2], h[1]),
        (3, "doc_3", "insert", [3], h[3], h[2]),
        (4, "doc_1", "update", [4], h[4], h[3]),   # orphaned by the fork
        (5, "doc_2", "update", [5], h[5], h[4]),   # orphaned by the fork
        (6, "doc_4", "insert", [6], "f6", h[3]),   # divergent: parent = h3, not h5
        (7, "doc_5", "insert", [7], "f7", "f6"),
        (8, "doc_1", "update", [8], "f8", "f7"),   # fork re-delivers d1's state
    ]
    tbl = pa.table(
        {
            "seq": pa.array([r[0] for r in rows], pa.int64()),
            "epoch": pa.array([0] * len(rows), pa.int64()),
            "partition": pa.array([0] * len(rows), pa.int32()),
            "doc_id": pa.array([r[1] for r in rows]),
            "op": pa.array([r[2] for r in rows]),
            "tokens": pa.array([r[3] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[3]) for r in rows], pa.int32()),
            "source": pa.array(["web"] * len(rows)),
            "rollback_to_seq": pa.nulls(len(rows), pa.int64()),
            "chain_hash": pa.array([r[4] for r in rows]),
            "parent_hash": pa.array([r[5] for r in rows]),
        }
    )
    log = str(tmp_path / "log")
    d = os.path.join(log, "epoch=00000", "partition=000")
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    stats = StreamController(spark, table, log, 1).run()
    assert stats.epochs[0].rollbacks == 1  # the synthetic one
    got = {r["doc_id"]: r for r in table.current_state().collect()}
    # d1: pre-fork version wiped (seq 4 >= fork point), re-inserted by seq 8
    # d2: wiped (seq 5), never repaired -> absent
    # d3: untouched (seq 3 < fork point 4)
    assert set(got) == {"doc_1", "doc_3", "doc_4", "doc_5"}
    assert got["doc_1"]["seq"] == 8 and got["doc_1"]["tokens"] == [8]
    assert got["doc_3"]["tokens"] == [3]
    assert got["doc_4"]["tokens"] == [6]
    assert got["doc_5"]["tokens"] == [7]
    # consensus columns are chain bookkeeping, never state payload
    assert "chain_hash" not in table.schema.fieldNames()


def test_intact_hash_chain_is_untouched(spark, tmp_path):
    """No divergence -> no synthetic rollbacks, plain replay."""
    rows = [(i, f"doc_{i}", "insert", [i], f"h{i}", f"h{i-1}") for i in range(1, 6)]
    tbl = pa.table(
        {
            "seq": pa.array([r[0] for r in rows], pa.int64()),
            "epoch": pa.array([0] * len(rows), pa.int64()),
            "partition": pa.array([0] * len(rows), pa.int32()),
            "doc_id": pa.array([r[1] for r in rows]),
            "op": pa.array([r[2] for r in rows]),
            "tokens": pa.array([r[3] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array([1] * len(rows), pa.int32()),
            "source": pa.array(["web"] * len(rows)),
            "rollback_to_seq": pa.nulls(len(rows), pa.int64()),
            "chain_hash": pa.array([r[4] for r in rows]),
            "parent_hash": pa.array([r[5] for r in rows]),
        }
    )
    log = str(tmp_path / "log")
    d = os.path.join(log, "epoch=00000", "partition=000")
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    stats = StreamController(spark, table, log, 1).run()
    assert stats.epochs[0].rollbacks == 0
    assert table.current_state().count() == 5


# ----------------------------------------------------------- streaming fence
def test_stream_into_table_with_prior_batch_epochs(spark, tmp_path):
    """Regression: the streaming fence must NOT reuse the batch epoch
    counter. Batch-ingest 2 epochs (committed_epoch=1), then stream the full
    log with a fresh checkpoint: the stream's batch 0/1 would previously be
    fenced out (0 <= 1) and epoch 2's data silently dropped."""
    from hemera_indexer_spark.streaming.structured import StructuredIngest

    spec = ChangelogSpec(
        n_docs=100, n_epochs=3, events_per_epoch=200, n_partitions=2,
        seed=11, schema_evolution_epoch=None, rollback_epochs=(),
    )
    log = str(tmp_path / "log")
    generate_changelog(log, spec)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    StreamController(spark, table, log, spec.n_partitions).run(max_epochs=2)
    assert table.committed_epoch() == 1

    ingest = StructuredIngest(
        spark, table, log, spec.n_partitions,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q = ingest.start(available_now=True)
    q.awaitTermination(300)
    table.refresh()
    expected = expected_live_rows(log, spec.n_partitions)
    got = _state_dicts(table)
    assert len(got) == len(expected)
    assert all(g["tokens"] == e["tokens"] for g, e in zip(got, expected))


# -------------------------------------------------------------------- job DAG
def test_job_dag_topo_and_oracle(spark):
    from hemera_indexer_spark.plans.dag import JobGraph

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    graph = JobGraph()

    @graph.register("enriched", inputs=["events"])
    def enriched(spark_, ins):
        return ins["events"].withColumn(
            "route",
            F.when(F.col("event_type").isin("click", "view"), "engagement")
            .otherwise("other"),
        )

    @graph.register("daily_routes", inputs=["enriched"])
    def daily_routes(spark_, ins):
        return ins["enriched"].groupBy(
            F.col("ts").cast("date").alias("day"), "route"
        ).agg(F.count("*").alias("n"))

    @graph.register("route_totals", inputs=["daily_routes", "enriched"])
    def route_totals(spark_, ins):  # diamond: two paths from 'enriched'
        return ins["daily_routes"].groupBy("route").agg(F.sum("n").alias("n"))

    order = [j.name for j in graph.topo_order(["route_totals"], {"events"})]
    assert order.index("enriched") < order.index("daily_routes") < order.index(
        "route_totals"
    )

    out = graph.run(spark, {"events": ev}, targets=["route_totals"])
    got = {r["route"]: r["n"] for r in out["route_totals"].collect()}
    direct = {
        r["route"]: r["n"]
        for r in ev.withColumn(
            "route",
            F.when(F.col("event_type").isin("click", "view"), "engagement")
            .otherwise("other"),
        )
        .groupBy("route")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == direct


def test_job_dag_cycle_and_missing_detection(spark):
    from hemera_indexer_spark.plans.dag import CycleError, JobGraph, MissingDatasetError

    g = JobGraph()
    g.register("a", inputs=["b"])(lambda s, i: i["b"])
    g.register("b", inputs=["a"])(lambda s, i: i["a"])
    with pytest.raises(CycleError):
        g.topo_order(["a"], set())

    g2 = JobGraph()
    g2.register("x", inputs=["nope"])(lambda s, i: i["nope"])
    with pytest.raises(MissingDatasetError):
        g2.topo_order(["x"], {"events"})

    g3 = JobGraph()
    g3.register("y", inputs=[])(lambda s, i: None)
    with pytest.raises(ValueError):
        g3.register("other", inputs=[], output="y")(lambda s, i: None)


def test_job_dag_derived_table_per_epoch(spark, tiny_log, tmp_path):
    """The reference's extension story: a custom downstream job consumes the
    state table each epoch group and materializes a derived table."""
    from hemera_indexer_spark.plans.dag import JobGraph

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    StreamController(spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions).run()

    graph = JobGraph()

    @graph.register("source_stats", inputs=["state"])
    def source_stats(spark_, ins):
        return ins["state"].groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )

    out = graph.run(spark, {"state": table.current_state()})
    derived_dir = str(tmp_path / "derived")
    out["source_stats"].write.mode("overwrite").parquet(derived_dir)

    exp = {}
    for e in expected_live_rows(tiny_log.out_dir, tiny_log.spec.n_partitions):
        s = exp.setdefault(e["source"], [0, 0])
        s[0] += 1
        s[1] += e["n_tok"]
    got = {
        r["source"]: [r["n_docs"], r["total_tokens"]]
        for r in spark.read.parquet(derived_dir).collect()
    }
    assert got == exp


# ------------------------------------------------------- period fold crashes
def _events(spark):
    return spark.read.parquet("/root/testdata/sf0.01/events.parquet")


def _global_totals(ev):
    return {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .collect()
    }


@pytest.mark.parametrize("crash_point", ["before_ckpt", "after_ckpt"])
def test_period_fold_crash_windows(spark, tmp_path, monkeypatch, crash_point):
    """Crash between staging and checkpoint re-folds the day exactly once;
    crash between checkpoint and old-dir cleanup leaves a committed state —
    either way the resumed totals equal the global aggregate (no double
    counting, no lost accumulator)."""
    from hemera_indexer_spark.plans import aggr_scheduler as mod

    ev = _events(spark)
    sched = mod.AggrScheduler(spark, str(tmp_path / "aggr"))
    sched.run_daily(ev)

    class Boom(RuntimeError):
        pass

    if crash_point == "before_ckpt":
        real_replace = os.replace
        state = {"armed": 0}

        def crashing_replace(src, dst):
            if dst.endswith("_period_ckpt.json"):
                state["armed"] += 1
                if state["armed"] == 3:  # die mid-run, after 2 folded days
                    raise Boom()
            return real_replace(src, dst)

        monkeypatch.setattr(mod.os, "replace", crashing_replace)
    else:
        import shutil as _shutil

        real_rmtree = _shutil.rmtree
        state = {"n": 0}

        def crashing_rmtree(path, *a, **kw):
            if "period.v" in str(path):
                state["n"] += 1
                if state["n"] == 2:
                    raise Boom()
            return real_rmtree(path, *a, **kw)

        monkeypatch.setattr("shutil.rmtree", crashing_rmtree)

    with pytest.raises(Boom):
        sched.run_period()
    monkeypatch.undo()

    # fresh scheduler = process restart; resume and verify totals
    sched2 = mod.AggrScheduler(spark, str(tmp_path / "aggr"))
    period = sched2.run_period()
    p = {r["user_id"]: r for r in period.collect()}
    d = _global_totals(ev)
    assert set(p) == set(d)
    for uid in d:
        assert p[uid]["n_events"] == d[uid]["n_events"]
        assert abs(p[uid]["sum_value"] - d[uid]["sum_value"]) < 1e-6
    # exactly one live accumulator dir remains
    vdirs = [x for x in os.listdir(tmp_path / "aggr") if x.startswith("period.v")]
    assert len(vdirs) == 1


# -------------------------------------------------- confirmation lag / --delay
def test_confirmation_lag_stays_behind_head(spark, tiny_log, tmp_path):
    """--delay analog: with confirmation_lag=2 the controller never ingests
    the top 2 epochs; dropping the lag catches up to the head."""
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    n = tiny_log.spec.n_epochs
    ctl = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        confirmation_lag=2,
    )
    ctl.run()
    assert table.committed_epoch() == n - 3  # head is n-1; lag 2 => n-3
    ctl.confirmation_lag = 0
    ctl.run()
    assert table.committed_epoch() == n - 1
    expected = expected_live_rows(tiny_log.out_dir, tiny_log.spec.n_partitions)
    got = _state_dicts(table)
    assert len(got) == len(expected)
    assert all(g["tokens"] == e["tokens"] for g, e in zip(got, expected))


# ------------------------------------------------------------ read-API analogs
def test_point_lookup_and_stats_count(spark, tiny_log, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    StreamController(spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions).run()
    state = {r["doc_id"]: r for r in table.current_state().collect()}
    some_key = sorted(state)[3]
    got = table.lookup(some_key).collect()
    assert len(got) == 1
    assert got[0]["seq"] == state[some_key]["seq"]
    assert got[0]["tokens"] == state[some_key]["tokens"]
    # a deleted/never-seen key resolves to no rows
    assert table.lookup("doc_99999999").count() == 0
    # metadata-only count: upper bound of resolved rows, >= live rows
    assert table.stats_row_count() >= len(state)
    table.compact()
    # after full compaction the stats count equals resolved rows exactly
    assert table.stats_row_count() == table.resolved().count()


# ----------------------------------------------------------- batched enrich
def test_batched_enrich_adaptive(spark):
    """Multicall/BatchWorkExecutor analog: chunks are bounded, a failing
    chunk is halved and retried, and every row is enriched exactly once."""
    import pandas as pd
    from hemera_indexer_spark.operators.batcher import batched_enrich

    df = spark.range(0, 1000, 1, 4).selectExpr("id")
    seen_sizes = []

    def enrich(chunk: pd.DataFrame) -> pd.DataFrame:
        seen_sizes.append(len(chunk))  # task-local; only for the local test
        if len(chunk) > 64:
            raise RuntimeError("simulated overload (too many calls batched)")
        return chunk.assign(doubled=chunk["id"] * 2)

    out = batched_enrich(
        df, enrich, out_schema="id long, doubled long", batch_size=256,
        min_batch_size=8,
    )
    rows = {r["id"]: r["doubled"] for r in out.collect()}
    assert len(rows) == 1000
    assert all(v == k * 2 for k, v in rows.items())

    # crashable: failure below min_batch_size propagates
    def poison(chunk):
        raise RuntimeError("deterministic poison")

    import pytest as _pytest
    with _pytest.raises(Exception):
        batched_enrich(
            df, poison, out_schema="id long", batch_size=4, min_batch_size=4
        ).collect()


def test_job_dag_module_discovery(spark):
    import types

    from hemera_indexer_spark.plans.dag import JobGraph, job

    mod = types.ModuleType("fake_plugins")

    @job("clicks", inputs=["events"])
    def clicks(spark_, ins):
        return ins["events"].where(F.col("event_type") == "click")

    @job("click_counts", inputs=["clicks"])
    def click_counts(spark_, ins):
        return ins["clicks"].groupBy("user_id").agg(F.count("*").alias("n"))

    mod.clicks = clicks
    mod.click_counts = click_counts
    g = JobGraph()
    assert g.discover(mod) == 2
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = g.run(spark, {"events": ev}, targets=["click_counts"])
    direct = ev.where(F.col("event_type") == "click").groupBy("user_id").count()
    assert out["click_counts"].count() == direct.count()


# ----------------------------------------------- stateful streaming operator
def test_stateful_running_doc_state(spark, tmp_path):
    """applyInPandasWithState custom stateful operator: per-doc running LWW
    state + lifetime event count, folded vectorized in the state store."""
    from hemera_indexer_spark.oracle import read_log_rows
    from hemera_indexer_spark.streaming.stateful import running_doc_state_stream

    spec = ChangelogSpec(
        n_docs=80, n_epochs=3, events_per_epoch=150, n_partitions=2,
        seed=5, schema_evolution_epoch=None, rollback_epochs=(),
    )
    log = str(tmp_path / "log")
    generate_changelog(log, spec)
    q = (
        running_doc_state_stream(spark, log)
        .writeStream.format("memory")
        .queryName("doc_state_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {}
    for r in spark.sql("SELECT * FROM doc_state_out").collect():
        cur = got.get(r["doc_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            got[r["doc_id"]] = r

    exp: dict = {}
    for row in read_log_rows(log):
        if row["op"] == "rollback":
            continue
        e = exp.setdefault(
            row["doc_id"], {"seq": -1, "n_tok": None, "deleted": None, "n": 0}
        )
        e["n"] += 1
        if row["seq"] > e["seq"]:
            e["seq"] = row["seq"]
            e["deleted"] = row["op"] == "delete"
            e["n_tok"] = row["n_tok"]
    assert set(got) == set(exp)
    for k, e in exp.items():
        g = got[k]
        assert g["seq"] == e["seq"], k
        assert g["is_deleted"] == e["deleted"], k
        assert g["n_events"] == e["n"], k
        assert g["n_tok"] == e["n_tok"], k


# -------------------------------------------- cross-batch consensus detection
def test_hash_chain_divergence_across_batches(spark, tmp_path):
    """The manifest's per-partition chain tip extends the consensus check
    across the batch boundary: a fork whose first divergent event opens a
    NEW batch is still detected, and the manifest's hash TAIL locates the
    out-of-batch fork point so only the orphaned suffix is rolled back
    (not the whole partition)."""
    def write_epoch(log, epoch, rows):
        tbl = pa.table(
            {
                "seq": pa.array([r[0] for r in rows], pa.int64()),
                "epoch": pa.array([epoch] * len(rows), pa.int64()),
                "partition": pa.array([0] * len(rows), pa.int32()),
                "doc_id": pa.array([r[1] for r in rows]),
                "op": pa.array(["insert"] * len(rows)),
                "tokens": pa.array([r[2] for r in rows], pa.list_(pa.int32())),
                "n_tok": pa.array([len(r[2]) for r in rows], pa.int32()),
                "source": pa.array(["web"] * len(rows)),
                "rollback_to_seq": pa.nulls(len(rows), pa.int64()),
                "chain_hash": pa.array([r[3] for r in rows]),
                "parent_hash": pa.array([r[4] for r in rows]),
            }
        )
        d = os.path.join(log, f"epoch={epoch:05d}", "partition=000")
        os.makedirs(d)
        pq.write_table(tbl, os.path.join(d, "events.parquet"))

    log = str(tmp_path / "log")
    write_epoch(log, 0, [
        (1, "doc_1", [1], "h1", "h0"),
        (2, "doc_2", [2], "h2", "h1"),
        (3, "doc_3", [3], "h3", "h2"),
    ])
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    ctl = StreamController(spark, table, log, 1)
    ctl.run()  # commit epoch 0; manifest records chain tip h3
    assert table.snapshot["manifest"]["last_hashes"] == {"0": "h3"}

    # epoch 1 opens on a fork: parent h2 (not our tip h3)
    write_epoch(log, 1, [
        (4, "doc_4", [4], "f4", "h2"),
        (5, "doc_1", [5], "f5", "f4"),   # fork re-delivers doc_1
    ])
    stats = ctl.run()
    assert stats.epochs[0].rollbacks == 1  # detected across the boundary
    got = {r["doc_id"]: r for r in table.current_state().collect()}
    # fork point (h2) is outside the batch but INSIDE the committed hash
    # tail -> bounded repair: only seq >= 3 wiped (doc_3), earlier docs
    # survive, fork events land on top
    assert set(got) == {"doc_1", "doc_2", "doc_4"}
    assert got["doc_1"]["seq"] == 5 and got["doc_1"]["tokens"] == [5]
    assert got["doc_2"]["seq"] == 2
    assert table.snapshot["manifest"]["last_hashes"] == {"0": "f5"}


def test_fork_two_batches_back_bounded_by_tail(spark, tmp_path):
    """A fork whose ancestor lies TWO committed batches back is still
    repaired from the manifest's hash tail (which accumulates across
    batches), wiping only the orphaned suffix."""
    log = str(tmp_path / "log")
    _write_hash_epoch(log, 0, [
        (1, "doc_1", [1], "h1", "h0"),
        (2, "doc_2", [2], "h2", "h1"),
    ])
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    ctl = StreamController(spark, table, log, 1)
    ctl.run()
    _write_hash_epoch(log, 1, [
        (3, "doc_3", [3], "h3", "h2"),
        (4, "doc_4", [4], "h4", "h3"),
    ])
    ctl.run()
    tails = table.snapshot["manifest"]["hash_tails"]["0"]
    assert [s for s, _ in tails] == [1, 2, 3, 4]  # accumulated across batches
    # epoch 2 forks off h2 — an ancestor from the FIRST batch
    _write_hash_epoch(log, 2, [
        (5, "doc_5", [5], "f5", "h2"),
        (6, "doc_3", [6], "f6", "f5"),
    ])
    stats = ctl.run()
    assert stats.epochs[0].rollbacks == 1
    got = {r["doc_id"]: r for r in table.current_state().collect()}
    # rollback bounded to seq >= 3: docs 1-2 survive, 3-4 wiped, fork lands
    assert set(got) == {"doc_1", "doc_2", "doc_3", "doc_5"}
    assert got["doc_3"]["seq"] == 6 and got["doc_3"]["tokens"] == [6]
    # orphaned hashes (h3, h4) must have been evicted from the tail
    tails = dict(table.snapshot["manifest"]["hash_tails"])["0"]
    assert {h for _, h in tails} == {"h1", "h2", "f5", "f6"}


def test_manifest_tips_survive_unhashed_batch(spark, tmp_path):
    """Committing a batch WITHOUT chain columns must not drop previously
    recorded tips/tails — a later hash-chained batch still fences against
    them (regression: tips were rebuilt from scratch per commit)."""
    log = str(tmp_path / "log")
    _write_hash_epoch(log, 0, [
        (1, "doc_1", [1], "h1", "h0"),
        (2, "doc_2", [2], "h2", "h1"),
    ])
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    ctl = StreamController(spark, table, log, 1)
    ctl.run()
    assert table.snapshot["manifest"]["last_hashes"] == {"0": "h2"}
    # epoch 1 carries NO chain columns (e.g. a source that stopped emitting
    # them); its commit must carry the old tips forward
    _write_hash_epoch(log, 1, [(3, "doc_3", [3], None, None)], hashed=False)
    ctl.run()
    assert table.snapshot["manifest"]["last_hashes"] == {"0": "h2"}
    assert [s for s, _ in table.snapshot["manifest"]["hash_tails"]["0"]] == [1, 2]
    # epoch 2 resumes the chain and forks at the boundary: still detected
    _write_hash_epoch(log, 2, [(4, "doc_1", [4], "f4", "hX")])
    stats = ctl.run()
    assert stats.epochs[0].rollbacks == 1


def test_synthetic_rollback_bounded_by_explicit_floor(spark, tmp_path):
    """When a fork's ancestor is nowhere (not in batch, not in tail), the
    synthetic rollback falls back to the floor of an explicit rollback for
    the same partition in the batch instead of wiping to seq 0 — rows the
    explicit rollback deliberately preserved stay preserved."""
    log = str(tmp_path / "log")
    _write_hash_epoch(log, 0, [
        (1, "doc_1", [1], "h1", "h0"),
        (2, "doc_2", [2], "h2", "h1"),
    ])
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA,
        num_buckets=4,
    )
    # tiny tail: only the newest entry is retained, so an older ancestor
    # cannot be located and the fallback path is exercised
    ctl = StreamController(spark, table, log, 1, hash_tail_len=1)
    ctl.run()
    assert [s for s, _ in table.snapshot["manifest"]["hash_tails"]["0"]] == [2]
    # epoch 1: an explicit rollback to seq 2, plus a divergent event whose
    # parent (hZ) matches nothing anywhere
    _write_hash_epoch(log, 1, [
        (3, "doc_2", [3], "g3", "hZ", 2, "rollback"),
        (4, "doc_2", [4], "g4", "g3"),
    ])
    ctl.run()
    got = {r["doc_id"]: r for r in table.current_state().collect()}
    # floor 2 honored: doc_1 (seq 1 < 2) survives; doc_2's old version is
    # wiped and repaired by the fork events
    assert set(got) == {"doc_1", "doc_2"}
    assert got["doc_1"]["seq"] == 1
    assert got["doc_2"]["seq"] == 4


def _write_hash_epoch(log, epoch, rows, hashed=True):
    """rows: (seq, doc_id, tokens, chain_hash, parent_hash[, rollback_to,
    op])."""
    n = len(rows)
    cols = {
        "seq": pa.array([r[0] for r in rows], pa.int64()),
        "epoch": pa.array([epoch] * n, pa.int64()),
        "partition": pa.array([0] * n, pa.int32()),
        "doc_id": pa.array([r[1] for r in rows]),
        "op": pa.array([(r[6] if len(r) > 6 else "insert") for r in rows]),
        "tokens": pa.array([r[2] for r in rows], pa.list_(pa.int32())),
        "n_tok": pa.array([len(r[2]) for r in rows], pa.int32()),
        "source": pa.array(["web"] * n),
        "rollback_to_seq": pa.array(
            [(r[5] if len(r) > 5 else None) for r in rows], pa.int64()
        ),
    }
    if hashed:
        cols["chain_hash"] = pa.array([r[3] for r in rows])
        cols["parent_hash"] = pa.array([r[4] for r in rows])
    d = os.path.join(log, f"epoch={epoch:05d}", "partition=000")
    os.makedirs(d)
    pq.write_table(pa.table(cols), os.path.join(d, "events.parquet"))
