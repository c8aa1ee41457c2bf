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


# ------------------------------------------- vocab_histogram approx mode
def _docs_df(spark):
    rows = [
        (f"d{i}", [t for t in range(i % 7)] + [99], "web") for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string"
    )


def test_vocab_histogram_exact_vs_approx(spark):
    from hemera_indexer_spark.operators.tokens import vocab_histogram

    docs = _docs_df(spark)
    exact = {
        r["token"]: (r["n_occurrences"], r["n_docs"])
        for r in vocab_histogram(docs, id_col="doc_id").collect()
    }
    approx = {
        r["token"]: (r["n_occurrences"], r["n_docs"])
        for r in vocab_histogram(docs, id_col="doc_id", approx=True).collect()
    }
    assert set(exact) == set(approx)
    for tok, (n_occ, n_docs) in exact.items():
        a_occ, a_docs = approx[tok]
        assert a_occ == n_occ  # occurrence count is exact in both modes
        # HLL++ at default rsd 5%: generous tolerance, tiny cardinalities
        # are exact in practice
        assert abs(a_docs - n_docs) <= max(1, int(0.1 * n_docs))


# -------------------------------------------- seeded-hyperplane anchors
def _emb_df(spark):
    import math

    rows = [
        (i, [math.sin(i * 0.7 + j) for j in range(8)]) for i in range(60)
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_hyperplane_buckets_deterministic_given_seed(spark):
    from hemera_indexer_spark.operators.similarity import anchor_lsh_buckets

    emb = _emb_df(spark)
    b1 = {
        r["vec_id"]: r["bucket"]
        for r in anchor_lsh_buckets(emb, method="hyperplane", seed=7).collect()
    }
    b2 = {
        r["vec_id"]: r["bucket"]
        for r in anchor_lsh_buckets(emb, method="hyperplane", seed=7).collect()
    }
    b3 = {
        r["vec_id"]: r["bucket"]
        for r in anchor_lsh_buckets(emb, method="hyperplane", seed=8).collect()
    }
    assert b1 == b2
    assert b3 != b1  # a different seed draws different planes
    assert set(b1) == set(range(60))


def test_hyperplane_buckets_group_near_duplicates(spark):
    # identical vectors must always share a bucket regardless of planes
    from hemera_indexer_spark.operators.similarity import anchor_lsh_buckets

    emb = _emb_df(spark)
    dup = emb.union(
        emb.where(F.col("vec_id") < 5).withColumn(
            "vec_id", F.col("vec_id") + 1000
        )
    )
    b = {
        r["vec_id"]: r["bucket"]
        for r in anchor_lsh_buckets(dup, method="hyperplane", seed=3).collect()
    }
    for i in range(5):
        assert b[i] == b[i + 1000]


def test_unknown_lsh_method_raises(spark):
    from hemera_indexer_spark.operators.similarity import anchor_lsh_buckets

    with pytest.raises(ValueError, match="method"):
        anchor_lsh_buckets(_emb_df(spark), method="nope").collect()


# ----------------------------------------- CC hybrid threshold boundary
@pytest.mark.parametrize("delta", [-1, 0, 1])
def test_cc_auto_identical_across_threshold(spark, delta):
    """connected_components_auto must produce identical labels whether the
    edge count lands just below, at, or just above driver_threshold (the
    union-find vs label-propagation cut-over can never silently diverge)."""
    from hemera_indexer_spark.operators.dedup import connected_components_auto

    # two chains + a star + singleton-free edge soup: 12 edges
    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"),
        ("e", "f"), ("f", "g"),
        ("h", "i"), ("h", "j"), ("h", "k"),
        ("m", "n"), ("n", "o"), ("o", "m"),  # cycle
        ("p", "q"),
    ]
    pairs = spark.createDataFrame(edges, "doc_a string, doc_b string")
    n_edges = pairs.distinct().count()
    labels = sorted(
        tuple(r)
        for r in connected_components_auto(
            pairs, driver_threshold=n_edges + delta
        ).collect()
    )
    expected = sorted(
        [
            ("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
            ("e", "e"), ("f", "e"), ("g", "e"),
            ("h", "h"), ("i", "h"), ("j", "h"), ("k", "h"),
            ("m", "m"), ("n", "m"), ("o", "m"),
            ("p", "p"), ("q", "p"),
        ]
    )
    assert labels == expected


# ------------------------------------------------ aggregates freshness
def test_aggr_freshness_guard(spark, tmp_path):
    """A half-ingested day must never be silently aggregated: explicit
    requests raise, auto mode skips it with a warning and computes it on
    the re-run after ingest passes the window (idempotent overwrite)."""
    import warnings

    from hemera_indexer_spark.plans.aggr_scheduler import (
        AggrScheduler,
        DataFreshnessError,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    days = sorted(
        r[0]
        for r in ev.select(F.to_date("ts").cast("string")).distinct().collect()
    )
    sched = AggrScheduler(spark, str(tmp_path / "aggr"))
    # explicit request for the day AT the watermark (ingest mid-day) raises
    with pytest.raises(DataFreshnessError, match="not fully ingested"):
        sched.run_daily(ev, days=[days[-1]], watermark=days[-1])
    # auto mode: skips the incomplete tail day loudly, writes the rest
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sched.run_daily(ev, watermark=days[-1])
    assert any("skipping incomplete" in str(x.message) for x in w)
    written = {
        r[0]
        for r in sched.daily()
        .select(F.col("day").cast("string"))
        .distinct()
        .collect()
    }
    assert written == set(days[:-1])
    # ingest passes the window -> the re-run back-fills exactly that day
    sched.run_daily(ev, days=[days[-1]])
    written2 = {
        r[0]
        for r in sched.daily()
        .select(F.col("day").cast("string"))
        .distinct()
        .collect()
    }
    assert written2 == set(days)
    # complete-day explicit request under the same watermark is fine
    sched.run_daily(ev, days=[days[0]], watermark=days[-1])


# -------------------------------------------- first-class multi-tenant
def test_multi_tenant_controllers_share_tables(spark, tmp_path):
    """Two tenants (one controller per tenant log, the reference's
    multi-chain exporter shape) ingest into ONE shared state table and ONE
    shared fact table: per-tenant state must match each log's oracle,
    fences must stay independent (interleaved runs), and a tenant's
    rollback must never touch the other tenant's rows."""
    from hemera_indexer_spark.oracle import expected_live_rows
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    fact = LakeTable.create(
        spark,
        str(tmp_path / "fact"),
        SEQUENCES_SCHEMA,
        num_buckets=8,
        seq_col="seq",
    )
    logs = {}
    for tenant in (1, 2):
        spec = ChangelogSpec(
            n_docs=200,
            n_epochs=6,
            events_per_epoch=300,
            n_partitions=4,
            seed=100 + tenant,
            schema_evolution_epoch=3,
            rollback_epochs=(4,),
            doc_prefix=f"t{tenant}_doc",
        )
        logs[tenant] = generate_changelog(
            str(tmp_path / f"log{tenant}"), spec
        )

    def ctl(tenant):
        return StreamController(
            spark,
            table,
            logs[tenant].out_dir,
            4,
            fact_table=fact,
            tenant_col="chain_id",
            tenant_id=tenant,
        )

    # interleaved: t1 partial -> t2 full -> t1 rest; independent fences
    # mean t1's resume picks up exactly where it stopped even though t2
    # committed later snapshots in between
    ctl(1).run(max_epochs=3)
    ctl(2).run()
    ctl(1).run()

    state = table.current_state().cache()
    for tenant in (1, 2):
        exp = expected_live_rows(logs[tenant].out_dir, 4)
        got = sorted(
            (
                r.asDict(recursive=True)
                for r in state.where(F.col("chain_id") == tenant).collect()
            ),
            key=lambda d: d["doc_id"],
        )
        assert len(got) == len(exp), f"tenant {tenant} row count"
        for g, e in zip(got, exp):
            assert g["doc_id"] == e["doc_id"]
            assert g["tokens"] == e["tokens"], f"tenant {tenant} {g['doc_id']}"
        assert all(g["chain_id"] == tenant for g in got)
    state.unpersist()

    # fact table: every tenant's rows carry its stamp; both tenants present
    fact_counts = {
        r["chain_id"]: r["n"]
        for r in fact.read()
        .groupBy("chain_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(fact_counts) == {1, 2} and all(
        v > 0 for v in fact_counts.values()
    )
    # re-run both: fully fenced, nothing reapplied
    s1 = ctl(1).run()
    s2 = ctl(2).run()
    assert all(e.skipped for e in s1.epochs) or not s1.epochs
    assert all(e.skipped for e in s2.epochs) or not s2.epochs


# ------------------------------------------------------ repair command
def _oracle_match(table, log_dir, n_partitions):
    from hemera_indexer_spark.oracle import expected_live_rows

    exp = expected_live_rows(log_dir, n_partitions)
    got = sorted(
        (r.asDict(recursive=True) for r in table.current_state().collect()),
        key=lambda d: d["doc_id"],
    )
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g["doc_id"] == e["doc_id"] and g["tokens"] == e["tokens"]


def test_repair_range_restores_corrupted_history(spark, tiny_log, tmp_path):
    """Corrupt a mid-history range (bogus payload swap + a vanished key),
    run --repair, state equals the oracle again; the cursor, chain tails
    and fences all return to the head."""
    from hemera_indexer_spark.streaming.controller import RepairLockHeld

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    ctl = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions
    )
    ctl.run()
    head = table.committed_epoch()
    _oracle_match(table, tiny_log.out_dir, tiny_log.spec.n_partitions)

    # --- corrupt two keys whose winners sit mid-history (epochs 2..3) ---
    lo, hi = 2, 3
    files = [f for e in (lo, hi) for f in ctl._epoch_files(e)]
    metas = [ctl._epoch_meta(ctl._epoch_files(e)) for e in (lo, hi)]
    seq_lo = min(r["mn"] for m in metas for r in m["lineage"])
    seq_hi = max(r["mx"] for m in metas for r in m["lineage"])
    victims = [
        r["doc_id"]
        for r in table.current_state()
        .where(F.col("seq").between(seq_lo, seq_hi))
        .orderBy("doc_id")
        .limit(2)
        .collect()
    ]
    assert len(victims) == 2, "fixture must have winners inside the range"
    # victim 0: payload swapped in place (hand-edit / writer-bug shape)
    v0 = table.lookup(victims[0]).collect()[0]
    bogus = spark.createDataFrame(
        [(victims[0], [999_999], 1, "corrupt", int(v0["seq"]))],
        "doc_id string, tokens array<int>, n_tok int, source string, seq long",
    ).withColumn("op", F.lit("update"))
    table.delete_keys_where(F.col("doc_id") == victims[0], seq_at_least=0)
    table.merge_upsert(bogus)
    # victim 1: vanished row (partial manual delete shape)
    table.delete_keys_where(F.col("doc_id") == victims[1], seq_at_least=0)
    assert table.lookup(victims[0]).collect()[0]["tokens"] == [999_999]
    assert table.lookup(victims[1]).count() == 0

    # --- a held lock blocks a second runner ---
    import json as _json
    import time as _time

    table.refresh()
    table.update_properties(
        {"repair_lock": _json.dumps({"runner": "other", "ts": _time.time()})}
    )
    with pytest.raises(RepairLockHeld):
        StreamController(
            spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions
        ).repair_range(lo, hi)
    # ... but a stale lock (crashed runner) is taken over
    ctl2 = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions
    )
    ctl2.repair_range(lo, hi, lock_ttl_s=0.0)

    table.refresh()
    _oracle_match(table, tiny_log.out_dir, tiny_log.spec.n_partitions)
    assert table.committed_epoch() == head
    assert "repair_lock" not in table.snapshot["properties"]
    # fenced after repair: a fresh run is a no-op
    s = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions
    ).run()
    assert not s.epochs or all(e.skipped for e in s.epochs)


def test_repair_range_validations(spark, tiny_log, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    ctl = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions
    )
    with pytest.raises(ValueError, match="committed history"):
        ctl.repair_range(0)  # nothing committed yet
    ctl.run(max_epochs=2)
    with pytest.raises(ValueError, match="committed history"):
        ctl.repair_range(5)  # beyond the fence
    with pytest.raises(ValueError, match="empty repair range"):
        ctl.repair_range(1, 0)


# ------------------------------------------------- cached hot dimension
def test_cached_dimension_ttl_and_broadcast(spark):
    from hemera_indexer_spark.plans.dimension import CachedDimension

    calls = {"n": 0}

    def loader(s):
        calls["n"] += 1
        return s.createDataFrame(
            [("tok_a", 18, "Alpha"), ("tok_b", 6, "Beta")],
            "token_addr string, decimals int, symbol string",
        )

    dim = CachedDimension(loader, ttl_s=3600.0)
    facts = spark.createDataFrame(
        [(1, "tok_a"), (2, "tok_b"), (3, "tok_x")],
        "transfer_id int, token_addr string",
    )
    out = dim.enrich(facts, on="token_addr", prefix="tok_")
    rows = {r["transfer_id"]: r for r in out.collect()}
    assert rows[1]["tok_symbol"] == "Alpha"
    assert rows[3]["tok_symbol"] is None  # left join keeps unknown tokens
    # the join must be broadcast (no shuffle of the fact side)
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
    # TTL window: repeated enriches reuse the persisted snapshot
    dim.enrich(facts, on="token_addr").collect()
    dim.enrich(facts, on="token_addr").collect()
    assert dim.load_count == 1 and calls["n"] == 1
    # invalidate (new token discovered) forces a reload
    dim.invalidate()
    dim.get(spark)
    assert dim.load_count == 2
    # ttl expiry path
    dim2 = CachedDimension(loader, ttl_s=0.0)
    dim2.get(spark)
    dim2.get(spark)
    assert dim2.load_count == 2
    dim.release()
    dim2.release()


# ------------------------------------------------- tenant-mode repair
def test_repair_range_tenant_scoped(spark, tmp_path):
    """Repair in multi-tenant mode: rewinds ONLY the repairing tenant's
    namespaced fence/manifest and deletes only its rows — the other
    tenant's state and cursor are untouched."""
    from hemera_indexer_spark.oracle import expected_live_rows
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    logs = {}
    for tenant in (1, 2):
        spec = ChangelogSpec(
            n_docs=120,
            n_epochs=4,
            events_per_epoch=200,
            n_partitions=4,
            seed=300 + tenant,
            schema_evolution_epoch=2,
            rollback_epochs=(),
            doc_prefix=f"t{tenant}_doc",
        )
        logs[tenant] = generate_changelog(str(tmp_path / f"log{tenant}"), spec)

    def ctl(tenant):
        return StreamController(
            spark,
            table,
            logs[tenant].out_dir,
            4,
            tenant_col="chain_id",
            tenant_id=tenant,
        )

    ctl(1).run()
    ctl(2).run()
    t2_before = sorted(
        tuple(r)
        for r in table.current_state()
        .where(F.col("chain_id") == 2)
        .select("doc_id", "seq")
        .collect()
    )
    # corrupt tenant 1: vanish one of its rows whose winner is mid-history
    victim = (
        table.current_state()
        .where(F.col("chain_id") == 1)
        .select("doc_id")
        .first()[0]
    )
    table.delete_keys_where(F.col("doc_id") == victim, seq_at_least=0)
    ctl(1).repair_range(0)
    table.refresh()
    # tenant 1 matches its oracle again
    exp = expected_live_rows(logs[1].out_dir, 4)
    got = sorted(
        (
            r.asDict(recursive=True)
            for r in table.current_state()
            .where(F.col("chain_id") == 1)
            .collect()
        ),
        key=lambda d: d["doc_id"],
    )
    assert len(got) == len(exp)
    assert all(g["tokens"] == e["tokens"] for g, e in zip(got, exp))
    # tenant 2 rows and cursor untouched by tenant 1's repair
    t2_after = sorted(
        tuple(r)
        for r in table.current_state()
        .where(F.col("chain_id") == 2)
        .select("doc_id", "seq")
        .collect()
    )
    assert t2_after == t2_before
    assert ctl(2)._state_committed_epoch() == 3
    s2 = ctl(2).run()
    assert not s2.epochs or all(e.skipped for e in s2.epochs)


# --------------------------------------- fact-table schema evolution
def test_fact_table_carries_evolved_columns(spark, tiny_log, tmp_path):
    """A column evolving mid-stream must reach the HISTORY table too:
    post-evolution fact rows carry the value, pre-evolution rows read
    NULL (previously insert_if_absent silently dropped the column)."""
    from hemera_indexer_spark.schemas import FACTS_SCHEMA

    state = LakeTable.create(
        spark, str(tmp_path / "state"), SEQUENCES_SCHEMA, num_buckets=8
    )
    facts = LakeTable.create(
        spark, str(tmp_path / "facts"), FACTS_SCHEMA, num_buckets=8,
        properties={"table_type": "fact"},
    )
    StreamController(
        spark, state, tiny_log.out_dir, tiny_log.spec.n_partitions,
        fact_table=facts,
    ).run()
    assert "lang" in facts.schema.fieldNames()
    # seqs are assigned sequentially from 1: epochs before the evolution
    # epoch cover seq <= evo * events_per_epoch
    boundary = tiny_log.spec.schema_evolution_epoch * tiny_log.spec.events_per_epoch
    rows = facts.read().select("seq", "lang", "op").collect()
    post = [r for r in rows if r["seq"] > boundary and r["op"] != "delete"]
    pre = [r for r in rows if r["seq"] <= boundary]
    assert post and any(r["lang"] is not None for r in post)
    assert all(r["lang"] is None for r in pre)


# ------------------------------------------------ run_ingest.py CLI e2e
def test_run_ingest_cli_and_repair(spark, tmp_path):
    """The operator surface end-to-end in subprocesses: ingest a log via
    scripts/run_ingest.py (auto-resume JSON report), corrupt a row, repair
    via --repair 0, verify the final state against the oracle."""
    import json as _json
    import os
    import subprocess
    import sys

    from hemera_indexer_spark.oracle import expected_live_rows
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = ChangelogSpec(
        n_docs=120,
        n_epochs=4,
        events_per_epoch=200,
        n_partitions=4,
        seed=11,
        schema_evolution_epoch=2,
        rollback_epochs=(3,),
    )
    log_dir = str(tmp_path / "log")
    root = str(tmp_path / "lake")
    generate_changelog(log_dir, spec)

    def cli(*extra):
        res = subprocess.run(
            [
                sys.executable, os.path.join(repo, "scripts", "run_ingest.py"),
                "--log-dir", log_dir, "--table-root", root,
                "--partitions", "4", "--num-buckets", "8", "--cores", "2",
                *extra,
            ],
            capture_output=True, text=True, cwd=repo, timeout=300,
        )
        lines = [l for l in res.stdout.splitlines() if l.startswith("{")]
        assert lines, res.stdout[-1500:] + "\n" + res.stderr[-3000:]
        return _json.loads(lines[-1])

    out = cli()
    assert out["committed_epoch"] == spec.n_epochs - 1
    assert out["events"] > 0 and out["lineage"]

    # corrupt a row in-process, then repair from the CLI
    table = LakeTable.load(spark, root)
    victim = table.current_state().select("doc_id").first()[0]
    table.delete_keys_where(F.col("doc_id") == victim, seq_at_least=0)

    out2 = cli("--repair", "0")
    assert out2["committed_epoch"] == spec.n_epochs - 1

    exp = expected_live_rows(log_dir, 4)
    table = LakeTable.load(spark, root)
    got = sorted(
        (r.asDict(recursive=True) for r in table.current_state().collect()),
        key=lambda d: d["doc_id"],
    )
    assert len(got) == len(exp)
    assert all(g["tokens"] == e["tokens"] for g, e in zip(got, exp))


# ------------------------------------- repair over a hash-chained log
def test_repair_range_trims_chain_tails(spark, tmp_path):
    """Repairing a consensus-checked (hash-chained) log must rewind the
    stored chain tips/tails below the repair point: the first re-driven
    batch checks its parent hashes against the trimmed tail and must NOT
    flag divergence (no synthetic rollbacks during repair replay)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    log = str(tmp_path / "log")

    def write_epoch(epoch, rows):
        # rows: (seq, doc_id, tokens, chain_hash, parent_hash)
        n = len(rows)
        cols = {
            "seq": pa.array([r[0] for r in rows], pa.int64()),
            "epoch": pa.array([epoch] * n, pa.int64()),
            "partition": pa.array([0] * n, pa.int32()),
            "doc_id": pa.array([r[1] for r in rows]),
            "op": pa.array(["insert"] * n),
            "tokens": pa.array([r[2] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[2]) for r in rows], pa.int32()),
            "source": pa.array(["web"] * n),
            "rollback_to_seq": pa.array([None] * n, pa.int64()),
            "chain_hash": pa.array([r[3] for r in rows]),
            "parent_hash": pa.array([r[4] for r in rows]),
        }
        d = os.path.join(log, f"epoch={epoch:05d}", "partition=000")
        os.makedirs(d)
        pq.write_table(pa.table(cols), os.path.join(d, "events.parquet"))

    # 9 chained events over 3 epochs, distinct docs (log partition of
    # doc_{i} is i % 1 = 0 for n_partitions=1)
    hashes = [f"h{i}" for i in range(10)]  # h0 unused genesis
    rows = [
        (i, f"doc_{i:08d}", [i], hashes[i], hashes[i - 1] if i > 1 else None)
        for i in range(1, 10)
    ]
    for e in range(3):
        write_epoch(e, rows[e * 3:(e + 1) * 3])

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    ctl = StreamController(spark, table, log, 1, max_batch_epochs=1)
    ctl.run()
    man = table.snapshot["manifest"]
    assert man.get("last_hashes", {}).get("0") == "h9"

    # corrupt a doc whose winner lies in epoch 1 (seq 4..6)
    table.delete_keys_where(F.col("doc_id") == "doc_00000005", seq_at_least=0)
    stats = StreamController(spark, table, log, 1, max_batch_epochs=1).repair_range(1)

    # no synthetic rollbacks were flagged during the repair replay
    assert all(e.rollbacks == 0 for e in stats.epochs)
    table.refresh()
    docs = {r["doc_id"]: r for r in table.current_state().collect()}
    assert len(docs) == 9 and docs["doc_00000005"]["tokens"] == [5]
    man = table.snapshot["manifest"]
    assert man["last_hashes"]["0"] == "h9"
    assert man["epoch_id"] == 2


# ---------------------------------------------- repair fuzz (3 seeds)
@pytest.mark.parametrize("seed", [5, 17, 23])
def test_repair_range_fuzz(spark, tmp_path, seed):
    """Randomized corruption sweep: for varied logs (rollbacks + schema
    evolution included), vanish/garble several random mid-history rows,
    repair from epoch 1, state equals the oracle."""
    import random

    from hemera_indexer_spark.oracle import expected_live_rows
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    rng = random.Random(seed)
    spec = ChangelogSpec(
        n_docs=100,
        n_epochs=5,
        events_per_epoch=150,
        n_partitions=4,
        seed=seed,
        schema_evolution_epoch=rng.choice([2, 3]),
        rollback_epochs=(rng.choice([3, 4]),),
    )
    log = str(tmp_path / "log")
    gen = generate_changelog(log, spec)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    StreamController(spark, table, log, 4).run()

    live = [r["doc_id"] for r in table.current_state().select("doc_id").collect()]
    victims = rng.sample(live, min(4, len(live)))
    # mix of corruption shapes: vanish two, garble two in place
    for v in victims[:2]:
        table.delete_keys_where(F.col("doc_id") == v, seq_at_least=0)
    for v in victims[2:]:
        cur = table.lookup(v).collect()[0]
        table.delete_keys_where(F.col("doc_id") == v, seq_at_least=0)
        bogus = spark.createDataFrame(
            [(v, [123456], 1, "corrupt", int(cur["seq"]))],
            "doc_id string, tokens array<int>, n_tok int, source string, seq long",
        ).withColumn("op", F.lit("update"))
        table.merge_upsert(bogus)

    StreamController(spark, table, log, 4).repair_range(0)
    table.refresh()
    exp = expected_live_rows(log, 4)
    got = sorted(
        (r.asDict(recursive=True) for r in table.current_state().collect()),
        key=lambda d: d["doc_id"],
    )
    assert len(got) == len(exp), seed
    for g, e in zip(got, exp):
        assert g["doc_id"] == e["doc_id"] and g["tokens"] == e["tokens"], (
            seed, g["doc_id"],
        )


# ----------------------------- review fixes: repair span + lock + CAS
def _write_plain_epoch(log, epoch, rows):
    """rows: (seq, doc_id, tokens)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(rows)
    cols = {
        "seq": pa.array([r[0] for r in rows], pa.int64()),
        "epoch": pa.array([epoch] * n, pa.int64()),
        "partition": pa.array([0] * n, pa.int32()),
        "doc_id": pa.array([r[1] for r in rows]),
        "op": pa.array(["insert"] * n),
        "tokens": pa.array([r[2] for r in rows], pa.list_(pa.int32())),
        "n_tok": pa.array([len(r[2]) for r in rows], pa.int32()),
        "source": pa.array(["web"] * n),
        "rollback_to_seq": pa.array([None] * n, pa.int64()),
    }
    d = os.path.join(log, f"epoch={epoch:05d}", "partition=000")
    os.makedirs(d)
    pq.write_table(pa.table(cols), os.path.join(d, "events.parquet"))


def test_repair_span_survives_redelivered_duplicates(spark, tmp_path):
    """A re-delivered duplicate in the repair range's first epoch carries
    its ORIGINAL low seq; the delete span must not be dragged into
    pre-range history (a key last written before the range, never
    re-delivered, would be deleted and never restored)."""
    log = str(tmp_path / "log")
    docs = {i: f"doc_{i:08d}" for i in range(1, 6)}
    _write_plain_epoch(log, 0, [(1, docs[1], [1]), (2, docs[2], [2]),
                                (3, docs[3], [3])])
    # epoch 1 re-delivers seq 2 (a duplicate) alongside its own seq 4
    _write_plain_epoch(log, 1, [(2, docs[2], [2]), (4, docs[4], [4])])
    _write_plain_epoch(log, 2, [(5, docs[5], [5])])

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    StreamController(spark, table, log, 1, max_batch_epochs=1).run()
    assert table.current_state().count() == 5

    StreamController(spark, table, log, 1, max_batch_epochs=1).repair_range(1)
    table.refresh()
    got = {r["doc_id"]: r["tokens"] for r in table.current_state().collect()}
    # doc_3 (winner seq 3, epoch 0, never re-delivered) must survive:
    # the naive min-of-epoch-1-footers span (seq_lo=2) would delete it
    assert got == {docs[i]: [i] for i in range(1, 6)}


def test_repair_lock_release_respects_takeover(spark, tiny_log, tmp_path):
    """If another runner takes the lock over mid-repair (our run exceeded
    the TTL), our release must NOT delete their live lock."""
    import json as _json
    import time as _time

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    ctl = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions
    )
    ctl.run()

    orig_run = ctl.run

    def hijacked_run(*a, **kw):
        # simulate a takeover happening while our replay runs
        ctl.table.refresh()
        ctl.table.update_properties(
            {"repair_lock": _json.dumps({"runner": "other", "ts": _time.time()})}
        )
        return orig_run(*a, **kw)

    ctl.run = hijacked_run
    ctl.repair_range(0)
    table.refresh()
    held = table.snapshot["properties"].get("repair_lock")
    assert held is not None and _json.loads(held)["runner"] == "other"
    table.update_properties({"repair_lock": None})  # cleanup


def test_tenant_commit_retries_concurrent_cas(spark, tmp_path):
    """Two tenant controllers sharing one table: a commit from a STALE
    handle (the other tenant committed after this handle's snapshot load)
    must retry the snapshot CAS and converge, not crash."""
    from hemera_indexer_spark.oracle import expected_live_rows
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    root = str(tmp_path / "lake")
    t_fresh = LakeTable.create(spark, root, SEQUENCES_SCHEMA, num_buckets=4)
    logs = {}
    for tenant in (1, 2):
        spec = ChangelogSpec(
            n_docs=60, n_epochs=3, events_per_epoch=100, n_partitions=2,
            seed=400 + tenant, schema_evolution_epoch=None,
            rollback_epochs=(), doc_prefix=f"t{tenant}_doc",
        )
        logs[tenant] = generate_changelog(str(tmp_path / f"log{tenant}"), spec)

    t_stale = LakeTable.load(spark, root)  # snapshot cached NOW
    ctl2 = StreamController(
        spark, t_stale, logs[2].out_dir, 2,
        tenant_col="chain_id", tenant_id=2,
    )
    # tenant 1 commits via the fresh handle -> ctl2's handle is now stale
    StreamController(
        spark, t_fresh, logs[1].out_dir, 2,
        tenant_col="chain_id", tenant_id=1,
    ).run()
    stats = ctl2.run()  # first commit CAS-fails, must retry and converge
    assert any(e.retries > 0 for e in stats.epochs)
    t = LakeTable.load(spark, root)
    for tenant in (1, 2):
        exp = expected_live_rows(logs[tenant].out_dir, 2)
        got = sorted(
            (r.asDict(recursive=True)
             for r in t.current_state()
             .where(F.col("chain_id") == tenant).collect()),
            key=lambda d: d["doc_id"],
        )
        assert len(got) == len(exp)
        assert all(g["tokens"] == e["tokens"] for g, e in zip(got, exp))


def test_span_seq_bound_stats_fallback(spark, tmp_path):
    """Footerless parquet (writer without column stats) must fall back to
    a Spark aggregate, not crash or silently shrink the repair span."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    log = str(tmp_path / "log")
    d = os.path.join(log, "epoch=00000", "partition=000")
    os.makedirs(d)
    cols = {
        "seq": pa.array([7, 8, 9], pa.int64()),
        "epoch": pa.array([0] * 3, pa.int64()),
        "partition": pa.array([0] * 3, pa.int32()),
        "doc_id": pa.array(["doc_1", "doc_2", "doc_3"]),
        "op": pa.array(["insert"] * 3),
        "tokens": pa.array([[1], [2], [3]], pa.list_(pa.int32())),
        "n_tok": pa.array([1, 1, 1], pa.int32()),
        "source": pa.array(["web"] * 3),
        "rollback_to_seq": pa.array([None] * 3, pa.int64()),
    }
    pq.write_table(
        pa.table(cols), os.path.join(d, "events.parquet"),
        write_statistics=False,
    )
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    ctl = StreamController(spark, table, log, 1)
    assert ctl._span_seq_bound([0], "min") == 7
    assert ctl._span_seq_bound([0], "max") == 9
    with pytest.raises(ValueError, match="no events"):
        ctl._span_seq_bound([], "max")


def test_span_seq_bound_mixed_stats_files_not_masked(spark, tmp_path):
    """FILE-granular stats: a partition holding one stats-bearing file
    (seqs 10..20) and one stats-less file (seqs 21..30) must yield
    max=30 — merging stats at partition granularity would let the
    stats-bearing file mask the other, shrinking a repair delete span
    onto pre-range winners (permanent data loss)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    log = str(tmp_path / "log")
    d = os.path.join(log, "epoch=00000", "partition=000")
    os.makedirs(d)

    def cols(seqs):
        n = len(seqs)
        return {
            "seq": pa.array(seqs, pa.int64()),
            "epoch": pa.array([0] * n, pa.int64()),
            "partition": pa.array([0] * n, pa.int32()),
            "doc_id": pa.array([f"doc_{s}" for s in seqs]),
            "op": pa.array(["insert"] * n),
            "tokens": pa.array([[1]] * n, pa.list_(pa.int32())),
            "n_tok": pa.array([1] * n, pa.int32()),
            "source": pa.array(["web"] * n),
            "rollback_to_seq": pa.array([None] * n, pa.int64()),
        }

    pq.write_table(pa.table(cols([10, 20])), os.path.join(d, "a.parquet"))
    pq.write_table(
        pa.table(cols([21, 30])), os.path.join(d, "b.parquet"),
        write_statistics=False,
    )
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    ctl = StreamController(spark, table, log, 1)
    assert ctl._span_seq_bound([0], "max") == 30
    assert ctl._span_seq_bound([0], "min") == 10


def test_span_seq_bound_backward_walk_early_stop(spark, tmp_path):
    """kind='max' walks epochs backward with early stop (originals are
    seq-monotone across epochs): on a long log only the tail epochs are
    read, and the result equals the exact full scan even when the newest
    epochs carry only re-delivered low-seq duplicates."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    log = str(tmp_path / "log")

    def write(epoch, seqs):
        d = os.path.join(log, f"epoch={epoch:05d}", "partition=000")
        os.makedirs(d)
        n = len(seqs)
        pq.write_table(
            pa.table({
                "seq": pa.array(seqs, pa.int64()),
                "epoch": pa.array([epoch] * n, pa.int64()),
                "partition": pa.array([0] * n, pa.int32()),
                "doc_id": pa.array([f"doc_{s}" for s in seqs]),
                "op": pa.array(["insert"] * n),
                "tokens": pa.array([[1]] * n, pa.list_(pa.int32())),
                "n_tok": pa.array([1] * n, pa.int32()),
                "source": pa.array(["web"] * n),
                "rollback_to_seq": pa.array([None] * n, pa.int64()),
            }),
            os.path.join(d, "events.parquet"),
        )

    n_epochs = 40
    for e in range(n_epochs - 2):
        write(e, [e * 10, e * 10 + 5])  # originals: monotone across epochs
    # newest two epochs: ONLY re-delivered duplicates at original low seqs
    write(n_epochs - 2, [15])
    write(n_epochs - 1, [3])
    true_max = (n_epochs - 3) * 10 + 5

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    ctl = StreamController(spark, table, log, 1)

    calls = []
    orig = ctl._epoch_file_seq_stats
    ctl._epoch_file_seq_stats = lambda e: (calls.append(e), orig(e))[1]

    assert ctl._span_seq_bound(range(n_epochs), "max") == true_max
    # early stop: duplicate-tail epochs + the dominating epoch + the
    # tolerance streak — far fewer than the full history
    assert len(calls) <= 2 + 1 + 8 < n_epochs
    # exact full scan agrees
    calls.clear()
    assert (
        ctl._span_seq_bound(range(n_epochs), "max", walk_tolerance=None)
        == true_max
    )
    assert len(calls) == n_epochs


# ---------------------------------- IVM approx-distinct (HLL sketches)
def test_ivm_approx_distinct_tracks_exact(spark, tiny_log, tmp_path):
    """Incrementally-maintained approx distinct count per group: HLL
    sketches stored per bucket union losslessly in the view; deletes are
    handled by the bucket recompute (no sketch subtraction exists). The
    estimate must track exact countDistinct within HLL tolerance through
    replay, delete and compaction."""
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    sink = IncrementalAggSink(
        table,
        str(tmp_path / "view"),
        aggs={"n_docs_approx": ("approx_distinct", "doc_id")},
    )
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions, sinks=[sink]
    ).run()

    def check():
        exact = {
            r["source"]: r["n"]
            for r in table.current_state()
            .groupBy("source")
            .agg(F.countDistinct("doc_id").alias("n"))
            .collect()
        }
        got = {
            r["source"]: r["n_docs_approx"] for r in sink.view().collect()
        }
        assert set(got) == set(exact)
        for src, n in exact.items():
            assert abs(got[src] - n) <= max(2, int(0.05 * n)), (src, got[src], n)

    check()
    # delete a key -> touched-bucket recompute must re-derive the sketch
    victim = table.current_state().select("doc_id").first()[0]
    table.delete_keys_where(F.col("doc_id") == victim, seq_at_least=0)
    sink.refresh(table.committed_epoch())
    check()
    if table.compact():
        sink.refresh(table.committed_epoch())
        check()


def test_ivm_rejects_non_decomposable_agg(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    with pytest.raises(ValueError, match="not bucket-decomposable"):
        IncrementalAggSink(
            table, str(tmp_path / "v"), aggs={"bad": ("median", "n_tok")}
        )


def test_run_ingest_cli_tenant_mode(spark, tmp_path):
    """The CLI surface of tenant mode: two `run_ingest.py --tenant-col
    chain_id --tenant-id N` subprocess runs (separate Spark sessions,
    exactly how per-chain runners deploy) share one table root; each
    tenant's state must match its own log's oracle."""
    import os
    import subprocess
    import sys as _sys

    from hemera_indexer_spark.oracle import expected_live_rows
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    logs = {}
    for tenant in (1, 2):
        spec = ChangelogSpec(
            n_docs=120, n_epochs=3, events_per_epoch=200, n_partitions=2,
            seed=200 + tenant, schema_evolution_epoch=None,
            rollback_epochs=(), doc_prefix=f"t{tenant}_doc",
        )
        logs[tenant] = generate_changelog(str(tmp_path / f"log{tenant}"), spec)

    for tenant in (1, 2):
        r = subprocess.run(
            [
                _sys.executable, os.path.join(repo, "scripts", "run_ingest.py"),
                "--log-dir", logs[tenant].out_dir,
                "--table-root", str(tmp_path / "lake"),
                "--partitions", "2", "--num-buckets", "4", "--cores", "2",
                "--tenant-col", "chain_id", "--tenant-id", str(tenant),
            ],
            capture_output=True, text=True, cwd=repo, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]

    t = LakeTable.load(spark, str(tmp_path / "lake"))
    state = t.current_state()
    for tenant in (1, 2):
        exp = expected_live_rows(logs[tenant].out_dir, 2)
        got = sorted(
            (r.asDict(recursive=True)
             for r in state.where(F.col("chain_id") == tenant).collect()),
            key=lambda d: d["doc_id"],
        )
        assert len(got) == len(exp), f"tenant {tenant} rows"
        assert all(g["tokens"] == e["tokens"] for g, e in zip(got, exp))


def test_table_health_metadata_report(spark, tmp_path):
    """table_health() is a pure-metadata report: delta depth matches
    delta_counts(), compaction candidates appear once the threshold is
    crossed and clear after compact(), skew/bytes/retention are sane."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("v", T.LongType()),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, num_buckets=4)
    for e in range(3):
        df = spark.createDataFrame(
            [(f"d{i}", e * 10 + i, i + e) for i in range(8)],
            "doc_id string, seq long, v long",
        ).withColumn("op", F.lit("update"))
        assert t.merge_upsert(df, epoch_id=e)
    h = t.table_health(compact_threshold=3)
    assert h["version"] == 3 and h["committed_epoch"] == 2
    assert h["delta_files"] == sum(t.delta_counts().values())
    assert h["max_delta_depth"] == max(t.delta_counts().values())
    assert h["rows_total"] == 24  # physical rows: 3 epochs x 8, pre-compaction
    assert h["bytes_total"] > 0 and h["snapshots_retained"] == 4
    assert h["compact_candidates"], "3 deltas per bucket >= threshold 3"
    assert h["row_skew"] >= 1.0
    t.compact()
    h2 = t.table_health(compact_threshold=3)
    assert h2["compact_candidates"] == [] and h2["max_delta_depth"] == 0
    assert h2["rows_total"] == 8  # folded to live rows only
    # staged-WAP pressure surfaces (and clears on discard)
    assert h2["staged_commits"] == []
    df = spark.createDataFrame(
        [("d0", 900, 1)], "doc_id string, seq long, v long"
    ).withColumn("op", F.lit("update"))
    assert t.merge_upsert(df, epoch_id=9, wap_id="stale-1")
    assert t.table_health()["staged_commits"] == ["stale-1"]
    t.discard_staged("stale-1")
    assert t.table_health()["staged_commits"] == []


def test_maybe_rebucket_policy(spark, tmp_path):
    """Grows to the next power of two that restores the target, bounded by
    max_factor per call; no-op when under target; state survives the
    rewrite unchanged."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("v", T.LongType()),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, num_buckets=2)
    df = spark.createDataFrame(
        [(f"d{i}", i, i) for i in range(64)], "doc_id string, seq long, v long"
    ).withColumn("op", F.lit("update"))
    assert t.merge_upsert(df, epoch_id=0)
    before = sorted(map(tuple, t.current_state().collect()))

    assert t.maybe_rebucket(target_rows_per_bucket=1000) is False  # under target
    # 64 rows / 2 buckets, target 4/bucket -> wants 16, capped at 2*4=8
    assert t.maybe_rebucket(target_rows_per_bucket=4, max_factor=4)
    assert t.num_buckets == 8
    # second call converges to the uncapped power-of-two target (16)
    assert t.maybe_rebucket(target_rows_per_bucket=4, max_factor=4)
    assert t.num_buckets == 16
    assert t.maybe_rebucket(target_rows_per_bucket=4, max_factor=4) is False
    assert sorted(map(tuple, t.current_state().collect())) == before


def test_controller_rebucket_policy_end_to_end(spark, tiny_log, tmp_path):
    """rebucket_target_rows= grows the layout during the run without
    disturbing correctness: final state still matches the oracle and the
    bucket count grew past its deliberately-tiny start."""
    from hemera_indexer_spark.oracle import expected_live_rows

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=2
    )
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        rebucket_target_rows=64,
    ).run()
    assert table.num_buckets > 2
    exp = expected_live_rows(tiny_log.out_dir, tiny_log.spec.n_partitions)
    got = sorted(
        (r.asDict(recursive=True) for r in table.current_state().collect()),
        key=lambda d: d["doc_id"],
    )
    assert len(got) == len(exp)
    assert all(g["tokens"] == e["tokens"] for g, e in zip(got, exp))
