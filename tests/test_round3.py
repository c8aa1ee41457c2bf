"""Round-3 engine tests: topic0-dispatch decode, recursive trace flatten,
keyset pagination, multi-exporter fan-out."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.schemas import FACTS_SCHEMA, SEQUENCES_SCHEMA
from hemera_indexer_spark.streaming import StreamController


# ------------------------------------------------------ dispatch decode
def test_decode_dispatch_roundtrip(spark):
    from hemera_indexer_spark.operators.decode import (
        decode_dispatch,
        encode_batch_records,
        encode_transfer_records,
    )

    t = spark.createDataFrame(
        [(1, "0x" + "ab" * 20, 123456789), (2, "0x" + "0f" * 20, 0)],
        "seq long, addr string, amount long",
    )
    b = spark.createDataFrame(
        [(3, [7, 8, 9]), (4, [100]), (5, [])],
        "seq long, vals array<long>",
    )
    raw = (
        encode_transfer_records(t, "seq", "addr", "amount")
        .select("record")
        .unionByName(encode_batch_records(b, "seq", "vals").select("record"))
    )
    typed = decode_dispatch(raw, "record")
    tr = {r["seq"]: r for r in typed["transfer"].collect()}
    assert set(tr) == {1, 2}
    assert tr[1]["address"] == "0x" + "ab" * 20
    assert tr[1]["amount"] == "123456789"
    assert tr[2]["amount"] == "0"
    ba = {r["seq"]: r for r in typed["batch"].collect()}
    assert set(ba) == {3, 4, 5}
    assert (ba[3]["n_items"], ba[3]["total"]) == (3, "24")
    assert (ba[4]["n_items"], ba[4]["total"]) == (1, "100")
    assert (ba[5]["n_items"], ba[5]["total"]) == (0, "0")


def test_decode_transfer_uint128_amount(spark):
    """Amounts wider than int64 (the uint256/NUMERIC(100) analog) decode to
    exact decimal strings."""
    from hemera_indexer_spark.operators.decode import (
        decode_transfer,
        encode_transfer_records,
    )

    big = (1 << 90) + 12345
    # encode via hex string since F.hex(long) cannot carry 90 bits
    df = spark.createDataFrame([(9, "0x" + "11" * 20)], "seq long, addr string")
    rec = F.concat(
        F.unhex(F.lit("01")),
        F.unhex(F.lpad(F.hex(F.col("seq")), 16, "0")),
        F.unhex(F.lpad(F.regexp_replace(F.col("addr"), "^0x", ""), 40, "0")),
        F.unhex(F.lit(format(big, "032x"))),
    )
    out = decode_transfer(df.withColumn("record", rec)).collect()[0]
    assert out["amount"] == str(big)
    assert encode_transfer_records is not None


# ------------------------------------------------------ trace flatten
def test_flatten_deep_tree(spark):
    """A depth-60 chain plus fan-out flattens completely — no recursion
    limit, paths/depths exact."""
    from hemera_indexer_spark.operators.traces import flatten_call_tree

    node = {"op": "leaf", "value": 60, "calls": []}
    for d in range(59, -1, -1):
        node = {"op": f"n{d}", "value": d, "calls": [node]}
    wide = {
        "op": "root",
        "value": -1,
        "calls": [node, {"op": "w", "value": 7, "calls": []}],
    }
    df = spark.createDataFrame([(1, json.dumps(wide))], "id long, trace string")
    rows = flatten_call_tree(df, "trace", "id").collect()
    assert len(rows) == 63  # root + 61-node chain + 1 wide leaf
    by_path = {r["trace_address"]: r for r in rows}
    assert by_path[""]["depth"] == 0 and by_path[""]["op"] == "root"
    assert by_path["1"]["op"] == "w" and by_path["1"]["depth"] == 1
    deep = "/".join(["0"] * 61)
    assert by_path[deep]["op"] == "leaf" and by_path[deep]["depth"] == 61
    assert by_path["/".join(["0"] * 31)]["value"] == 30


def test_flatten_preorder_sibling_paths(spark):
    from hemera_indexer_spark.operators.traces import flatten_call_tree

    tree = {
        "op": "r",
        "value": 0,
        "calls": [
            {"op": "a", "value": 1, "calls": [{"op": "aa", "value": 2, "calls": []}]},
            {"op": "b", "value": 3, "calls": []},
        ],
    }
    df = spark.createDataFrame([(5, json.dumps(tree))], "id long, trace string")
    got = {
        r["trace_address"]: (r["op"], r["depth"])
        for r in flatten_call_tree(df).collect()
    }
    assert got == {"": ("r", 0), "0": ("a", 1), "0/0": ("aa", 2), "1": ("b", 1)}


# ------------------------------------------------------ keyset pagination
def test_keyset_pages_equal_offset_pages(spark):
    from hemera_indexer_spark.plans.pagination import keyset_page

    df = spark.createDataFrame(
        [(i, float(i % 7), f"u{i}") for i in range(100)],
        "id long, score double, name string",
    )
    cols = [("score", True), ("id", False)]
    # oracle: full sort, sliced
    full = df.orderBy(F.col("score").desc(), F.col("id")).collect()
    last = None
    seen = []
    for _page in range(4):
        rows = keyset_page(df, cols, last, 25).collect()
        seen.extend(rows)
        last = (rows[-1]["score"], rows[-1]["id"])
    assert [(r["id"]) for r in seen] == [(r["id"]) for r in full]


# ------------------------------------------------------ exporter fan-out
def test_three_sink_fanout_consistent(spark, tiny_log, tmp_path):
    """One scanned batch drives state + fact + range-file sinks
    simultaneously; all three agree with the replay oracle."""
    from hemera_indexer_spark.oracle import expected_live_rows
    from hemera_indexer_spark.streaming.sinks import RangeFileSink

    log_dir, spec = tiny_log.out_dir, tiny_log.spec
    state = LakeTable.create(
        spark, str(tmp_path / "state"), SEQUENCES_SCHEMA, num_buckets=8
    )
    fact = LakeTable.create(
        spark,
        str(tmp_path / "fact"),
        FACTS_SCHEMA,
        num_buckets=8,
        properties={"table_type": "fact"},
    )
    export_dir = str(tmp_path / "export")
    ctl = StreamController(
        spark,
        state,
        log_dir,
        spec.n_partitions,
        fact_table=fact,
        sinks=[RangeFileSink(export_dir, fmt="json", seqs_per_file=500)],
    )
    ctl.run()
    exp = expected_live_rows(log_dir, spec.n_partitions)
    got = sorted(
        (r.asDict(recursive=True) for r in state.current_state().collect()),
        key=lambda d: d["doc_id"],
    )
    assert len(got) == len(exp)
    assert all(g["tokens"] == e["tokens"] for g, e in zip(got, exp))
    # fact table holds every applied (non-wiped) version exactly once
    fact_rows = fact.current_state().count()
    assert fact_rows >= len(exp)
    dup = (
        fact.current_state()
        .groupBy("doc_id", "seq")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    # range files: every exported record is a real applied event, sorted
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(export_dir)
        for f in fs
        if f.endswith(".json")
    ]
    assert files, "range-file sink produced no files"
    exported = spark.read.json(files)
    assert exported.count() > 0
    assert exported.select(F.min("seq")).collect()[0][0] >= 1


def test_fanout_preserves_aqe_setting(spark, tiny_log, tmp_path):
    """The fan-out's single AQE toggle restores the session value even with
    concurrent sink writes (regression: racing per-write toggles could
    leave AQE off for the session)."""
    log_dir, spec = tiny_log.out_dir, tiny_log.spec
    before = spark.conf.get("spark.sql.adaptive.enabled")
    state = LakeTable.create(
        spark, str(tmp_path / "s2"), SEQUENCES_SCHEMA, num_buckets=8
    )
    fact = LakeTable.create(
        spark, str(tmp_path / "f2"), FACTS_SCHEMA, num_buckets=8,
        properties={"table_type": "fact"},
    )
    StreamController(
        spark, state, log_dir, spec.n_partitions, fact_table=fact
    ).run()
    assert spark.conf.get("spark.sql.adaptive.enabled") == before


# ------------------------------------------------------ entity selection
def test_parse_entity_types():
    from hemera_indexer_spark.enumeration import EntityType, parse_entity_types

    assert parse_entity_types("state") == EntityType.STATE
    assert parse_entity_types("STATE,facts") == EntityType.STATE | EntityType.FACTS
    assert parse_entity_types("all") == EntityType.ALL
    with pytest.raises(ValueError, match="unknown entity type"):
        parse_entity_types("state,bogus")
    with pytest.raises(ValueError, match="STATE is required"):
        parse_entity_types("facts")


# ------------------------------------------------------ star-contraction CC
def test_star_cc_matches_label_propagation(spark):
    from hemera_indexer_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"), ("r", "p")],
        "doc_a string, doc_b string",
    )
    lp = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    st = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components_star(pairs).collect()
    }
    assert st == lp


def test_star_cc_long_chain_converges_fast(spark):
    """A 200-node chain has diameter 199 — label propagation at default
    max_iter would give up; star contraction converges in O(log n)
    rounds."""
    from hemera_indexer_spark.operators.dedup import connected_components_star

    n = 200
    pairs = spark.createDataFrame(
        [(f"d{i:03d}", f"d{i + 1:03d}") for i in range(n - 1)],
        "doc_a string, doc_b string",
    )
    got = connected_components_star(pairs, max_iter=15).collect()
    assert len(got) == n
    assert {r["cluster_id"] for r in got} == {"d000"}


# ------------------------------------------------------ adaptive strategy
def test_auto_strategy_adapts_to_batch_shape(spark, tmp_path):
    """'auto' observes the winners/events ratio of each commit: an
    update-heavy replay keeps the map-side-combining 'sql' merge, an
    insert-heavy (all-unique-keys) replay flips the next pick to 'jvm'."""
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    # update-heavy: 40 docs x 1000 events -> ratio ~0.04
    hot = str(tmp_path / "hot")
    generate_changelog(
        hot, ChangelogSpec(n_docs=40, n_epochs=2, events_per_epoch=500,
                           n_partitions=2, rollback_epochs=()),
    )
    t1 = LakeTable.create(spark, str(tmp_path / "t1"), SEQUENCES_SCHEMA, num_buckets=8)
    c1 = StreamController(spark, t1, hot, 2, merge_strategy="auto")
    c1.run()
    assert c1._auto_pick == "sql"

    # insert-heavy: every event on a distinct doc -> ratio ~1.0
    cold = str(tmp_path / "cold")
    generate_changelog(
        cold, ChangelogSpec(n_docs=5000, n_epochs=2, events_per_epoch=300,
                            n_partitions=2, rollback_epochs=(),
                            hot_share=0.0, p_insert=1.0, p_update=0.0,
                            p_delete=0.0),
    )
    t2 = LakeTable.create(spark, str(tmp_path / "t2"), SEQUENCES_SCHEMA, num_buckets=8)
    c2 = StreamController(spark, t2, cold, 2, merge_strategy="auto")
    c2.run()
    assert c2._auto_pick == "jvm"


def test_fanout_retry_converges_without_duplicates(spark, tiny_log, tmp_path):
    """Chaos under fan-out: the state merge dies transiently AFTER the
    concurrent fact insert may have committed; the retried group must not
    duplicate fact rows (anti-join + fencing) and both sinks converge."""
    from hemera_indexer_spark.oracle import expected_live_rows

    log_dir, spec = tiny_log.out_dir, tiny_log.spec
    state = LakeTable.create(
        spark, str(tmp_path / "s3"), SEQUENCES_SCHEMA, num_buckets=8
    )
    fact = LakeTable.create(
        spark, str(tmp_path / "f3"), FACTS_SCHEMA, num_buckets=8,
        properties={"table_type": "fact"},
    )
    real = state.merge_upsert
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated transient I/O failure")
        return real(*a, **kw)

    state.merge_upsert = flaky
    ctl = StreamController(
        spark, state, log_dir, spec.n_partitions, fact_table=fact,
        max_retries=2, retry_backoff_s=0.01,
    )
    stats = ctl.run()
    assert any(s.retries > 0 for s in stats.epochs)
    exp = expected_live_rows(log_dir, spec.n_partitions)
    got = sorted(
        (r.asDict(recursive=True) for r in state.current_state().collect()),
        key=lambda d: d["doc_id"],
    )
    assert len(got) == len(exp)
    assert all(g["tokens"] == e["tokens"] for g, e in zip(got, exp))
    dup = (
        fact.current_state()
        .groupBy("doc_id", "seq")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0


# --------------------------------------------- review-found regressions
def test_sink_failure_after_state_fence_is_redriven(spark, tiny_log, tmp_path):
    """A sink that fails AFTER the state table's fenced commit landed must
    not lose its group: the controller resumes from the minimum committed
    epoch across state + sinks and re-drives the sink (idempotently)."""
    from hemera_indexer_spark.oracle import expected_fact_rows

    log_dir, spec = tiny_log.out_dir, tiny_log.spec
    state = LakeTable.create(
        spark, str(tmp_path / "s4"), SEQUENCES_SCHEMA, num_buckets=8
    )
    fact = LakeTable.create(
        spark, str(tmp_path / "f4"), FACTS_SCHEMA, num_buckets=8,
        properties={"table_type": "fact"},
    )
    real = fact.insert_if_absent
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise OSError("simulated sink I/O failure")
        return real(*a, **kw)

    fact.insert_if_absent = flaky
    ctl = StreamController(
        spark, state, log_dir, spec.n_partitions, fact_table=fact,
        max_retries=2, retry_backoff_s=0.01,
    )
    ctl.run()
    exp = expected_fact_rows(log_dir, spec.n_partitions)
    got = fact.current_state()
    assert got.count() == len(exp)
    dup = (
        got.groupBy("doc_id", "seq").count().where(F.col("count") > 1).count()
    )
    assert dup == 0
    # and a FRESH controller over the same log has nothing left to do
    stats = StreamController(
        spark, state, log_dir, spec.n_partitions, fact_table=fact
    ).run()
    assert all(s.skipped for s in stats.epochs) or not stats.epochs


def test_lookup_special_and_numeric_keys(spark, tmp_path):
    """Point lookup must bucket exactly like the write path for keys with
    quotes/backslashes (no SQL-literal splicing) — regression for a
    reproduced mis-bucketing on 'a\\nb'."""
    t = LakeTable.create(
        spark, str(tmp_path / "lk"), SEQUENCES_SCHEMA, num_buckets=16
    )
    rows = [
        ("a\\nb", [1, 2]), ("it's", [3]), ("plain", [4]), ("x\\", [5]),
    ]
    upd = spark.createDataFrame(
        [(k, toks, len(toks), "web", i + 1, "insert") for i, (k, toks) in enumerate(rows)],
        "doc_id string, tokens array<int>, n_tok int, source string, seq long, op string",
    )
    t.merge_upsert(upd, epoch_id=0)
    for k, toks in rows:
        got = t.lookup(k).collect()
        assert len(got) == 1 and got[0]["tokens"] == toks, k


def test_rollback_only_batch_keeps_consensus_sane(spark, tmp_path):
    """A batch whose only event for a partition is an explicit rollback
    must repoint the recorded chain tip at the newest SURVIVING hash, so
    the next batch's repair events are not flagged as a fork."""
    from tests.test_round2 import _write_hash_epoch

    log = str(tmp_path / "log")
    _write_hash_epoch(log, 0, [
        (1, "doc_1", [1], "h1", "h0"),
        (2, "doc_2", [2], "h2", "h1"),
        (3, "doc_3", [3], "h3", "h2"),
    ])
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    ctl = StreamController(spark, table, log, 1)
    ctl.run()
    # epoch 1: ONLY a rollback to seq 2 (chain cols present on the row)
    _write_hash_epoch(log, 1, [(4, "doc_2", [9], "h4", "h3", 2, "rollback")])
    ctl.run()
    man = table.snapshot["manifest"]
    # tip repointed at the surviving seq-1 hash, orphans evicted
    assert man["last_hashes"] == {"0": "h1"}
    assert [s for s, _ in man["hash_tails"]["0"]] == [1]
    # epoch 2: repair events chain from h1 — must NOT be treated as a fork
    _write_hash_epoch(log, 2, [
        (5, "doc_2", [5], "h5", "h1"),
        (6, "doc_3", [6], "h6", "h5"),
    ])
    stats = ctl.run()
    assert stats.epochs[0].rollbacks == 0
    got = {r["doc_id"]: r["seq"] for r in table.current_state().collect()}
    assert got == {"doc_1": 1, "doc_2": 5, "doc_3": 6}


def test_keyset_pagination_with_null_keys(spark):
    """NULL sort keys paginate exactly like the OFFSET oracle (Spark: nulls
    first under asc, last under desc)."""
    from hemera_indexer_spark.plans.pagination import keyset_page

    rows = [(i, None if i % 5 == 0 else float(i % 3)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, score double")
    for cols in ([("score", True), ("id", False)], [("score", False), ("id", False)]):
        full = df.orderBy(
            *[F.col(c).desc() if d else F.col(c).asc() for c, d in cols]
        ).collect()
        seen, last = [], None
        for _ in range(5):
            page = keyset_page(df, cols, last, 8).collect()
            seen.extend(page)
            last = tuple(page[-1][c] for c, _ in cols)
        assert [r["id"] for r in seen] == [r["id"] for r in full]


# -------------------------------------------- training-pipeline additions
def test_duplicated_spans_positions_and_short_docs(spark):
    from hemera_indexer_spark.operators.dedup import duplicated_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h tail one"),
            (2, "prefix a b c d e f g h"),
            (3, "too short"),
            (4, "x " * 3),
        ],
        "doc_id long, text string",
    )
    got = duplicated_spans(df, "doc_id", "text", window=8).collect()
    # the span "a b c d e f g h" occurs at doc1 pos0 and doc2 pos1
    assert {(r["doc_id"], r["pos"]) for r in got} == {(1, 0), (2, 1)}
    assert all(r["n_occurrences"] == 2 and r["n_docs"] == 2 for r in got)


def test_dataset_split_deterministic_and_complete(spark):
    from hemera_indexer_spark.operators.dedup import dataset_split

    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = dataset_split(df, "doc_id", weights={"train": 80, "val": 10, "test": 10})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 1000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # deterministic: same assignment on recompute
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in dataset_split(df, "doc_id", weights={"train": 80, "val": 10, "test": 10}).collect()}
    assert a == b
    with pytest.raises(ValueError):
        dataset_split(df, "doc_id", weights={"train": 50})


# ---------------------------------------- randomized fork-repair property
@pytest.mark.parametrize("seed", [7, 21, 99])
def test_randomized_fork_replay_matches_canonical(spark, tmp_path, seed):
    """Randomized multi-batch fork scenarios: a writer keeps extending a
    hash chain, occasionally orphaning the tail of an EARLIER batch (fork
    depth within the manifest tail) and re-issuing repaired versions. The
    final state must equal the fold of the canonical (never-orphaned)
    chain — exercising tail lookup, eviction and bounded rollback under
    random fork depths/positions."""
    import random

    rng = random.Random(seed)
    docs = [f"doc_{i}" for i in range(12)]
    seq = 0
    canon = []          # canonical (never-orphaned) events
    batches = []        # per-epoch delivered rows
    tip = ("h0", 0)     # (hash, seq) of canonical tip

    def mk_event(doc, parent_hash):
        nonlocal seq
        seq += 1
        h = f"h{seq}"
        ev = {"seq": seq, "doc": doc, "tokens": [seq], "hash": h,
              "parent": parent_hash}
        return ev

    for _epoch in range(6):
        rows = []
        # maybe fork: orphan up to the last 5 canonical events (possibly
        # reaching into previous batches, but always within the tail)
        if canon and rng.random() < 0.6:
            depth = rng.randint(1, min(5, len(canon)))
            orphaned = canon[-depth:]
            del canon[-depth:]
            tip = (canon[-1]["hash"], canon[-1]["seq"]) if canon else ("h0", 0)
            # repair: fresh versions for the orphaned docs
            for o in orphaned:
                ev = mk_event(o["doc"], tip[0])
                canon.append(ev)
                rows.append(ev)
                tip = (ev["hash"], ev["seq"])
        # normal extension
        for _ in range(rng.randint(2, 5)):
            ev = mk_event(rng.choice(docs), tip[0])
            canon.append(ev)
            rows.append(ev)
            tip = (ev["hash"], ev["seq"])
        batches.append(rows)

    log = str(tmp_path / "log")
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    ctl = StreamController(spark, table, log, 1)
    from tests.test_round2 import _write_hash_epoch

    for epoch, rows in enumerate(batches):
        _write_hash_epoch(
            log, epoch,
            [(r["seq"], r["doc"], r["tokens"], r["hash"], r["parent"])
             for r in rows],
        )
        ctl.run()

    expected = {}
    for ev in canon:  # canonical order; later wins
        expected[ev["doc"]] = ev
    got = {r["doc_id"]: r for r in table.current_state().collect()}
    assert set(got) == set(expected), (set(got) ^ set(expected))
    for d, ev in expected.items():
        assert got[d]["seq"] == ev["seq"], (d, got[d]["seq"], ev["seq"])
        assert got[d]["tokens"] == ev["tokens"]


def test_pack_sequences_boundaries_and_drop_last(spark):
    from hemera_indexer_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [
            ("d1", "en", [1, 2, 3]),
            ("d2", "en", [4, 5, 6, 7]),
            ("d3", "en", [8, 9]),
            ("d4", "fr", [10, 11, 12, 13, 14]),
        ],
        "doc_id string, lang string, tokens array<int>",
    )
    full = pack_sequences(df, seq_len=4, drop_last=False).collect()
    by = {(r["lang"], r["chunk_id"]): r for r in full}
    # en stream = 1..9 (doc order), chunked by 4: docs cross boundaries
    assert by[("en", 0)]["tokens"] == [1, 2, 3, 4]
    assert by[("en", 1)]["tokens"] == [5, 6, 7, 8]
    assert by[("en", 2)]["tokens"] == [9] and by[("en", 2)]["n_tokens"] == 1
    assert by[("fr", 0)]["tokens"] == [10, 11, 12, 13]
    assert by[("fr", 1)]["tokens"] == [14]
    dropped = pack_sequences(df, seq_len=4).collect()
    assert {(r["lang"], r["chunk_id"]) for r in dropped} == {
        ("en", 0), ("en", 1), ("fr", 0)
    }
    assert all(r["n_tokens"] == 4 for r in dropped)


def test_pack_state_table_end_to_end(spark, tiny_log, tmp_path):
    """The full story: CDC replay materializes the token-sequence state
    table, and pack_sequences turns its live rows into fixed-length
    training rows — every token of every live doc appears exactly once,
    in stream order, when the trailing partial chunks are kept."""
    from hemera_indexer_spark.operators.packing import pack_sequences

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions
    ).run()
    state = table.current_state().withColumn(
        "shard", F.pmod(F.xxhash64("doc_id"), F.lit(4))
    )
    packed = pack_sequences(
        state, tokens_col="tokens", group_col="shard",
        order_col="doc_id", seq_len=256, drop_last=False,
    )
    total_in = state.agg(F.sum(F.size("tokens"))).collect()[0][0]
    total_out = packed.agg(F.sum("n_tokens")).collect()[0][0]
    assert total_out == total_in
    # per shard: at most one partial chunk (the trailing one)
    partials = (
        packed.where(F.col("n_tokens") < 256)
        .groupBy("shard")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in partials)
