"""Incremental dedup: pure new-vs-base LSH, the persisted SignatureIndex,
and its CDC maintenance path (update_from_changes).

Core law: checking a batch against the corpus incrementally must say
exactly what a full-corpus run would have said about the crossing pairs."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def _split(spark):
    from hemera_indexer_spark.operators.dedup import dataset_split

    s = dataset_split(_docs(spark), "doc_id")
    return (
        s.where(F.col("split") != "train").drop("split"),
        s.where(F.col("split") == "train").drop("split"),
    )


def test_incremental_equals_full_run_cross_pairs(spark):
    """incremental_lsh_pairs(new, base) == lsh_candidate_pairs(new U base)
    restricted to pairs with one side in each split."""
    from hemera_indexer_spark.operators.dedup import lsh_candidate_pairs
    from hemera_indexer_spark.operators.dedup_index import incremental_lsh_pairs

    new, base = _split(spark)
    inc = {
        (r["new_id"], r["base_id"], r["jaccard"])
        for r in incremental_lsh_pairs(
            new, base, "doc_id", "text", n=2, k=16, bands=4, threshold=0.5
        ).collect()
    }
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    cross = set()
    for r in lsh_candidate_pairs(
        _docs(spark), "doc_id", "text", n=2, k=16, bands=4, threshold=0.5
    ).collect():
        a, b = r["doc_a"], r["doc_b"]
        if (a in new_ids) != (b in new_ids):
            ni, bi = (a, b) if a in new_ids else (b, a)
            cross.add((ni, bi, r["jaccard"]))
    assert inc == cross
    assert inc, "fixture produced no crossing near-dup pairs — test is vacuous"


def test_signature_index_check_equals_pure_composition(spark, tmp_path):
    from hemera_indexer_spark.operators.dedup_index import (
        SignatureIndex,
        incremental_lsh_pairs,
    )

    new, base = _split(spark)
    idx = SignatureIndex.build(spark, str(tmp_path / "idx"), base)
    got = {
        tuple(r) for r in idx.check(new, base, threshold=0.5).collect()
    }
    want = {
        tuple(r)
        for r in incremental_lsh_pairs(
            new, base, "doc_id", "text", n=2, k=16, bands=4, threshold=0.5
        ).collect()
    }
    assert got == want and got


def _mk_source(spark, root):
    from hemera_indexer_spark.lake.table import LakeTable

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    return LakeTable.create(spark, root, schema, num_buckets=4)


def _merge(table, spark, rows, epoch):
    df = spark.createDataFrame(rows, "doc_id string, seq long, text string, op string")
    assert table.merge_upsert(df, epoch_id=epoch)


def test_update_from_changes_matches_fresh_rebuild(spark, tmp_path):
    """After a mixed epoch (update-to-near-dup, delete, insert, update-to-
    empty), the incrementally maintained index state equals an index built
    fresh from the source's current state — including the emptied doc
    DROPPING out (stale signatures must not survive a text rewrite)."""
    from hemera_indexer_spark.operators.dedup_index import SignatureIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    base_rows = [
        ("a", 1, "the quick brown fox jumps over the lazy dog today", "update"),
        ("b", 2, "completely different text about spark engines and parquet", "update"),
        ("c", 3, "a third document with some middling unrelated content here", "update"),
        ("e", 4, "target text that doc d will nearly duplicate verbatim soon", "update"),
    ]
    _merge(src, spark, base_rows, epoch=0)
    idx = SignatureIndex.build_from_table(
        spark, str(tmp_path / "idx"), src, text_col="text"
    )
    assert idx.synced_version() == src.snapshot["version"]
    # epoch 1: a -> near-dup of e's text; c deleted; d inserted (near-dup of
    # e); b emptied (whitespace only -> zero shingles)
    _merge(
        src,
        spark,
        [
            ("a", 10, "target text that doc d will nearly duplicate verbatim now", "update"),
            ("c", 11, None, "delete"),
            ("d", 12, "target text that doc d will nearly duplicate verbatim soon ok", "update"),
            ("b", 13, "   ", "update"),
        ],
        epoch=1,
    )
    assert idx.update_from_changes(src, text_col="text")
    assert idx.synced_version() == src.snapshot["version"]
    fresh = SignatureIndex.build(
        spark, str(tmp_path / "idx2"), src.current_state(), text_col="text"
    )
    cols = ["doc_id", "b0", "b1", "b2", "b3"]
    got = sorted(map(tuple, idx.table.current_state().select(*cols).collect()))
    want = sorted(map(tuple, fresh.table.current_state().select(*cols).collect()))
    assert got == want
    ids = {t[0] for t in got}
    assert "c" not in ids and "b" not in ids and "d" in ids
    # re-driving when already synced is a no-op (idempotent)
    assert idx.update_from_changes(src, text_col="text") is False
    got2 = sorted(map(tuple, idx.table.current_state().select(*cols).collect()))
    assert got2 == got


def test_index_check_finds_new_near_dup_after_maintenance(spark, tmp_path):
    from hemera_indexer_spark.operators.dedup_index import SignatureIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    _merge(
        src,
        spark,
        [
            ("a", 1, "the quick brown fox jumps over the lazy dog again today", "update"),
            ("b", 2, "completely different text about spark engines and parquet", "update"),
        ],
        epoch=0,
    )
    idx = SignatureIndex.build(
        spark, str(tmp_path / "idx"), src.current_state(), text_col="text"
    )
    batch = spark.createDataFrame(
        [("n1", "the quick brown fox jumps over the lazy dog again today ok")],
        "doc_id string, text string",
    )
    hits = idx.check(batch, src.current_state(), text_col="text", threshold=0.5).collect()
    assert {(r["new_id"], r["base_id"]) for r in hits} == {("n1", "a")}


def test_family_version_mismatch_raises(spark, tmp_path):
    from hemera_indexer_spark.operators.dedup_index import (
        IndexFamilyError,
        SignatureIndex,
    )

    root = str(tmp_path / "idx")
    idx = SignatureIndex.create(spark, root)
    assert idx.table.update_properties({"minhash_family": "1"})
    with pytest.raises(IndexFamilyError, match="family v1"):
        SignatureIndex.load(spark, root)


def test_non_index_table_raises(spark, tmp_path):
    from hemera_indexer_spark.operators.dedup_index import (
        IndexFamilyError,
        SignatureIndex,
    )

    src = _mk_source(spark, str(tmp_path / "plain"))
    with pytest.raises(IndexFamilyError, match="not a SignatureIndex"):
        SignatureIndex(src)


def test_word_shingles_on_token_array_column(spark):
    """Array columns shingle as token-id n-grams (no split/lower path)."""
    from hemera_indexer_spark.operators.dedup import word_shingles

    df = spark.createDataFrame(
        [("a", [10, 20, 30])], "doc_id string, tokens array<int>"
    )
    got = sorted(
        r["shingle"] for r in word_shingles(df, "doc_id", "tokens", n=2).collect()
    )
    assert got == ["10_20", "20_30"]


def test_signature_index_sink_e2e(spark, tiny_log, tmp_path):
    """Full CDC replay (rollback + schema evolution included) with a
    SignatureIndexSink over the token arrays: after the run the maintained
    index equals one built fresh from the final state, its log fence equals
    the last epoch, and a re-driven controller leaves both unchanged."""
    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.operators.dedup_index import SignatureIndex
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
    from hemera_indexer_spark.streaming import StreamController
    from hemera_indexer_spark.streaming.sinks import SignatureIndexSink

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    idx = SignatureIndex.build_from_table(
        spark, str(tmp_path / "idx"), table, text_col="tokens", k=8, bands=2
    )
    sink = SignatureIndexSink(table, idx, text_col="tokens")
    ctl = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        sinks=[sink],
    )
    stats = ctl.run()
    last_epoch = max(e.epoch for e in stats.epochs)
    assert sink.committed_epoch() == last_epoch
    assert idx.synced_version() == table.snapshot["version"]

    fresh = SignatureIndex.build_from_table(
        spark, str(tmp_path / "idx2"), table, text_col="tokens", k=8, bands=2
    )
    cols = ["doc_id", "b0", "b1"]
    got = sorted(map(tuple, idx.table.current_state().select(*cols).collect()))
    want = sorted(map(tuple, fresh.table.current_state().select(*cols).collect()))
    assert got == want and got

    # re-drive: a second controller over the same fully-committed log must
    # not move the index (fenced groups never reach the sink's merge)
    v = idx.table.snapshot["version"]
    StreamController(
        spark, LakeTable.load(spark, str(tmp_path / "lake")),
        tiny_log.out_dir, tiny_log.spec.n_partitions,
        sinks=[SignatureIndexSink(table, idx, text_col="tokens")],
    ).run()
    idx.table.refresh()
    assert idx.table.snapshot["version"] == v
    assert sink.committed_epoch() == last_epoch


def test_one_index_shared_by_tenant_controllers(spark, tmp_path):
    """Two tenant controllers over ONE shared state table can maintain ONE
    SignatureIndex when each sink namespaces its log-epoch fence
    (fence_key=tenant): fences stay independent (tenant A's epochs never
    fence out tenant B's), every sync covers both tenants' changes, and
    the final index equals a fresh rebuild of the shared corpus."""
    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.operators.dedup_index import SignatureIndex
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )
    from hemera_indexer_spark.streaming import StreamController
    from hemera_indexer_spark.streaming.sinks import SignatureIndexSink

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    idx = SignatureIndex.build_from_table(
        spark, str(tmp_path / "idx"), table, text_col="tokens", k=8, bands=2
    )
    logs = {}
    for tenant in (1, 2):
        logs[tenant] = generate_changelog(
            str(tmp_path / f"log{tenant}"),
            ChangelogSpec(
                n_docs=60, n_epochs=4, events_per_epoch=120, n_partitions=2,
                seed=300 + tenant, schema_evolution_epoch=None,
                rollback_epochs=(), doc_prefix=f"t{tenant}_doc",
            ),
        )

    def ctl(tenant):
        sink = SignatureIndexSink(
            table, idx, text_col="tokens", fence_key=str(tenant)
        )
        return StreamController(
            spark, table, logs[tenant].out_dir, 2,
            tenant_col="chain_id", tenant_id=tenant, sinks=[sink],
        ), sink

    # interleave: t1 partial -> t2 full -> t1 rest. With a SHARED fence,
    # t2's epochs (0..3) would have fenced out t1's remaining epochs.
    c, s1a = ctl(1)
    c.run(max_epochs=2)
    assert s1a.committed_epoch() == 1
    c, s2 = ctl(2)
    c.run()
    assert s2.committed_epoch() == 3
    assert s1a.committed_epoch() == 1  # t2's run did not move t1's fence
    c, s1b = ctl(1)
    c.run()
    assert s1b.committed_epoch() == 3
    assert idx.synced_version() == table.snapshot["version"]

    fresh = SignatureIndex.build_from_table(
        spark, str(tmp_path / "idx2"), table, text_col="tokens", k=8, bands=2
    )
    cols = ["doc_id", "b0", "b1"]
    got = sorted(map(tuple, idx.table.current_state().select(*cols).collect()))
    want = sorted(map(tuple, fresh.table.current_state().select(*cols).collect()))
    assert got == want and got
    # both tenants' docs are in the one index
    ids = {t[0] for t in got}
    assert any(i.startswith("t1_") for i in ids)
    assert any(i.startswith("t2_") for i in ids)


def _write_log_epoch(out_dir, epoch, rows, seq0):
    """Hand-crafted 1-partition changelog epoch: rows = [(doc_id, tokens)]."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hemera_indexer_spark.sources.generator import _event_arrow_schema

    cols = {
        "seq": [seq0 + i for i in range(len(rows))],
        "epoch": [epoch] * len(rows),
        "partition": [0] * len(rows),
        "doc_id": [r[0] for r in rows],
        "op": ["update"] * len(rows),
        "tokens": [r[1] for r in rows],
        "n_tok": [len(r[1]) for r in rows],
        "source": ["wiki"] * len(rows),
        "rollback_to_seq": [None] * len(rows),
    }
    path = os.path.join(out_dir, f"epoch={epoch:05d}", "partition=000")
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.Table.from_pydict(cols, schema=_event_arrow_schema(False)),
        os.path.join(path, "events.parquet"),
    )


def test_admission_report_flags_new_vs_committed_only(spark, tmp_path):
    """The report flags a group's docs against the PREVIOUSLY committed
    corpus: identical-token docs arriving in the SAME group are not paired
    with each other, only with earlier-committed near-dups; re-driving the
    log rewrites the identical report (idempotent)."""
    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.operators.dedup_index import SignatureIndex
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
    from hemera_indexer_spark.streaming import StreamController
    from hemera_indexer_spark.streaming.sinks import SignatureIndexSink

    log = str(tmp_path / "log")
    toks_a = list(range(100, 130))
    toks_b = list(range(500, 540))
    _write_log_epoch(log, 0, [("a", toks_a), ("b", toks_b)], seq0=0)
    # c and c2 are BOTH token-identical to a (jaccard 1.0 — banding always
    # collides, no LSH-recall flake) and to each other
    _write_log_epoch(log, 1, [("c", toks_a), ("c2", toks_a)], seq0=10)

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    idx = SignatureIndex.build_from_table(
        spark, str(tmp_path / "idx"), table, text_col="tokens", k=8, bands=2
    )
    report = str(tmp_path / "report")
    sink = SignatureIndexSink(
        table, idx, text_col="tokens", report_dir=report, report_threshold=0.9
    )
    StreamController(
        spark, table, log, 1, sinks=[sink], max_batch_epochs=1
    ).run()

    got = {
        (r["new_id"], r["base_id"])
        for r in spark.read.parquet(f"{report}/epoch=00001").collect()
    }
    assert got == {("c", "a"), ("c2", "a")}
    # epoch 0 ran against an empty corpus
    assert spark.read.parquet(f"{report}/epoch=00000").count() == 0

    # re-drive: fenced groups don't re-report; the files stay identical
    import os

    mtimes = {
        f: os.path.getmtime(os.path.join(report, "epoch=00001", f))
        for f in os.listdir(os.path.join(report, "epoch=00001"))
    }
    StreamController(
        spark, LakeTable.load(spark, str(tmp_path / "lake")), log, 1,
        sinks=[SignatureIndexSink(table, idx, text_col="tokens",
                                  report_dir=report, report_threshold=0.9)],
        max_batch_epochs=1,
    ).run()
    got2 = {
        (r["new_id"], r["base_id"])
        for r in spark.read.parquet(f"{report}/epoch=00001").collect()
    }
    assert got2 == got


def test_curated_state_excludes_flagged_keeps_first(spark, tmp_path):
    """curated_state = current_state minus admission-flagged docs: the
    earlier-committed doc survives, later near-dup arrivals drop out; an
    unrelated doc and a missing report dir both pass through untouched."""
    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.operators.dedup_index import (
        SignatureIndex,
        curated_state,
    )
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
    from hemera_indexer_spark.streaming import StreamController
    from hemera_indexer_spark.streaming.sinks import SignatureIndexSink

    log = str(tmp_path / "log")
    toks_a = list(range(100, 130))
    toks_b = list(range(500, 540))
    _write_log_epoch(log, 0, [("a", toks_a), ("b", toks_b)], seq0=0)
    _write_log_epoch(log, 1, [("c", toks_a), ("c2", toks_a)], seq0=10)

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    idx = SignatureIndex.build_from_table(
        spark, str(tmp_path / "idx"), table, text_col="tokens", k=8, bands=2
    )
    report = str(tmp_path / "report")
    StreamController(
        spark, table, log, 1,
        sinks=[SignatureIndexSink(table, idx, text_col="tokens",
                                  report_dir=report, report_threshold=0.9)],
        max_batch_epochs=1,
    ).run()

    full = {r["doc_id"] for r in table.current_state().collect()}
    assert full == {"a", "b", "c", "c2"}
    cur = {r["doc_id"] for r in curated_state(table, report).collect()}
    assert cur == {"a", "b"}
    # threshold above the verified similarity: nothing excluded
    loose = {
        r["doc_id"]
        for r in curated_state(table, report, min_jaccard=1.01).collect()
    }
    assert loose == full
    # no reports at all: identity view
    none = {
        r["doc_id"]
        for r in curated_state(table, str(tmp_path / "nowhere")).collect()
    }
    assert none == full
