"""Fact-table small-file compaction (`compact_files`): pure file
reorganization — the row multiset, redelivery dedup, and the change feed
must all be invariant across a pack."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _fact_schema():
    return T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )


def _mk_fact(spark, tmp_path, n_epochs=6, num_buckets=4):
    from hemera_indexer_spark.lake import LakeTable

    t = LakeTable.create(
        spark,
        str(tmp_path / "fact"),
        _fact_schema(),
        num_buckets=num_buckets,
        properties={"table_type": "fact"},
    )
    batches = []
    for e in range(n_epochs):
        rows = [
            (f"d{i}", e * 100 + i, f"p{e}-{i}") for i in range(8)
        ]
        batches.append(rows)
        t.insert_if_absent(
            spark.createDataFrame(rows, "doc_id string, seq long, payload string"),
            epoch_id=e,
        )
    return t, batches


def _rows(t):
    return sorted(map(tuple, t.current_state().collect()))


def test_compact_files_packs_and_preserves_multiset(spark, tmp_path):
    t, _ = _mk_fact(spark, tmp_path)
    before = _rows(t)
    per_bucket = {}
    for f in t.snapshot["files"]:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert max(per_bucket.values()) > 1  # the problem exists
    assert t.compact_files(max_files=1)
    after_counts = {}
    for f in t.snapshot["files"]:
        after_counts[f["bucket"]] = after_counts.get(f["bucket"], 0) + 1
    assert max(after_counts.values()) == 1
    assert _rows(t) == before
    # footer seq stats survive the rewrite (pruned reads depend on them)
    for f in t.snapshot["files"]:
        assert f["min_seq"] is not None and f["max_seq"] >= f["min_seq"]
    # idempotent: nothing left beyond the threshold
    assert not t.compact_files(max_files=1)


def test_compact_files_changes_since_net_empty(spark, tmp_path):
    t, _ = _mk_fact(spark, tmp_path)
    v = t.snapshot["version"]
    assert t.compact_files(max_files=1)
    assert t.changes_since(v).count() == 0


def test_redelivery_still_dropped_after_pack(spark, tmp_path):
    t, batches = _mk_fact(spark, tmp_path)
    n = t.current_state().count()
    assert t.compact_files(max_files=1)
    # re-deliver epoch 2's rows without the epoch fence (min_seq pruning +
    # anti-join must still see them in the packed files)
    t.insert_if_absent(
        spark.createDataFrame(
            batches[2], "doc_id string, seq long, payload string"
        )
    )
    assert t.current_state().count() == n


def test_state_table_refuses_compact_files(spark, tmp_path):
    from hemera_indexer_spark.lake import LakeTable

    t = LakeTable.create(
        spark, str(tmp_path / "state"), _fact_schema(), num_buckets=2
    )
    with pytest.raises(ValueError, match="fact-table"):
        t.compact_files()


def test_fact_sink_after_commit_packs(spark, tmp_path):
    from hemera_indexer_spark.streaming.sinks import FactSink

    t, _ = _mk_fact(spark, tmp_path)
    before = _rows(t)
    sink = FactSink(t, compact_max_files=1)
    sink.after_commit(group_epoch=5, is_last=False)  # only fires on last
    assert max(
        sum(1 for f in t.snapshot["files"] if f["bucket"] == b)
        for b in range(4)
    ) > 1
    sink.after_commit(group_epoch=5, is_last=True)
    t.refresh()
    counts = {}
    for f in t.snapshot["files"]:
        counts[f["bucket"]] = counts.get(f["bucket"], 0) + 1
    assert max(counts.values()) == 1
    assert _rows(t) == before


def test_structured_ingest_fact_compaction_parity(spark, tmp_path):
    """Structured-streaming parity for fact small-file maintenance: with
    fact_compact_max_files the per-batch slot packs history buckets, and
    the packed table still equals the batch controller's fact output."""
    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.schemas import FACTS_SCHEMA, SEQUENCES_SCHEMA
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )
    from hemera_indexer_spark.streaming import StreamController
    from hemera_indexer_spark.streaming.structured import StructuredIngest

    spec = ChangelogSpec(
        n_docs=120, n_epochs=4, events_per_epoch=300, n_partitions=2,
        seed=31, schema_evolution_epoch=None, rollback_epochs=(2,),
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(log_dir, spec)

    b_state = LakeTable.create(
        spark, str(tmp_path / "b_state"), SEQUENCES_SCHEMA, num_buckets=4
    )
    b_facts = LakeTable.create(
        spark, str(tmp_path / "b_facts"), FACTS_SCHEMA, num_buckets=4,
        properties={"table_type": "fact"},
    )
    StreamController(
        spark, b_state, log_dir, spec.n_partitions, fact_table=b_facts
    ).run()

    s_state = LakeTable.create(
        spark, str(tmp_path / "s_state"), SEQUENCES_SCHEMA, num_buckets=4
    )
    s_facts = LakeTable.create(
        spark, str(tmp_path / "s_facts"), FACTS_SCHEMA, num_buckets=4,
        properties={"table_type": "fact"},
    )
    StructuredIngest(
        spark, s_state, log_dir, spec.n_partitions,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=3,
        fact_table=s_facts,
        fact_compact_max_files=1,
    ).start(available_now=True).awaitTermination(300)

    def fact_rows(t):
        t.refresh()
        return sorted(
            (r["doc_id"], r["seq"], r["op"], tuple(r["tokens"] or []))
            for r in t.read().collect()
        )

    assert fact_rows(s_facts) == fact_rows(b_facts)
    counts = {}
    for f in s_facts.snapshot["files"]:
        counts[f["bucket"]] = counts.get(f["bucket"], 0) + 1
    assert max(counts.values()) == 1


def test_size_tiered_pack_leaves_big_files_alone(spark, tmp_path):
    """small_rows tiering: a file at/above the tier is never a pack
    candidate (its path survives the commit verbatim); small files merge
    into one. Bounds write amplification at maintenance cadence."""
    t, _ = _mk_fact(spark, tmp_path)  # 6 epochs x 8 rows, 4 buckets
    before = _rows(t)
    # first pack everything into one big file per bucket (one-shot mode)
    assert t.compact_files(max_files=1)
    big_paths = {f["path"] for f in t.snapshot["files"]}
    tier = min(f["rows"] for f in t.snapshot["files"])  # all big >= tier
    # append two more small epochs
    for e in (10, 11):
        t.insert_if_absent(
            spark.createDataFrame(
                [(f"d{i}", e * 100 + i, f"p{e}-{i}") for i in range(8)],
                "doc_id string, seq long, payload string",
            ),
            epoch_id=e,
        )
    # tiered pack: every big file (rows >= tier) stays in place
    assert t.compact_files(max_files=1, small_rows=tier)
    after_paths = {f["path"] for f in t.snapshot["files"]}
    assert big_paths <= after_paths  # untouched, not rewritten
    counts = {}
    for f in t.snapshot["files"]:
        counts[f["bucket"]] = counts.get(f["bucket"], 0) + 1
    assert max(counts.values()) <= 2  # one big + one packed-small per bucket
    assert _rows(t) == sorted(before + [
        (f"d{i}", e * 100 + i, f"p{e}-{i}")
        for e in (10, 11) for i in range(8)
    ])


def test_fact_sink_rolling_retention(spark, tmp_path):
    """FactSink(retention_lag_seqs=): the post-group slot truncates
    history below (max_seq - lag) once whole files fall below the
    cutoff, advances the insert floor, and composes with the pack."""
    from hemera_indexer_spark.streaming.sinks import FactSink

    t, _ = _mk_fact(spark, tmp_path)  # seqs 0..507 across 6 epochs
    sink = FactSink(t, compact_max_files=2, retention_lag_seqs=250)
    n_before = t.read().count()
    sink.after_commit(group_epoch=5, is_last=True)
    t.refresh()
    # cutoff = 507 - 250 = 257: epochs 0-1 (seq <= 107) dropped wholesale;
    # epoch 2 (200..207) files are also fully below -> dropped
    assert t.read().where("seq < 257").count() == 0
    assert t.read().count() < n_before
    assert int(t.snapshot["properties"]["retention_min_seq"]) == 257
    # re-delivered truncated epoch: fenced by the floor, not resurrected
    n = t.read().count()
    t.insert_if_absent(
        spark.createDataFrame(
            [(f"d{i}", i, f"p0-{i}") for i in range(8)],
            "doc_id string, seq long, payload string",
        ),
        epoch_id=99,
    )
    t.refresh()
    assert t.read().count() == n
    # steady state: no files below the new cutoff -> slot is a no-op
    v = t.snapshot["version"]
    sink.after_commit(group_epoch=6, is_last=True)
    t.refresh()
    assert t.snapshot["version"] == v


def test_structured_ingest_rolling_retention_parity(spark, tmp_path):
    """Streaming parity for rolling retention: with
    fact_retention_lag_seqs the per-batch slot truncates old history,
    and the surviving rows equal the batch controller's fact output
    filtered by the same floor."""
    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.schemas import FACTS_SCHEMA, SEQUENCES_SCHEMA
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )
    from hemera_indexer_spark.streaming import StreamController
    from hemera_indexer_spark.streaming.structured import StructuredIngest

    spec = ChangelogSpec(
        n_docs=120, n_epochs=4, events_per_epoch=300, n_partitions=2,
        seed=33, schema_evolution_epoch=None, rollback_epochs=(),
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(log_dir, spec)

    b_state = LakeTable.create(
        spark, str(tmp_path / "b_state"), SEQUENCES_SCHEMA, num_buckets=4
    )
    b_facts = LakeTable.create(
        spark, str(tmp_path / "b_facts"), FACTS_SCHEMA, num_buckets=4,
        properties={"table_type": "fact"},
    )
    StreamController(
        spark, b_state, log_dir, spec.n_partitions, fact_table=b_facts
    ).run()

    s_state = LakeTable.create(
        spark, str(tmp_path / "s_state"), SEQUENCES_SCHEMA, num_buckets=4
    )
    s_facts = LakeTable.create(
        spark, str(tmp_path / "s_facts"), FACTS_SCHEMA, num_buckets=4,
        properties={"table_type": "fact"},
    )
    StructuredIngest(
        spark, s_state, log_dir, spec.n_partitions,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=3,
        fact_table=s_facts,
        fact_retention_lag_seqs=400,
    ).start(available_now=True).awaitTermination(300)
    s_facts.refresh()
    floor = int(s_facts.snapshot["properties"]["retention_min_seq"])
    assert floor > 0
    assert s_facts.read().where(f"seq < {floor}").count() == 0

    def rows(t, lo):
        return sorted(
            (r["doc_id"], r["seq"], r["op"])
            for r in t.read().where(F.col("seq") >= lo).collect()
        )

    assert rows(s_facts, floor) == rows(b_facts, floor)
