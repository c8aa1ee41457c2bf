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
