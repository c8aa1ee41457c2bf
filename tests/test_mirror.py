"""LakeMirror: changelog APPLY (the ingress half of the WAL loop).

Laws: (1) replica state == source state after sync — through duplicates,
rollback retractions and mid-stream schema evolution; (2) sync is
incremental (only new envelope directories apply) and re-drives are
fenced no-ops; (3) the replica orders on version_to, so a source
ROLLBACK-restored old value (lower payload seq) still wins on the
replica; (4) a hole in the envelope chain raises instead of silently
skipping changes."""

import os
import shutil

import pytest
from pyspark.sql import functions as F, types as T

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
from hemera_indexer_spark.streaming import StreamController
from hemera_indexer_spark.streaming.mirror import (
    FeedGapError,
    LakeMirror,
    MIRROR_SEQ_COL,
)
from hemera_indexer_spark.streaming.sinks import ChangelogExportSink


def _assert_same_state(source: LakeTable, mirror: LakeMirror):
    src = source.current_state()
    rep = mirror.state()
    assert sorted(rep.columns) == sorted(src.columns)
    rep = rep.select(*src.columns)
    assert src.exceptAll(rep).count() == 0
    assert rep.exceptAll(src).count() == 0


def _tiny_state_schema():
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("val", T.StringType()),
        ]
    )


def _upd(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, seq long, op string, val string"
    )


def test_mirror_replicates_controller_run(spark, tiny_log, tmp_path):
    # Full loop: changelog -> StreamController -> lake -> envelope feed
    # -> LakeMirror -> replica. The tiny log carries duplicates, a
    # rollback (epoch 6) and schema evolution (epoch 5), so equality here
    # proves the mirror through all three.
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    feed = str(tmp_path / "export")
    sink = ChangelogExportSink(table, feed)
    StreamController(
        spark, table, tiny_log.out_dir, 4, sinks=[sink], max_batch_epochs=2
    ).run()
    assert len([d for d in os.listdir(feed) if d.startswith("chg_v")]) > 1

    m = LakeMirror(spark, feed, str(tmp_path / "replica"))
    applied = m.sync()
    assert applied > 1  # multi-directory chain, not one big batch
    _assert_same_state(table, m)
    # evolved column rode the feed
    assert "lang" in m.dest.schema.fieldNames()


def test_mirror_sync_incremental_and_redrive_fenced(spark, tmp_path):
    src = LakeTable.create(
        spark, str(tmp_path / "src"), _tiny_state_schema(),
        num_buckets=4, key_col="doc_id", seq_col="seq",
    )
    feed = str(tmp_path / "feed")
    sink = ChangelogExportSink(src, feed)
    src.merge_upsert(_upd(spark, [(1, 10, "update", "a"), (2, 11, "update", "b")]))
    sink.sync(epoch=0)
    m = LakeMirror(spark, feed, str(tmp_path / "replica"))
    assert m.sync() == 1
    v_after_first = m.dest.snapshot["version"]
    # nothing new -> no-op, no commit
    assert m.sync() == 0
    assert m.dest.snapshot["version"] == v_after_first

    src.merge_upsert(_upd(spark, [(1, 20, "update", "a2"), (2, 21, "delete", None)]))
    sink.sync(epoch=1)
    assert m.sync() == 1  # only the NEW directory
    _assert_same_state(src, m)
    assert m.state().where("doc_id = 2").count() == 0  # delete applied

    # re-driving an already-applied directory is fenced to a no-op
    v = m.dest.snapshot["version"]
    v_from, v_to, path = sorted(
        (int(d[5:].split("_")[0]), int(d[5:].split("_")[1]),
         os.path.join(feed, d))
        for d in os.listdir(feed) if d.startswith("chg_v")
    )[-1]
    m._apply_dir(path, v_to)
    assert m.dest.snapshot["version"] == v


def test_mirror_rollback_retraction_beats_payload_seq(spark, tmp_path):
    # A source rollback_to restores an OLD image whose payload seq is
    # LOWER than what the replica already applied. The replica must take
    # it anyway — version_to (not payload seq) is the replica seq domain.
    src = LakeTable.create(
        spark, str(tmp_path / "src"), _tiny_state_schema(),
        num_buckets=4, key_col="doc_id", seq_col="seq",
    )
    feed = str(tmp_path / "feed")
    sink = ChangelogExportSink(src, feed)
    src.merge_upsert(_upd(spark, [(7, 10, "update", "old")]))
    sink.sync(epoch=0)
    restore_v = src.snapshot["version"]
    src.merge_upsert(_upd(spark, [(7, 99, "update", "new")]))
    sink.sync(epoch=1)
    m = LakeMirror(spark, feed, str(tmp_path / "replica"))
    m.sync()
    assert m.state().collect()[0]["val"] == "new"

    src.rollback_to(restore_v)
    sink.sync(epoch=2)
    m.sync()
    row = m.state().collect()[0]
    assert row["val"] == "old" and row["seq"] == 10
    _assert_same_state(src, m)


def test_mirror_gap_raises(spark, tmp_path):
    src = LakeTable.create(
        spark, str(tmp_path / "src"), _tiny_state_schema(),
        num_buckets=4, key_col="doc_id", seq_col="seq",
    )
    feed = str(tmp_path / "feed")
    sink = ChangelogExportSink(src, feed)
    for i in range(3):
        src.merge_upsert(_upd(spark, [(1, 10 + i, "update", f"v{i}")]))
        sink.sync(epoch=i)
    dirs = sorted(d for d in os.listdir(feed) if d.startswith("chg_v"))
    assert len(dirs) == 3
    shutil.rmtree(os.path.join(feed, dirs[1]))  # hole in the chain
    m = LakeMirror(spark, feed, str(tmp_path / "replica"))
    with pytest.raises(FeedGapError, match="chain break"):
        m.sync()


def test_mirror_state_shape_matches_source(spark, tmp_path):
    src = LakeTable.create(
        spark, str(tmp_path / "src"), _tiny_state_schema(),
        num_buckets=4, key_col="doc_id", seq_col="seq",
    )
    feed = str(tmp_path / "feed")
    sink = ChangelogExportSink(src, feed)
    src.merge_upsert(_upd(spark, [(3, 5, "update", "x")]))
    sink.sync(epoch=0)
    m = LakeMirror(spark, feed, str(tmp_path / "replica"))
    m.sync()
    # bookkeeping column hidden from the user-facing view, present inside
    assert MIRROR_SEQ_COL not in m.state().columns
    assert MIRROR_SEQ_COL in m.dest.schema.fieldNames()
    # replica cursor lives in the source-version domain
    assert m.applied_version == src.snapshot["version"]
