"""Write-audit-publish: staged commits are invisible until published,
auditable as a pinned handle, CAS-protected at publish, and their data
files survive vacuum while staged but are collected once discarded."""

import os

import pytest
from pyspark.sql import types as T

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.lake.table import ConcurrentCommitError

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("val", T.StringType()),
    ]
)


def _mk(spark, root):
    t = LakeTable.create(spark, root, SCHEMA, num_buckets=4)
    t.merge_upsert(
        spark.createDataFrame(
            [(f"d{i}", i + 1, f"v{i}", "upsert") for i in range(10)],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=0,
    )
    return t


def _state(t):
    return {
        r["doc_id"]: (r["seq"], r["val"]) for r in t.current_state().collect()
    }


def _batch(spark):
    return spark.createDataFrame(
        [("d3", 100, "patched", "upsert"),
         ("d5", 101, None, "delete"),
         ("x1", 102, "new", "upsert")],
        "doc_id string, seq long, val string, op string",
    )


def test_stage_audit_publish(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    before = _state(t)
    assert t.merge_upsert(_batch(spark), epoch_id=1, wap_id="w1")
    # invisible: live state, version and fence unchanged
    t2 = LakeTable.load(spark, t.root)
    assert _state(t2) == before
    assert t2.committed_epoch() == 0
    assert [s["wap_id"] for s in t.staged_snapshots()] == ["w1"]
    # audit: exactly the would-be state; mutations through the handle raise
    a = t.audit_staged("w1")
    audited = _state(a)
    assert audited["d3"] == (100, "patched")
    assert "d5" not in audited and audited["x1"] == (102, "new")
    with pytest.raises(ConcurrentCommitError, match="pinned"):
        a.merge_upsert(_batch(spark))
    # publish: audited state becomes live, fence takes effect, stage gone
    v = t.publish_staged("w1")
    t.refresh()
    assert t.snapshot["version"] == v
    assert _state(t) == audited
    assert t.committed_epoch() == 1
    assert t.staged_snapshots() == []
    # the published fence rejects a re-drive of the same epoch
    assert t.merge_upsert(_batch(spark), epoch_id=1) is False


def _parquets(root):
    import glob

    return set(
        glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                  recursive=True)
    )


def test_discard_then_vacuum_collects_staged_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    before = _state(t)
    assert t.merge_upsert(_batch(spark), epoch_id=1, wap_id="w1")
    # while staged: vacuum must NOT touch the stage's DATA files
    # (writer sidecars like _SUCCESS are fair game, as for live commits)
    files_staged = _parquets(t.root)
    t.vacuum_orphans()
    assert _parquets(t.root) == files_staged
    a = t.audit_staged("w1")
    assert "x1" in _state(a)  # still readable after vacuum
    t.discard_staged("w1")
    assert t.staged_snapshots() == []
    with pytest.raises(KeyError, match="no staged commit"):
        t.audit_staged("w1")
    # now the stage's data files are orphans and get collected
    t.vacuum_orphans()
    assert _parquets(t.root) < files_staged
    assert _state(t) == before
    # re-staging under the same id after discard works
    assert t.merge_upsert(_batch(spark), epoch_id=1, wap_id="w1")
    assert t.publish_staged("w1") == t.snapshot["version"]


def test_publish_cas_rejected_after_intervening_commit(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    assert t.merge_upsert(_batch(spark), epoch_id=1, wap_id="w1")
    # an ordinary commit lands while the stage awaits its audit
    t.merge_upsert(
        spark.createDataFrame(
            [("d9", 200, "moved", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=1,
    )
    with pytest.raises(ConcurrentCommitError, match="version moved"):
        t.publish_staged("w1")
    # the stage survives the rejection; the operator re-stages on the
    # new head instead (no rebase under the single-writer model)
    assert [s["wap_id"] for s in t.staged_snapshots()] == ["w1"]
    t.discard_staged("w1")
    assert t.merge_upsert(_batch(spark), epoch_id=2, wap_id="w2")
    t.publish_staged("w2")
    got = _state(t)
    assert got["d9"] == (200, "moved") and got["x1"] == (102, "new")
