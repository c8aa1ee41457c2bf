"""Two-level metadata (snapshot format v2 — Iceberg's manifest-list
analog): on disk a snapshot stores per-bucket pointers to
content-addressed ``manifest-<sha1>.json`` files; in memory every
consumer still sees the resolved ``files`` list.

Laws under test:

- the on-disk snapshot carries ``file_manifests`` and NO inline files;
  the in-memory form is resolved (engine code is layout-agnostic);
- commit metadata write cost is O(touched buckets): a commit touching
  one bucket reuses every other bucket's manifest file VERBATIM (same
  content-addressed name, no rewrite);
- legacy v0/v1 snapshots (inline ``files``) stay readable, and the
  next commit upgrades the table to v2;
- publish_staged reuses the manifests written at staging time (zero
  new manifest files at publish);
- vacuum_orphans collects manifests referenced by no retained
  snapshot/stage and keeps the referenced ones;
- time travel and changes_since work across manifest generations.
"""

import json
import os

from pyspark.sql import types as T

from hemera_indexer_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("val", T.StringType()),
    ]
)

UPD_DDL = "doc_id string, seq long, val string, op string"


def _mk(spark, root, num_buckets=8, n_epochs=3, docs_per_epoch=32):
    t = LakeTable.create(spark, root, SCHEMA, num_buckets=num_buckets)
    for e in range(n_epochs):
        rows = [
            (f"d{i}", e * 1000 + i, f"v{e}-{i}", "upsert")
            for i in range(docs_per_epoch)
        ]
        t.merge_upsert(spark.createDataFrame(rows, UPD_DDL), epoch_id=e)
    return t


def _disk_snap(t, version=None):
    v = t.snapshot["version"] if version is None else version
    with open(os.path.join(t.meta_dir, f"snap-{v:010d}.json")) as f:
        return json.load(f)


def _manifest_files(t):
    return {
        fn
        for fn in os.listdir(t.meta_dir)
        if fn.startswith("manifest-") and fn.endswith(".json")
    }


def test_disk_form_is_pointers_memory_form_is_resolved(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    disk = _disk_snap(t)
    assert "files" not in disk
    assert disk["format_version"] == 2
    fm = disk["file_manifests"]
    assert fm and all(n.startswith("manifest-") for n in fm.values())
    # in-memory: resolved, pointer-free, matches the union of manifests
    mem = t.snapshot
    assert "file_manifests" not in mem
    from_manifests = []
    for name in fm.values():
        from_manifests += json.load(open(os.path.join(t.meta_dir, name)))
    assert sorted(e["path"] for e in mem["files"]) == sorted(
        e["path"] for e in from_manifests
    )
    # a fresh handle reads the same state
    fresh = LakeTable.load(spark, t.root)
    assert sorted(map(tuple, fresh.current_state().collect())) == sorted(
        map(tuple, t.current_state().collect())
    )


def test_commit_reuses_untouched_buckets_manifests(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), num_buckets=8)
    before_ptrs = _disk_snap(t)["file_manifests"]
    before_files = _manifest_files(t)
    # single-key batch: touches exactly one bucket
    t.merge_upsert(
        spark.createDataFrame([("d0", 10**6, "new", "upsert")], UPD_DDL),
        epoch_id=99,
    )
    after_ptrs = _disk_snap(t)["file_manifests"]
    changed = {b for b in after_ptrs if before_ptrs.get(b) != after_ptrs[b]}
    assert len(changed) == 1, f"one bucket touched, pointers changed: {changed}"
    unchanged = set(after_ptrs) - changed
    assert all(after_ptrs[b] == before_ptrs[b] for b in unchanged)
    # exactly the touched bucket's new manifest landed on disk
    new_files = _manifest_files(t) - before_files
    assert new_files == {after_ptrs[b] for b in changed}


def test_metadata_write_is_o_touched_not_o_table(spark, tmp_path):
    """The scale law itself: on-disk metadata bytes WRITTEN by a 1-bucket
    commit must not grow with the table's total file count."""
    t = _mk(spark, str(tmp_path / "t"), num_buckets=8, n_epochs=6)
    total_entries = len(t.snapshot["files"])
    assert total_entries >= 40  # the table is much bigger than one bucket
    before = _manifest_files(t)
    t.merge_upsert(
        spark.createDataFrame([("d0", 10**7, "x", "upsert")], UPD_DDL),
        epoch_id=100,
    )
    new_manifest_bytes = sum(
        os.path.getsize(os.path.join(t.meta_dir, fn))
        for fn in _manifest_files(t) - before
    )
    # the rewritten manifest covers ONE bucket; generous bound: half the
    # size of the full file list serialization
    full = len(json.dumps(t.snapshot["files"]))
    assert new_manifest_bytes < full / 2, (
        f"1-bucket commit wrote {new_manifest_bytes}B of manifests vs "
        f"{full}B full list — not O(touched)"
    )


def test_legacy_inline_snapshot_reads_and_upgrades(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n_epochs=1)
    # rewrite the current snapshot in the v1 inline form
    v = t.snapshot["version"]
    legacy = dict(t.snapshot)
    legacy["format_version"] = 1
    spath = os.path.join(t.meta_dir, f"snap-{v:010d}.json")
    open(spath, "w").write(json.dumps(legacy))
    for fn in list(os.listdir(t.meta_dir)):
        if fn.startswith("manifest-"):
            os.remove(os.path.join(t.meta_dir, fn))
    fresh = LakeTable.load(spark, t.root)
    assert len(fresh.current_state().collect()) == 32
    assert fresh.snapshot["format_version"] == 1
    # next commit re-splits: table upgrades to v2
    fresh.merge_upsert(
        spark.createDataFrame([("d0", 10**6, "up", "upsert")], UPD_DDL),
        epoch_id=50,
    )
    assert _disk_snap(fresh)["format_version"] == 2
    assert "file_manifests" in _disk_snap(fresh)
    got = {r.doc_id: r.val for r in fresh.current_state().collect()}
    assert got["d0"] == "up" and got["d1"] == "v0-1"


def test_publish_staged_reuses_staged_manifests(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n_epochs=1)
    t.merge_upsert(
        spark.createDataFrame([("d0", 10**6, "staged", "upsert")], UPD_DDL),
        epoch_id=10,
        wap_id="w1",
    )
    staged = _manifest_files(t)
    t.publish_staged("w1")
    assert _manifest_files(t) == staged, "publish must write no new manifests"
    got = {r.doc_id: r.val for r in t.current_state().collect()}
    assert got["d0"] == "staged"


def test_vacuum_collects_unreferenced_manifests(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n_epochs=4)
    all_before = _manifest_files(t)
    t.expire_snapshots(keep_last=1)
    removed = t.vacuum_orphans()
    assert removed > 0
    kept = _manifest_files(t)
    # every manifest the live snapshot points at survives; at least one
    # history-only manifest was collected
    live_ptrs = set(_disk_snap(t)["file_manifests"].values())
    assert live_ptrs <= kept
    assert kept < all_before
    # the table still reads perfectly
    assert len(t.current_state().collect()) == 32
    # staged manifests are protected
    t.merge_upsert(
        spark.createDataFrame([("zz", 1, "s", "upsert")], UPD_DDL),
        epoch_id=20,
        wap_id="w2",
    )
    with open(os.path.join(t.meta_dir, "wap-w2.json")) as f:
        wap_ptrs = set(json.load(f)["file_manifests"].values())
    t.vacuum_orphans()
    assert wap_ptrs <= _manifest_files(t)
    t.publish_staged("w2")
    assert "zz" in {r.doc_id for r in t.current_state().collect()}


def test_time_travel_and_changes_across_generations(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n_epochs=2)
    v0 = t.snapshot["version"]
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 10**6, "new", "upsert"), ("d1", 10**6 + 1, None, "delete")],
            UPD_DDL,
        ),
        epoch_id=9,
    )
    old = t.as_of(v0)
    assert {r.val for r in old.current_state().where("doc_id='d0'").collect()} == {
        "v1-0"
    }
    ch = {(r.change_op, r.doc_id) for r in t.changes_since(v0).collect()}
    assert ch == {("update", "d0"), ("delete", "d1")}


def test_snapshots_summary_resolves_counts(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n_epochs=2)
    summaries = t.snapshots()
    assert summaries[-1]["version"] == t.snapshot["version"]
    assert summaries[-1]["n_files"] == len(t.snapshot["files"])
    assert summaries[-1]["rows"] == sum(f["rows"] for f in t.snapshot["files"])
