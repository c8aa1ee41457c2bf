"""LakeCatalog: atomic multi-table publish over WAP stages.

The invariant under test: catalog READERS (``read_view`` / ``table``)
never observe a torn pair — either every table of a transaction is
visible or none is — even when the publisher crashes between per-table
pointer flips; ``recover()`` then completes the transaction exactly once.
"""

import json
import os

import pytest
from pyspark.sql import types as T

from hemera_indexer_spark.lake import (
    CatalogTxnError,
    ConcurrentCommitError,
    LakeCatalog,
    LakeTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("val", T.StringType()),
    ]
)


def _mk_table(spark, root, tag):
    t = LakeTable.create(spark, root, SCHEMA, num_buckets=2)
    t.merge_upsert(
        spark.createDataFrame(
            [(f"d{i}", i + 1, f"{tag}{i}", "upsert") for i in range(5)],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=0,
    )
    return t


def _mk(spark, tmp_path):
    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    a = _mk_table(spark, str(tmp_path / "a"), "a")
    b = _mk_table(spark, str(tmp_path / "b"), "b")
    cat.register("a", a.root)
    cat.register("b", b.root)
    return cat, a, b


def _batch(spark, tag):
    return spark.createDataFrame(
        [("d0", 100, f"{tag}-new", "upsert")],
        "doc_id string, seq long, val string, op string",
    )


def _val(t, doc):
    return {r["doc_id"]: r["val"] for r in t.current_state().collect()}[doc]


def test_publish_all_atomic_happy_path(spark, tmp_path):
    cat, a, b = _mk(spark, tmp_path)
    v0 = cat.versions()
    assert a.merge_upsert(_batch(spark, "a"), epoch_id=1, wap_id="wa")
    assert b.merge_upsert(_batch(spark, "b"), epoch_id=1, wap_id="wb")
    # staged => catalog view unchanged
    assert _val(cat.table("a"), "d0") == "a0"
    published = cat.publish_all({"a": "wa", "b": "wb"})
    assert published == {"a": v0["a"] + 1, "b": v0["b"] + 1}
    assert cat.versions() == published
    view = cat.read_view()
    assert _val(view["a"], "d0") == "a-new"
    assert _val(view["b"], "d0") == "b-new"
    # stages consumed; tables' own fences took effect
    assert a.staged_snapshots() == [] and b.staged_snapshots() == []


def test_publish_all_validates_before_touching_anything(spark, tmp_path):
    cat, a, b = _mk(spark, tmp_path)
    assert a.merge_upsert(_batch(spark, "a"), epoch_id=1, wap_id="wa")
    # b's stage is built on a head that then moves -> whole txn refused
    assert b.merge_upsert(_batch(spark, "b"), epoch_id=1, wap_id="wb")
    b.merge_upsert(
        spark.createDataFrame(
            [("d4", 200, "moved", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=2,
    )
    with pytest.raises(ConcurrentCommitError, match="re-stage"):
        cat.publish_all({"a": "wa", "b": "wb"})
    # NOTHING published: a's stage intact, catalog view unchanged, no lock
    assert [s["wap_id"] for s in a.staged_snapshots()] == ["wa"]
    assert _val(cat.table("a"), "d0") == "a0"
    assert not os.path.exists(os.path.join(cat.root, "txn.json"))
    # unknown stage / unknown table fail the same way
    with pytest.raises(KeyError):
        cat.publish_all({"a": "nope"})
    with pytest.raises(KeyError, match="not in catalog"):
        cat.publish_all({"zz": "wa"})


def test_crash_mid_publish_invisible_then_recovered(spark, tmp_path):
    cat, a, b = _mk(spark, tmp_path)
    assert a.merge_upsert(_batch(spark, "a"), epoch_id=1, wap_id="wa")
    assert b.merge_upsert(_batch(spark, "b"), epoch_id=1, wap_id="wb")

    # crash AFTER table a's pointer flip, BEFORE table b's
    real = LakeTable.publish_staged
    calls = []

    def boom(self, wap_id):
        if calls:
            raise RuntimeError("simulated crash")
        calls.append(wap_id)
        return real(self, wap_id)

    LakeTable.publish_staged = boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            cat.publish_all({"a": "wa", "b": "wb"})
    finally:
        LakeTable.publish_staged = real

    # direct reader of a sees the flip (read-committed per table)...
    assert _val(LakeTable.load(spark, a.root), "d0") == "a-new"
    # ...but a fresh CATALOG reader sees the OLD consistent pair
    fresh = LakeCatalog.load(spark, cat.root)
    view = fresh.read_view()
    assert _val(view["a"], "d0") == "a0"
    assert _val(view["b"], "d0") == "b0"
    # a second transaction is refused while the intent is pending
    with pytest.raises(CatalogTxnError, match="pending"):
        fresh.publish_all({"a": "whatever"})
    # recovery completes the txn: a's step is detected as already
    # published (stage gone, version at target), b's publishes now
    published = fresh.recover()
    assert set(published) == {"a", "b"}
    view = fresh.read_view()
    assert _val(view["a"], "d0") == "a-new"
    assert _val(view["b"], "d0") == "b-new"
    assert fresh.recover() is None  # nothing pending anymore


def test_recover_refuses_lost_stage(spark, tmp_path):
    cat, a, b = _mk(spark, tmp_path)
    assert a.merge_upsert(_batch(spark, "a"), epoch_id=1, wap_id="wa")
    target = a.staged_snapshots()[0]["version"]
    # forge an intent whose stage file is gone and table never reached it
    os.remove(os.path.join(a.meta_dir, "wap-wa.json"))
    intent = {
        "txn_id": "t1",
        "catalog_parent": cat.snapshot["version"],
        "steps": [
            {"name": "a", "root": a.root, "wap_id": "wa",
             "parent": target - 1, "target": target}
        ],
    }
    with open(os.path.join(cat.root, "txn.json"), "w") as f:
        f.write(json.dumps(intent))
    with pytest.raises(ConcurrentCommitError, match="vanished"):
        cat.recover()


def test_register_mid_txn_survives_catalog_flip(spark, tmp_path):
    """A register() racing the transaction's catalog flip is kept: the
    flip applies on the CURRENT head, not the intent's parent."""
    cat, a, b = _mk(spark, tmp_path)
    assert a.merge_upsert(_batch(spark, "a"), epoch_id=1, wap_id="wa")
    c = _mk_table(spark, str(tmp_path / "c"), "c")

    real = LakeTable.publish_staged

    def publish_then_register(self, wap_id):
        v = real(self, wap_id)
        # another process registers a table between publish and the flip
        LakeCatalog.load(self.spark, cat.root).register("c", c.root)
        return v

    LakeTable.publish_staged = publish_then_register
    try:
        cat.publish_all({"a": "wa"})
    finally:
        LakeTable.publish_staged = real
    fresh = LakeCatalog.load(spark, cat.root)
    assert set(fresh.versions()) == {"a", "b", "c"}
    assert _val(fresh.table("a"), "d0") == "a-new"
    assert _val(fresh.table("c"), "d0") == "c0"


def test_advance_repins_in_one_commit(spark, tmp_path):
    """advance(): the read-side companion to publish_all — re-pin tables
    at their current versions in ONE catalog commit (controller calls it
    after state commit + index sync so catalog readers see the pair move
    together). No-op when nothing moved."""
    cat, a, b = _mk(spark, tmp_path)
    cv0 = cat.snapshot["version"]
    assert cat.advance() == cat.versions()
    assert cat.snapshot["version"] == cv0  # nothing moved -> no commit
    a.merge_upsert(_batch(spark, "a"), epoch_id=1)
    b.merge_upsert(_batch(spark, "b"), epoch_id=1)
    assert _val(cat.table("a"), "d0") == "a0"  # still pinned pre-advance
    pinned = cat.advance()
    assert cat.snapshot["version"] == cv0 + 1  # ONE commit for both
    assert pinned == {"a": a.snapshot["version"] + 1,
                      "b": b.snapshot["version"] + 1} or pinned == {
        "a": LakeTable.load(spark, a.root).snapshot["version"],
        "b": LakeTable.load(spark, b.root).snapshot["version"],
    }
    assert _val(cat.table("a"), "d0") == "a-new"
    assert _val(cat.table("b"), "d0") == "b-new"
    # selective advance moves only the named table
    a2 = LakeTable.load(spark, a.root)
    a2.merge_upsert(
        spark.createDataFrame(
            [("d0", 300, "a-newer", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=2,
    )
    cat.advance(["b"])
    assert _val(cat.table("a"), "d0") == "a-new"
    cat.advance(["a"])
    assert _val(cat.table("a"), "d0") == "a-newer"


def test_lake_admin_catalog_verbs(spark, tmp_path):
    """scripts/lake_admin.py cat-*: create / register / publish / recover
    in real subprocesses (one JSON line each) — the operator workflow for
    a coordinated two-table release."""
    import subprocess
    import sys as _sys

    a = _mk_table(spark, str(tmp_path / "a"), "a")
    b = _mk_table(spark, str(tmp_path / "b"), "b")
    cat_root = str(tmp_path / "cat")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def admin(*argv):
        r = subprocess.run(
            [_sys.executable, "scripts/lake_admin.py", cat_root, *argv],
            capture_output=True, text=True, timeout=300, cwd=repo,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    assert admin("cat-create")["catalog_created"] == cat_root
    admin("cat-register", f"a={a.root}")
    admin("cat-register", f"b={b.root}")
    v = admin("cat-versions")
    assert set(v["tables"]) == {"a", "b"}
    assert a.merge_upsert(_batch(spark, "a"), epoch_id=1, wap_id="wa")
    assert b.merge_upsert(_batch(spark, "b"), epoch_id=1, wap_id="wb")
    pub = admin("cat-publish", "a=wa,b=wb")
    assert set(pub["published"]) == {"a", "b"}
    cat = LakeCatalog.load(spark, cat_root)
    assert _val(cat.table("a"), "d0") == "a-new"
    assert _val(cat.table("b"), "d0") == "b-new"
    assert admin("cat-recover")["recovered"] is None
    # out-of-band commit + cat-advance re-pins via the CLI
    a2 = LakeTable.load(spark, a.root)
    a2.merge_upsert(
        spark.createDataFrame(
            [("d0", 500, "a-cli", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=2,
    )
    pin = admin("cat-advance", "a")
    assert pin["pinned"]["a"] == a2.snapshot["version"]


def test_catalog_view_pins_across_out_of_band_commits(spark, tmp_path):
    """Out-of-band table commits don't move the catalog view until the
    next catalog transaction touches that table."""
    cat, a, b = _mk(spark, tmp_path)
    a.merge_upsert(_batch(spark, "a"), epoch_id=1)  # direct, no catalog
    assert _val(LakeTable.load(spark, a.root), "d0") == "a-new"
    assert _val(cat.table("a"), "d0") == "a0"  # catalog still pinned
