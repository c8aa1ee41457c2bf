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


def test_controller_advances_catalog_per_group(spark, tiny_log, tmp_path):
    """StreamController(catalog=): after a full CDC replay with a
    SecondaryIndexSink, the catalog pins state + index at a mutually-
    consistent point — a catalog reader's index lookup answers exactly
    what filtering the catalog's state view answers, and both pins equal
    the live heads (the last group's advance saw everything, including
    post-group layout maintenance)."""
    from pyspark.sql import functions as F

    from hemera_indexer_spark.lake import LakeCatalog
    from hemera_indexer_spark.operators.secondary_index import SecondaryIndex
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
    from hemera_indexer_spark.streaming import StreamController
    from hemera_indexer_spark.streaming.sinks import SecondaryIndexSink

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    idx = SecondaryIndex.build_from_table(
        spark, str(tmp_path / "idx"), table, "n_tok", num_buckets=4
    )
    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    cat.register("state", table.root)
    cat.register("index", idx.table.root)
    cv0 = cat.snapshot["version"]
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        sinks=[SecondaryIndexSink(table, idx, maintain_after=1)],
        catalog=cat, catalog_tables=["state", "index"],
    ).run()
    assert cat.snapshot["version"] > cv0  # advanced at least once
    live_state = LakeTable.load(spark, table.root).snapshot["version"]
    live_index = LakeTable.load(spark, idx.table.root).snapshot["version"]
    assert cat.versions() == {"state": live_state, "index": live_index}
    # cross-table consistency of the pinned pair: the index's sorted
    # projection answers the same rows as filtering the pinned state
    view = cat.read_view()
    want = {
        (r["doc_id"], r["n_tok"])
        for r in view["state"].current_state()
        .where(F.col("n_tok").between(10, 25))
        .collect()
    }
    got = {tuple(r) for r in idx.lookup(10, 25).collect()}
    assert got == want and got


def test_run_ingest_catalog_dir_cli(spark, tmp_path):
    """scripts/run_ingest.py --catalog-dir: the catalog is auto-created,
    state + secondary index register under fixed names, and after the run
    the pins equal the live heads; a resumed run reuses the existing
    catalog (no re-register error)."""
    import subprocess
    import sys as _sys

    from hemera_indexer_spark.lake import LakeCatalog
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = ChangelogSpec(
        n_docs=80, n_epochs=3, events_per_epoch=150, n_partitions=2,
        seed=5, schema_evolution_epoch=None, rollback_epochs=(),
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(log_dir, spec)
    root, idx_dir, cat_dir = (
        str(tmp_path / "lake"), str(tmp_path / "idx"), str(tmp_path / "cat")
    )

    def cli():
        res = subprocess.run(
            [
                _sys.executable,
                os.path.join(repo, "scripts", "run_ingest.py"),
                "--log-dir", log_dir, "--table-root", root,
                "--partitions", "2", "--num-buckets", "4", "--cores", "2",
                "--secidx-dir", idx_dir, "--catalog-dir", cat_dir,
            ],
            capture_output=True, text=True, cwd=repo, timeout=300,
        )
        lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
        assert lines, res.stdout[-1500:] + "\n" + res.stderr[-3000:]
        return json.loads(lines[-1])

    out = cli()
    assert out["committed_epoch"] == spec.n_epochs - 1
    cat = LakeCatalog.load(spark, cat_dir)
    assert set(cat.versions()) == {"state", "sec_index"}
    assert cat.versions() == {
        "state": LakeTable.load(spark, root).snapshot["version"],
        "sec_index": LakeTable.load(spark, idx_dir).snapshot["version"],
    }
    # resume run: existing catalog reused, nothing re-registered, pins hold
    out2 = cli()
    assert out2["committed_epoch"] == spec.n_epochs - 1
    cat2 = LakeCatalog.load(spark, cat_dir)
    assert set(cat2.versions()) == {"state", "sec_index"}


def test_catalog_view_pins_across_out_of_band_commits(spark, tmp_path):
    """Out-of-band table commits don't move the catalog view until the
    next catalog transaction touches that table."""
    cat, a, b = _mk(spark, tmp_path)
    a.merge_upsert(_batch(spark, "a"), epoch_id=1)  # direct, no catalog
    assert _val(LakeTable.load(spark, a.root), "d0") == "a-new"
    assert _val(cat.table("a"), "d0") == "a0"  # catalog still pinned


def test_catalog_expire_bounds_metadata(spark, tmp_path):
    cat, a, b = _mk(spark, tmp_path)
    for e in range(1, 9):
        a.merge_upsert(
            spark.createDataFrame(
                [("d0", 100 + e, f"v{e}", "upsert")],
                "doc_id string, seq long, val string, op string",
            ),
            epoch_id=e,
        )
        cat.advance(["a"])
    n_files = lambda: len(
        [f for f in os.listdir(cat.root) if f.startswith("cat-")]
    )
    assert n_files() > 4
    removed = cat.expire(keep_last=3)
    assert removed > 0 and n_files() == 3
    # current pointer still resolves; pinned table reads still work
    fresh = LakeCatalog.load(spark, cat.root)
    assert _val(fresh.table("a"), "d0") == "v8"


def test_catalog_fsck(spark, tmp_path):
    """cat.fsck(): clean on a healthy catalog; flags a pin the member
    table expired (the pinned-reads-404 failure mode), a lingering
    publish intent, and — with tables_deep — a member table's own
    integrity issue rolled up under its name. Read-only throughout."""
    cat, a, b = _mk(spark, tmp_path)
    rep = cat.fsck(tables_deep=True)
    assert rep["ok"], rep["issues"]
    assert rep["checked"]["tables"] == 2
    assert rep["checked"]["tables_deep"] == 2

    # expire a's history past the catalog pin -> pinned reads would 404
    for e in range(1, 4):
        a.merge_upsert(
            spark.createDataFrame(
                [("d0", 100 + e, f"n{e}", "upsert")],
                "doc_id string, seq long, val string, op string",
            ),
            epoch_id=e,
        )
    a.expire_snapshots(keep_last=1)
    rep2 = cat.fsck()
    assert not rep2["ok"]
    assert {i["kind"] for i in rep2["issues"]} == {"pinned_version_expired"}
    assert rep2["issues"][0]["table"] == "a"
    # advance() repins at the heads -> clean again
    cat.advance()
    assert cat.fsck()["ok"]

    # lingering intent file -> actionable issue
    with open(os.path.join(cat.root, "txn.json"), "w") as f:
        f.write("{}")
    assert {i["kind"] for i in cat.fsck()["issues"]} == {"pending_intent"}
    os.remove(os.path.join(cat.root, "txn.json"))

    # deep cascade: break a member table's data file
    victim = os.path.join(b.root, b.snapshot["files"][0]["path"])
    os.remove(victim)
    rep3 = cat.fsck(tables_deep=True)
    kinds = {(i["kind"], i.get("table")) for i in rep3["issues"]}
    assert ("missing_file", "b") in kinds
    # the metadata-level catalog check alone stays clean (pin retained)
    assert cat.fsck()["ok"]


def test_catalog_claim_is_exclusive_and_probes_forward(spark, tmp_path):
    """Same commit discipline as the table: the claimed cat file IS the
    commit; a stale-handle write loses loudly (never clobbers), and a
    claimed-but-unflipped catalog commit is the head readers resolve."""
    cat, a, b = _mk(spark, tmp_path)
    v = cat.snapshot["version"]
    # hand-claim v+1 (committer crashed before the pointer write)
    snap = dict(cat.snapshot)
    snap = {"version": v + 1, "parent": v, "tables": dict(snap["tables"])}
    with open(os.path.join(cat.root, f"cat-{v + 1:010d}.json"), "w") as f:
        json.dump(snap, f)
    fresh = LakeCatalog.load(spark, cat.root)
    assert fresh.snapshot["version"] == v + 1
    # the stale handle's next commit sees the probed head and loses loudly
    with pytest.raises(ConcurrentCommitError):
        cat.register("c", a.root)
    cat.refresh()
    assert cat.snapshot["version"] == v + 1
    cat.register("c", a.root)  # refresh-and-retry converges
    assert cat.snapshot["version"] == v + 2
