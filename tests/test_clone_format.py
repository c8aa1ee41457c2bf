"""Snapshot format versioning (`FORMAT_VERSION` / `FormatVersionError`)
and consistent single-snapshot clone (`clone_to`)."""

import json
import os

import pytest
from pyspark.sql import types as T

from hemera_indexer_spark.lake import (
    FormatVersionError,
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


def _mk(spark, root, n_epochs=3):
    t = LakeTable.create(spark, root, SCHEMA, num_buckets=2)
    for e in range(n_epochs):
        rows = [(f"d{i}", e * 100 + i, f"v{e}-{i}", "upsert")
                for i in range(10)]
        t.merge_upsert(
            spark.createDataFrame(
                rows, "doc_id string, seq long, val string, op string"
            ),
            epoch_id=e,
        )
    return t


def _state(t):
    return sorted(map(tuple, t.current_state().collect()))


def test_snapshots_carry_format_version(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    assert t.snapshot["format_version"] == 2


def test_newer_format_version_rejected_loudly(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n_epochs=1)
    v = t.snapshot["version"]
    spath = os.path.join(t.meta_dir, f"snap-{v:010d}.json")
    snap = json.load(open(spath))
    snap["format_version"] = 99
    open(spath, "w").write(json.dumps(snap))
    fresh = LakeTable(spark, t.root)
    with pytest.raises(FormatVersionError, match="99"):
        fresh.refresh()
    # legacy (absent field) stays readable
    del snap["format_version"]
    open(spath, "w").write(json.dumps(snap))
    assert LakeTable.load(spark, t.root).current_state().count() == 10


def test_clone_is_consistent_and_independent(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"))
    before = _state(src)
    epoch = src.committed_epoch()
    clone = src.clone_to(str(tmp_path / "clone"))
    assert _state(clone) == before
    assert clone.committed_epoch() == epoch  # ingest cursor rides along
    assert clone.snapshot["version"] == 0 and clone.snapshot["parent"] is None

    # independence: mutate source -> clone unchanged, and vice versa
    src.merge_upsert(
        spark.createDataFrame(
            [("d0", 999, "new", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=epoch + 1,
    )
    assert _state(LakeTable.load(spark, str(tmp_path / "clone"))) == before
    clone2 = LakeTable.load(spark, str(tmp_path / "clone"))
    clone2.merge_upsert(
        spark.createDataFrame(
            [("d1", 999, "clone-only", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=epoch + 1,
    )
    src.refresh()
    assert ("d1", 999, "clone-only") in _state(clone2)
    assert ("d1", 999, "clone-only") not in _state(src)


def test_clone_refuses_existing_destination(spark, tmp_path):
    from hemera_indexer_spark.lake import ConcurrentCommitError

    src = _mk(spark, str(tmp_path / "src"), n_epochs=1)
    src.clone_to(str(tmp_path / "c"))
    with pytest.raises(ConcurrentCommitError, match="already exists"):
        src.clone_to(str(tmp_path / "c"))


def _disk_payloads(root, key_val):
    """Every (val) payload stored on disk for a key, across ALL parquet
    files under the table root — the ground truth a purge must empty."""
    import glob

    import pyarrow.parquet as pq

    out = []
    for p in glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                       recursive=True):
        t = pq.read_table(p)
        cols = t.column_names
        if "doc_id" not in cols:
            continue
        d = t.to_pylist()
        out.extend(r.get("val") for r in d if r.get("doc_id") == key_val)
    return out


def test_purge_keys_removes_payload_from_disk(spark, tmp_path):
    """After purge_keys the purged doc's payload exists nowhere on disk
    (any retained file, any snapshot); the key survives only as a
    payload-NULL tombstone, other docs are untouched, and a stale replay
    of the purged doc is still fenced by the tombstone's seq."""
    root = str(tmp_path / "t")
    t = _mk(spark, root)
    assert _disk_payloads(root, "d3")  # payload is on disk pre-purge
    rep = t.purge_keys(["d3"])
    assert rep["keys"] == 1 and rep["files_vacuumed"] > 0
    vals = _disk_payloads(root, "d3")
    assert vals and all(v is None for v in vals)  # tombstone only
    state = {r["doc_id"] for r in t.current_state().collect()}
    assert "d3" not in state and "d4" in state and len(state) == 9
    # stale replay of the purged doc (old seq) must not resurrect it
    t.merge_upsert(
        spark.createDataFrame(
            [("d3", 5, "stale", "upsert")],
            "doc_id string, seq long, val string, op string",
        )
    )
    assert "d3" not in {r["doc_id"] for r in t.current_state().collect()}


def test_purge_keys_fact_table(spark, tmp_path):
    # fact schema: no is_deleted (facts are append-only; a NULL-filled
    # tombstone column would filter every row — see the schemas.py split)
    fact_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    root = str(tmp_path / "f")
    t = LakeTable.create(
        spark, root, fact_schema, num_buckets=2,
        properties={"table_type": "fact"},
    )
    for e in range(2):
        rows = [(f"d{i}", e * 100 + i, f"v{e}-{i}") for i in range(6)]
        t.insert_if_absent(
            spark.createDataFrame(
                rows, "doc_id string, seq long, val string"
            ),
            epoch_id=e,
        )
    before_n = t.current_state().count()
    rep = t.purge_keys(["d2"])
    assert rep["buckets_rewritten"] >= 1
    # payload gone from EVERY retained file; the (key, seq) skeleton
    # remains — it is the redelivery fence
    vals = _disk_payloads(root, "d2")
    assert vals and all(v is None for v in vals)
    got = {(r["doc_id"], r["val"]) for r in t.current_state().collect()
           if r["doc_id"] == "d2"}
    assert got == {("d2", None)} or all(v is None for _, v in got)
    assert t.current_state().count() == before_n  # rows never removed
    # a re-delivered duplicate of a purged row must NOT re-admit payload
    t.insert_if_absent(
        spark.createDataFrame(
            [("d2", 2, "v0-2")], "doc_id string, seq long, val string"
        )
    )
    assert all(v is None for v in _disk_payloads(root, "d2"))


def test_tags_name_snapshots(spark, tmp_path):
    """tag()/as_of_tag(): names stick across later commits, resolve to the
    exact tagged state, reject unknown names and unretained versions."""
    t = _mk(spark, str(tmp_path / "t"), n_epochs=2)
    t.tag("after-e1")
    state_at_tag = _state(t)
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 999, False, "later", "upsert")],
            "doc_id string, seq long, is_deleted boolean, val string, op string",
        ),
        epoch_id=5,
    )
    assert _state(t) != state_at_tag
    pinned = t.as_of_tag("after-e1")
    assert _state(pinned) == state_at_tag
    with pytest.raises(KeyError, match="no tag"):
        t.as_of_tag("nope")
    with pytest.raises(FileNotFoundError, match="not retained"):
        t.tag("bad", version=12345)
    # expiry wins over tags (documented): dropping history breaks the tag
    t.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        t.as_of_tag("after-e1")


def test_rollback_to_restores_state_as_new_commit(spark, tmp_path):
    """rollback_to(v): current state flips to the target's, as a NEW head
    (history retained — the rolled-past version stays time-travelable),
    the audit breadcrumb lands, the epoch fence rolls back with the data
    (a re-merge of the rolled-past epoch is accepted and converges), and
    head tags carry forward across the restore."""
    t = _mk(spark, str(tmp_path / "t"), n_epochs=3)  # versions 1..3
    head = t.snapshot["version"]
    full_state = _state(t)
    state_v2 = _state(t.as_of(2))
    assert full_state != state_v2
    t.tag("good-head")

    new_head = t.rollback_to(2)
    assert new_head == head + 2  # +1 for the tag commit, +1 for rollback
    assert _state(t) == state_v2
    assert t.snapshot["rollback_of"] == 2
    assert t.snapshot["parent"] == new_head - 1
    # history is intact: the rolled-past head still reads
    assert _state(t.as_of(head)) == full_state
    # tags carry forward (named pointers into retained history)
    assert _state(t.as_of_tag("good-head")) == full_state
    # fence rolled back with the data: re-merging epoch 2's rows converges
    rows = [(f"d{i}", 200 + i, False, f"v2-{i}", "upsert") for i in range(10)]
    t.merge_upsert(
        spark.createDataFrame(
            rows,
            "doc_id string, seq long, is_deleted boolean, val string, op string",
        ),
        epoch_id=2,
    )
    assert _state(t) == full_state


def test_fsck_integrity_audit(spark, tmp_path):
    """fsck(): clean on a healthy table (incl. deep footer cross-check,
    WAP stage present, history retained); flags a deleted data file, a
    truncated file's corrupt footer, and a stage whose parent expired —
    and never mutates anything."""
    t = _mk(spark, str(tmp_path / "t"), n_epochs=3)
    t.merge_upsert(
        spark.createDataFrame(
            [("w1", 10_000, False, "staged", "upsert")],
            "doc_id string, seq long, is_deleted boolean, val string, op string",
        ),
        wap_id="audit-me",
    )
    rep = t.fsck(deep=True)
    assert rep["ok"], rep["issues"]
    assert rep["checked"]["live_files"] > 0
    assert rep["checked"]["staged"] == 1
    assert rep["checked"]["deep_footers"] == rep["checked"]["live_files"]
    v = t.snapshot["version"]

    # break things: delete one live file, truncate another
    files = [f["path"] for f in t.snapshot["files"]]
    os.remove(os.path.join(t.root, files[0]))
    with open(os.path.join(t.root, files[1]), "r+b") as fh:
        fh.truncate(os.path.getsize(os.path.join(t.root, files[1])) // 2)
    rep2 = t.fsck(deep=True)
    kinds = {i["kind"] for i in rep2["issues"]}
    assert not rep2["ok"]
    assert "missing_file" in kinds and "corrupt_footer" in kinds
    # fsck mutated nothing
    t.refresh()
    assert t.snapshot["version"] == v

    # a stage whose parent expired can never publish — flagged
    t2 = _mk(spark, str(tmp_path / "t2"), n_epochs=3)
    t2.merge_upsert(
        spark.createDataFrame(
            [("w2", 10_001, False, "old-stage", "upsert")],
            "doc_id string, seq long, is_deleted boolean, val string, op string",
        ),
        wap_id="stale",
    )
    t2.tag("x")
    t2.tag("y")
    t2.expire_snapshots(keep_last=2)
    rep3 = t2.fsck()
    assert {i["kind"] for i in rep3["issues"]} == {"stage_parent_expired"}


def test_analyze_column_stats(spark, tmp_path):
    """analyze(exact=True): ndv/nulls/min/max over the RESOLVED live state
    match hand-computed truth, commit as version-stamped properties,
    column_stats() reads them back, and table_health reports the lag as
    more commits land. Unknown columns raise; nested/binary are skipped
    by default."""
    t = _mk(spark, str(tmp_path / "t"), n_epochs=2)  # d0..d9, seq 100+i wins
    stats = t.analyze(exact=True)
    # is_deleted is consumed by the live fold — not part of the state
    assert set(stats) == {"doc_id", "seq", "val"}
    assert stats["doc_id"] == {
        "ndv": 10, "nulls": 0, "min": "d0", "max": "d9",
        "version": 2,
    }
    assert stats["seq"]["ndv"] == 10 and stats["seq"]["max"] == 109
    assert t.column_stats()["val"]["min"] == "v1-0"
    h = t.table_health()
    assert h["colstats_lag"] == h["version"] - 2
    with pytest.raises(KeyError, match="unknown columns"):
        t.analyze(cols=["nope"])
    # lag grows with commits; re-analyze resets it
    t.tag("x")
    assert t.table_health()["colstats_lag"] > h["colstats_lag"]
    t.analyze(cols=["seq"], exact=True)
    assert t.column_stats()["seq"]["version"] == t.snapshot["version"] - 1
    # doc_id stats survive (older version stamp) — lag reflects the oldest
    assert t.table_health()["colstats_lag"] >= 2


def test_rollback_to_guards(spark, tmp_path):
    """rollback_to: head is a no-op, unretained versions raise loudly, a
    live repair_lock refuses, and a stale transient lock in the TARGET is
    not resurrected."""
    t = _mk(spark, str(tmp_path / "t"), n_epochs=2)
    head = t.snapshot["version"]
    assert t.rollback_to(head) == head  # no-op, no commit
    assert t.snapshot["version"] == head
    with pytest.raises(FileNotFoundError, match="not retained"):
        t.rollback_to(999)
    # a live repair lock on the head refuses the restore
    t.update_properties({"repair_lock": "runner-1"})
    from hemera_indexer_spark.lake import ConcurrentCommitError

    with pytest.raises(ConcurrentCommitError, match="repair_range lock"):
        t.rollback_to(1)
    # clearing the lock unblocks; the TARGET's own lock (version with the
    # property set) must not ride along into the restored head
    lock_v = t.snapshot["version"]
    t.update_properties({"repair_lock": None})
    t.rollback_to(lock_v)
    assert "repair_lock" not in t.snapshot["properties"]


def test_purge_keys_is_rerunnable_after_partial_failure(spark, tmp_path):
    """Each purge step is an atomic snapshot flip, so a crash between
    steps leaves a consistent table and RE-RUNNING purge_keys converges
    to the same disk-level guarantee (idempotent composition: unfenced
    tombstone merge = LWW no-op, compact/expire/vacuum all re-runnable)."""
    root = str(tmp_path / "t")
    t = _mk(spark, root)
    # simulate a crash after step 1 (tombstone landed, nothing compacted)
    t.merge_upsert(
        spark.createDataFrame(
            [("d7", 10_000, "delete")], "doc_id string, seq long, op string"
        )
    )
    assert any(v is not None for v in _disk_payloads(root, "d7"))
    # operator re-runs the whole purge
    rep = t.purge_keys(["d7"])
    vals = _disk_payloads(root, "d7")
    assert vals and all(v is None for v in vals)
    assert "d7" not in {r["doc_id"] for r in t.current_state().collect()}
    # and a second full purge is a clean no-op on state
    before = _state(t)
    t.purge_keys(["d7"])
    assert _state(t) == before


def test_lake_admin_cli_verbs(spark, tmp_path):
    """scripts/lake_admin.py: health / tag / clone / purge round-trip in
    real subprocesses (one JSON line each), against a table built here."""
    import json as _json
    import subprocess
    import sys as _sys

    root = str(tmp_path / "t")
    _mk(spark, root, n_epochs=2)

    def admin(*argv):
        r = subprocess.run(
            [_sys.executable, "scripts/lake_admin.py", root, *argv],
            capture_output=True, text=True, timeout=300,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return _json.loads(r.stdout.strip().splitlines()[-1])

    h = admin("health")
    assert h["rows_total"] > 0 and h["committed_epoch"] == 1
    tg = admin("tag", "rc1")
    assert tg["tagged"] == "rc1"
    rb = admin("rollback", "--version", "1")
    assert rb["rolled_back_to"] == 1 and rb["committed_epoch"] == 0
    rb2 = admin("rollback", "--version", str(rb["new_head"] - 2))
    assert rb2["committed_epoch"] == 1  # restored forward again
    cl = admin("clone", str(tmp_path / "c"))
    assert cl["committed_epoch"] == 1 and cl["rows"] > 0
    cp = admin("compact")
    assert cp["compacted"] in (True, False)
    ex = admin("expire", "--keep-last", "2")
    assert ex["snapshots_expired"] >= 0
    vc = admin("vacuum")
    assert vc["files_vacuumed"] >= 0
    pg = admin("purge", "d1,d2")
    assert pg["keys"] == 2 and pg["files_vacuumed"] > 0
    left = {r["doc_id"] for r in LakeTable.load(spark, root)
            .current_state().collect()}
    assert not {"d1", "d2"} & left and len(left) == 8
    # write-audit-publish verbs: stage in-process, drive the rest via CLI
    t = LakeTable.load(spark, root)
    t.merge_upsert(
        spark.createDataFrame(
            [("w1doc", 10_000, "staged", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        wap_id="rc-wap",
    )
    st = admin("staged")
    assert [s["wap_id"] for s in st["staged"]] == ["rc-wap"]
    pub = admin("publish", "rc-wap")
    t.refresh()
    assert pub["published_version"] == t.snapshot["version"]
    assert "w1doc" in {r["doc_id"] for r in t.current_state().collect()}
    assert admin("staged")["staged"] == []


def test_lake_admin_ivf_verbs(spark, tmp_path):
    """scripts/lake_admin.py ivf-*: build / drift / maintain round-trip in
    real subprocesses against an embeddings source table mutated between
    calls — the operational loop an index operator actually runs."""
    import json as _json
    import subprocess
    import sys as _sys

    src_root = str(tmp_path / "emb")
    idx_root = str(tmp_path / "ivf")
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    src = LakeTable.create(spark, src_root, schema, num_buckets=4,
                           key_col="vec_id", seq_col="seq")
    src.bulk_load(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
    )

    def admin(*argv):
        r = subprocess.run(
            [_sys.executable, "scripts/lake_admin.py", idx_root, *argv,
             "--source", src_root],
            capture_output=True, text=True, timeout=300,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return _json.loads(r.stdout.strip().splitlines()[-1])

    b = admin("ivf-build", "--ncells", "8")
    assert b["ncells"] == 8 and b["rows_at_train"] > 0
    d = admin("ivf-drift")
    assert d["drift"] == 0.0
    m = admin("ivf-maintain")
    assert m["action"] == "noop"
    # small mutation -> maintain syncs incrementally
    src.merge_upsert(
        spark.createDataFrame(
            [(90001, 100, [1.0] * 64, "update")],
            "vec_id long, seq long, embedding array<float>, op string",
        ),
        epoch_id=1,
    )
    m = admin("ivf-maintain", "--max-drift", "0.5")
    assert m["action"] == "sync"
    # mass mutation past the drift threshold -> maintain retrains
    n = b["rows_at_train"]
    rows = [(91000 + i, 200 + i, [float(i % 7)] * 64, "update")
            for i in range(n // 2 + 1)]
    src.merge_upsert(
        spark.createDataFrame(
            rows, "vec_id long, seq long, embedding array<float>, op string"
        ),
        epoch_id=2,
    )
    m = admin("ivf-maintain", "--max-drift", "0.5")
    assert m["action"] == "retrain"
    assert m["trained_version"] == LakeTable.load(spark, src_root).snapshot["version"]


def test_purge_keys_long_keyed_table_hits_right_bucket(spark, tmp_path):
    """Regression: bucket ids must come from bucket_col over the key
    COLUMN's type — xxhash64 of a Python-int literal (IntegerType) and of
    a LongType column value differ, which would compact the WRONG bucket
    and silently retain the payload on disk."""
    import glob

    import pyarrow.parquet as pq

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("val", T.StringType()),
        ]
    )
    root = str(tmp_path / "lk")
    t = LakeTable.create(spark, root, schema, num_buckets=8)
    rows = [(i, 100 + i, f"v{i}", "upsert") for i in range(20)]
    t.merge_upsert(
        spark.createDataFrame(
            rows, "doc_id long, seq long, val string, op string"
        ),
        epoch_id=0,
    )
    t.purge_keys([5])
    leaked = []
    for p in glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                       recursive=True):
        for r in pq.read_table(p).to_pylist():
            if r.get("doc_id") == 5 and r.get("val") is not None:
                leaked.append(p)
    assert not leaked
    assert 5 not in {r["doc_id"] for r in t.current_state().collect()}


def test_purge_keys_statless_footer_falls_back_to_scan(spark, tmp_path):
    """Regression (ADVICE r4): if the file holding the true max(seq) lost
    its footer max_seq stat, deriving the tombstone seq from stats alone
    (with default 0 / skip-None) could stamp a LOSING seq — the purge
    would silently retain the payload while reporting success. The fix
    scans exactly the stats-less files for the real max."""
    root = str(tmp_path / "t")
    t = _mk(spark, root)  # seqs up to 2*100+9 = 209
    # simulate a stats-less file: null out max_seq on the file that holds
    # the highest seq (a pre-stats writer / foreign tool would do this).
    # v2 metadata: entries live in the per-bucket manifest files the
    # snapshot points at — tamper with those in place (readers don't
    # re-verify the content hash)
    hi = max(
        f["max_seq"] for f in t.snapshot["files"] if f["max_seq"] is not None
    )
    v = t.snapshot["version"]
    spath = os.path.join(t.meta_dir, f"snap-{v:010d}.json")
    for mname in set(json.load(open(spath))["file_manifests"].values()):
        mpath = os.path.join(t.meta_dir, mname)
        entries = json.load(open(mpath))
        for f in entries:
            if f["max_seq"] == hi:
                f["max_seq"] = None
        open(mpath, "w").write(json.dumps(entries))
    t = LakeTable.load(spark, root)
    t.purge_keys(["d3"])
    # the tombstone must have out-sequenced the hidden max: d3 stays gone
    assert "d3" not in {r["doc_id"] for r in t.current_state().collect()}
    vals = _disk_payloads(root, "d3")
    assert all(v is None for v in vals)


def test_clone_strips_transient_operational_properties(spark, tmp_path):
    """Regression (ADVICE r4): tag:* entries point at SOURCE snapshot
    versions that don't exist in the version-0 clone (as_of_tag would
    500), and a live repair_lock would block repairs on the clone until
    TTL. Both are stripped; ordinary properties ride along."""
    src = _mk(spark, str(tmp_path / "src"))
    src.tag("golden")
    src.update_properties({"repair_lock": "runner-x:9999999999",
                           "custom_prop": "keep-me"})
    clone = src.clone_to(str(tmp_path / "clone"))
    props = clone.snapshot["properties"]
    assert "repair_lock" not in props
    assert not any(k.startswith("tag:") for k in props)
    assert props["custom_prop"] == "keep-me"
    with pytest.raises(KeyError):
        clone.as_of_tag("golden")
