"""Named branches (Iceberg v2 refs analog): branch commits are invisible
to main, share data files/manifests with main, survive vacuum while open,
fast-forward into main as pure metadata when main hasn't moved, and are
CAS-rejected when it has. Main-domain verbs raise on branch handles, and
purge_keys refuses to run while a branch (or stage) pins history."""

import json
import os
import subprocess
import sys

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


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, seq long, val string, op string"
    )


def test_branch_commits_invisible_to_main(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "lake"))
    before = _state(t)
    br = t.create_branch("audit")
    br.merge_upsert(
        _batch(spark, [("d3", 100, "branched", "upsert"),
                       ("x1", 101, "new", "upsert")]),
        epoch_id=1,
    )
    # branch sees its own head; main is untouched on disk and in memory
    assert _state(br)["d3"] == (100, "branched")
    assert "x1" in _state(br)
    t.refresh()
    assert _state(t) == before
    assert t.snapshot["version"] == br.snapshot["version"] - 1
    summaries = t.branches()
    assert [b["name"] for b in summaries] == ["audit"]
    assert summaries[0]["commits"] == 1
    assert summaries[0]["head_epoch"] == 1


def test_branch_multi_commit_then_fast_forward(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "lake"))
    head0 = t.snapshot["version"]
    br = t.create_branch("fix")
    br.merge_upsert(
        _batch(spark, [("d1", 200, "a", "upsert")]), epoch_id=1
    )
    br.merge_upsert(
        _batch(spark, [("d2", 201, None, "delete"),
                       ("y1", 202, "b", "upsert")]),
        epoch_id=2,
    )
    want = _state(br)
    new_head = t.fast_forward("fix")
    assert new_head == head0 + 2
    assert _state(t) == want
    # the branch head's fence became main's fence
    assert t.committed_epoch() == 2
    assert t.branches() == []
    # history is linear through the fast-forwarded commits
    assert t.fsck()["ok"]
    # fast-forward was metadata-only: the branch's data files ARE the
    # live files — vacuum collects no parquet (only _SUCCESS/.crc
    # sidecars, which every commit leaves behind)
    live = [os.path.join(t.root, f["path"]) for f in t.snapshot["files"]]
    t.vacuum_orphans()
    assert all(os.path.exists(p) for p in live)
    assert _state(t) == want
    # main keeps committing normally afterwards
    t.merge_upsert(_batch(spark, [("z1", 300, "c", "upsert")]), epoch_id=3)
    assert _state(t)["z1"] == (300, "c")


def test_fast_forward_rejected_after_main_diverges(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "lake"))
    br = t.create_branch("stale")
    br.merge_upsert(_batch(spark, [("d1", 200, "a", "upsert")]), epoch_id=1)
    t.merge_upsert(_batch(spark, [("d9", 201, "m", "upsert")]), epoch_id=1)
    with pytest.raises(ConcurrentCommitError, match="forked at"):
        t.fast_forward("stale")
    # the branch itself still reads fine and can be dropped
    assert _state(br)["d1"] == (200, "a")
    assert t.drop_branch("stale") == 1


def test_branch_files_survive_vacuum_until_drop(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "lake"))
    br = t.create_branch("wip")
    br.merge_upsert(_batch(spark, [("d1", 200, "a", "upsert")]), epoch_id=1)
    branch_files = {
        f["path"] for f in br.snapshot["files"]
    } - {f["path"] for f in t.snapshot["files"]}
    assert branch_files, "branch commit wrote new files"
    t.vacuum_orphans()
    for rel in branch_files:
        assert os.path.exists(os.path.join(t.root, rel))
    # after drop, the branch-only files are orphans and get collected
    t.drop_branch("wip")
    assert t.vacuum_orphans() >= len(branch_files)
    for rel in branch_files:
        assert not os.path.exists(os.path.join(t.root, rel))
    assert _state(t)["d1"] == (2, "v1")  # main unharmed


def test_branch_readable_after_main_expires_fork_point(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "lake"))
    br = t.create_branch("longlived")
    for i in range(12):  # push main far past the fork
        t.merge_upsert(
            _batch(spark, [(f"m{i}", 500 + i, "x", "upsert")]),
            epoch_id=1 + i,
        )
    t.expire_snapshots(keep_last=2)
    # branch snap 0 is a COPY of the fork point: still readable
    assert _state(br)["d3"] == (4, "v3")
    br.merge_upsert(_batch(spark, [("b1", 900, "y", "upsert")]), epoch_id=99)
    assert _state(br)["b1"] == (900, "y")
    assert t.fsck()["ok"]


def test_branch_handle_guards(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "lake"))
    br = t.create_branch("guarded")
    for verb in (
        lambda: br.tag("t1"),
        lambda: br.rollback_to(0),
        lambda: br.as_of_epoch(0),
        lambda: br.key_history("d1"),
        lambda: br.purge_keys(["d1"]),
        lambda: br.expire_snapshots(),
        lambda: br.vacuum_orphans(),
        lambda: br.create_branch("nested"),
        lambda: br.fast_forward("guarded"),
        lambda: br.drop_branch("guarded"),
    ):
        with pytest.raises(ValueError, match="main-table verb"):
            verb()
    with pytest.raises(ValueError, match="WAP staging"):
        br.merge_upsert(
            _batch(spark, [("d1", 999, "w", "upsert")]),
            epoch_id=5,
            wap_id="s1",
        )
    # pre-fork time travel through the branch is shared history: allowed
    assert br.as_of(0).snapshot["version"] == 0
    with pytest.raises(ValueError, match="pre-fork"):
        br.as_of(t.snapshot["version"] + 1)


def test_purge_refuses_with_open_branch_or_stage(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "lake"))
    t.create_branch("pin")
    with pytest.raises(ValueError, match="branch:pin"):
        t.purge_keys(["d1"])
    t.drop_branch("pin")
    t.merge_upsert(
        _batch(spark, [("d1", 999, "w", "upsert")]),
        epoch_id=5,
        wap_id="s1",
    )
    with pytest.raises(ValueError, match="stage:s1"):
        t.purge_keys(["d1"])
    t.discard_staged("s1")
    rep = t.purge_keys(["d1"])
    assert rep["keys"] == 1
    assert "d1" not in _state(t)


def test_branch_cas_rejects_stale_branch_handle(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "lake"))
    t.create_branch("b")
    h1 = t.branch("b")
    h2 = t.branch("b")
    h1.merge_upsert(_batch(spark, [("d1", 200, "a", "upsert")]), epoch_id=1)
    with pytest.raises(ConcurrentCommitError, match="moved to"):
        h2.merge_upsert(
            _batch(spark, [("d2", 201, "b", "upsert")]), epoch_id=1
        )
    t.drop_branch("b")


def test_controller_ingests_onto_branch_then_fast_forward(spark, tmp_path):
    """The whole ingest loop runs against a BRANCH handle (blue/green
    staging: replay a log onto a branch, validate, fast-forward): the
    controller's fences/cursor live in the branch snapshots, main stays
    at the fork until the metadata-only publish, and the fast-forwarded
    state equals the replay oracle."""
    from hemera_indexer_spark.oracle import expected_live_rows
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )
    from hemera_indexer_spark.streaming import StreamController

    log = str(tmp_path / "log")
    generate_changelog(
        log,
        ChangelogSpec(
            n_docs=120, n_epochs=4, events_per_epoch=200, n_partitions=2,
            seed=7, rollback_epochs=(2,),
        ),
    )
    t = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    head0 = t.snapshot["version"]
    br = t.create_branch("staging")
    StreamController(spark, br, log, 2).run()
    t.refresh()
    assert t.snapshot["version"] == head0
    assert t.current_state().count() == 0
    exp = {e["doc_id"]: e["tokens"] for e in expected_live_rows(log, 2)}
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in br.current_state().collect()
    }
    assert got == exp
    t.fast_forward("staging")
    got_main = {
        r["doc_id"]: list(r["tokens"])
        for r in t.current_state().collect()
    }
    assert got_main == exp
    # the branch head's fence came with the chain: a re-drive on main is
    # fully fenced (idempotent no-op)
    stats = StreamController(spark, t, log, 2).run()
    assert all(e.skipped for e in stats.epochs)
    assert got_main == {
        r["doc_id"]: list(r["tokens"])
        for r in t.current_state().collect()
    }


def test_lake_admin_branch_verbs(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "lake"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def admin(*argv):
        r = subprocess.run(
            [sys.executable, "scripts/lake_admin.py", t.root, *argv],
            capture_output=True, text=True, timeout=300, cwd=repo,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    assert admin("branch-create", "cli")["branch"] == "cli"
    br = t.branch("cli")
    br.merge_upsert(
        _batch(spark, [("c1", 400, "cli", "upsert")]), epoch_id=1
    )
    listed = admin("branch-list")["branches"]
    assert listed[0]["name"] == "cli" and listed[0]["commits"] == 1
    ff = admin("branch-ff", "cli")
    assert ff["new_head"] == t.snapshot["version"] + 1
    t.refresh()
    assert _state(t)["c1"] == (400, "cli")
    assert admin("branch-list")["branches"] == []


def test_run_ingest_branch_flag(spark, tmp_path):
    """`run_ingest.py --branch`: the staging ingest lands on the branch
    (main empty), `lake_admin.py branch-ff` publishes, and the published
    state matches the replay oracle."""
    from hemera_indexer_spark.oracle import expected_live_rows
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    log = str(tmp_path / "log")
    generate_changelog(
        log,
        ChangelogSpec(n_docs=80, n_epochs=3, events_per_epoch=150,
                      n_partitions=2, seed=13),
    )
    root = str(tmp_path / "lake")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(script, *argv):
        r = subprocess.run(
            [sys.executable, f"scripts/{script}", *argv],
            capture_output=True, text=True, timeout=300, cwd=repo,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    rep = run("run_ingest.py", "--log-dir", log, "--table-root", root,
              "--partitions", "2", "--num-buckets", "4", "--cores", "2",
              "--branch", "staging")
    assert rep["branch"] == "staging" and rep["committed_epoch"] == 2
    t = LakeTable.load(spark, root)
    assert t.current_state().count() == 0  # main untouched
    run("lake_admin.py", root, "branch-ff", "staging")
    t.refresh()
    exp = {e["doc_id"]: e["tokens"] for e in expected_live_rows(log, 2)}
    got = {r["doc_id"]: list(r["tokens"])
           for r in t.current_state().collect()}
    assert got == exp
    # sink-less guard: --branch with a sink selection errors loudly
    r = subprocess.run(
        [sys.executable, "scripts/run_ingest.py", "--log-dir", log,
         "--table-root", root, "--partitions", "2", "--branch", "b2",
         "--export-dir", str(tmp_path / "exp")],
        capture_output=True, text=True, timeout=120, cwd=repo,
    )
    assert r.returncode != 0 and "plain batch STATE ingest" in r.stderr


def test_create_branch_validates(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "lake"))
    with pytest.raises(ValueError, match="invalid branch name"):
        t.create_branch("bad/name")
    t.create_branch("dup")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("dup")
    with pytest.raises(FileNotFoundError, match="not retained"):
        t.create_branch("ghost", version=99)
    health = t.table_health()
    assert health["open_branches"] == ["dup"]
    assert t.fsck()["checked"]["branches"] == 1
