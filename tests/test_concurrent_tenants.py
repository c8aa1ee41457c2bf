"""TRUE multi-writer race: two OS processes, each its own SparkSession
and StreamController, ingest different tenants into ONE shared state
table at the same time.

The single-process tenant test (tests/test_round4.py) interleaves runs
sequentially; this one exercises the configuration the tenant-mode CAS
retry (`StreamController._process_group`, tenant_cas_retries budget +
per-tenant backoff phase) actually exists for — snapshot flips landing
BETWEEN another controller's refresh and commit. Whatever interleaving
the scheduler produces, the final table must equal both logs' oracles
exactly, with neither tenant's rows, fences, or rollbacks leaking into
the other's.
"""

import json
import os
import subprocess
import sys

import pyspark.sql.functions as F

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_processes_ingest_tenants_simultaneously(spark, tmp_path):
    from hemera_indexer_spark.oracle import expected_live_rows
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    logs = {}
    for tenant in (1, 2):
        spec = ChangelogSpec(
            n_docs=150,
            n_epochs=8,
            events_per_epoch=200,
            n_partitions=2,
            seed=500 + tenant,
            rollback_epochs=(5,),
            doc_prefix=f"t{tenant}_doc",
        )
        logs[tenant] = generate_changelog(
            str(tmp_path / f"log{tenant}"), spec
        )
    root = str(tmp_path / "lake")
    # pre-create so neither worker races the CREATE itself (that race is
    # covered by the metrics-table create/load fallback elsewhere)
    LakeTable.create(spark, root, SEQUENCES_SCHEMA, num_buckets=8)

    def worker(tenant):
        return subprocess.Popen(
            [
                sys.executable, "scripts/run_ingest.py",
                "--log-dir", logs[tenant].out_dir,
                "--table-root", root,
                "--partitions", "2",
                "--num-buckets", "8",
                "--cores", "2",
                "--tenant-col", "chain_id",
                "--tenant-id", str(tenant),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=REPO,
        )

    procs = {t: worker(t) for t in (1, 2)}  # launched back-to-back: overlap
    reports = {}
    for t, p in procs.items():
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, (t, err[-3000:])
        reports[t] = json.loads(out.strip().splitlines()[-1])
    for t in (1, 2):
        assert reports[t]["committed_epoch"] == 7, reports[t]

    table = LakeTable.load(spark, root)
    state = table.current_state().cache()
    try:
        for tenant in (1, 2):
            exp = expected_live_rows(logs[tenant].out_dir, 2)
            got = sorted(
                (
                    r.asDict(recursive=True)
                    for r in state.where(
                        F.col("chain_id") == tenant
                    ).collect()
                ),
                key=lambda d: d["doc_id"],
            )
            assert len(got) == len(exp), f"tenant {tenant} row count"
            for g, e in zip(got, exp):
                assert g["doc_id"] == e["doc_id"]
                assert g["tokens"] == e["tokens"], (tenant, g["doc_id"])
        # no rows outside the two tenants; per-tenant fences both present
        assert state.where(~F.col("chain_id").isin(1, 2)).count() == 0
    finally:
        state.unpersist()
    props = table.snapshot["properties"]
    for t in (1, 2):
        man = json.loads(props[f"tenant_manifest:{t}"])
        assert man["epoch_id"] == 7, (t, man)
    # a fresh fenced re-drive of either tenant is a clean no-op
    rerun = subprocess.run(
        [
            sys.executable, "scripts/run_ingest.py",
            "--log-dir", logs[1].out_dir,
            "--table-root", root,
            "--partitions", "2",
            "--num-buckets", "8",
            "--cores", "2",
            "--tenant-col", "chain_id",
            "--tenant-id", "1",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert rerun.returncode == 0, rerun.stderr[-3000:]
    v_after = LakeTable.load(spark, root).snapshot["version"]
    assert v_after == table.snapshot["version"]


def test_compactor_races_tenant_writers(spark, tmp_path):
    """Physical-layout commits racing data commits: while TWO tenant
    ingest processes write, the main process repeatedly compacts the
    same table. The compactor's CAS may lose any given attempt (that is
    the contract — retry from a fresh snapshot), but no interleaving may
    corrupt the fold: final per-tenant state must equal both oracles."""
    import time

    from hemera_indexer_spark.lake import ConcurrentCommitError
    from hemera_indexer_spark.oracle import expected_live_rows
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    logs = {}
    for tenant in (1, 2):
        spec = ChangelogSpec(
            n_docs=120,
            n_epochs=6,
            events_per_epoch=200,
            n_partitions=2,
            seed=700 + tenant,
            doc_prefix=f"t{tenant}_doc",
        )
        logs[tenant] = generate_changelog(
            str(tmp_path / f"log{tenant}"), spec
        )
    root = str(tmp_path / "lake")
    table = LakeTable.create(spark, root, SEQUENCES_SCHEMA, num_buckets=8)

    def worker(tenant):
        return subprocess.Popen(
            [
                sys.executable, "scripts/run_ingest.py",
                "--log-dir", logs[tenant].out_dir,
                "--table-root", root,
                "--partitions", "2",
                "--num-buckets", "8",
                "--cores", "2",
                "--tenant-col", "chain_id",
                "--tenant-id", str(tenant),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=REPO,
        )

    procs = {t: worker(t) for t in (1, 2)}
    compactions = lost_races = 0
    deadline = time.time() + 540
    while any(p.poll() is None for p in procs.values()):
        assert time.time() < deadline, "writers did not finish"
        try:
            table.refresh()
            if table.compact():
                compactions += 1
        except ConcurrentCommitError:
            lost_races += 1  # expected traffic: retry from fresh snapshot
        time.sleep(0.3)
    for t, p in procs.items():
        out, err = p.communicate(timeout=60)
        assert p.returncode == 0, (t, err[-3000:])
        assert json.loads(out.strip().splitlines()[-1])["committed_epoch"] == 5

    table.refresh()
    state = table.current_state().cache()
    try:
        for tenant in (1, 2):
            exp = expected_live_rows(logs[tenant].out_dir, 2)
            got = sorted(
                (
                    r.asDict(recursive=True)
                    for r in state.where(
                        F.col("chain_id") == tenant
                    ).collect()
                ),
                key=lambda d: d["doc_id"],
            )
            assert len(got) == len(exp), f"tenant {tenant} row count"
            for g, e in zip(got, exp):
                assert g["doc_id"] == e["doc_id"]
                assert g["tokens"] == e["tokens"], (tenant, g["doc_id"])
    finally:
        state.unpersist()
    # the race actually happened: the compactor did real work mid-run
    # (it may also have lost CAS attempts; both counts are legitimate)
    assert compactions + lost_races > 0


def test_snapshot_claim_is_exclusive_and_head_probes_forward(spark, tmp_path):
    """The commit point is the exclusive snapshot-file claim: a commit
    racing into an already-claimed version loses LOUDLY (never clobbers),
    and a claimed-but-unflipped commit (committer crashed between claim
    and pointer write) is still the head every reader resolves."""
    import pytest

    from hemera_indexer_spark.lake import ConcurrentCommitError
    from hemera_indexer_spark.lake.table import VERSION_FILE

    root = str(tmp_path / "lake")
    t = LakeTable.create(spark, root, SEQUENCES_SCHEMA, num_buckets=4)

    def batch(doc, seq):
        return spark.createDataFrame(
            [(doc, "upsert", seq, [seq])],
            "doc_id string, op string, seq long, tokens array<int>",
        )

    t.merge_upsert(batch("d1", 1), epoch_id=0)
    v = t.snapshot["version"]

    # simulate a concurrent committer that claimed v+1 but crashed before
    # writing the pointer: copy the head snapshot forward by hand
    import shutil

    src = os.path.join(root, "meta", f"snap-{v:010d}.json")
    claimed = os.path.join(root, "meta", f"snap-{v + 1:010d}.json")
    snap = json.load(open(src))
    snap["version"], snap["parent"] = v + 1, v
    with open(claimed, "w") as f:
        json.dump(snap, f)

    # a reader resolves the claimed commit as head even though VERSION
    # still points at v
    assert int(open(os.path.join(root, "meta", VERSION_FILE)).read()) == v
    fresh = LakeTable.load(spark, root)
    assert fresh.snapshot["version"] == v + 1

    # a stale-handle commit loses loudly (parent check sees the probed
    # head, and the claim itself would refuse the existing file)
    with pytest.raises(ConcurrentCommitError):
        t.merge_upsert(batch("d2", 2), epoch_id=1)

    # refresh-and-retry converges on top of the claimed commit
    t.refresh()
    assert t.snapshot["version"] == v + 1
    t.merge_upsert(batch("d2", 2), epoch_id=1)
    assert t.snapshot["version"] == v + 2
    docs = {r["doc_id"] for r in t.current_state().collect()}
    assert docs == {"d1", "d2"}


def test_rename_races_ingesting_controller(spark, tmp_path):
    """A schema op (rename_column) from an admin PROCESS races a live
    tenant-mode ingest in another process. The exclusive snapshot claim
    serializes them: whichever loses a version retries (the controller
    via its tenant CAS budget, the admin via a refresh loop), and the
    final table must hold the full oracle under the NEW column name —
    events kept speaking the old name throughout (old-writer mapping),
    and the controller must not have re-ADDed it."""
    from hemera_indexer_spark.oracle import expected_live_rows
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    gen = generate_changelog(
        str(tmp_path / "log"),
        ChangelogSpec(
            n_docs=150,
            n_epochs=8,
            events_per_epoch=200,
            n_partitions=2,
            seed=901,
            rollback_epochs=(5,),
        ),
    )
    root = str(tmp_path / "lake")
    LakeTable.create(spark, root, SEQUENCES_SCHEMA, num_buckets=8)

    ingest = subprocess.Popen(
        [
            sys.executable, "scripts/run_ingest.py",
            "--log-dir", gen.out_dir,
            "--table-root", root,
            "--partitions", "2",
            "--num-buckets", "8",
            "--cores", "2",
            "--tenant-col", "chain_id",
            "--tenant-id", "1",
        ],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
    )
    renamer = subprocess.Popen(
        [
            sys.executable, "-c",
            f"""
import sys, time
sys.path.insert(0, {REPO!r})
from hemera_indexer_spark.session import get_spark
from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.lake.table import ConcurrentCommitError
spark = get_spark("renamer", cores=2, shuffle_partitions=4)
time.sleep(12)  # let the ingest get going; any interleaving is legal
t = LakeTable.load(spark, {root!r})
for attempt in range(60):
    try:
        t.rename_column("source", "origin")
        break
    except ConcurrentCommitError:
        time.sleep(0.3)
        t.refresh()
else:
    raise SystemExit("rename never won a commit")
print("RENAMED at version", t.snapshot["version"])
""",
        ],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
    )
    out_i, err_i = ingest.communicate(timeout=600)
    out_r, err_r = renamer.communicate(timeout=600)
    assert ingest.returncode == 0, err_i[-3000:]
    assert renamer.returncode == 0, err_r[-3000:]
    assert "RENAMED" in out_r

    table = LakeTable.load(spark, root)
    names = table.schema.fieldNames()
    assert "origin" in names and "source" not in names, names
    exp = expected_live_rows(gen.out_dir, 2)
    got = sorted(
        (r.asDict(recursive=True) for r in table.current_state().collect()),
        key=lambda d: d["doc_id"],
    )
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g["tokens"] == e["tokens"], g["doc_id"]
        assert g["origin"] == e["source"], g["doc_id"]
    # fenced re-drive stays a no-op on the renamed table
    rerun = subprocess.run(
        [
            sys.executable, "scripts/run_ingest.py",
            "--log-dir", gen.out_dir,
            "--table-root", root,
            "--partitions", "2",
            "--num-buckets", "8",
            "--cores", "2",
            "--tenant-col", "chain_id",
            "--tenant-id", "1",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert rerun.returncode == 0, rerun.stderr[-3000:]
    assert LakeTable.load(spark, root).snapshot["version"] == \
        table.snapshot["version"]
