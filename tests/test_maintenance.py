"""Policy-driven maintenance (lake/maintenance.py::run_maintenance):
reads the metadata-only health report, acts only where thresholds say,
reaches a fixpoint (second run = all no-ops, zero new commits)."""

import json
import os
import subprocess
import sys

from pyspark.sql import types as T

from hemera_indexer_spark.lake import (
    LakeTable,
    MaintenancePolicy,
    run_maintenance,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("val", T.StringType()),
    ]
)


def _deep_state(spark, root, epochs=6):
    t = LakeTable.create(spark, root, SCHEMA, num_buckets=2)
    for e in range(epochs):
        t.merge_upsert(
            spark.createDataFrame(
                [(f"d{i}", e * 100 + i, f"v{e}", "upsert") for i in range(8)],
                "doc_id string, seq long, val string, op string",
            ),
            epoch_id=e,
        )
    return t


def test_state_maintenance_compacts_expires_vacuums_then_fixpoint(
    spark, tmp_path
):
    t = _deep_state(spark, str(tmp_path / "t"))
    before = {
        r["doc_id"]: r["val"] for r in t.current_state().collect()
    }
    rep = run_maintenance(
        t,
        MaintenancePolicy(compact_delta_depth=3, expire_keep_last=2),
    )
    assert rep["compacted_buckets"]  # deep delta chains got folded
    assert rep["snapshots_expired"] > 0
    assert rep["files_vacuumed"] > 0
    assert rep["after"]["delta_files"] == 0
    assert rep["after"]["files"] < rep["before"]["files"]
    # state unchanged by any of it
    t.refresh()
    assert {
        r["doc_id"]: r["val"] for r in t.current_state().collect()
    } == before
    # fixpoint: a healthy table produces zero new commits
    v = t.snapshot["version"]
    rep2 = run_maintenance(
        t,
        MaintenancePolicy(compact_delta_depth=3, expire_keep_last=2),
    )
    assert "compacted_buckets" not in rep2
    assert rep2["files_vacuumed"] == 0
    assert rep2["after"]["version"] == v


def test_maintenance_analyze_lag_and_fixpoint(spark, tmp_path):
    """analyze_lag: never-analyzed tables analyze on the first policy run
    (stats postdate the layout rewrites), a fresh table then reaches the
    zero-commit fixpoint, staleness re-triggers once lag >= threshold,
    and a sub-2 threshold is refused (it could never reach a fixpoint)."""
    import pytest

    t = _deep_state(spark, str(tmp_path / "t"))
    pol = MaintenancePolicy(
        compact_delta_depth=3, expire_keep_last=2, analyze_lag=3
    )
    rep = run_maintenance(t, pol)
    assert rep["analyzed"] == ["doc_id", "seq", "val"]
    t.refresh()
    stats_v = t.column_stats()["doc_id"]["version"]
    assert stats_v >= rep["before"]["version"]  # postdates the rewrites
    # fixpoint: fresh stats (lag == 1) stay below the threshold
    v = t.snapshot["version"]
    rep2 = run_maintenance(t, pol)
    assert "analyzed" not in rep2 and rep2["after"]["version"] == v
    # staleness re-triggers: push lag to the threshold with no-op commits
    t.update_properties({"x": "1"})
    t.update_properties({"x": "2"})
    rep3 = run_maintenance(t, pol)
    assert rep3["analyzed"] == ["doc_id", "seq", "val"]
    with pytest.raises(ValueError, match="analyze_lag"):
        run_maintenance(t, MaintenancePolicy(analyze_lag=1))


def test_fact_maintenance_packs_small_files(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "f"), SCHEMA, num_buckets=2,
        properties={"table_type": "fact"},
    )
    for e in range(5):
        t.insert_if_absent(
            spark.createDataFrame(
                [(f"e{e}-{i}", e * 10 + i, f"x{e}", "upsert")
                 for i in range(4)],
                "doc_id string, seq long, val string, op string",
            ),
            epoch_id=e,
        )
    n = t.read().count()
    rep = run_maintenance(t, MaintenancePolicy(pack_max_files=2))
    assert rep["packed"] is True
    assert rep["after"]["files"] < rep["before"]["files"]
    t.refresh()
    assert t.read().count() == n


def test_rebucket_trigger_next_power_of_two(spark, tmp_path):
    t = _deep_state(spark, str(tmp_path / "t"), epochs=2)
    rep = run_maintenance(
        t,
        MaintenancePolicy(
            compact_delta_depth=None,
            rebucket_rows_per_bucket=3,  # 16 physical rows / 2 buckets = 8
            expire_keep_last=None,
            vacuum_grace_seconds=None,
        ),
    )
    assert rep["rebucketed_to"] == 8  # 16/4=4 > 3, 16/8=2 <= 3
    t.refresh()
    assert t.num_buckets == 8


def test_lake_admin_maintain_verb(spark, tmp_path):
    t = _deep_state(spark, str(tmp_path / "t"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "scripts/lake_admin.py", t.root, "maintain",
         "--compact-depth", "3", "--keep-last", "2"],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["after"]["delta_files"] == 0
    assert rep["snapshots_expired"] > 0


def test_write_compression_property_and_reencode(spark, tmp_path):
    """properties['write.compression']: per-table codec override applied
    at every data write; flipping the property and compacting re-encodes
    existing files (maintenance rewrites share the write path)."""
    import pyarrow.parquet as pq

    def codecs(t):
        out = set()
        for f in t.snapshot["files"]:
            md = pq.ParquetFile(os.path.join(t.root, f["path"])).metadata
            out.add(md.row_group(0).column(0).compression)
        return out

    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, num_buckets=2,
        properties={"write.compression": "zstd"},
    )
    t.merge_upsert(
        spark.createDataFrame(
            [(f"d{i}", i + 1, f"v{i}" * 50, "upsert") for i in range(200)],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=0,
    )
    assert codecs(t) == {"ZSTD"}
    # flip to snappy + compact: existing data re-encodes
    t.update_properties({"write.compression": "snappy"})
    t.refresh()
    assert t.compact(buckets=set(range(t.num_buckets)))
    t.refresh()
    assert codecs(t) == {"SNAPPY"}
    state = {r["doc_id"] for r in t.current_state().collect()}
    assert len(state) == 200


def _mk_fact_epochs(spark, root, epochs=5, per=20):
    t = LakeTable.create(
        spark, root, SCHEMA, num_buckets=2,
        properties={"table_type": "fact"},
    )
    for e in range(epochs):
        t.insert_if_absent(
            spark.createDataFrame(
                [(f"e{e}-{i}", e * 100 + i, f"x{e}", "upsert")
                 for i in range(per)],
                "doc_id string, seq long, val string, op string",
            ),
            epoch_id=e,
        )
    return t


def test_truncate_before_drops_files_and_fences_redelivery(spark, tmp_path):
    t = _mk_fact_epochs(spark, str(tmp_path / "f"))
    n_files_before = len(t.snapshot["files"])
    v0 = t.snapshot["version"]
    rep = t.truncate_before(200)  # epochs 0-1 (seq < 200) drop
    t.refresh()
    # epochs 0/1 files are entirely below the cutoff: metadata-only drops
    assert rep["files_dropped"] >= 2
    assert rep["files_rewritten"] == 0  # no file straddles 200
    assert len(t.snapshot["files"]) < n_files_before
    assert t.read().where("seq < 200").count() == 0
    assert t.read().count() == 60  # epochs 2-4
    # changes_since across the truncate reports the drops as deletes
    ch = t.changes_since(v0).groupBy("change_op").count().collect()
    assert {r["change_op"]: r["count"] for r in ch} == {"delete": 40}
    # re-delivering a truncated epoch must NOT resurrect it
    assert t.insert_if_absent(
        spark.createDataFrame(
            [(f"e0-{i}", i, "x0", "upsert") for i in range(20)],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=99,
    )
    t.refresh()
    assert t.read().count() == 60
    # a batch mixing below/above-floor rows keeps only the above part
    assert t.insert_if_absent(
        spark.createDataFrame(
            [("old", 150, "old", "upsert"), ("new", 900, "new", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=100,
    )
    t.refresh()
    got = {r["doc_id"] for r in t.read().collect()}
    assert "new" in got and "old" not in got
    # idempotent: repeating the truncate commits nothing
    v = t.snapshot["version"]
    rep2 = t.truncate_before(200)
    t.refresh()
    assert rep2 == {"files_dropped": 0, "files_rewritten": 0}
    assert t.snapshot["version"] == v
    # dropped files become orphans and vacuum away
    assert t.vacuum_orphans() >= rep["files_dropped"]


def test_truncate_before_straddling_file_rewrites(spark, tmp_path):
    t = _mk_fact_epochs(spark, str(tmp_path / "f"), epochs=2, per=20)
    rep = t.truncate_before(110)  # mid-epoch-1: its files straddle
    t.refresh()
    assert rep["files_rewritten"] >= 1
    assert t.read().where("seq < 110").count() == 0
    assert t.read().count() == 10  # seqs 110..119


def test_truncate_refuses_state_tables_and_drives_via_policy(
    spark, tmp_path
):
    import pytest as _pt

    s = LakeTable.create(spark, str(tmp_path / "s"), SCHEMA, num_buckets=2)
    with _pt.raises(ValueError, match="fact-table retention"):
        s.truncate_before(10)
    t = _mk_fact_epochs(spark, str(tmp_path / "f"))
    rep = run_maintenance(
        t,
        MaintenancePolicy(
            fact_truncate_before_seq=300, pack_max_files=2,
            expire_keep_last=2,
        ),
    )
    assert rep["truncated"]["files_dropped"] >= 2
    t.refresh()
    assert t.read().count() == 40  # epochs 3-4
