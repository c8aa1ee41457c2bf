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
