"""`scan_report`: the EXPLAIN surface for the file-pruning cascade.
The report must be metadata-only, apply layers in the same order as the
real read paths (bucket -> seq fence -> kind -> zone maps -> key blooms),
and its kept-file set must equal what `read(...)` / `lookup_many(...)`
with the same arguments actually scan — the law every test here pins.
"""

import pytest
from pyspark.sql import types as T

from hemera_indexer_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("ts", T.LongType()),
        T.StructField("val", T.StringType()),
    ]
)


def _mk(spark, root, n_epochs=5, per_epoch=8, **create_kw):
    t = LakeTable.create(spark, root, SCHEMA, num_buckets=2, **create_kw)
    for e in range(n_epochs):
        rows = [
            (f"d{e}-{i}", e * 100 + i + 1, e * 1000 + i, f"v{e}", "upsert")
            for i in range(per_epoch)
        ]
        t.merge_upsert(
            spark.createDataFrame(
                rows,
                "doc_id string, seq long, ts long, val string, op string",
            ),
            epoch_id=e,
        )
    return t


def test_no_filters_single_totals(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "s1"), n_epochs=3)
    rep = t.scan_report()
    assert rep["layers"] == []
    assert rep["files_kept"] == rep["files_total"] == len(t.snapshot["files"])
    assert rep["rows_kept"] == rep["rows_total"] == 3 * 8
    assert sorted(rep["kept"]) == sorted(
        f["path"] for f in t.snapshot["files"]
    )


def test_matches_read_selection_zone_and_seq(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "s2"), stats_cols=("ts",))
    ranges = {"ts": (2000, 2999)}
    rep = t.scan_report(seq_at_least=150, ranges=ranges)
    want = t._select_files(seq_at_least=150, ranges=ranges)
    assert sorted(rep["kept"]) == sorted(f["path"] for f in want)
    assert [l["layer"] for l in rep["layers"]] == ["seq_fence", "zone_map"]
    # each epoch's delta holds disjoint ts ranges: the zone layer must
    # actually skip something, and the counts must be internally consistent
    zl = rep["layers"][-1]
    assert zl["skipped_files"] > 0
    assert zl["kept_files"] == rep["files_kept"] == len(want)
    assert rep["rows_kept"] == sum(f["rows"] for f in want)


def test_key_values_matches_lookup_many(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "s3"), bloom_bits=2048)
    keys = ["d0-1", "d3-5"]
    rep = t.scan_report(key_values=keys)
    assert [l["layer"] for l in rep["layers"]] == ["bucket", "key_bloom"]
    # law: the report's kept set IS what the lookup scans
    b = {
        r["b"]
        for r in t.spark.sql(
            f"SELECT pmod(xxhash64(k), {t.num_buckets}) AS b "
            "FROM VALUES (?), (?) AS t(k)",
            args=keys,
        ).collect()
    }
    want = t._bloom_keep(t._select_files(buckets=b), keys)
    assert sorted(rep["kept"]) == sorted(f["path"] for f in want)
    assert rep["layers"][-1]["skipped_files"] > 0  # blooms really pruned
    got = sorted(r["doc_id"] for r in t.lookup_many(keys).collect())
    assert got == sorted(keys)


def test_bloomless_table_keeps_all_in_bloom_layer(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "s4"), n_epochs=3)  # no blooms
    rep = t.scan_report(key_values=["d1-1"])
    assert [l["layer"] for l in rep["layers"]] == ["bucket", "key_bloom"]
    bl = rep["layers"][-1]
    assert bl["skipped_files"] == 0  # nothing provable -> keep everything
    assert rep["files_kept"] == rep["layers"][0]["kept_files"]


def test_unmapped_range_column_raises(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "s5"), n_epochs=1)
    with pytest.raises(ValueError):
        t.scan_report(ranges={"ts": (0, 10)})


def test_cli_scan_report(spark, tmp_path):
    """CLI face: typed key coercion + range parsing produce the same
    report the API gives (run in-process; the CLI module is imported,
    argv-driven main exercised via subprocess elsewhere)."""
    import json
    import subprocess
    import sys

    t = _mk(
        spark,
        str(tmp_path / "s6"),
        bloom_bits=2048,
        stats_cols=("ts",),
    )
    out = subprocess.run(
        [
            sys.executable,
            "scripts/lake_admin.py",
            str(tmp_path / "s6"),
            "scan-report",
            "--keys",
            "d2-3",
            "--cores",
            "2",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    api = t.scan_report(key_values=["d2-3"])
    assert sorted(rep["kept"]) == sorted(api["kept"])
    assert rep["layers"] == api["layers"]
