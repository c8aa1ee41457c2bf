"""Zone-map data skipping (`stats_cols` / `read(ranges=)`): per-file
min/max footer stats over declared payload columns must prune files, must
never change results, and must survive compaction rewrites."""

import pytest
from pyspark.sql import types as T

from hemera_indexer_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("src", T.StringType()),
    ]
)


def _mk(spark, tmp_path, n_epochs=6):
    t = LakeTable.create(
        spark,
        str(tmp_path / "zm"),
        SCHEMA,
        num_buckets=2,
        properties={"table_type": "fact"},
        stats_cols=("ts", "src"),
    )
    for e in range(n_epochs):
        rows = [
            (f"d{e}-{i}", e * 100 + i, e * 1000 + i, f"s{e}")
            for i in range(20)
        ]
        t.insert_if_absent(
            spark.createDataFrame(
                rows, "doc_id string, seq long, ts long, src string"
            ),
            epoch_id=e,
        )
    return t


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def test_range_prune_skips_files_same_result(spark, tmp_path):
    t = _mk(spark, tmp_path)
    total = len(t._select_files())
    lo, hi = 2000, 2999  # epoch 2 only
    kept = t._select_files(ranges={"ts": (lo, hi)})
    assert 0 < len(kept) < total
    assert all((f["stats"]["ts"][0] or 0) <= hi for f in kept)
    full = _sorted(t.read().where(f"ts BETWEEN {lo} AND {hi}"))
    pruned = _sorted(
        t.read(ranges={"ts": (lo, hi)}).where(f"ts BETWEEN {lo} AND {hi}")
    )
    assert pruned == full and len(full) == 20


def test_one_sided_and_string_ranges(spark, tmp_path):
    t = _mk(spark, tmp_path)
    total = len(t._select_files())
    # one-sided: everything from epoch 4 on
    kept = t._select_files(ranges={"ts": (4000, None)})
    assert 0 < len(kept) < total
    got = _sorted(t.read(ranges={"ts": (4000, None)}).where("ts >= 4000"))
    assert got == _sorted(t.read().where("ts >= 4000"))
    # string zone map: exactly one epoch's source tag
    kept_s = t._select_files(ranges={"src": ("s3", "s3")})
    assert 0 < len(kept_s) < total
    got_s = _sorted(t.read(ranges={"src": ("s3", "s3")}).where("src = 's3'"))
    assert got_s == _sorted(t.read().where("src = 's3'"))
    assert len(got_s) == 20


def test_prune_on_unmapped_column_raises(spark, tmp_path):
    t = _mk(spark, tmp_path, n_epochs=1)
    with pytest.raises(ValueError, match="not.*zone-mapped"):
        t.read(ranges={"seq": (0, 10)})


def test_create_validates_stats_cols(spark, tmp_path):
    bad = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
        ]
    )
    with pytest.raises(ValueError, match="non-orderable"):
        LakeTable.create(
            spark, str(tmp_path / "a"), bad, stats_cols=("tokens",)
        )
    with pytest.raises(ValueError, match="not in schema"):
        LakeTable.create(
            spark, str(tmp_path / "b"), bad, stats_cols=("nope",)
        )


def test_stats_survive_compaction(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = _sorted(t.read().where("ts BETWEEN 1000 AND 1999"))
    assert t.compact_files(max_files=1)
    for f in t.snapshot["files"]:
        mn, mx = f["stats"]["ts"]
        assert mn is not None and mx >= mn
    got = _sorted(
        t.read(ranges={"ts": (1000, 1999)}).where("ts BETWEEN 1000 AND 1999")
    )
    assert got == before


def test_tables_without_stats_cols_reject_ranges(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "plain"), SCHEMA)
    with pytest.raises(ValueError, match="not.*zone-mapped"):
        t._select_files(ranges={"ts": (0, 1)})


def test_compact_files_cluster_by_orders_rows(spark, tmp_path):
    """cluster_by must physically order each rewritten file by the
    cluster columns (tight per-row-group range stats), while preserving
    the row multiset and the seq-sorted default elsewhere."""
    import glob

    import pyarrow.parquet as pq

    t = _mk(spark, tmp_path)
    before = _sorted(t.read())
    # write ts in reverse-of-seq order within each epoch so the default
    # seq sort and a ts clustering genuinely differ
    assert t.compact_files(max_files=1, cluster_by=("ts",))
    assert _sorted(t.read()) == before
    files = [
        f for f in glob.glob(str(tmp_path / "zm/data/**/*.parquet"),
                             recursive=True)
        if any(f.endswith(e["path"].split("/")[-1])
               for e in t.snapshot["files"])
    ]
    assert files
    for f in files:
        ts = pq.read_table(f, columns=["ts"])["ts"].to_pylist()
        assert ts == sorted(ts), f"file not ts-clustered: {f}"


def test_compact_cluster_by_state_table(spark, tmp_path):
    """State-table compact(cluster_by=) keeps the resolved state identical."""
    from pyspark.sql import functions as F

    t = LakeTable.create(
        spark, str(tmp_path / "st"), SCHEMA, num_buckets=2
    )
    for e in range(3):
        rows = [(f"d{i}", e * 100 + i, e * 1000 + i, f"s{e}", "upsert")
                for i in range(15)]
        t.merge_upsert(
            spark.createDataFrame(
                rows,
                "doc_id string, seq long, ts long, src string, op string",
            ),
            epoch_id=e,
        )
    before = _sorted(t.current_state())
    assert t.compact(cluster_by=("ts",))
    assert _sorted(t.current_state()) == before


def test_table_health_reports_zone_map_coverage(spark, tmp_path):
    t = _mk(spark, tmp_path, n_epochs=2)
    h = t.table_health()
    assert h["stats_cols"] == ["ts", "src"]
    assert h["zone_map_coverage"] == 1.0
    plain = LakeTable.create(spark, str(tmp_path / "plain"), SCHEMA)
    hp = plain.table_health()
    assert hp["stats_cols"] == [] and hp["zone_map_coverage"] is None


def test_set_stats_cols_late_declaration_and_backfill(spark, tmp_path):
    """Declaring zone maps on a LIVE table: pre-declaration files have no
    stats (reads keep them — correct, just unpruned), coverage reports
    the gap, and compaction backfills the maps."""
    t = LakeTable.create(
        spark, str(tmp_path / "late"), SCHEMA, num_buckets=2,
        properties={"table_type": "fact"},
    )
    for e in range(3):
        t.insert_if_absent(
            spark.createDataFrame(
                [(f"d{e}-{i}", e * 100 + i, e * 1000 + i, f"s{e}")
                 for i in range(10)],
                "doc_id string, seq long, ts long, src string",
            ),
            epoch_id=e,
        )
    t.set_stats_cols(("ts",))
    assert t.table_health()["zone_map_coverage"] == 0.0  # history unmapped
    full = _sorted(t.read().where("ts >= 2000"))
    # ranges on unmapped history: nothing pruned, result still correct
    assert _sorted(t.read(ranges={"ts": (2000, None)}).where("ts >= 2000")) == full
    # new writes record the map; compaction backfills history
    t.insert_if_absent(
        spark.createDataFrame(
            [("dx", 9000, 9000, "s9")],
            "doc_id string, seq long, ts long, src string",
        ),
        epoch_id=9,
    )
    assert t.compact_files(max_files=1)
    assert t.table_health()["zone_map_coverage"] == 1.0
    # fully-packed files span the whole range (nothing prunable), but the
    # backfilled maps are live: a disjoint range now proves zero files
    assert t._select_files(ranges={"ts": (99999, None)}) == []
    assert _sorted(
        t.read(ranges={"ts": (2000, 2999)}).where("ts BETWEEN 2000 AND 2999")
    ) == _sorted(t.read().where("ts BETWEEN 2000 AND 2999"))
    with pytest.raises(ValueError, match="not in schema"):
        t.set_stats_cols(("nope",))
