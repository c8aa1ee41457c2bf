"""Z-order clustered compaction (`compact(zorder=...)`): the Morton key
must match its pure-Python reference bit-for-bit, the rewrite must not
change the resolved state, per-file footer stats must become tight in
EVERY interleaved dimension (a box `read(ranges=)` skips files on the
non-leading column, which lexicographic cluster_by cannot), and invalid
configurations must fail loudly."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hemera_indexer_spark.functions.zorder import (
    validate_zorder_cols,
    zorder_key,
    zorder_key_py,
)
from hemera_indexer_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("is_deleted", T.BooleanType()),
    ]
)

GRID = 32  # x, y each uniform over [0, GRID)


def _mk(spark, tmp_path, stats=("x", "y")):
    """State lake over a uniform 2-D grid: every (x, y) cell once, keys
    immutable after load (the state-table zone-map caveat is satisfied —
    no key ever has two versions with different x/y)."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "zo"),
        SCHEMA,
        num_buckets=2,
        stats_cols=tuple(stats),
    )
    t.bulk_load(
        spark.createDataFrame(
            [(f"d{x}-{y}", x, y) for x in range(GRID) for y in range(GRID)],
            "doc_id string, x long, y long",
        )
    )
    return t


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def test_zorder_key_matches_python_reference(spark):
    vals = [(x, y) for x in (0, 1, 7, 100, 255) for y in (0, 3, 64, 255)]
    vals.append((None, 17))
    df = spark.createDataFrame(vals, "x long, y long").withColumn(
        "z", zorder_key([("x", 0, 255), ("y", 0, 255)], bits=8)
    )
    for r in df.collect():
        assert r["z"] == zorder_key_py(
            [r["x"], r["y"]], [(0, 255), (0, 255)], bits=8
        ), (r["x"], r["y"])


def test_zorder_key_constant_and_null_and_clamp(spark):
    df = spark.createDataFrame(
        [(5, -10), (5, 500), (None, 100)], "a long, b long"
    ).withColumn(
        # a is constant (lo == hi): contributes 0; b clamps to [0, 255]
        "z",
        zorder_key([("a", 5, 5), ("b", 0, 255)], bits=8),
    )
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    assert got[(5, -10)] == zorder_key_py([5, 0], [(5, 5), (0, 255)], bits=8)
    assert got[(5, 500)] == zorder_key_py([5, 255], [(5, 5), (0, 255)], bits=8)
    assert got[(None, 100)] == zorder_key_py(
        [None, 100], [(5, 5), (0, 255)], bits=8
    )


def test_zorder_key_width_budget():
    with pytest.raises(ValueError, match="62-bit"):
        zorder_key([("a", 0, 1)] * 4, bits=16)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([])


def test_validate_zorder_cols():
    with pytest.raises(ValueError, match="not in schema"):
        validate_zorder_cols(SCHEMA, ("nope",))
    with pytest.raises(TypeError, match="non-numeric"):
        validate_zorder_cols(SCHEMA, ("doc_id",))


def test_compact_zorder_preserves_state_and_splits_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = _sorted(t.current_state())
    assert t.compact(buckets=set(range(t.num_buckets)),
                     zorder=("x", "y"), zorder_splits=8)
    t.refresh()
    assert _sorted(t.current_state()) == before
    # each bucket split into multiple z-contiguous files
    per_bucket: dict[int, int] = {}
    for f in t.snapshot["files"]:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert all(n >= 2 for n in per_bucket.values()), per_bucket
    # footer stats present and tight in BOTH dimensions: no file spans the
    # full grid in both x and y at once
    for f in t.snapshot["files"]:
        sx, sy = f["stats"]["x"], f["stats"]["y"]
        assert sx[0] is not None and sy[0] is not None
        assert (sx[1] - sx[0] < GRID - 1) or (sy[1] - sy[0] < GRID - 1), f


def test_zorder_box_scan_prunes_both_dimensions(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.compact(buckets=set(range(t.num_buckets)),
              zorder=("x", "y"), zorder_splits=8)
    t.refresh()
    total = len(t.snapshot["files"])
    box = {"x": (4, 11), "y": (20, 27)}
    kept = t._select_files(ranges=box)
    assert 0 < len(kept) < total, (len(kept), total)
    pred = (
        F.col("x").between(4, 11) & F.col("y").between(20, 27)
    )
    got = _sorted(t.read(ranges=box).where(pred).select("doc_id", "x", "y"))
    want = _sorted(t.read().where(pred).select("doc_id", "x", "y"))
    assert got == want and len(want) == 8 * 8


def test_zorder_beats_lexicographic_on_trailing_column(spark, tmp_path):
    """The load-bearing comparison: a range constraining ONLY y. Under
    cluster_by=('x',) every file spans all of y (prunes nothing); under
    zorder=('x','y') files are y-tight and most are skipped."""
    lex = _mk(spark, tmp_path / "lex")
    lex.compact(buckets=set(range(lex.num_buckets)), cluster_by=("x",))
    lex.refresh()
    zo = _mk(spark, tmp_path / "zo2")
    zo.compact(buckets=set(range(zo.num_buckets)),
               zorder=("x", "y"), zorder_splits=8)
    zo.refresh()
    yband = {"y": (8, 11)}
    lex_kept = len(lex._select_files(ranges=yband))
    zo_kept = len(zo._select_files(ranges=yband))
    assert zo_kept < len(zo.snapshot["files"])
    assert zo_kept / len(zo.snapshot["files"]) < lex_kept / max(
        1, len(lex.snapshot["files"])
    ), (zo_kept, len(zo.snapshot["files"]), lex_kept,
        len(lex.snapshot["files"]))
    # and identical answers
    got = _sorted(zo.read(ranges=yband).where("y BETWEEN 8 AND 11")
                  .select("doc_id"))
    want = _sorted(lex.read().where("y BETWEEN 8 AND 11").select("doc_id"))
    assert got == want


def test_zorder_cluster_by_mutually_exclusive(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="mutually exclusive"):
        t.compact(buckets={0, 1}, cluster_by=("x",), zorder=("y",))


def test_zorder_ranges_fallback_without_stats(spark, tmp_path):
    """z-order columns NOT zone-mapped: normalization ranges come from the
    column-pruned scan fallback; the rewrite still works (no file-level
    pruning claim without stats — this is the layout-only mode)."""
    t = _mk(spark, tmp_path, stats=())
    before = _sorted(t.current_state())
    assert t.compact(buckets=set(range(t.num_buckets)),
                     zorder=("x", "y"), zorder_splits=4)
    t.refresh()
    assert _sorted(t.current_state()) == before


FACT_SCHEMA = T.StructType(
    [
        T.StructField("ev_id", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
    ]
)


def _mk_fact(spark, tmp_path, epochs=4):
    t = LakeTable.create(
        spark,
        str(tmp_path / "zf"),
        FACT_SCHEMA,
        num_buckets=2,
        key_col="ev_id",
        properties={"table_type": "fact"},
        stats_cols=("x", "y"),
    )
    per = GRID * GRID // epochs
    rows = [
        (x * GRID + y, x * GRID + y, x, y)
        for x in range(GRID)
        for y in range(GRID)
    ]
    for e in range(epochs):
        t.insert_if_absent(
            spark.createDataFrame(
                rows[e * per : (e + 1) * per],
                "ev_id long, seq long, x long, y long",
            ),
            epoch_id=e,
        )
    return t


def test_compact_files_zorder_multiset_and_box_prune(spark, tmp_path):
    t = _mk_fact(spark, tmp_path)
    before = _sorted(t.read())
    assert t.compact_files(zorder=("x", "y"), zorder_splits=8)
    t.refresh()
    assert _sorted(t.read()) == before
    box = {"x": (4, 11), "y": (20, 27)}
    kept = t._select_files(ranges=box)
    assert 0 < len(kept) < len(t.snapshot["files"])
    got = _sorted(
        t.read(ranges=box)
        .where("x BETWEEN 4 AND 11 AND y BETWEEN 20 AND 27")
        .select("ev_id")
    )
    assert len(got) == 8 * 8


def test_compact_files_zorder_redelivery_still_fenced(spark, tmp_path):
    """The documented trade-off is pruning TIGHTNESS, never correctness:
    re-delivering an already-packed epoch after a z-order pack must still
    be a no-op."""
    t = _mk_fact(spark, tmp_path)
    assert t.compact_files(zorder=("x", "y"), zorder_splits=8)
    t.refresh()
    n_before = t.stats_row_count()
    per = GRID * GRID // 4
    rows = [
        (x * GRID + y, x * GRID + y, x, y)
        for x in range(GRID)
        for y in range(GRID)
    ][:per]
    t.insert_if_absent(
        spark.createDataFrame(rows, "ev_id long, seq long, x long, y long"),
        epoch_id=0,
    )
    t.refresh()
    assert t.stats_row_count() == n_before


def test_compact_files_zorder_cluster_by_exclusive(spark, tmp_path):
    t = _mk_fact(spark, tmp_path)
    with pytest.raises(ValueError, match="mutually exclusive"):
        t.compact_files(cluster_by=("x",), zorder=("y",))
