"""Unit tests for the temporal operators (as-of join, SCD2 intervals,
bucketed range join) — edge cases the sf0.01 oracle run can't isolate:
no-match probes, equal-timestamp ties, same-ts dim duplicates, single-row
keys, intervals spanning multiple buckets and bucket boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hemera_indexer_spark.operators.temporal import (
    asof_join,
    range_join_buckets,
    scd2_intervals,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


# ------------------------------------------------------------- asof_join
def _asof_fixture(spark):
    probe = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:00:00")),  # before any dim -> null
            (2, "k1", _ts("2024-01-01 12:00:00")),  # matches d1
            (3, "k1", _ts("2024-01-01 13:00:00")),  # equal ts -> matches d2
            (4, "k1", _ts("2024-01-01 23:00:00")),  # matches latest d3
            (5, "k2", _ts("2024-01-01 12:00:00")),  # key with no dims
        ],
        "pid long, k string, ts timestamp",
    )
    dim = spark.createDataFrame(
        [
            (10, "k1", _ts("2024-01-01 11:00:00"), 1.0),
            (11, "k1", _ts("2024-01-01 13:00:00"), 2.0),
            (12, "k1", _ts("2024-01-01 14:00:00"), 3.0),
        ],
        "did long, k string, dts timestamp, v double",
    )
    return probe, dim


def test_asof_backward_with_ties_and_no_match(spark):
    probe, dim = _asof_fixture(spark)
    out = asof_join(
        probe, dim, key="k", probe_ts="ts", dim_ts="dts",
        dim_cols=["did", "v"], dim_tiebreak="did",
    )
    got = {r["pid"]: (r["did"], r["v"]) for r in out.collect()}
    assert got[1] == (None, None)  # probe before first dim
    assert got[2] == (10, 1.0)
    assert got[3] == (11, 2.0)  # equal timestamp matches (>= semantics)
    assert got[4] == (12, 3.0)
    assert got[5] == (None, None)  # key never appears in dim
    assert out.count() == probe.count()  # left semantics: no row loss


def test_asof_same_ts_dim_duplicates_resolved_by_tiebreak(spark):
    probe = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 12:00:00"))], "pid long, k string, ts timestamp"
    )
    dim = spark.createDataFrame(
        [
            (7, "k", _ts("2024-01-01 11:00:00"), 7.0),
            (9, "k", _ts("2024-01-01 11:00:00"), 9.0),
            (8, "k", _ts("2024-01-01 11:00:00"), 8.0),
        ],
        "did long, k string, dts timestamp, v double",
    )
    out = asof_join(
        probe, dim, key="k", probe_ts="ts", dim_ts="dts",
        dim_cols=["did", "v"], dim_tiebreak="did",
    ).collect()
    assert out[0]["did"] == 9  # max tiebreak wins deterministically


# -------------------------------------------------------- scd2_intervals
def test_scd2_compresses_runs_and_marks_current(spark):
    df = spark.createDataFrame(
        [
            ("u1", 1, "a"),
            ("u1", 2, "a"),  # same run — compressed away
            ("u1", 3, "b"),
            ("u1", 5, "a"),  # value returns: NEW interval, not merged
            ("u2", 4, "x"),  # single-version key
        ],
        "k string, seq long, attr string",
    )
    out = scd2_intervals(df, key="k", version="seq", attr="attr")
    rows = sorted(
        (r["k"], r["valid_from"], r["attr"], r["valid_to"], r["is_current"])
        for r in out.collect()
    )
    assert rows == [
        ("u1", 1, "a", 3, False),
        ("u1", 3, "b", 5, False),
        ("u1", 5, "a", None, True),
        ("u2", 4, "x", None, True),
    ]


def test_scd2_null_attr_is_a_distinct_value(spark):
    df = spark.createDataFrame(
        [("u", 1, None), ("u", 2, None), ("u", 3, "a")],
        "k string, seq long, attr string",
    )
    out = scd2_intervals(df, key="k", version="seq", attr="attr").collect()
    # null run compresses (null-safe compare), then transitions to 'a'
    assert sorted((r["valid_from"], r["attr"]) for r in out) == [
        (1, None), (3, "a"),
    ]


# --------------------------------------------------- range_join_buckets
def test_range_join_interval_spanning_buckets(spark):
    points = spark.createDataFrame(
        [
            (1, "k", _ts("2024-01-01 10:30:00")),
            (2, "k", _ts("2024-01-01 12:30:00")),
            (3, "k", _ts("2024-01-01 13:30:00")),  # outside every interval
            (4, "z", _ts("2024-01-01 10:30:00")),  # wrong key
        ],
        "pid long, k string, pts timestamp",
    )
    # one 3-hour interval spanning 4 hour-buckets incl. exact boundaries
    intervals = spark.createDataFrame(
        [(100, "k", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 13:00:00"))],
        "iid long, k string, s timestamp, e timestamp",
    )
    out = range_join_buckets(
        points, intervals, key="k", point_ts="pts", start_ts="s", end_ts="e"
    )
    assert sorted(r["pid"] for r in out.collect()) == [1, 2]
    # each qualifying pair appears exactly once despite the multi-bucket explode
    assert out.count() == 2


def test_range_join_inclusive_boundaries(spark):
    points = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 10:00:00")), (2, "k", _ts("2024-01-01 11:00:00"))],
        "pid long, k string, pts timestamp",
    )
    intervals = spark.createDataFrame(
        [(9, "k", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "iid long, k string, s timestamp, e timestamp",
    )
    out = range_join_buckets(
        points, intervals, key="k", point_ts="pts", start_ts="s", end_ts="e"
    )
    assert out.count() == 2  # both endpoints inclusive


def test_range_join_matches_inequality_join_on_random_data(spark):
    # cross-check the bucketed plan against a plain inequality join
    ev = (
        spark.range(300)
        .select(
            F.col("id").alias("pid"),
            (F.col("id") % 7).cast("string").alias("k"),
            F.timestamp_seconds(
                F.lit(1700000000) + (F.col("id") * 937) % 86400
            ).alias("pts"),
        )
    )
    iv = (
        spark.range(60)
        .select(
            (F.col("id") + 1000).alias("iid"),
            (F.col("id") % 7).cast("string").alias("k"),
            F.timestamp_seconds(
                F.lit(1700000000) + (F.col("id") * 4211) % 86400
            ).alias("s"),
        )
        .withColumn("e", F.col("s") + F.expr("INTERVAL 90 MINUTES"))
    )
    fast = range_join_buckets(
        ev, iv, key="k", point_ts="pts", start_ts="s", end_ts="e"
    ).select("pid", "iid")
    slow = (
        ev.join(iv, "k")
        .where((F.col("pts") >= F.col("s")) & (F.col("pts") <= F.col("e")))
        .select("pid", "iid")
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))


def test_range_join_open_intervals(spark):
    """NULL end_ts fails loudly by default (silent drops were the old
    behavior); open_end closes open intervals for the join."""
    import pytest

    points = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 12:00:00"))], "pid long, k string, pts timestamp"
    )
    intervals = spark.createDataFrame(
        [(9, "k", _ts("2024-01-01 10:00:00"), None)],
        "iid long, k string, s timestamp, e timestamp",
    )
    with pytest.raises(Exception):  # Spark surfaces assert_true as a job error
        range_join_buckets(
            points, intervals, key="k", point_ts="pts", start_ts="s", end_ts="e"
        ).collect()
    out = range_join_buckets(
        points, intervals, key="k", point_ts="pts", start_ts="s", end_ts="e",
        open_end="2024-01-01 23:00:00",
    ).collect()
    assert [r["pid"] for r in out] == [1]
