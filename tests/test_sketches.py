"""Misra-Gries heavy hitters: exact regime vs groupBy-count, approximate
regime vs the N/(capacity+1) bound, merge correctness across partitions."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from hemera_indexer_spark.operators.sketches import heavy_hitters, mg_partials


def _stream(spark, items, n_partitions=4):
    return spark.createDataFrame(
        [(x,) for x in items], "item string"
    ).repartition(n_partitions)


def test_exact_when_capacity_covers_distincts(spark):
    items = ["a"] * 50 + ["b"] * 30 + ["c"] * 15 + ["d"] * 5
    df = _stream(spark, items)
    got = {r["item"]: r["est"] for r in heavy_hitters(df, "item", capacity=64, k=10).collect()}
    assert got == {"a": 50, "b": 30, "c": 15, "d": 5}


def test_approximate_regime_respects_error_bound(spark):
    # skewed zipf-ish stream, capacity far below distincts
    import random

    rng = random.Random(7)
    items = []
    for i in range(40):
        items += [f"t{i:03d}"] * (1 + 400 // (i + 1))
    rng.shuffle(items)
    true = Counter(items)
    n = len(items)
    capacity = 8
    df = _stream(spark, items, n_partitions=4)
    est = {
        r["item"]: r["est"]
        for r in heavy_hitters(df, "item", capacity=capacity, k=40).collect()
    }
    # every estimate is a lower bound within N/(capacity+1)
    for item, e in est.items():
        assert e <= true[item]
        assert true[item] - e <= n // (capacity + 1) + 1
    # every SUFFICIENTLY frequent item is guaranteed to surface: with P
    # partitions the per-item loss is at most sum over partitions of
    # N_p/(capacity+1) <= N/(capacity+1)
    bound = n / (capacity + 1)
    for item, c in true.items():
        if c > bound:
            assert item in est, f"{item} (count {c} > bound {bound:.0f}) missing"


def test_partials_bounded_per_partition(spark):
    items = [f"u{i}" for i in range(1000)]  # all distinct
    df = _stream(spark, items, n_partitions=4)
    parts = mg_partials(df, "item", capacity=16)
    per_part = (
        parts.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert all(r["count"] <= 16 for r in per_part)


def test_nulls_dropped_and_validation(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "item string")
    got = {r["item"]: r["est"] for r in heavy_hitters(df, "item", capacity=4, k=5).collect()}
    assert got == {"a": 2}
    with pytest.raises(ValueError, match="capacity"):
        mg_partials(df, "item", 0)


def test_deterministic_topk_tiebreak(spark):
    items = ["x"] * 3 + ["y"] * 3 + ["z"] * 3 + ["w"] * 1
    df = _stream(spark, items)
    rows = heavy_hitters(df, "item", capacity=16, k=3).collect()
    assert [(r["item"], r["est"]) for r in rows] == [("x", 3), ("y", 3), ("z", 3)]
