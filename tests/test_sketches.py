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


# ---------------------------------------------------------------- quantiles
def _vals(spark, xs, n_partitions=4):
    return spark.createDataFrame(
        [(float(x),) for x in xs], "v double"
    ).repartition(n_partitions)


def _exact_disc(xs, p):
    s = sorted(xs)
    import math

    return s[max(math.ceil(p * len(s)), 1) - 1]


def test_quantile_exact_regime_matches_disc_rule(spark):
    import random

    rng = random.Random(3)
    xs = [rng.uniform(-100, 100) for _ in range(500)]
    probs = [0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    from hemera_indexer_spark.operators.sketches import quantile_sketch

    got = {
        r["p"]: r["v"]
        for r in quantile_sketch(
            _vals(spark, xs), "v", probs, buffer_size=1024
        ).collect()
    }
    assert got == {p: _exact_disc(xs, p) for p in probs}


def test_quantile_approximate_regime_rank_error_bound(spark):
    import math
    import random

    rng = random.Random(7)
    xs = [rng.gauss(0, 1) for _ in range(4000)]
    n, b = len(xs), 64
    probs = [0.1, 0.5, 0.9]
    from hemera_indexer_spark.operators.sketches import quantile_sketch

    got = {
        r["p"]: r["v"]
        for r in quantile_sketch(
            _vals(spark, xs, n_partitions=4), "v", probs, buffer_size=b
        ).collect()
    }
    s = sorted(xs)
    # documented bound (per task, merged): ceil(log2(n/b)+1) * n / (2b);
    # partitioning splits n across tasks, which only tightens it
    bound = math.ceil(math.log2(n / b) + 1) * n / (2 * b)
    for p, v in got.items():
        target = max(math.ceil(p * n), 1)
        # rank of the returned value in the TRUE sorted data
        import bisect

        lo = bisect.bisect_left(s, v) + 1
        hi = bisect.bisect_right(s, v)
        err = min(abs(lo - target), abs(hi - target))
        assert err <= bound, (p, v, err, bound)


def test_quantile_partials_are_exact_weighted_multiset_when_small(spark):
    from hemera_indexer_spark.operators.sketches import quantile_partials

    xs = list(range(100))
    rows = quantile_partials(_vals(spark, xs), "v", buffer_size=256).collect()
    assert all(r["w"] == 1 for r in rows)
    assert sorted(r["v"] for r in rows) == [float(x) for x in xs]


def test_quantile_weight_conservation_and_validation(spark):
    import pytest as _pt

    from hemera_indexer_spark.operators.sketches import (
        quantile_partials,
        quantile_sketch,
    )

    xs = list(range(1000))
    rows = quantile_partials(
        _vals(spark, xs, n_partitions=3), "v", buffer_size=16
    ).collect()
    # the summary never loses or invents mass
    assert sum(r["w"] for r in rows) == len(xs)
    with _pt.raises(ValueError, match="even integer"):
        quantile_sketch(_vals(spark, xs), "v", [0.5], buffer_size=7)
