"""round_double must equal DuckDB's ROUND(double, s) bit-for-bit —
including the binary-tie sliver where Spark's repr-based F.round
diverges (the round-6 sf0.001 unigram_logprob row)."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from hemera_indexer_spark.functions.rounding import round_double


def _cases():
    rng = random.Random(7)
    cases = [
        -1.4791604999999999,  # the observed divergence: exact 6dp tie
        0.0, 1.0, -1.0, 0.4999995, -0.4999995, 12.3456785,
    ]
    for _ in range(4000):
        base = rng.randint(-3_000_000, 3_000_000)
        eps = rng.choice([0.0, 1e-16, -1e-16, 1e-13, -1e-13, 1e-10,
                          -1e-10, 4.9999e-7, -4.9999e-7])
        cases.append(base / 1e6 + 5e-7 + eps)
        cases.append(rng.uniform(-100, 100))
    return cases


def test_round_double_equals_duckdb(spark):
    cases = _cases()
    df = spark.createDataFrame([(x,) for x in cases], "x double")
    got = [r["r"] for r in
           df.select(round_double(F.col("x"), 6).alias("r")).collect()]
    con = duckdb.connect()
    exp = [r[0] for r in con.execute(
        "SELECT ROUND(CAST(x AS DOUBLE), 6) FROM (SELECT UNNEST(?) AS x)",
        [cases]).fetchall()]
    diffs = [(x, g, e) for x, g, e in zip(cases, got, exp) if g != e]
    assert not diffs, diffs[:5]


def test_spark_round_diverges_on_the_tie(spark):
    # documents WHY round_double exists: plain F.round disagrees with
    # DuckDB on the binary-tie value (repr-based HALF_UP vs std::round)
    x = -1.4791604999999999
    df = spark.createDataFrame([(x,)], "x double")
    plain = df.select(F.round("x", 6).alias("r")).first()["r"]
    ours = df.select(round_double(F.col("x"), 6).alias("r")).first()["r"]
    assert plain == pytest.approx(-1.479161)
    assert ours == -1.47916
