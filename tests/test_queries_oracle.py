"""Mimics the driver's correctness gate: run every ``__spark_entry__``
query at sf0.01 on Spark AND its oracle SQL on DuckDB, then compare
row count, column names, and order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in entry.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows(cols, data):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in idx) for r in data
    ), [cols[i] for i in idx]


ORACLES = entry.oracle_sql()
QUERIES = entry.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ducks, name):
    df = QUERIES[name](spark, SF_DIR)
    got = [tuple(r) for r in df.collect()]
    got_rows, got_cols = _rows(df.columns, got)
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert len(got_rows) >= 0
        return
    res = ducks.execute(ORACLES[name])
    exp_cols = [d[0] for d in res.description]
    exp = res.fetchall()
    exp_rows, exp_cols = _rows(exp_cols, exp)
    assert got_cols == exp_cols, f"{name}: columns {got_cols} != {exp_cols}"
    assert len(got_rows) == len(exp_rows), (
        f"{name}: rows {len(got_rows)} != {len(exp_rows)}"
    )
    n_bad = sum(1 for g, e in zip(got_rows, exp_rows) if g != e)
    assert n_bad == 0, (
        f"{name}: {n_bad} mismatched rows; first: "
        f"{next((g, e) for g, e in zip(got_rows, exp_rows) if g != e)}"
    )
