#!/usr/bin/env python
"""Driver-canon dtype audit: for each declared query, build pandas frames
BOTH ways — Spark ``toPandas()`` vs DuckDB ``.df()`` — and report
per-column dtype mismatches plus exact-value mismatches after a
sort_values canonicalization. This mimics the per-round driver's
correctness hash (which is dtype-sensitive), unlike the historical local
gate (which compared Python objects where DuckDB Decimals == Spark
Decimals).

Usage: python scripts/dtype_audit.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # list cells break sort_values (the driver errs on them); tuple-ize
    for c in df.columns:
        if df[c].dtype == object and df[c].map(lambda v: isinstance(v, (list, tuple))).any():
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> None:
    import __spark_entry__ as entry
    from hemera_indexer_spark.session import get_spark

    spark = get_spark("dtype_audit", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in entry.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, oracles = entry.queries(), entry.oracle_sql()
    names = sys.argv[1:] or [n for n in qs if n in oracles]
    bad = []
    for name in names:
        try:
            got = qs[name](spark, SF_DIR).toPandas()
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ERR {str(e)[:160]}")
            bad.append(name)
            continue
        issues = []
        if sorted(got.columns) != sorted(exp.columns):
            issues.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        else:
            for c in sorted(got.columns):
                if str(got[c].dtype) != str(exp[c].dtype):
                    issues.append(f"{c}: spark={got[c].dtype} duck={exp[c].dtype}")
            try:
                g, e = canon(got), canon(exp)
                if len(g) != len(e):
                    issues.append(f"rows {len(g)} != {len(e)}")
                elif not g.equals(e):
                    neq = [c for c in g.columns if not g[c].equals(e[c])]
                    issues.append(f"values differ in {neq}")
            except Exception as ce:
                issues.append(f"canon err: {str(ce)[:120]}")
        if issues:
            bad.append(name)
            print(f"{name}: " + "; ".join(issues))
    print(f"# {len(bad)} / {len(names)} queries with driver-canon issues")
    print("# bad:", ",".join(bad))


if __name__ == "__main__":
    main()
