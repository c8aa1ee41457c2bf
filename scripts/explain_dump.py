#!/usr/bin/env python
"""Dump .explain("formatted") for named __spark_entry__ queries to
plans/<tag>/<query>_<suffix>.txt — the plan evidence files for the
optimization rounds (guide §1: capture the plan shape before and after
every change).

Usage:
    python scripts/explain_dump.py --tag r06 --suffix before q1 q2 ...
    python scripts/explain_dump.py --tag r06 --suffix before --all
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="r06")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from hemera_indexer_spark.session import get_spark

    spark = get_spark("explain", cores=CPUS, shuffle_partitions=max(2 * CPUS, 16))
    qs = entry.queries()
    names = sorted(qs) if args.all else args.names
    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, SF_DIR)
            try:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
        except Exception as e:  # keep going; note the failure
            plan = f"EXPLAIN FAILED: {e}"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
