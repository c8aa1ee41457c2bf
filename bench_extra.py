#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds — bench.py is FROZEN for
measurement, so per-query isolation lives here (guide §1.4):

- times each named query with the noop sink (computes every column of
  every row, no driver collect) AND with the frozen bench's count()
  methodology, best-of-N each;
- labels jobs so the history server / logs stay readable.

Usage:
    python bench_extra.py q1 q2 ...          # named queries
    python bench_extra.py --all              # whole registry
    BENCH_X_REPS=3 python bench_extra.py ... # best-of-3 (default 2)

Prints one JSON line per query:
    {"query": name, "noop_sec": best, "count_sec": best, "samples": {...}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int,
                    default=int(os.environ.get("BENCH_X_REPS", "2")))
    ap.add_argument("--skip-noop", action="store_true",
                    help="count()-only timing (the frozen-bench methodology)")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from hemera_indexer_spark.session import get_spark

    spark = get_spark("bench_extra", cores=CPUS,
                      shuffle_partitions=max(2 * CPUS, 16))
    qs = entry.queries()
    names = sorted(qs) if args.all else args.names
    for name in names:
        if name not in qs:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        noop, cnt = [], []
        try:
            for i in range(args.reps):
                spark.sparkContext.setJobDescription(f"{name} count rep{i}")
                t0 = time.monotonic()
                df = qs[name](spark, SF_DIR)
                df.count()
                cnt.append(round(time.monotonic() - t0, 3))
                if not args.skip_noop:
                    spark.sparkContext.setJobDescription(f"{name} noop rep{i}")
                    t0 = time.monotonic()
                    df = qs[name](spark, SF_DIR)
                    df.write.format("noop").mode("overwrite").save()
                    noop.append(round(time.monotonic() - t0, 3))
        except Exception as e:
            print(json.dumps({"query": name, "error": str(e)[:200]}))
            continue
        finally:
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({
            "query": name,
            "count_sec": min(cnt) if cnt else None,
            "noop_sec": min(noop) if noop else None,
            "samples": {"count": cnt, "noop": noop},
        }), flush=True)


if __name__ == "__main__":
    main()
