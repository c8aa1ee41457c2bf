"""Measured evidence for CHECK-constraint enforcement cost: replay the
same generated change log three ways — no checks, one check under the
default abort policy (per-batch aggregate validation pass), and the
same check under check_policy='quarantine' (divert scan every group,
merge-time pass skipped) — best-of-N alternating arms, and report the
walls side by side.

The check is satisfied by every generated event, so all three arms
commit identical state and the delta is pure enforcement overhead.

Run on a quiet box (1-min loadavg < 1.5); one JSON line on stdout:

    TMPDIR=/dev/shm SPARK_LOCAL_DIR=/dev/shm/spark-tmp \
        python scripts/probe_checks.py [--epochs 8] [--events 250000]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--events", type=int, default=250000,
                    help="events per epoch")
    ap.add_argument("--docs", type=int, default=200000)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--root", default="/dev/shm/checks_probe")
    args = ap.parse_args()

    if os.getloadavg()[0] > 1.5:
        print(json.dumps({"error": "loadavg gate", "load": os.getloadavg()}))
        return

    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
    from hemera_indexer_spark.session import get_spark
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )
    from hemera_indexer_spark.streaming import StreamController

    spark = get_spark("checks-probe", cores=args.cores,
                      shuffle_partitions=args.buckets)
    shutil.rmtree(args.root, ignore_errors=True)
    os.makedirs(args.root)
    log = os.path.join(args.root, "log")
    generate_changelog(
        log,
        ChangelogSpec(
            n_docs=args.docs, n_epochs=args.epochs,
            events_per_epoch=args.events, n_partitions=4, seed=3,
        ),
    )
    n_events = args.epochs * args.events

    ARMS = ("none", "abort", "quarantine")

    def run(arm: str, i: int) -> float:
        root = os.path.join(args.root, f"lake_{arm}_{i}")
        t = LakeTable.create(
            spark, root, SEQUENCES_SCHEMA, num_buckets=args.buckets
        )
        kw: dict = {}
        if arm != "none":
            # satisfied by every generated event: measures pure overhead
            t.set_check("sane", "n_tok IS NULL OR n_tok >= 0")
        if arm == "quarantine":
            kw = dict(
                quarantine_dir=os.path.join(args.root, f"dl_{arm}_{i}"),
                check_policy="quarantine",
            )
        t0 = time.monotonic()
        StreamController(spark, t, log, 4, **kw).run()
        wall = time.monotonic() - t0
        shutil.rmtree(root, ignore_errors=True)
        return round(wall, 3)

    run("none", 99)  # warm codegen/readers outside the timed arms
    walls = {a: [] for a in ARMS}
    for i in range(args.reps):
        for a in ARMS:  # alternate arms against drift
            walls[a].append(run(a, i))
    best = {a: min(w) for a, w in walls.items()}
    report = {
        "metric": "check_enforcement_overhead",
        "events": n_events,
        "wall_none_sec": best["none"],
        "wall_abort_sec": best["abort"],
        "wall_quarantine_sec": best["quarantine"],
        "abort_overhead_pct": round(
            100 * (best["abort"] / best["none"] - 1), 1
        ),
        "quarantine_overhead_pct": round(
            100 * (best["quarantine"] / best["none"] - 1), 1
        ),
        "walls_all": walls,
        "loadavg_1m_at_start": round(os.getloadavg()[0], 2),
        "cores": args.cores,
    }
    print(json.dumps(report))
    shutil.rmtree(args.root, ignore_errors=True)


if __name__ == "__main__":
    main()
