#!/usr/bin/env python
"""Replication-chain probe: cost of the export feed during ingest, and
mirror apply throughput, at bench scale.

Three measured arms over the same deterministic change log:

  1. baseline   — StreamController replay, no sinks (the flagship bench)
  2. +export    — same replay with a ChangelogExportSink attached
                  (per-group net-diff + envelope write = the egress tax)
  3. mirror     — LakeMirror.sync() over the produced feed (the replica
                  apply cost, per envelope directory = one fenced merge)

Prints one JSON line; appends a BENCH.md row when --record is passed.
Gate on loadavg like every other measurement on this box
(CLAUDE.md: never trust a single sample; alternate arms, best-of-N).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--record", action="store_true",
                    help="append a BENCH.md section")
    args = ap.parse_args()

    from bench import _bench_spec, _ensure_log, _warmup
    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
    from hemera_indexer_spark.session import get_spark
    from hemera_indexer_spark.streaming import StreamController
    from hemera_indexer_spark.streaming.mirror import LakeMirror
    from hemera_indexer_spark.streaming.sinks import ChangelogExportSink

    load0 = os.getloadavg()[0]
    log_dir, total = _ensure_log(args.events)
    spark = get_spark("probe-mirror", cores=args.cores,
                      shuffle_partitions=args.cores)
    _warmup(spark)
    n_parts = _bench_spec(args.events).n_partitions

    root = tempfile.mkdtemp(prefix="probe_mirror_")
    walls = {"baseline": [], "export": [], "mirror": []}
    feed_rows = mirror_rows = 0
    n_dirs = 0
    try:
        for rep in range(args.reps):
            # arm 1: plain replay
            d = os.path.join(root, f"base{rep}")
            t = LakeTable.create(spark, d, SEQUENCES_SCHEMA, num_buckets=32)
            t0 = time.monotonic()
            StreamController(spark, t, log_dir, n_parts).run()
            walls["baseline"].append(round(time.monotonic() - t0, 3))

            # arm 2: replay + export sink
            d = os.path.join(root, f"exp{rep}")
            feed = os.path.join(root, f"feed{rep}")
            t = LakeTable.create(spark, d, SEQUENCES_SCHEMA, num_buckets=32)
            sink = ChangelogExportSink(t, feed)
            t0 = time.monotonic()
            StreamController(spark, t, log_dir, n_parts,
                             sinks=[sink]).run()
            walls["export"].append(round(time.monotonic() - t0, 3))

            # arm 3: mirror apply over that feed
            m = LakeMirror(spark, feed, os.path.join(root, f"rep{rep}"))
            t0 = time.monotonic()
            n_dirs = m.sync()
            walls["mirror"].append(round(time.monotonic() - t0, 3))
            mirror_rows = m.state().count()
            feed_rows = sum(
                spark.read.parquet(os.path.join(feed, d2)).count()
                for d2 in os.listdir(feed) if d2.startswith("chg_v")
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)

    base, exp, mir = (min(walls[k]) for k in ("baseline", "export", "mirror"))
    report = {
        "metric": "replication_chain",
        "events": total,
        "cores": args.cores,
        "baseline_replay_sec": base,
        "replay_with_export_sec": exp,
        "export_overhead_pct": round(100.0 * (exp - base) / base, 1),
        "mirror_apply_sec": mir,
        "envelope_dirs": n_dirs,
        "envelope_rows": feed_rows,
        "replica_rows": mirror_rows,
        "mirror_rows_per_sec": round(feed_rows / mir, 1),
        "walls_all": walls,
        "loadavg_1m_at_start": round(load0, 2),
    }
    print(json.dumps(report))
    if args.record:
        with open(os.path.join(REPO, "BENCH.md"), "a") as f:
            f.write(
                f"\n## Replication chain ({time.strftime('%Y-%m-%d %H:%M:%S')})\n\n"
                f"{total} events, local[{args.cores}], best-of-{args.reps} "
                f"(loadavg at start {load0:.2f}):\n\n"
                f"| arm | wall (s) |\n|---|---|\n"
                f"| replay, no sinks | {base} |\n"
                f"| replay + ChangelogExportSink | {exp} "
                f"({report['export_overhead_pct']:+.1f}%) |\n"
                f"| LakeMirror apply ({n_dirs} dirs, {feed_rows} envelope "
                f"rows) | {mir} ({report['mirror_rows_per_sec']:.0f} "
                f"rows/s) |\n\n"
                f"All samples: {json.dumps(walls)}.\n"
            )


if __name__ == "__main__":
    main()
