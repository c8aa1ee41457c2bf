"""Measured evidence for per-file key Bloom filters: build two identical
merge-on-read lakes (blooms on / off), leave each bucket with a deep
delta chain (the uncompacted worst case a point lookup actually hits),
then time `lookup_many` and `lookup` best-of-N on both and report the
`scan_report` file counts alongside the walls.

Run on a quiet box (1-min loadavg < 1.5); one JSON line on stdout:

    TMPDIR=/dev/shm SPARK_LOCAL_DIR=/dev/shm/spark-tmp \
        python scripts/probe_bloom.py [--epochs 24] [--rows 40000]
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
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--rows", type=int, default=40000)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--root", default="/dev/shm/bloom_probe")
    args = ap.parse_args()

    if os.getloadavg()[0] > 1.5:
        print(json.dumps({"error": "loadavg gate", "load": os.getloadavg()}))
        return

    from pyspark.sql import functions as F

    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
    from hemera_indexer_spark.session import get_spark

    spark = get_spark("bloom-probe", cores=args.cores,
                      shuffle_partitions=args.buckets)
    shutil.rmtree(args.root, ignore_errors=True)

    def build(root, **kw):
        t = LakeTable.create(
            spark, root, SEQUENCES_SCHEMA, num_buckets=args.buckets, **kw
        )
        for e in range(args.epochs):
            # disjoint key ranges per epoch: every bucket gains one delta
            # file per epoch, and a given key truly lives in ONE file —
            # exactly the shape blooms are built to exploit.
            base = e * args.rows
            df = (
                spark.range(args.rows)
                .select(
                    F.concat(F.lit("doc-"), (F.col("id") + base)).alias("doc_id"),
                    (F.col("id") + base + 1).alias("seq"),
                    F.lit("upsert").alias("op"),
                    F.sequence(F.lit(1), F.lit(64)).cast("array<int>").alias("tokens"),
                    F.lit("en").alias("lang"),
                )
            )
            t.merge_upsert(df, epoch_id=e)
        return t

    t_off = build(os.path.join(args.root, "off"))
    t_on = build(os.path.join(args.root, "on"), bloom_bits=1 << 19)  # 64 KiB/file

    probe_one = f"doc-{(args.epochs // 2) * args.rows + 7}"
    probe_many = [f"doc-{e * args.rows + 11}" for e in range(0, args.epochs, 3)]

    def bom(fn):
        walls = []
        for _ in range(args.reps):
            s = time.monotonic()
            fn()
            walls.append(round(time.monotonic() - s, 3))
        return min(walls), walls

    out = {
        "epochs": args.epochs,
        "rows_total": args.epochs * args.rows,
        "buckets": args.buckets,
        "n_probe_many": len(probe_many),
    }
    for name, t in (("off", t_off), ("on", t_on)):
        rep1 = t.scan_report(key_values=[probe_one])
        repm = t.scan_report(key_values=probe_many)
        w1, all1 = bom(lambda: t.lookup(probe_one).collect())
        wm, allm = bom(lambda: t.lookup_many(probe_many).collect())
        out[name] = {
            "lookup_files": f'{rep1["files_kept"]}/{rep1["files_total"]}',
            "lookup_s": w1,
            "lookup_walls": all1,
            "lookup_many_files": f'{repm["files_kept"]}/{repm["files_total"]}',
            "lookup_many_s": wm,
            "lookup_many_walls": allm,
        }
    out["speedup_lookup"] = round(out["off"]["lookup_s"] / out["on"]["lookup_s"], 2)
    out["speedup_many"] = round(
        out["off"]["lookup_many_s"] / out["on"]["lookup_many_s"], 2
    )
    out["load1"] = round(os.getloadavg()[0], 2)
    shutil.rmtree(args.root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
