#!/usr/bin/env python
"""Stage-by-stage decomposition of the CDC replay at one parallelism level.

Run once per core count in a FRESH process (same protocol as
bench.py --scaling):

    TMPDIR=/dev/shm SPARK_LOCAL_DIR=/dev/shm/spark-tmp \
    BENCH_LAKE_DIR=/dev/shm/bench_lake \
    python scripts/profile_scaling.py --cores 4  --events 8000000
    python scripts/profile_scaling.py --cores 16 --events 8000000

Phases (each cumulative slice isolated by subtraction, best of --reps):

    scan        read the change log, count            (parquet decode)
    agg_noop    + sql partial-max_by reduce, noop sink (agg + winner shuffle)
    write       + partitionBy(_bucket) parquet write   (encode + write I/O)
    merge       full merge_upsert                      (+ footer stats, commit)
    full        full StreamController.run()            (+ epoch meta, manifest,
                                                         auto-pick, compaction check)

so  merge - write  = per-commit driver fixed cost (footer stat pass +
snapshot JSON + commit bookkeeping) and  full - merge  = controller fixed
cost (epoch footer metadata, manifest build, strategy auto-pick). Those two
are the wave-independent per-run terms that cap high-core efficiency.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--events", type=int, default=8_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--buckets", type=int,
                    default=int(os.environ.get("BENCH_BUCKETS", "128")))
    args = ap.parse_args()

    from bench import _bench_spec, _ensure_log, _warmup
    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.schemas import CHANGE_EVENT_SCHEMA, SEQUENCES_SCHEMA
    from hemera_indexer_spark.session import get_spark
    from hemera_indexer_spark.streaming import StreamController
    from pyspark.sql import functions as F

    spark = get_spark(
        "profile", cores=args.cores,
        shuffle_partitions=max(2 * args.cores, 16),
    )
    log_dir, total = _ensure_log(args.events)
    _warmup(spark, "sql")

    import glob

    import pyspark.sql.types as T

    files = sorted(glob.glob(os.path.join(log_dir, "epoch=*", "partition=*", "*.parquet")))
    # the bench log evolves `lang` at epoch 3 — same union schema the
    # controller derives from the footers
    ev_schema = T.StructType(
        list(CHANGE_EVENT_SCHEMA.fields) + [T.StructField("lang", T.StringType(), True)]
    )

    def timed(fn):
        best = None
        for _ in range(args.reps):
            t0 = time.monotonic()
            fn()
            w = time.monotonic() - t0
            best = w if best is None else min(best, w)
        return round(best, 3)

    out = {"cores": args.cores, "events": total, "buckets": args.buckets,
           "loadavg_start": os.getloadavg()[0]}

    # -------------------------------------------------------------- scan
    def scan():
        spark.read.schema(ev_schema).parquet(*files).count()

    out["scan"] = timed(scan)

    # ------------------------------------------------- agg + winner shuffle
    def make_table(tmp):
        return LakeTable.create(
            spark, os.path.join(tmp, "t"), SEQUENCES_SCHEMA,
            num_buckets=args.buckets, properties={"write_mode": "mor"},
        )

    tmp0 = tempfile.mkdtemp(prefix="prof_lake_", dir=os.environ.get("BENCH_LAKE_DIR"))
    t0tab = make_table(tmp0)
    t0tab.evolve_schema([T.StructField("lang", T.StringType(), True)])
    state_cols = t0tab.schema.fieldNames()
    from hemera_indexer_spark.functions import bucket_col

    def reduced_df():
        df = spark.read.schema(ev_schema).parquet(*files)
        upd = df.where(F.col("op") != "rollback").withColumn(
            "is_deleted", F.col("op") == F.lit("delete")
        )
        for c in state_cols:
            if c not in upd.columns:
                upd = upd.withColumn(c, F.lit(None).cast(t0tab.schema[c].dataType))
        upd = upd.select(*state_cols).withColumn(
            "_bucket", bucket_col(F.col("doc_id"), args.buckets)
        )
        return t0tab._lww_reduce(None, upd.withColumn("_prio", F.lit(0)),
                                 state_cols, "sql")

    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")

    def agg_noop():
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            reduced_df().write.format("noop").mode("overwrite").save()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)

    out["agg_noop"] = timed(agg_noop)

    # ------------------------------------------------------ parquet write
    def write_only():
        dest = tempfile.mkdtemp(prefix="prof_out_", dir=os.environ.get("BENCH_LAKE_DIR"))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            reduced_df().write.partitionBy("_bucket").mode("overwrite").parquet(
                os.path.join(dest, "d")
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
            shutil.rmtree(dest, ignore_errors=True)

    out["write"] = timed(write_only)

    # ------------------------------------------------------- merge_upsert
    def merge():
        tmp = tempfile.mkdtemp(prefix="prof_lake_", dir=os.environ.get("BENCH_LAKE_DIR"))
        try:
            t = make_table(tmp)
            t.evolve_schema([T.StructField("lang", T.StringType(), True)])
            df = spark.read.schema(ev_schema).parquet(*files)
            t.merge_upsert(df.where(F.col("op") != "rollback"),
                           epoch_id=0, strategy="sql")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    out["merge"] = timed(merge)

    # ------------------------------------------------------------- full
    def full():
        tmp = tempfile.mkdtemp(prefix="prof_lake_", dir=os.environ.get("BENCH_LAKE_DIR"))
        try:
            t = make_table(tmp)
            StreamController(spark, t, log_dir,
                             _bench_spec(args.events).n_partitions,
                             merge_strategy="sql").run()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    out["full"] = timed(full)

    shutil.rmtree(tmp0, ignore_errors=True)
    out["loadavg_end"] = os.getloadavg()[0]
    out["derived"] = {
        "agg_shuffle": round(out["agg_noop"] - out["scan"], 3),
        "parquet_write": round(out["write"] - out["agg_noop"], 3),
        "commit_fixed": round(out["merge"] - out["write"], 3),
        "controller_fixed": round(out["full"] - out["merge"], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
