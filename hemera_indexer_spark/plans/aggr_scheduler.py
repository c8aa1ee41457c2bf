"""Incremental OLAP scheduler — the aggr_jobs layer end-to-end.

Mirrors the reference's two-phase design
(/root/reference/indexer/aggr_jobs/aggr_job_scheduler.py:15-27):

1. **disorder phase** (order-independent): daily aggregates per day window,
   written with dynamic partition overwrite — re-running a day replaces
   exactly that day's partition (the reference's per-day upsert SQL,
   daily_wallet_addresses_aggregates.sql). Days are independent; Spark
   parallelizes within each day's job and days could run concurrently on a
   cluster — here they run in one job over all requested days, grouped by
   day partition (strictly more parallel than the reference's per-day
   thread pool).
2. **order phase** (order-dependent fold): period accumulators merged
   day-by-day sequentially via FULL OUTER JOIN + COALESCE sums
   (period_wallet_addresses_aggregates.sql:30-79), checkpointed per day so
   a crash resumes from the last folded day.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hemera_indexer_spark.plans.aggregates import (
    daily_user_aggregates,
    merge_period_accumulators,
)

SUM_COLS = ["n_events", "sum_value", "n_errors"]


class AggrScheduler:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.daily_dir = os.path.join(root, "daily")
        self.period_dir = os.path.join(root, "period")
        self.ckpt = os.path.join(root, "_period_ckpt.json")

    # ------------------------------------------------------ disorder phase
    def run_daily(self, events: DataFrame, days: list[str] | None = None) -> None:
        """(Re)compute daily aggregates; each day lands in its own partition
        via dynamic partition overwrite (idempotent per day)."""
        agg = daily_user_aggregates(events)
        if days:
            agg = agg.where(F.col("day").isin(days))
        (
            agg.repartition("day")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day")
            .parquet(self.daily_dir)
        )

    def daily(self) -> DataFrame:
        return self.spark.read.parquet(self.daily_dir)

    # --------------------------------------------------------- order phase
    def _last_folded(self) -> str | None:
        if os.path.exists(self.ckpt):
            with open(self.ckpt) as f:
                return json.load(f)["last_day"]
        return None

    def run_period(self) -> DataFrame:
        """Sequential day-by-day fold of daily aggregates into the running
        period accumulator, resuming after the last checkpointed day."""
        daily = self.daily().withColumn("day", F.col("day").cast("string"))
        days = sorted(r["day"] for r in daily.select("day").distinct().collect())
        last = self._last_folded()
        todo = [d for d in days if last is None or d > last]
        for d in todo:
            today = daily.where(F.col("day") == d)
            if os.path.exists(os.path.join(self.period_dir, "_SUCCESS")):
                period = self.spark.read.parquet(self.period_dir)
                merged = merge_period_accumulators(
                    today, period, keys=["user_id"], sum_cols=SUM_COLS
                )
            else:
                merged = today.select(["user_id"] + SUM_COLS)
            # write-then-swap: the fold reads its own output, so stage the
            # new period table before replacing (delete+insert pattern of
            # period_*.sql:1-4)
            staged = self.period_dir + ".staging"
            merged.write.mode("overwrite").parquet(staged)
            import shutil

            if os.path.exists(self.period_dir):
                shutil.rmtree(self.period_dir)
            os.replace(staged, self.period_dir)
            with open(self.ckpt, "w") as f:
                json.dump({"last_day": d}, f)
        return self.spark.read.parquet(self.period_dir)
