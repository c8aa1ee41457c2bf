"""Incremental OLAP layer — the aggr_jobs analog.

The reference runs (a) order-independent daily aggregates
(/root/reference/indexer/aggr_jobs/disorder_jobs/
daily_wallet_addresses_aggregates.sql:3-27 — COUNT DISTINCT, SUM, conditional
SUM grouped by (address, DATE(ts))) and (b) order-dependent period
accumulators merged day-by-day with a FULL OUTER JOIN + COALESCE sums
(/root/reference/indexer/aggr_jobs/order_jobs/
period_wallet_addresses_aggregates.sql:30-79). Both are pure Spark SQL here;
the period merge is the classic incremental-aggregation fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_user_aggregates(events: DataFrame) -> DataFrame:
    """Per (user_id, day): txn-count / distinct-actions / sums / conditional
    sums — the daily_wallet_addresses shape on the events table."""
    # float sums go through decimal(18,6): exact, order-independent, so the
    # result hashes identically regardless of partitioning (and matches any
    # external oracle bit-for-bit).
    dec = F.col("value").cast("decimal(18,6)")
    return events.groupBy(
        F.col("user_id"), F.to_date("ts").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.sum(dec).cast("double").alias("sum_value"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_errors"
        ),
        F.sum(
            F.when(F.col("value") > 50, dec).otherwise(F.lit(0).cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("sum_large_value"),
    )


def merge_period_accumulators(
    today: DataFrame, period: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """FULL OUTER JOIN + COALESCE(a,0)+COALESCE(b,0) — the running-period
    accumulator merge (period_wallet_addresses_aggregates.sql:79)."""
    t = today.select(keys + sum_cols)
    p = period.select(keys + sum_cols)
    for c in sum_cols:
        t = t.withColumnRenamed(c, f"_t_{c}")
        p = p.withColumnRenamed(c, f"_p_{c}")
    joined = t.join(p, on=keys, how="full_outer")
    out = joined.select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"_t_{c}"), F.lit(0))
                + F.coalesce(F.col(f"_p_{c}"), F.lit(0))
            ).alias(c)
            for c in sum_cols
        ],
    )
    return out
