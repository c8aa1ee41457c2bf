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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hemera_indexer_spark.functions.rounding import round_double


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


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: how many users completed step k — where
    step k counts only if it happened STRICTLY AFTER the user's step k-1
    completion (the cascaded-min law: t_k = min ts of a step-k event with
    ts > t_{k-1}; order-independent, so any engine reproduces it exactly).
    Returns (step 1-indexed, step_name, users) with users
    non-increasing by construction.

    Shape: ONE shuffle — groupBy(user) collecting the user's (ts, type)
    events, then the whole cascade is array expressions (filter /
    transform / array_min) inside the aggregate projection; the per-step
    counts reduce a users-sized frame. Per-user arrays are bounded by
    that user's event count — for power-law users pre-filter to the
    funnel's event types (done below: only step types are collected)."""
    steps = tuple(steps)
    ev = events.where(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("_u"),
        F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("t")).alias("_e"),
    )
    per_user = ev.groupBy("_u").agg(F.collect_list("_e").alias("_es"))
    t_prev = None
    flags = []
    for i, s in enumerate(steps):
        if t_prev is None:
            cand = F.filter(F.col("_es"), lambda x: x["t"] == F.lit(s))
        else:
            tp = t_prev
            cand = F.filter(
                F.col("_es"),
                lambda x: (x["t"] == F.lit(s)) & (x["ts"] > tp),
            )
        t_k = F.array_min(F.transform(cand, lambda x: x["ts"]))
        per_user = per_user.withColumn(f"_t{i}", t_k)
        flags.append(F.col(f"_t{i}").isNotNull())
        t_prev = F.col(f"_t{i}")
    counted = per_user.agg(
        *[
            F.sum(fl.cast("long")).alias(f"_n{i}")
            for i, fl in enumerate(flags)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("step_name"),
                F.coalesce(F.col(f"_n{i}"), F.lit(0)).alias("users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counted.select(F.explode(rows).alias("r")).select("r.*")


def retention_cohorts(
    events: DataFrame,
    max_offset_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users grouped by FIRST-ACTIVITY day, counted on
    each later day they were active — (cohort_day, offset_days, users).
    Offset 0 is the cohort size; offsets beyond ``max_offset_days`` are
    dropped (bounds the output to days x offsets rows).

    Shape: one groupBy(user) for the cohort day, one equi-join back on
    the user key (users dim vs activity fact — the standard shape; Spark
    broadcasts the dim when small, AQE decides otherwise), one
    map-side-combined count-distinct per (cohort, offset)."""
    day = F.to_date(F.col(ts_col))
    firsts = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.min(day).alias("cohort_day")
    )
    activity = events.select(
        F.col(user_col).alias("_u"), day.alias("_day")
    ).distinct()
    j = activity.join(firsts, "_u")
    off = F.datediff(F.col("_day"), F.col("cohort_day"))
    return (
        j.where(off <= max_offset_days)
        .groupBy("cohort_day", off.alias("offset_days"))
        .agg(F.countDistinct("_u").alias("users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    (from_type, to_type, n, prob) where prob row-normalizes over
    from_type — the behavioral-model complement to ``funnel_counts``
    (which fixes one path) and ``retention_cohorts`` (which ignores
    order). Ordering is (ts, tiebreak) so equal timestamps cannot flip
    pairs between engines.

    Shape: ONE window shuffle keyed by user (lag), one map-side-combined
    pair count; the row normalization runs over the |types|² aggregate
    via an unpartitioned-by-key window on that tiny frame, never a second
    pass over events. prob rounds to 6dp decimal (the oracle law)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    pairs = (
        events.select(
            F.col(user_col),
            F.col(type_col).alias("to_type"),
            F.lag(type_col).over(w).alias("from_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    row_total = F.sum("n").over(Window.partitionBy("from_type"))
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        round_double(F.col("n") / row_total, 6)
        .cast("decimal(18,6)")
        .alias("prob"),
    )
