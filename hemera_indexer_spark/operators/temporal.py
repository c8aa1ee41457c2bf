"""Temporal join / versioning operators for CDC pipelines.

The reference has no as-of, range, or interval joins (SURVEY §2.3 notes
their absence) — but a CDC engine that materializes versioned state keeps
meeting them downstream: enrich an event with the dimension row that was
current AT the event's time (as-of), reconstruct validity intervals from a
change log (SCD Type-2), and correlate events within a bounded time window
(range join). All three are pure DataFrame compositions with exactly one
shuffle each; no per-row Python.

Scale notes (100 TB):
- ``asof_join`` is the union-merge shape: one shuffle on the join key,
  then a running ``last(ignorenulls)`` window — never an inequality join
  (which Spark plans as broadcast-nested-loop) and never a per-probe
  subquery. Cost is O(probe + dim) rows through one exchange.
- ``scd2_intervals`` is two narrow windows over one key-shuffle.
- ``range_join_buckets`` turns the inequality predicate into an equi-join
  on a time bucket (the standard interval-bucketing trick): each interval
  explodes to the buckets it covers (bounded by interval_len/bucket_width
  + 1), each point lands in exactly one bucket, so the join output needs
  no dedup and the shuffle key (key, bucket) is fine-grained enough to
  spread hot keys over time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    dim: DataFrame,
    key: str,
    probe_ts: str,
    dim_ts: str,
    dim_cols: list[str],
    dim_tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each probe row, attach the dim row with the
    largest ``dim_ts`` <= ``probe_ts`` for the same ``key`` (DuckDB
    ``ASOF JOIN ... ON probe.ts >= dim.ts`` semantics; equal timestamps
    match). Probe rows with no earlier dim row get NULLs.

    Physical shape: tag and union both inputs, shuffle ONCE on ``key``,
    sort within partition by (ts, side) with dim rows first at equal ts,
    and carry the latest dim payload forward with a running
    ``last(ignorenulls)`` frame. If several dim rows share (key, ts) the
    winner is the max ``dim_tiebreak`` (pass a unique column for
    deterministic output)."""
    side_cols = [c for c in probe.columns]
    d_payload = F.struct(*[F.col(c) for c in dim_cols]).alias("_dim")
    d = dim.select(
        F.col(key).alias(key),
        F.col(dim_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (
            F.col(dim_tiebreak) if dim_tiebreak is not None else F.lit(0)
        ).alias("_tb"),
        d_payload,
    )
    p = probe.select(
        *side_cols,
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(d.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(d.schema["_dim"].dataType).alias("_dim"),
    )
    u = p.unionByName(d, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_m", F.last("_dim", ignorenulls=True).over(w))
    out = matched.where(F.col("_side") == 1).select(
        *side_cols, *[F.col(f"_m.{c}").alias(c) for c in dim_cols]
    )
    return out


def scd2_intervals(
    df: DataFrame,
    key: str,
    version: str,
    attr: str,
) -> DataFrame:
    """SCD Type-2 history from a change log: compress consecutive versions
    with the same ``attr`` value and emit one validity interval per run —
    (key, attr, valid_from, valid_to, is_current), ``valid_to`` NULL for
    the open (current) interval. This is the reverse of the engine's LWW
    collapse: instead of keeping the last version, reconstruct WHEN each
    value was in force (the warehouse-dimension view of the same change
    stream the controller upserts; cf. the reference's current-state vs
    append-only fact split, common/models/current_token_balances.py:9-36).

    Two narrow windows over one key-shuffle: change-point filter via
    ``lag`` (null-safe), then ``lead`` over the surviving change points."""
    w = Window.partitionBy(key).orderBy(version)
    prev = F.lag(attr).over(w)
    prev_exists = F.lag(F.lit(1)).over(w)
    changes = df.select(key, version, attr).withColumn(
        "_chg",
        prev_exists.isNull() | ~F.col(attr).eqNullSafe(prev),
    ).where(F.col("_chg"))
    w2 = Window.partitionBy(key).orderBy(version)
    return changes.select(
        key,
        attr,
        F.col(version).alias("valid_from"),
        F.lead(version).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_micros: int = 3_600_000_000,
    open_end: str | None = None,
) -> DataFrame:
    """Interval range join without an inequality join: pair every point
    with every interval of the same ``key`` whose [start_ts, end_ts]
    contains it. Both timestamp axes bucket to ``bucket_micros`` wide
    slots; intervals explode to every slot they touch, points land in
    exactly one slot, and the (key, bucket) equi-join + exact range filter
    yields each qualifying pair exactly once — no dedup, no
    broadcast-nested-loop. Returns all point columns + all interval
    columns (names must not clash).

    Open intervals (NULL ``end_ts`` — e.g. the is_current rows of
    ``scd2_intervals``) cannot be bucketed unbounded: pass ``open_end``
    (a timestamp literal such as the stream's high-water mark) to close
    them for the join. Without it, a NULL end fails the job loudly
    (assert_true) instead of silently dropping the interval."""
    # unix_micros requires TIMESTAMP (not NTZ); the cast is applied to BOTH
    # axes so bucket alignment is invariant to the session timezone shift
    def _us(c: str):
        return F.unix_micros(F.col(c).cast("timestamp"))

    # the effective end lives in a TEMP column: the caller's end_ts column
    # comes back untouched (open intervals keep their NULL — downstream
    # is_current/duration logic must not see a fabricated close)
    if open_end is not None:
        eff_end = F.coalesce(F.col(end_ts), F.lit(open_end).cast("timestamp"))
    else:
        eff_end = F.when(
            F.assert_true(
                F.col(end_ts).isNotNull(),
                f"range_join_buckets: NULL {end_ts} (open interval) — "
                "pass open_end to close open intervals",
            ).isNull(),
            F.col(end_ts),
        )
    intervals = intervals.withColumn("_eff_end", eff_end)
    pb = points.withColumn(
        "_bkt", F.floor(_us(point_ts) / F.lit(bucket_micros))
    )
    ib = intervals.withColumn(
        "_bkts",
        F.sequence(
            F.floor(_us(start_ts) / F.lit(bucket_micros)),
            F.floor(_us("_eff_end") / F.lit(bucket_micros)),
        ),
    ).withColumn("_bkt", F.explode("_bkts")).drop("_bkts")
    joined = pb.join(ib, [key, "_bkt"]).where(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col("_eff_end"))
    )
    return joined.drop("_bkt", "_eff_end")
