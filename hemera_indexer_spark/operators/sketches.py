"""Bounded-memory mergeable sketches: frequent items (Misra-Gries) and
deterministic quantiles (Munro-Paterson multi-level buffers).

The custom-sketch slot of the pipeline toolbox: estimate the top-k most
frequent items of a huge keyed stream with O(capacity) state per task,
never a full (item, count) table.

When to use it — and when NOT to: Spark's ``groupBy(col).count()`` already
map-side-combines, so its shuffle is bounded by DISTINCT items per
partition, and that is the right plan whenever the distinct set fits in
executor memory (every oracle-checked query in this repo uses it). The
sketch wins only on web-scale long tails (URLs, user ids, raw shingles)
where even the per-partition distinct set blows the hash-aggregate into
spill: Misra-Gries caps the per-task state at ``capacity`` counters with
the classic guarantee ``true_count - estimate <= N / (capacity + 1)``
(Misra & Gries 1982), and partial summaries merge losslessly within that
bound (Agarwal et al., "Mergeability of Summaries", PODS 2012).

Plan shape: ONE ``mapInPandas`` pass emits <= capacity (item, weight)
rows per task (Arrow-batched, value_counts-vectorized — never a per-row
Python UDF), a tiny groupBy-sum merges the partials (<= capacity x tasks
rows), and a window picks the deterministic top-k. Estimates only ever
UNDER-count; any item with true frequency > N/(capacity+1) is guaranteed
to surface.

Exactness regime: if every partition's distinct-item count stays <=
capacity, no decrement ever fires and the output equals the exact
groupBy-count — which is what the DuckDB oracle checks at test scale
(capacity >> vocabulary), while the property suite drives the
approximate regime against the error bound.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "heavy_hitters",
    "mg_partials",
    "quantile_partials",
    "quantile_sketch",
]

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("item", T.StringType(), False),
        T.StructField("c", T.LongType(), False),
    ]
)


def mg_partials(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-task Misra-Gries partial summaries: <= ``capacity`` (item, c)
    rows per input partition. NULL items are dropped (they are not a
    frequency question). Exposed separately so callers can persist or
    further merge partials themselves.

    The whole update lives INSIDE the closure (no module-global
    references), so cloudpickle ships it by value and workers need no
    package import — the operator runs under bare spark-submit without
    --py-files."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Weighted Misra-Gries: bulk-add each batch's exact value_counts
        # (exact within the batch), then if over capacity subtract the
        # (capacity+1)-th largest value from every counter and drop the
        # non-positive ones — the PODS'12 merge step applied batch-wise.
        # Each recap subtracts at most (weight seen)/(capacity+1) from
        # any counter, preserving the global N/(capacity+1) bound.
        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].dropna().astype(str).value_counts()
            if not len(vc):
                continue
            for item, n in vc.items():
                counters[item] = counters.get(item, 0) + int(n)
            if len(counters) > capacity:
                vals = sorted(counters.values(), reverse=True)
                t = vals[capacity]  # (capacity+1)-th largest
                for item in list(counters):
                    c = counters[item] - t
                    if c > 0:
                        counters[item] = c
                    else:
                        del counters[item]
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "c": list(counters.values())}
            )

    return df.select(col).mapInPandas(summarize, _PARTIAL_SCHEMA)


def heavy_hitters(
    df: DataFrame, col: str, capacity: int = 4096, k: int = 20
) -> DataFrame:
    """Top-k frequent items with bounded per-task memory. Returns
    ``(item, est)`` — ``est`` is a LOWER bound on the true count, within
    N/(capacity+1) of it — ordered/tie-broken by (est desc, item asc)
    and limited to k rows deterministically.

    The merged partials are NOT recapped to ``capacity`` (the summary is
    <= capacity x tasks rows — driver-trivial; skipping the recap only
    tightens the estimates)."""
    merged = (
        mg_partials(df, col, capacity)
        .groupBy("item")
        .agg(F.sum("c").alias("est"))
    )
    w = Window.orderBy(F.desc("est"), F.asc("item"))
    return (
        merged.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("item", "est")
    )


_Q_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("v", T.DoubleType(), False),
        T.StructField("w", T.LongType(), False),
    ]
)


def quantile_partials(
    df: DataFrame, col: str, buffer_size: int = 4096
) -> DataFrame:
    """Per-task DETERMINISTIC mergeable quantile summaries (the classic
    Munro-Paterson multi-level buffer collapse, no randomness — unlike
    KLL's coin flips, so replays and retries reproduce bit-identically).

    State per task: at most one buffer of ``buffer_size`` sorted values
    per level; a level-L value represents 2^L originals. Two level-L
    buffers collapse by merge-sorting their 2b values and keeping the
    ODD positions (fixed offset — determinism over the unbiasedness a
    random offset would buy), yielding one level-(L+1) buffer. Memory is
    O(buffer_size x levels) = O(b log(n/b)) per task; each collapse at
    level L perturbs any rank by <= 2^L, giving total rank error
    <= ceil(log2(n/b) + 1) * n / (2b) — the bound the property suite
    drives. Output: <= b values per level as (v, weight=2^level) rows.

    Exactness regime: a task whose value count stays <= buffer_size never
    collapses, so its partial is the exact weighted multiset — which is
    what the DuckDB oracle checks at test scale, while the property
    tests cover the approximate regime.

    Like ``mg_partials``, the whole update lives inside the closure so
    cloudpickle ships it by value (bare spark-submit safe)."""
    if buffer_size < 2 or buffer_size % 2:
        raise ValueError(
            f"buffer_size must be an even integer >= 2, got {buffer_size}"
        )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        levels: dict[int, list] = {}  # level -> sorted list (len <= b)

        def push(level: int, buf: list) -> None:
            # carry-propagate: colliding buffers collapse upward, exactly
            # like binary addition — at most one buffer per level survives
            while level in levels:
                other = levels.pop(level)
                merged = sorted(other + buf)
                buf = merged[1::2]  # odd positions, fixed offset
                level += 1
            levels[level] = buf

        pending: list = []
        for pdf in batches:
            # vectorized intake (one tolist per Arrow batch, never a
            # per-row Python loop); drain in full-buffer chunks
            pending.extend(pdf[col].dropna().astype(float).tolist())
            while len(pending) >= buffer_size:
                push(0, sorted(pending[:buffer_size]))
                pending = pending[buffer_size:]
        if pending:
            # a final partial level-0 buffer: exact, weight 1 — never
            # collapsed into a full buffer (that would inflate weights)
            levels.setdefault(-1, []).extend(sorted(pending))
        out_v, out_w = [], []
        for lvl, buf in levels.items():
            w = 1 if lvl < 0 else 2 ** lvl
            out_v.extend(buf)
            out_w.extend([w] * len(buf))
        if out_v:
            yield pd.DataFrame({"v": out_v, "w": out_w})

    return df.select(col).mapInPandas(summarize, _Q_PARTIAL_SCHEMA)


def quantile_sketch(
    df: DataFrame,
    col: str,
    probs: list[float],
    buffer_size: int = 4096,
) -> DataFrame:
    """Approximate discrete quantiles from the deterministic sketch:
    for each p, the smallest sampled value whose cumulative weight
    reaches ceil(p * N) (the quantile_disc rank rule, so the exact
    regime matches any engine computing the same rule on the raw data).

    Plan shape: one map-only sketch pass, then ONE single-partition sort
    window over the merged partials — tiny by construction
    (<= tasks x b x levels rows), which is the whole point: the window
    that would be a scale-killer on raw data is fine on the summary.
    Returns (p, v) ordered by p."""
    parts = quantile_partials(df, col, buffer_size)
    w_cum = Window.orderBy("v", "w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = parts.select(
        "v",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(w_all).alias("n"),
    )
    # one range join against the tiny probs table (never re-running the
    # sketch pass per quantile): for each p, min sampled v whose
    # cumulative weight reaches the rank
    probs_df = df.sparkSession.createDataFrame(
        [(float(p),) for p in probs], "p double"
    )
    return (
        ranked.join(
            F.broadcast(probs_df),
            F.col("cum")
            >= F.greatest(F.ceil(F.col("p") * F.col("n")), F.lit(1)),
        )
        .groupBy("p")
        .agg(F.min("v").alias("v"))
        .orderBy("p")
    )
