"""Bounded-memory frequent-items sketch (Misra-Gries).

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

__all__ = ["heavy_hitters", "mg_partials"]

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
