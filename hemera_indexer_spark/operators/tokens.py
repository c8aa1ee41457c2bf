"""Token-level operators over the engine's native payload — the
``tokens: array<int>`` column of the state table. These are the
aggregate views a training pipeline derives from the materialized
corpus: vocabulary histograms (tokenizer coverage / distribution drift)
and per-group token budgets (mixture accounting).

All pure DataFrame compositions: explode is map-only, both aggregates
are map-side combined, nothing crosses the Python boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def vocab_histogram(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str | None = None,
    top_k: int | None = None,
    approx: bool = False,
) -> DataFrame:
    """Corpus-wide token frequency: (token, n_occurrences, n_docs).
    ``top_k`` keeps only the most frequent tokens (ordered by count desc,
    token asc — deterministic).

    The ``n_occurrences`` side is one map-side-combined groupBy over the
    exploded token stream (the explode is map-only, so its shuffle carries
    one row per DISTINCT token per map split). ``n_docs`` is the expensive
    half: an EXACT ``countDistinct(doc)`` cannot partially aggregate —
    every (token, doc) occurrence pair crosses the shuffle, O(corpus
    occurrences) bytes at 100 TB. ``approx=True`` routes it through
    ``approx_count_distinct`` (HyperLogLog++, default rsd 5%), whose
    fixed-size sketch DOES combine map-side — shuffle back to one row per
    distinct token per split. Exact stays the default because it is the
    oracle-comparable mode; flip to approx for corpus-scale runs.

    When ``id_col`` is None doc identity falls back to
    ``monotonically_increasing_id`` — nondeterministic across stage
    retries / different partitionings. Harmless for counting distinct
    docs (any bijective relabeling gives the same counts within one
    uninterrupted computation), but never join on it, and prefer a real
    id column whenever one exists."""
    doc = (
        F.col(id_col) if id_col is not None else F.monotonically_increasing_id()
    )
    occ = df.select(doc.alias("_doc"), F.explode(tokens_col).alias("token"))
    ndocs = (
        F.approx_count_distinct("_doc") if approx else F.countDistinct("_doc")
    )
    hist = occ.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        ndocs.alias("n_docs"),
    )
    if top_k is not None:
        hist = hist.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(top_k)
    return hist


def token_budget(
    df: DataFrame, group_col: str, tokens_col: str = "tokens"
) -> DataFrame:
    """Per-group token accounting: (group, n_docs, n_tokens, share).
    The mixture-weight input of a training run — computed from array
    sizes only (no explode; ``size`` is evaluated on the column
    metadata-free but without touching element values)."""
    # size(NULL) is -1 in Spark — a NULL tokens array (e.g. a row written
    # before the column evolved in) must count as 0, not deflate the sum
    sz = F.when(F.col(tokens_col).isNull(), F.lit(0)).otherwise(
        F.size(tokens_col)
    )
    totals = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(sz).cast("long").alias("n_tokens"),
    )
    # grand total via an unpartitioned window over the (tiny, one row per
    # group) aggregate — no second scan of the corpus
    grand = F.sum("n_tokens").over(Window.partitionBy())
    return totals.select(
        group_col,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / grand, 6).alias("share"),
    )
