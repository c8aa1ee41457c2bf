"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): select pretraining documents whose hashed-n-gram
distribution looks like a small TARGET corpus.

Method: featurize every document as a bag of hashed n-grams (unigrams +
adjacent bigrams into ``n_features`` buckets — the same md5-prefix
bucket rule as ``feature_hashing``, operators/text.py), fit two
Laplace-smoothed bag-of-buckets models — p̂_target over the target
corpus, p̂_raw over the raw pool — and score each raw document with the
importance log-weight

    log w(x) = Σ_grams ( ln p̂_target[b(gram)] − ln p̂_raw[b(gram)] )

Documents with the highest weights are the ones the target
distribution up-weights; resampling by weight yields a target-shaped
training subset. The hashed-feature trick is what makes this scale: the
model is ``n_features`` numbers regardless of corpus size — no
vocabulary pass, no dictionary broadcast.

Scale shape (100 TB pool): ONE map-only gram pass per corpus (unigrams
and bigrams concat off a single split — never a two-stream union that
re-reads the text), the raw pool's pass reduced ONCE to the persisted
per-doc (id, bucket, count) table from which both the corpus histogram
(its per-bucket sum — the only driver-side collect besides the target's
n_features longs) and the scoring sum derive. The scoring shuffle is
bounded by O(docs × n_features); the log-ratio table ships as a literal
array — the broadcast-small-side rule. No Python in any pass.

Determinism: buckets are md5-prefix mod ``n_features`` (engine-portable,
the ``dataset_split`` rule); per-bucket log-ratios are rounded to 9dp
and routed through decimal(28,9) so the doc-level sum is
order-independent; ties in the selection rank break by doc_id. A DuckDB
oracle reproduces the whole chain (see ``_dsir_oracle`` in
__spark_entry__.py).

Reference anchor: /root/reference has no data-selection code; this
extends the builder brief's training-data-pipeline surface (quality
scoring / mixtures) with the importance-resampling selector those
mixtures feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hemera_indexer_spark.operators.corpus import word_stream

_W_DEC = "decimal(28,9)"


def _gram_stream(
    df: DataFrame, id_col: str, text_col: str, use_bigrams: bool
) -> DataFrame:
    """Map-only (id, gram) stream: unigrams plus (optionally) adjacent
    bigrams joined with a single space — the DSIR featurization.

    ONE pass: the earlier ``word_stream UNION bigram_stream`` form read
    and re-split the corpus twice per consumer; here the split array
    materializes once and both gram families concat into a single
    explode. The per-family expressions are verbatim
    ``word_stream``/``bigram_stream`` normal form (lowercase, \\s+ split,
    empties dropped, bigrams = adjacent pairs with both sides non-empty),
    so the gram MULTISET — all any consumer aggregates — is identical."""
    if not use_bigrams:
        return word_stream(df, text_col, id_col).select(
            F.col(id_col), F.col("w").alias("gram")
        )
    w = F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
    base = df.select(F.col(id_col), w.alias("_w"))
    arr = F.col("_w")
    sz = F.size(arr)
    unis = F.filter(arr, lambda t: t != "")
    bigr = F.filter(
        F.zip_with(
            F.slice(arr, 1, sz - 1),
            F.slice(arr, 2, sz - 1),
            lambda a, b: F.when(
                (a != "") & (b != ""), F.concat_ws(" ", a, b)
            ),
        ),
        lambda g: g.isNotNull(),
    )
    return base.select(
        F.col(id_col), F.explode(F.concat(unis, bigr)).alias("gram")
    )


def _bucket(n_features: int):
    """md5-prefix bucket — identical to ``feature_hashing``'s rule so
    one engine-portable hash serves every hashed-feature operator."""
    return (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 4), 16, 10).cast("int")
        % n_features
    )


def _bucket_counts(
    df: DataFrame, id_col: str, text_col: str,
    n_features: int, use_bigrams: bool,
) -> dict[int, int]:
    """Corpus-level bucket histogram: map-side-combined groupBy with at
    most ``n_features`` result rows — the ONLY driver-side collect."""
    rows = (
        _gram_stream(df, id_col, text_col, use_bigrams)
        .select(_bucket(n_features).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    return {r["b"]: r["count"] for r in rows}


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 64,
    use_bigrams: bool = True,
) -> DataFrame:
    """Per-raw-document DSIR importance log-weight. Returns
    (id, log_weight: decimal) — higher = more target-like. Selection on
    top is ``dsir_topk`` (deterministic head) — or resample externally
    with the weights.

    The per-bucket log-ratio ``ln((ct_b+1)/(Tt+B)) − ln((cr_b+1)/(Tr+B))``
    is evaluated as a Spark expression over the two collected count
    tables (constant-folded JVM ``Math.log`` — the same libm pairing
    every green log-based oracle in this repo relies on), rounded to 9dp
    and cast to decimal BEFORE the per-doc multiply-sum so the fold is
    order-independent."""
    B = n_features
    ct = _bucket_counts(target, id_col, text_col, B, use_bigrams)
    # ONE raw-corpus gram pass, not two: the per-doc (id, bucket, count)
    # table persists, the corpus histogram `cr` is its per-bucket sum
    # (identical longs — sum of per-doc counts), and the scoring pass
    # below re-reads the cache instead of re-splitting + re-hashing the
    # whole pool. The returned frame references the cache; Spark's
    # ContextCleaner reclaims it when the result goes out of scope.
    per_bucket = (
        _gram_stream(raw, id_col, text_col, use_bigrams)
        .select(F.col(id_col), _bucket(B).alias("b"))
        .groupBy(id_col, "b")
        .count()
        .persist()
    )
    cr = {
        r["b"]: r["n"]
        for r in per_bucket.groupBy("b")
        .agg(F.sum("count").alias("n"))
        .collect()
    }
    tt = sum(ct.values())
    tr = sum(cr.values())
    # lr entries are decimal(19,9) and the per-doc count decimal(9,0):
    # their product is (29,9) — inside Spark's 38-digit cap, so the
    # multiply stays EXACT at scale 9. Wider operands would trip the
    # allowPrecisionLoss scale reduction to 6dp and silently de-sync the
    # sum from the oracle (measured: ~3e-6 drift at sf0.01).
    lr = F.array(
        *[
            F.round(
                F.log(
                    F.lit(ct.get(b, 0) + 1).cast("double")
                    / F.lit(tt + B).cast("double")
                )
                - F.log(
                    F.lit(cr.get(b, 0) + 1).cast("double")
                    / F.lit(tr + B).cast("double")
                ),
                9,
            ).cast("decimal(19,9)")
            for b in range(B)
        ]
    )
    contrib = (
        F.col("count").cast("decimal(9,0)")
        * F.element_at(lr, F.col("b") + 1)
    ).cast(_W_DEC)
    return (
        per_bucket.select(F.col(id_col), contrib.alias("_c"))
        .groupBy(id_col)
        .agg(F.sum("_c").cast(_W_DEC).alias("log_weight"))
    )


def dsir_topk(
    raw: DataFrame,
    target: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 64,
    use_bigrams: bool = True,
) -> DataFrame:
    """The k most target-like raw documents: (id, sel_rank, log_weight),
    ranked by (log_weight desc, id) — exact-decimal compare, so the head
    is deterministic across engines. This is DSIR's arg-top-k form; for
    the paper's stochastic resampling pass weights to a seeded Gumbel
    perturbation downstream (kept out of the oracle-checked core — RNG
    is policy, the weight law is the operator)."""
    head = (
        dsir_weights(
            raw, target, id_col, text_col, n_features, use_bigrams
        )
        # TakeOrderedAndProject, not a global window: the full pool never
        # funnels through one partition, only k rows survive the sort
        .orderBy(F.col("log_weight").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("log_weight").desc(), F.col(id_col).asc())
    return head.withColumn("sel_rank", F.row_number().over(w)).select(
        F.col(id_col), "sel_rank", "log_weight"
    )
