"""Trainable linear quality classifier over hashed text features — the
fastText/CCNet-style document filter (Joulin et al. 2017; Wenzek et al.
2020 train exactly this shape to score web text against a quality
corpus), as a DISTRIBUTED, bit-deterministic Spark operator.

Model: logistic-style linear classifier over hashed unigram PRESENCE
features (the ``feature_hashing`` md5-prefix bucket rule) plus a bias,
trained by full-batch gradient descent with a HARD-SIGMOID activation

    σ_h(z) = clamp(z/4 + 1/2, 0, 1)

— the straight-through surrogate quantized-training uses. The choice is
deliberate: σ_h is exact DECIMAL arithmetic end-to-end (one multiply by
0.25, one clamp), where exp() is a transcendental whose last-ulp
behavior differs across engines — with σ_h every weight of every round
is bit-reproducible in Spark, DuckDB and Python alike (the repo's
kmeans/PQ quantized-fixpoint discipline applied to GD: weights quantize
to 9dp each round BY DEFINITION of the training family).

Update rule (no divisions, no transcendentals):

    w ← round_half_up(w + lr · Σ_docs x_b · (y − σ_h(w·x)), 9)

with ``lr`` a caller-chosen decimal literal; presence features bound
the gradient by the doc count. Deterministic, engine-portable, and an
unremarkable perceptron-with-saturation learner — which is all a
quality filter needs (CCNet's is a bag-of-ngrams linear model too).

Scale shape: the (doc, bucket) presence pairs materialize ONCE (map-only
explode + distinct bounded by docs × n_features) and are persisted;
each round costs one doc-keyed join-sum (z), one bucket-keyed
re-aggregation (gradient, ≤ n_features+1 result rows collected) — 2
bounded shuffles per round, weights ship as literals, no Python in any
pass. Training a 100 TB corpus subset is iters × 2 shuffles over the
cached feature pairs.

Reference anchor: /root/reference has no ML; this extends the builder
brief's text-quality-scoring surface with the TRAINED filter the static
heuristics (gopher_filter, text_stats quality) feed into.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hemera_indexer_spark.operators.corpus import word_stream

_W = "decimal(20,9)"
_Z = "decimal(28,9)"
_P = "decimal(30,11)"


def _doc_buckets(
    df: DataFrame, id_col: str, text_col: str, n_features: int
) -> DataFrame:
    """Distinct (id, b) presence pairs — md5-prefix buckets, the
    feature_hashing rule (one hash family serves every hashed-feature
    operator in the repo)."""
    ws = word_stream(df, text_col, id_col)
    b = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 4), 16, 10).cast("int")
        % n_features
    ).alias("b")
    return ws.select(F.col(id_col), b).distinct()


def _z_scores(
    docb: DataFrame, labels: DataFrame, w: list[Decimal], id_col: str
) -> DataFrame:
    """Per-doc margin z = Σ_present w_b + w_bias, exact decimal; weights
    (incl. bias, last slot) ship as one literal array."""
    n = len(w) - 1
    w_arr = F.array(*[F.lit(str(x)).cast(_W) for x in w[:n]])
    z = (
        docb.select(F.col(id_col), F.element_at(w_arr, F.col("b") + 1).alias("_w"))
        .groupBy(id_col)
        .agg(F.sum("_w").cast(_Z).alias("_zf"))
    )
    # right join: a doc with NO features still has the bias margin
    return labels.join(z, id_col, "left").select(
        F.col(id_col),
        F.col("_y"),
        (
            F.coalesce(F.col("_zf"), F.lit(0).cast(_Z))
            + F.lit(str(w[n])).cast(_W)
        ).cast(_Z).alias("_z"),
    )


def _probs(z_col):
    """σ_h(z) = clamp(z/4 + 1/2, 0, 1) in exact decimal: (z+2)·0.25."""
    p = (z_col + F.lit(2).cast(_Z)) * F.lit("0.25").cast("decimal(3,2)")
    return F.least(
        F.lit(1).cast(_P), F.greatest(F.lit(0).cast(_P), p.cast(_P))
    )


def train_classifier(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 64,
    iters: int = 3,
    lr: str = "0.01",
) -> list[Decimal]:
    """Train and return the weight vector (n_features buckets + bias,
    each a 9dp Decimal). ``label_col`` is a boolean/int column (1 = the
    quality/target class). ``lr`` is a decimal STRING — it enters the
    exact-arithmetic chain, so it must not pass through a float."""
    if not isinstance(lr, str):
        raise TypeError(
            f"lr must be a decimal string, got {type(lr).__name__}: a "
            "float would enter the exact-arithmetic chain as its binary "
            "expansion and silently de-sync every engine replay"
        )
    labels = df.select(
        F.col(id_col), F.col(label_col).cast("int").cast("decimal(1,0)").alias("_y")
    ).persist()
    docb = _doc_buckets(df, id_col, text_col, n_features).persist()
    try:
        w = [Decimal(0).quantize(Decimal("1e-9"))] * (n_features + 1)
        lr_d = Decimal(lr)
        q9 = Decimal("1e-9")
        # the bias gradient is the residual sum over ALL docs — fold it
        # into the same aggregate as the per-bucket sums via a sentinel
        # bucket (-1) every doc carries, so each GD round is ONE Spark
        # action instead of two (and the residual subplan evaluates once,
        # not twice). Exact-decimal sums are order-independent, so the
        # merged aggregate is bit-identical to the split form.
        ext = docb.unionByName(
            labels.select(F.col(id_col), F.lit(-1).cast("int").alias("b"))
        )
        for _ in range(iters):
            scored = _z_scores(docb, labels, w, id_col)
            r = scored.select(
                F.col(id_col),
                (F.col("_y").cast(_P) - _probs(F.col("_z"))).alias("_r"),
            )
            rows = (
                ext.join(r, id_col)
                .groupBy("b")
                .agg(F.sum("_r").cast(_P).alias("g"))
                .collect()
            )
            g = {row["b"]: row["g"] for row in rows}
            grad_bias = g.get(-1, 0)
            w = [
                (w[b] + lr_d * Decimal(g.get(b, 0))).quantize(
                    q9, rounding=ROUND_HALF_UP
                )
                for b in range(n_features)
            ] + [
                (w[n_features] + lr_d * Decimal(grad_bias or 0)).quantize(
                    q9, rounding=ROUND_HALF_UP
                )
            ]
        return w
    finally:
        labels.unpersist()
        docb.unpersist()


def score_documents(
    df: DataFrame,
    weights: list[Decimal],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Map-shaped scoring pass: (id, score σ_h(z) as decimal(18,6),
    keep = score ≥ 0.5). One docs×n_features-bounded shuffle; weights
    ship as literals."""
    n_features = len(weights) - 1
    docb = _doc_buckets(df, id_col, text_col, n_features)
    ids = df.select(F.col(id_col), F.lit(0).cast("decimal(1,0)").alias("_y"))
    scored = _z_scores(docb, ids, weights, id_col)
    p = _probs(F.col("_z"))
    return scored.select(
        F.col(id_col),
        F.round(p.cast("double"), 6).cast("decimal(18,6)").alias("score"),
        (p >= F.lit("0.5").cast("decimal(2,1)")).alias("keep"),
    )


def quality_filter(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 64,
    iters: int = 3,
    lr: str = "0.01",
) -> DataFrame:
    """Train on ``df``'s own labels, score every doc: the one-call
    CCNet-style filter (in production, train on a labeled slice and
    ``score_documents`` the 100 TB pool with the frozen weights)."""
    w = train_classifier(
        df, label_col, id_col, text_col, n_features, iters, lr
    )
    return score_documents(df, w, id_col, text_col)
