"""Embedding-column feature engineering: per-dimension distribution
stats (whitening / PCA prep, drift monitoring) and deterministic scalar
quantization (int8 storage compression — the standard pre-ANN-index
shrink; FAISS calls this SQ8).

Everything stays JVM-side: posexplode + map-side-combined groupBy for
the stats; the quantizer is an O(dim) transform over the array column
with the per-dimension parameters shipped as literal arrays (the
parameter table is dim-sized — collecting it driver-side is the
broadcast-small-side rule, same as the IVF coarse quantizer in
operators/similarity.py).

Determinism: stats expose EXACT decimal component sums (mean = sum/n
downstream) and exact min/max; the quantizer uses floor (never
round-half) so no engine pair can disagree on a boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hemera_indexer_spark.functions.rounding import round_double

__all__ = [
    "dim_stats",
    "quantize_embeddings",
    "jl_signs",
    "jl_project",
    "kmeans_lloyd",
]


def dim_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension stats over an array<float> column: (dim, n, sum_v,
    sum_sq, min_v, max_v). Mean and variance derive downstream
    (``var = sum_sq/n − (sum_v/n)²``); the exact decimal sums keep the
    fold order-independent, and min/max on doubles are exact by nature.

    One map-only posexplode + one map-side-combined groupBy keyed by
    dim — ndim groups, embarrassingly parallel, no vector ever touches
    the driver."""
    ex = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "v")
    )
    dec = F.col("v").cast("decimal(18,6)")
    return ex.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum(dec).cast("decimal(18,6)").alias("sum_v"),
        # keep the EXACT scale-12 products: rounding each square back to
        # 6dp before summing would introduce a (tiny) tie-break surface
        F.sum(dec * dec).cast("decimal(28,12)").alias("sum_sq"),
        F.round(F.min("v"), 6).cast("decimal(18,6)").alias("min_v"),
        F.round(F.max("v"), 6).cast("decimal(18,6)").alias("max_v"),
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Deterministic per-dimension scalar quantization to ``bits`` bits:
    ``q = min(2^bits − 1, floor((v − min_d) / (max_d − min_d) · 2^bits))``
    with min/max computed per dimension over the dataset. Returns
    (id, qvec: array<int>) — a 4× (fp32→int8) storage cut ahead of ANN
    indexing; dequantize with ``min_d + (q + 0.5) · range_d / 2^bits``.

    The parameter pass is ``dim_stats``-shaped (posexplode + groupBy
    dim). The ndim parameter rows are collected driver-side and shipped
    as two literal arrays into an O(dim) transform — the quantize pass
    itself is map-only, no shuffle, no Python. Constant dimensions
    (max == min) quantize to 0. Floor, not round: a half-way value
    cannot split engines."""
    ex = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "v")
    )
    params = (
        ex.groupBy("dim")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .orderBy("dim")
        .collect()
    )
    levels = 2 ** bits
    los = F.array(*[F.lit(float(r["lo"])) for r in params])
    spans = F.array(
        *[F.lit(float(r["hi"] - r["lo"])) for r in params]
    )
    arr = F.col(vec_col).cast("array<double>")
    q = F.transform(
        arr,
        lambda v, i: F.when(
            F.element_at(spans, i + 1) == 0.0, F.lit(0)
        ).otherwise(
            F.least(
                F.lit(levels - 1),
                F.floor(
                    (v - F.element_at(los, i + 1))
                    / F.element_at(spans, i + 1)
                    * F.lit(levels)
                ).cast("int"),
            )
        ),
    )
    return df.select(F.col(id_col), q.alias("qvec"))


def jl_signs(in_dim: int, out_dim: int, seed: int = 7) -> list[list[int]]:
    """Deterministic ±1 Johnson–Lindenstrauss sign matrix (Achlioptas'
    database-friendly random projection, STOC'01): sign(i, j) from the
    parity of md5(f"{seed}:{i}:{j}") — pure Python, engine-portable, and
    reproducible anywhere (the DuckDB oracle inlines the same matrix as
    literals). Returns ``out_dim`` rows of ``in_dim`` signs."""
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()[0] & 1
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def jl_project(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Random-projection dimensionality reduction (the pre-ANN shrink
    complementing ``quantize_embeddings``'s storage cut): project each
    ``in_dim`` vector onto ``out_dim`` deterministic ±1 hyperplanes,
    ``proj[j] = Σ_i sign(i,j) · v_i``. The JL lemma bounds the pairwise
    distance distortion, so downstream cosine/ANN runs on ``out_dim``
    floats instead of ``in_dim`` — at 100 TB the projection is a pure
    map-only O(in_dim · out_dim) transform, no shuffle, no Python, and
    the (out_dim × in_dim) sign matrix ships as literal arrays (the
    broadcast-small-side rule, same as the SQ8 parameter arrays above).

    Determinism: a ±1 sign flip of a double is EXACT, each element is
    rounded to decimal(18,6) BEFORE the fold, and the accumulator stays
    decimal — fold order (Spark partitioning vs DuckDB vectorization)
    cannot change the result. The conventional 1/√out_dim normalization
    is a constant factor left to the consumer (documented, not applied:
    exact ±1 sums keep the oracle law trivial).

    ``in_dim`` is explicit (embedding columns are fixed-width by
    contract); a vector of any other length NULL-pads the zip, poisoning
    the fold to a NULL projection — visibly wrong, never silently
    truncated.
    """
    signs = jl_signs(in_dim, out_dim, seed)
    dec = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: x.cast("decimal(18,6)"),
    )
    # materialize the decimal array ONCE: Spark does not CSE expressions
    # inside higher-order-function lambdas, and out_dim aggregates each
    # walk this array (the 7x bug class documented in operators/dedup.py)
    base = df.select(F.col(id_col), dec.alias("_dec"))
    zero = F.lit(0).cast("decimal(28,6)")
    projs = [
        F.aggregate(
            F.zip_with(
                F.col("_dec"),
                F.array(*[F.lit(s) for s in signs[j]]),
                lambda x, s: F.when(s > 0, x).otherwise(-x),
            ),
            zero,
            lambda acc, x: (acc + x).cast("decimal(28,6)"),
        )
        .cast("decimal(18,6)")
        .alias(f"p{j}")
        for j in range(out_dim)
    ]
    return base.select(F.col(id_col), F.array(*projs).alias("proj"))


def _assign_clusters(base: DataFrame, cents: dict[int, list[float]]) -> DataFrame:
    """One map-only assignment pass: per-centroid exact-decimal squared
    distance over the pre-materialized ``_dec`` array, argmin via
    ``array_min`` over (dist, cid) structs (lexicographic struct order =
    smallest distance, ties to the smallest cluster id).

    The centroid matrix rides in as a SINGLE-ROW BROADCAST cross-join
    (array<struct<c, cent>>), not as k×dim inlined literals: the decimal
    chain is identical (centroids enter as doubles and cast element-wise
    to decimal(18,6), exactly what ``F.lit(x).cast`` did), but the plan
    stays constant-size in k, so each Lloyd round stops re-paying
    O(k·dim) analysis/codegen per action."""
    from pyspark.sql import types as T

    spark = base.sparkSession
    data = ([(int(cid), [float(x) for x in cents[cid]])
             for cid in sorted(cents)],)
    schema = T.StructType([
        T.StructField("_cb", T.ArrayType(T.StructType([
            T.StructField("c", T.IntegerType()),
            T.StructField("cent", T.ArrayType(T.DoubleType())),
        ]))),
    ])
    cb = spark.createDataFrame([data], schema).select(
        F.transform(
            "_cb",
            lambda e: F.struct(
                e["c"].alias("c"),
                F.transform(
                    e["cent"], lambda x: x.cast("decimal(18,6)")
                ).alias("cent"),
            ),
        ).alias("_cb")
    )

    def _score(e):
        d = F.aggregate(
            F.zip_with(
                F.col("_dec"),
                e["cent"],
                lambda x, y: (
                    (x - y).cast("decimal(15,6)")
                    * (x - y).cast("decimal(15,6)")
                ).cast("decimal(38,12)"),
            ),
            F.lit(0).cast("decimal(38,12)"),
            lambda acc, x: (acc + x).cast("decimal(38,12)"),
        )
        return F.struct(d.alias("d"), e["c"].alias("c"))

    return (
        base.crossJoin(F.broadcast(cb))
        .withColumn("cluster", F.array_min(F.transform("_cb", _score))["c"])
        .drop("_cb")
    )


def kmeans_lloyd(
    df: DataFrame,
    in_dim: int,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic distributed Lloyd's k-means over an embedding column,
    returning the (id, cluster) assignment after ``iters`` rounds. Every
    step is defined so ANY engine reproduces it bit-for-bit:

    - init: the vectors of the ``k`` smallest ids, cluster ids 0..k-1 in
      id order (no RNG — engine/partitioning-portable, the same rule as
      the IVF anchors in operators/similarity.py);
    - assignment: exact-decimal squared distance (elements quantized to
      6dp first), ties to the smallest cluster id;
    - update: per-dimension mean rounded to 6dp (centroids are QUANTIZED
      each round by definition — that quantization is what makes the
      fixpoint engine-portable); a cluster that loses all members drops
      out (its id disappears; no respawn heuristic).

    Scale shape per round: ONE map-only assignment pass (the k×dim
    centroid matrix ships as literals — broadcast-small-side rule) + ONE
    map-side-combined (cluster, dim) groupBy whose k·dim result rows are
    collected driver-side. Nothing else crosses the shuffle; total cost
    is ``iters + 1`` corpus passes. For huge corpora raise
    ``spark.sql.shuffle.partitions``, not this function — there is no
    per-row Python anywhere.

    Reference anchor: the reference's aggregate jobs iterate fixed-point
    daily rollups over committed rows (/root/reference/indexer/aggr_jobs);
    this is the iterative-refinement analog over the embedding corpus.
    """
    dec = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: x.cast("decimal(18,6)"),
    )
    # persist: the init collect + every iteration's stats collect re-read
    # `base`; caching makes pass 2..iters+1 read columnar cache instead of
    # re-scanning parquet + re-deriving the decimal transform each round.
    base = df.select(F.col(id_col), dec.alias("_dec")).persist()
    try:
        init_rows = base.orderBy(id_col).limit(k).collect()
        cents = {
            cid: [float(x) for x in r["_dec"]]
            for cid, r in enumerate(init_rows)
        }
        for _ in range(iters):
            assigned = _assign_clusters(base, cents)
            stats = (
                assigned.select(
                    "cluster", F.posexplode("_dec").alias("dim", "v")
                )
                .groupBy("cluster", "dim")
                .agg(
                    # mean quantization happens JVM-side; the mean is a
                    # RATIONAL double (decimal sum / count) so it can land
                    # exactly on a 6dp tie, where Spark's repr-based
                    # F.round and DuckDB's binary ROUND disagree —
                    # round_double replicates DuckDB bit-for-bit
                    # (functions/rounding.py; the collected double IS the
                    # quantized value)
                    round_double(
                        F.sum("v").cast("double") / F.count("*"), 6
                    ).alias("m")
                )
                .collect()
            )
            cents = {}
            for r in stats:
                cents.setdefault(r["cluster"], [0.0] * in_dim)[r["dim"]] = r["m"]
        return _assign_clusters(base, cents).select(
            F.col(id_col), F.col("cluster")
        )
    finally:
        # the returned assignment is lazy; unpersisting here means its ONE
        # final pass recomputes from source — correct, and it keeps this
        # function leak-free for long-lived callers (cache covers exactly
        # the iters+1 driver-side collects above, where the reuse is).
        base.unpersist()


def semantic_dedup(
    df: DataFrame,
    in_dim: int,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023 shape): cluster the embedding corpus,
    then mark semantic near-duplicates WITHIN each cluster only — the
    clustering is what turns an O(n²) all-pairs cosine into
    O(Σ cluster_size²), the whole point of the method at corpus scale.

    Pipeline: deterministic ``kmeans_lloyd`` assignment (engine-portable
    by construction) → within-cluster self-join on cluster id (shuffle
    keyed by cluster; both sides are the (id, vec, cluster) projection) →
    exact cosine at 4dp on candidate pairs only.

    Keep rule (deterministic one-pass, the same keep-first law as
    ``chunk_dedup``/``duplicated_spans``): a doc is dropped iff SOME
    smaller-id doc in its cluster is ≥ threshold similar — whether or not
    that senior doc was itself dropped. This is not transitive-closure
    grouping (see ``dedup.py`` connected components for that); it is the
    order-independent approximation production SemDeDup uses, and it
    needs no iteration.

    Returns (id, cluster, kept). Scale shape: the k-means passes (see
    ``kmeans_lloyd``), ONE cluster-keyed self-join whose output is pruned
    by the cosine filter before the distinct, ONE left anti-ish join to
    label. Skewed clusters are the known failure mode at scale — raise k
    (smaller clusters) rather than salting: splitting a semantic cluster
    across salts would lose dup pairs.
    """
    from .similarity import dot, norm

    assigned = kmeans_lloyd(
        df, in_dim, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    # per-vector norm computed ONCE (n rows) and carried into the pair
    # join: same double as evaluating norm() per pair (identical
    # expression over the identical array), 1/3 the per-pair element ops
    e = (
        df.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
        )
        .join(assigned, id_col)
        .select(F.col(id_col), "_v", norm(F.col("_v")).alias("_n"), "cluster")
    )
    a = e.select(
        F.col(id_col).alias("_ia"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), "cluster"
    )
    b = e.select(
        F.col(id_col).alias("_ib"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), "cluster"
    )
    drops = (
        a.join(b, "cluster")
        .where(F.col("_ia") < F.col("_ib"))
        .where(
            F.round(
                dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                4,
            )
            >= threshold
        )
        .select(F.col("_ib").alias(id_col))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return assigned.join(drops, id_col, "left").select(
        F.col(id_col),
        "cluster",
        F.col("_drop").isNull().alias("kept"),
    )
