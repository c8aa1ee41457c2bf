"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk`` — exact cosine top-k: the baseline. The dot product
  runs JVM-side via ``zip_with`` + ``aggregate`` (no Python). Query set is
  broadcast; candidates stream. At 100 TB-scale this is the per-partition
  inner loop of any ANN scheme, so it must be shuffle-free: broadcast the
  queries, compute scores in the scan stage, take top-k per query with one
  window shuffle on query_id (small: n_queries × n_candidates rows reduce to
  k per query via partial top-k in AQE).
- ``anchor_lsh_buckets`` / ``anchor_lsh_topk`` — the scale path: random-
  hyperplane LSH where the hyperplanes are ANCHOR VECTORS drawn
  deterministically from the dataset itself (first ``n_anchors`` vec_ids),
  so the Spark engine and any SQL oracle derive identical buckets without a
  shared RNG. Candidates = same bucket; exact cosine re-ranks within bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    # cast to array<double> first: float32 elements would otherwise multiply
    # in single precision before the double accumulate, drifting ~1e-7 from
    # any double-based oracle (and flipping near-zero LSH sign bits). With
    # the cast the fold is bit-identical to a sequential double reduce.
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a.cast("array<double>"), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query id (queries drawn from the
    same table; self-matches excluded). Returns (query_id, rank, neighbor_id,
    cos_sim rounded to 4dp); rank ties broken by neighbor_id."""
    # norms factored out of the per-pair cosine: norm over the same double
    # array is the same double wherever evaluated, so carrying it as a
    # column is bit-identical and removes 2 of the 3 O(dim) folds per pair
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    scored = (
        emb.select(
            F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("_n")
        )
        .crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                dot(F.col(vec_col), F.col("_qv"))
                / (F.col("_n") * F.col("_qn")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def anchor_lsh_buckets(
    emb: DataFrame,
    n_anchors: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "anchor",
    seed: int = 0,
) -> DataFrame:
    """Sign-bit LSH bucket per vector: bit i = (dot(v, plane_i) >= 0).
    Returns (vec_id, bucket:int).

    Two deterministic plane families:

    - ``method="anchor"`` (default): plane_i is the embedding of the i-th
      smallest ``id_col`` value. Chosen as the default because a SQL
      oracle can derive the identical planes without a shared RNG — but
      be aware the anchors are then DATA: if low ids are correlated
      (e.g. ids assigned in crawl order, so the first vectors all come
      from one domain), the planes are nearly parallel and bucket
      occupancy skews badly.
    - ``method="hyperplane"``: classic random-hyperplane LSH (Charikar
      '02) with planes drawn from a SEEDED Gaussian — deterministic
      given ``seed`` (NumPy PCG64, generated driver-side and broadcast,
      never a per-executor RNG), independent of the data distribution.
      Use this for corpora where anchor choice could be correlated; the
      trade is that an external oracle must replay the same generator.
    """
    from pyspark.sql import types as T

    if method == "anchor":
        # anchors are <= n_anchors rows by construction: collect them (a
        # metadata-bounded driver fetch — the same thing broadcasting a
        # hyperplane matrix does in any ANN build) and re-broadcast with
        # stable bit positions, instead of ranking via an unpartitioned
        # window.
        rows = (
            emb.orderBy(F.col(id_col).asc())
            .limit(n_anchors)
            .select(F.col(id_col).alias("_aid"), F.col(vec_col).alias("_av"))
            .collect()
        )
        plane_rows = [(i, r["_av"]) for i, r in enumerate(rows)]
    elif method == "hyperplane":
        import numpy as np

        # dim probe: ONE row, a limit-1 scan of the vector column only
        first = emb.select(F.col(vec_col).alias("_v")).limit(1).collect()
        if not first:
            plane_rows = []
        else:
            dim = len(first[0]["_v"])
            rng = np.random.default_rng(seed)
            planes = rng.standard_normal((n_anchors, dim))
            plane_rows = [
                (i, [float(x) for x in planes[i]]) for i in range(n_anchors)
            ]
    else:
        raise ValueError(f"unknown LSH plane method: {method!r}")

    anchors = emb.sparkSession.createDataFrame(
        plane_rows,
        T.StructType(
            [
                T.StructField("_bit", T.IntegerType(), False),
                T.StructField(
                    "_av", T.ArrayType(T.DoubleType(), False), False
                ),
            ]
        ),
    )
    bits = (
        emb.crossJoin(F.broadcast(anchors))
        .select(
            F.col(id_col).alias("vec_id"),
            F.when(dot(F.col(vec_col), F.col("_av")) >= 0, F.lit(1))
            .otherwise(F.lit(0))
            .alias("b"),
            "_bit",
        )
        .groupBy("vec_id")
        .agg(F.sum(F.col("b") * F.pow(F.lit(2.0), F.col("_bit"))).cast("int").alias("bucket"))
    )
    return bits


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_anchors: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space near-duplicate pairs (SemDeDup shape): candidates are
    vectors sharing an LSH bucket (equi-join on bucket — never all-pairs),
    kept when exact cosine >= threshold. Returns (vec_a, vec_b, cos_sim)
    with vec_a < vec_b. At scale the bucket count grows with 2^n_anchors so
    per-bucket candidate sets stay small; pipe the output through
    ``dedup.connected_components`` for keep/drop sets."""
    buckets = anchor_lsh_buckets(emb, n_anchors, id_col, vec_col)
    # per-vector norm computed ONCE here (n rows), not once per PAIR in
    # the bucket self-join below: cosine(a,b) = dot/(norm(a)*norm(b)), and
    # norm over the same double array is the same double wherever it is
    # evaluated, so carrying it as a column is bit-identical while cutting
    # 2/3 of the per-pair element ops (dot + 2 norms -> dot).
    embb = (
        emb.select(F.col(id_col).alias("_eid"), F.col(vec_col).alias("_v"))
        .join(buckets, F.col("_eid") == F.col("vec_id"))
        .select("vec_id", "_v", norm(F.col("_v")).alias("_n"), "bucket")
    )
    a = embb.select(
        F.col("vec_id").alias("vec_a"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), "bucket"
    )
    b = embb.select(
        F.col("vec_id").alias("vec_b"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                4,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def anchor_lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_anchors: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: candidates restricted to the query's LSH bucket, exact cosine
    re-rank inside the bucket. Returns (query_id, rank, neighbor_id,
    cos_sim). Recall < 1 by construction; the win is that the join is
    bucket-equi (shuffle on bucket) instead of a cross join."""
    buckets = anchor_lsh_buckets(emb, n_anchors, id_col, vec_col)
    # per-vector norm once (see embedding_dup_pairs) — bit-identical
    embb = (
        emb.select(F.col(id_col).alias("_eid"), F.col(vec_col).alias("_v"))
        .join(buckets, F.col("_eid") == F.col("vec_id"))
        .select("vec_id", "_v", norm(F.col("_v")).alias("_n"), "bucket")
    )
    q = embb.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_n").alias("_qn"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        embb.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("_v"), F.col("_qv"))
                / (F.col("_n") * F.col("_qn")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def _argmax_cell(
    emb: DataFrame,
    cents: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(vec_id, cell): each vector's nearest centroid by cosine (ties ->
    smallest cell id). Centroids are broadcast; the argmax is a map-side
    combinable ``max_by`` groupBy — ONE shuffle of N pre-reduced rows, no
    window over the N x ncells cross product."""
    # vector norm once per ROW, centroid norm once per CELL (on the tiny
    # broadcast side) — not once per (row, cell) pair; bit-identical
    cents_n = cents.select(
        "_cell", "_cv", norm(F.col("_cv")).alias("_cn")
    )
    scored = (
        emb.select(
            F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("_vn")
        )
        .crossJoin(F.broadcast(cents_n))
        .select(
            F.col(id_col).alias("vec_id"),
            F.col("_cell"),
            (
                dot(F.col(vec_col), F.col("_cv"))
                / (F.col("_vn") * F.col("_cn"))
            ).alias("_cos"),
        )
    )
    return scored.groupBy("vec_id").agg(
        F.max_by(
            "_cell", F.struct(F.col("_cos"), (-F.col("_cell")).alias("_n"))
        ).alias("cell")
    )


#: Version of the IVF quantizer "family": the deterministic seed rule
#: (ncells smallest ids), the exact-decimal(18,6) Lloyd mean, and the
#: cosine metric. Persisted indexes built under a different family must be
#: rebuilt, never mixed — see operators/ivf_index.py.
IVF_FAMILY_VERSION = 1

_CENT_SCHEMA = None  # built lazily (needs pyspark.sql.types)


def _cent_schema():
    global _CENT_SCHEMA
    if _CENT_SCHEMA is None:
        from pyspark.sql import types as T

        _CENT_SCHEMA = T.StructType(
            [
                T.StructField("_cell", T.IntegerType(), False),
                T.StructField(
                    "_cv", T.ArrayType(T.DoubleType(), False), False
                ),
            ]
        )
    return _CENT_SCHEMA


def centroids_df(spark, rows: list[tuple[int, list[float]]]) -> DataFrame:
    """(cell, centroid) rows -> the broadcastable quantizer frame."""
    return spark.createDataFrame(rows, _cent_schema())


def train_ivf_quantizer(
    emb: DataFrame,
    ncells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """The deterministic IVF coarse-quantizer build shared by the inline
    ``ivf_topk`` and the persisted ``IVFIndex`` (their equality law depends
    on this being ONE code path). Seeds = embeddings of the ``ncells``
    smallest ids; ONE Lloyd refinement with exact-decimal(18,6) elementwise
    means (order-independent, so any engine reproduces the same doubles).
    Returns the refined (cell, centroid) rows — a bounded ncells x dim
    driver artifact, the thing any IVF build broadcasts as its quantizer.
    Cells that attracted no members drop out."""
    spark = emb.sparkSession
    seed_rows = (
        emb.orderBy(F.col(id_col).asc())
        .limit(ncells)
        .select(vec_col)
        .collect()
    )
    seeds = centroids_df(
        spark,
        [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(seed_rows)],
    )
    assigned1 = _argmax_cell(emb, seeds, id_col, vec_col)
    comp = (
        emb.join(assigned1, emb[id_col] == assigned1["vec_id"])
        .select("cell", F.posexplode(F.col(vec_col)).alias("dim", "_v"))
        .groupBy("cell", "dim")
        .agg(
            (
                F.sum(
                    F.col("_v").cast("double").cast("decimal(18,6)")
                ).cast("double")
                / F.count("*")
            ).alias("c")
        )
    )
    by_cell: dict[int, dict[int, float]] = {}
    for r in comp.collect():
        by_cell.setdefault(r["cell"], {})[r["dim"]] = r["c"]
    return [
        (c, [vs[d] for d in sorted(vs)]) for c, vs in sorted(by_cell.items())
    ]


def ivf_probe_topk(
    emb: DataFrame,
    refined: DataFrame,
    assigned: DataFrame,
    query_ids: list[int],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF search half, over an already-built quantizer: each query
    probes its ``nprobe`` nearest cells (by cosine to the refined
    centroids), candidates are the vectors ASSIGNED to those cells
    (equi-join on cell — never all-pairs), exact cosine re-ranks top-k.
    ``assigned`` is (vec_id, cell); ``refined`` is (_cell, _cv)."""
    # query/vector/centroid norms factored out of the per-pair cosines
    # (same doubles, see embedding_dup_pairs) — bit-identical
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    refined_n = refined.select(
        "_cell", "_cv", norm(F.col("_cv")).alias("_cn")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("_pcos").desc(), F.col("_cell").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(refined_n))
        .select(
            "query_id",
            "_qv",
            "_qn",
            F.col("_cell"),
            (
                dot(F.col("_qv"), F.col("_cv"))
                / (F.col("_qn") * F.col("_cn"))
            ).alias("_pcos"),
        )
        .withColumn("_pr", F.row_number().over(probe_w))
        .where(F.col("_pr") <= nprobe)
        .select("query_id", "_qv", "_qn", F.col("_cell").alias("cell"))
    )
    cands = (
        emb.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_v"),
            norm(F.col(vec_col)).alias("_vn"),
        )
        .join(assigned, F.col("neighbor_id") == assigned["vec_id"])
        .join(F.broadcast(probes), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("_v"), F.col("_qv"))
                / (F.col("_vn") * F.col("_qn")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    ncells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via an IVF (inverted-file) coarse quantizer — the cell-probe
    counterpart to ``anchor_lsh_topk``'s hash-bucket path.

    Build: seed centroids are the embeddings of the ``ncells`` smallest
    ids (deterministic, oracle-derivable without a shared RNG), refined by
    ONE Lloyd iteration: assign every vector to its nearest seed (max
    cosine), then recompute each cell's centroid as the element-wise mean
    of its members. Search: a query probes its ``nprobe`` nearest refined
    cells; candidates are the vectors ASSIGNED to those cells (equi-join
    on cell — never all-pairs); exact cosine re-ranks, top-k per query.

    Scale shape: centroids are a bounded driver artifact (ncells x dim
    doubles — the same thing any IVF build broadcasts as its quantizer);
    both assignment passes are broadcast-join + map-side-combined argmax
    (one N-row shuffle each); the centroid mean is ONE shuffle keyed by
    (cell, dim); candidate generation shuffles on cell. Recall/cost knobs
    are ncells (cell granularity) and nprobe (cells searched per query).

    Cross-engine determinism: refined centroid components are the EXACT
    decimal(18,6) sum of members divided by the member count — the
    decimal sum is order-independent, so Spark and any SQL oracle build
    bit-identical centroids, and every downstream cosine (a sequential
    fold over identical doubles) is bit-identical too; assignment and
    probe ties break on the smaller cell id. Result cos_sim rounds to 4dp
    as in ``brute_force_topk``.
    """
    refined = centroids_df(
        emb.sparkSession, train_ivf_quantizer(emb, ncells, id_col, vec_col)
    )
    assigned = _argmax_cell(emb, refined, id_col, vec_col)
    return ivf_probe_topk(
        emb, refined, assigned, query_ids, k, nprobe, id_col, vec_col
    )
