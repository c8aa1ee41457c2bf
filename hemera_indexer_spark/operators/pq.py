"""Product quantization (PQ) — memory-bounded codes for ANN search.

Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011): split each d-dim vector into ``m`` contiguous
subspaces of ``d/m`` dims, train an independent k-means codebook of
``ks`` sub-centroids per subspace, and store each vector as ``m`` small
integer codes. A 64-dim fp32 embedding (256 B) compresses to m bytes
(m=4 → 64×); search uses ASYMMETRIC DISTANCE COMPUTATION (ADC): the
query stays un-quantized, a per-query distance table of m×ks entries is
precomputed once, and every encoded vector scores as the sum of m table
lookups — O(m) per candidate instead of O(d).

This completes the engine's ANN family (operators/similarity.py: brute
force → anchor-LSH → IVF): PQ is the form that fits a 100 TB embedding
corpus in cluster RAM. Scale shape:

- TRAINING is Lloyd's k-means run for ALL m subspaces in one combined
  pass per round (one map-only assignment + one map-side-combined
  (sub, code, dim) groupBy whose ks×d result rows are collected) —
  the same iters+1-corpus-pass budget as ``kmeans_lloyd``, not m× it.
- ENCODING is map-only: the m×ks×(d/m) = ks×d codebook rides in as a
  single-row BROADCAST (broadcast-small-side rule; a broadcast column
  keeps the plan constant-size in ks where inlined literals made every
  action re-pay O(ks·d) analysis/codegen), argmin per subspace is
  map-side, no shuffle of the corpus, no Python.
- ADC SEARCH is map-only per candidate: per-query distance tables are
  m×ks literals computed by a bounded Spark job over the (few) query
  rows; the corpus pass is one scan of the codes column + a per-query
  top-k window. Nothing all-pairs, nothing driver-side but the tables.

Every step is engine-portable by the same discipline ``kmeans_lloyd``
established (first-ks-ids init, exact-decimal distances over
6dp-quantized elements, 6dp-quantized centroid updates, ties to the
smallest code), so a DuckDB oracle reproduces training + encoding + ADC
bit-for-bit (see ``_pq_oracle`` in __spark_entry__.py).

Reference anchor: /root/reference has no vector search; this extends
SURVEY.md §2's training-data-pipeline surface (similarity search) with
the compressed-index form, as the builder brief's "IVF or LSH-bucketed
variant as the scale path" asks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hemera_indexer_spark.functions.rounding import round_double

# exact accumulator type for sums of squared 6dp-decimal differences
_ACC = "decimal(38,12)"

# bump when the training/encode/ADC definition changes incompatibly
# (init rule, decimal discipline, distance metric): persisted codes from
# one family cannot be scored against another family's codebook
PQ_FAMILY_VERSION = 1

Codebook = dict[int, dict[int, list[float]]]  # sub -> code -> centroid


def _sub_slices(
    df: DataFrame, in_dim: int, m: int, id_col: str, vec_col: str
) -> DataFrame:
    """Project (id, _s0.._s{m-1}) where ``_s{s}`` is the 6dp-decimal
    subvector of subspace ``s``. Slices are MATERIALIZED as columns here
    (not re-derived inside lambdas) — Spark does not CSE expressions
    inside higher-order-function lambdas, and every downstream pass
    touches each slice ks times."""
    if in_dim % m:
        raise ValueError(f"in_dim {in_dim} not divisible by m {m}")
    dsub = in_dim // m
    dec = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: x.cast("decimal(18,6)"),
    )
    return df.select(
        F.col(id_col),
        *[
            F.slice(dec, s * dsub + 1, dsub).alias(f"_s{s}")
            for s in range(m)
        ],
    )


def _d2_cols(sub_col: Column, cent_col: Column) -> Column:
    """Exact squared distance between two decimal(18,6)-array columns:
    diffs quantized to 6dp, squares exact. The centroid side arrives as
    a broadcast column off ``_codebook_by_s`` — identical
    Cast/CheckOverflow chain to the earlier inlined-literal form."""
    return F.aggregate(
        F.zip_with(
            sub_col,
            cent_col,
            lambda x, y: (
                (x - y).cast("decimal(15,6)")
                * (x - y).cast("decimal(15,6)")
            ).cast(_ACC),
        ),
        F.lit(0).cast(_ACC),
        lambda acc, x: (acc + x).cast(_ACC),
    )


def _codebook_by_s(spark, book: Codebook, m: int) -> DataFrame:
    """The codebook as an m-row broadcastable table (s, cb:
    array<struct<c:int, cent:array<decimal(18,6)>>>). Centroids enter as
    doubles and are cast element-wise to decimal(18,6) — the same
    double->decimal cast `F.lit(x).cast(...)` performs, so distances off
    this table are bit-identical to the literal form. Shipping the book
    as a broadcast COLUMN instead of m×ks inlined literal arrays keeps
    the expression tree (and its per-action analysis/codegen cost)
    constant in ks — measured 2x on the sf0.1 train round."""
    from pyspark.sql import types as T

    rows = [
        (s, [(int(cid), [float(x) for x in cent])
             for cid, cent in sorted(book[s].items())])
        for s in range(m)
    ]
    schema = T.StructType([
        T.StructField("s", T.IntegerType()),
        T.StructField("cb", T.ArrayType(T.StructType([
            T.StructField("c", T.IntegerType()),
            T.StructField("cent", T.ArrayType(T.DoubleType())),
        ]))),
    ])
    return spark.createDataFrame(rows, schema).select(
        "s",
        F.transform(
            "cb",
            lambda e: F.struct(
                e["c"].alias("c"),
                F.transform(
                    e["cent"], lambda x: x.cast("decimal(18,6)")
                ).alias("cent"),
            ),
        ).alias("cb"),
    )


def _assign_long(base: DataFrame, book: Codebook, m: int) -> DataFrame:
    """(id, s, sv, cid): chosen code per (vector, subspace). One inline
    to long form + a broadcast join against the m-row codebook table +
    a map-side ``array_min`` argmin over (d2, code) structs — no per-row
    blowup beyond m, no argmin shuffle, and a plan whose size does not
    grow with ks (unlike the earlier inlined-literal tree). Distances
    and tie-breaks are the exact decimal chain of ``_d2_cols``."""
    id_col = base.columns[0]
    long_ = base.select(
        F.col(id_col),
        F.inline(F.array(*[
            F.struct(F.lit(s).alias("s"), F.col(f"_s{s}").alias("sv"))
            for s in range(m)
        ])),
    )
    cd = _codebook_by_s(base.sparkSession, book, m)
    return long_.join(F.broadcast(cd), "s").select(
        F.col(id_col),
        "s",
        "sv",
        F.array_min(
            F.transform(
                F.col("cb"),
                lambda e: F.struct(
                    _d2_cols(F.col("sv"), e["cent"]).alias("d"),
                    e["c"].alias("c"),
                ),
            )
        )["c"].alias("cid"),
    )


def _assign_wide(base: DataFrame, book: Codebook, m: int) -> DataFrame:
    """base + ``_code_{s}`` columns, MAP-ONLY: the codebook rides in as a
    single-row broadcast (one array<struct<c,cent>> column per subspace,
    cross-joined), argmin per subspace via ``array_min`` of (d2, code)
    structs. No shuffle of the corpus — the encode-path contract — and
    the plan stays constant-size in ks. Same decimal chain and tie-break
    as ``_assign_long``."""
    from pyspark.sql import types as T

    spark = base.sparkSession
    data = tuple(
        [(int(cid), [float(x) for x in cent])
         for cid, cent in sorted(book[s].items())]
        for s in range(m)
    )
    schema = T.StructType([
        T.StructField(f"_cb{s}", T.ArrayType(T.StructType([
            T.StructField("c", T.IntegerType()),
            T.StructField("cent", T.ArrayType(T.DoubleType())),
        ]))) for s in range(m)
    ])
    cb = spark.createDataFrame([data], schema).select(*[
        F.transform(
            f"_cb{s}",
            lambda e: F.struct(
                e["c"].alias("c"),
                F.transform(
                    e["cent"], lambda x: x.cast("decimal(18,6)")
                ).alias("cent"),
            ),
        ).alias(f"_cb{s}")
        for s in range(m)
    ])
    def _argmin(s: int):
        # single-arg lambda (F.transform passes the index to 2-arg ones)
        def scorer(e):
            return F.struct(
                _d2_cols(F.col(f"_s{s}"), e["cent"]).alias("d"),
                e["c"].alias("c"),
            )

        return F.array_min(F.transform(F.col(f"_cb{s}"), scorer))["c"]

    out = base.crossJoin(F.broadcast(cb))
    for s in range(m):
        out = out.withColumn(f"_code_{s}", _argmin(s))
    return out.drop(*[f"_cb{s}" for s in range(m)])


def pq_train(
    df: DataFrame,
    in_dim: int,
    m: int = 4,
    ks: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    _base: DataFrame | None = None,
) -> Codebook:
    """Train the m×ks codebook with deterministic per-subspace Lloyd's:

    - init: subspace s's codes 0..ks-1 are the s-th slices of the ks
      smallest-id vectors (no RNG — the ``kmeans_lloyd`` rule);
    - assignment: exact-decimal squared distance, ties to smallest code;
    - update: per-dim mean rounded to 6dp (codebooks are QUANTIZED each
      round by definition); a code that loses all members drops out.

    All m subspaces train in the SAME iters+1 corpus passes: one
    map-only assignment + one (sub, code, dim) groupBy per round whose
    ks×in_dim rows are the only driver-side collect.

    ``_base``: a caller-owned persisted ``_sub_slices`` frame — the
    inline ``pq_adc_topk`` builds the slice table ONCE and shares it
    across training, the query distance tables and the encode pass
    (otherwise each re-derives the decimal slicing from source). When
    supplied, this function neither persists nor unpersists it."""
    base = (
        _base
        if _base is not None
        else _sub_slices(df, in_dim, m, id_col, vec_col).persist()
    )
    dsub = in_dim // m
    try:
        init_rows = base.orderBy(id_col).limit(ks).collect()
        if not init_rows:
            # empty-corpus cold start: an empty codebook (the IVFIndex
            # empty-quantizer analog) — encode yields no rows, and the
            # drift policy retrains once data arrives
            return {s: {} for s in range(m)}
        book: Codebook = {
            s: {
                cid: [float(x) for x in r[f"_s{s}"]]
                for cid, r in enumerate(init_rows)
            }
            for s in range(m)
        }
        for _ in range(iters):
            long = _assign_long(base, book, m).select(
                "s", "cid", F.posexplode("sv").alias("i", "v")
            )
            stats = (
                long.groupBy("s", "cid", "i")
                .agg(
                    # mean quantization JVM-side; DuckDB-exact binary
                    # rounding — the rational mean can land on a 6dp tie
                    # where F.round diverges (see functions/rounding.py)
                    round_double(
                        F.sum("v").cast("double") / F.count("*"), 6
                    ).alias("mn")
                )
                .collect()
            )
            book = {s: {} for s in range(m)}
            for r in stats:
                book[r["s"]].setdefault(r["cid"], [0.0] * dsub)[
                    r["i"]
                ] = r["mn"]
        return book
    finally:
        if _base is None:
            base.unpersist()


def pq_encode(
    df: DataFrame,
    book: Codebook,
    in_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only encode: (id, codes: array<int> of length m). The codebook
    ships as literals; no shuffle, no Python in the pass."""
    m = len(book)
    base = _sub_slices(df, in_dim, m, id_col, vec_col)
    if any(not book[s] for s in range(m)):
        # empty codebook (trained on an empty corpus): nothing encodes
        return base.where(F.lit(False)).select(
            F.col(id_col),
            F.lit(None).cast("array<int>").alias("codes"),
        )
    return _assign_wide(base, book, m).select(
        F.col(id_col),
        F.array(*[F.col(f"_code_{s}") for s in range(m)]).alias("codes"),
    )


def _query_cells(
    df: DataFrame,
    book: Codebook,
    in_dim: int,
    query_ids: list,
    id_col: str,
    vec_col: str,
    _base: DataFrame | None = None,
) -> DataFrame:
    """Per-query ADC distance table as a DATAFRAME: (qid, s, cid, d2),
    nq×m×ks rows, computed BY SPARK over the (few) query rows so the
    decimal chain is bit-identical to the assignment pass (no Python
    float/decimal re-derivation to drift). The table stays distributed
    and BROADCASTS into the scoring join — the earlier form collected it
    to the driver and re-inlined it as literal arrays, costing a whole
    action per lookup batch plus an O(nq·m·ks) expression tree.

    Raises on an empty codebook (index built on an empty corpus —
    retrain after data arrives); query ids that match no source row
    simply contribute no cells (the scoring join then yields no rows
    for them)."""
    m = len(book)
    if any(not book[s] for s in range(m)):
        raise ValueError(
            "empty codebook (index built on an empty corpus — retrain "
            "after data arrives)"
        )
    q = (
        _base.where(F.col(id_col).isin(query_ids))
        if _base is not None
        else _sub_slices(
            df.where(F.col(id_col).isin(query_ids)), in_dim, m, id_col,
            vec_col,
        )
    )
    q_long = q.select(
        F.col(id_col).alias("qid"),
        F.inline(F.array(*[
            F.struct(F.lit(s).alias("s"), F.col(f"_s{s}").alias("sv"))
            for s in range(m)
        ])),
    )
    cd = _codebook_by_s(q.sparkSession, book, m)
    return (
        q_long.join(F.broadcast(cd), "s")
        .select(
            "qid", "s",
            F.explode(
                F.transform(
                    F.col("cb"),
                    lambda e: F.struct(
                        e["c"].alias("cid"),
                        _d2_cols(F.col("sv"), e["cent"]).alias("d2"),
                    ),
                )
            ).alias("_cell"),
        )
        .select("qid", "s", F.col("_cell.cid").alias("cid"),
                F.col("_cell.d2").alias("d2"))
    )


def pq_adc_topk(
    df: DataFrame,
    in_dim: int,
    query_ids: list,
    k: int = 5,
    m: int = 4,
    ks: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    book: Codebook | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: (qid, vec_id, adc_d2) — the k nearest
    encoded vectors per query by summed table lookups. Pass ``book`` to
    reuse a trained codebook (the production path); otherwise trains on
    ``df`` first.

    The corpus-side pass is ONE scan of the codes joined (broadcast)
    against the nq×m×ks distance-cell table + one per-query top-k
    window partitioned by qid. Ties break (d2, vec_id) — deterministic
    across engines."""
    # ONE persisted slice table feeds training, the query distance
    # tables and the encode pass — uncached, each re-derived the decimal
    # slicing from source (train already persisted internally; the other
    # two were fresh scans + fresh codegen). Lifecycle: the returned
    # frame references the cache; Spark's ContextCleaner reclaims it
    # when the result goes out of scope. At corpus scale run encode
    # separately against a frozen ``book`` (the documented production
    # path) rather than through this inline trainer.
    if book is not None:
        # a caller-trained book fixes the subspace count — the slice
        # table must match IT, not the parameter default
        m = len(book)
    base = _sub_slices(df, in_dim, m, id_col, vec_col).persist()
    if book is None:
        book = pq_train(
            df, in_dim, m=m, ks=ks, iters=iters,
            id_col=id_col, vec_col=vec_col, _base=base,
        )
    m = len(book)
    cells = _query_cells(
        df, book, in_dim, query_ids, id_col, vec_col, _base=base
    )
    encoded = _assign_wide(base, book, m).select(
        F.col(id_col),
        F.array(*[F.col(f"_code_{s}") for s in range(m)]).alias("codes"),
    )
    return adc_topk_from_codes(encoded, cells, m, k, id_col=id_col)


def adc_topk_from_codes(
    encoded: DataFrame,
    cells: DataFrame,
    m: int,
    k: int,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """Score persisted/derived PQ codes against the per-query distance
    CELL table ((qid, s, cid, d2) from ``_query_cells``) — the shared
    ADC tail both the inline ``pq_adc_topk`` and the persisted
    ``PQIndex.topk`` run, so their equality law is one code path, not
    two implementations agreeing.

    The codes explode to (id, s, cid) and broadcast-join the cell table
    (every (s, code) matches exactly one cell per qid — encoding used
    the same final book, so dropped-centroid codes never occur), then a
    (id, qid)-keyed exact-decimal sum replaces the earlier sequential
    literal-table fold: decimal addition here is exact (no rounding,
    values far under the 38-digit cap), so the order-independent sum is
    bit-identical to the fold, without collecting the tables to the
    driver or inlining nq·m·ks literals into the plan."""
    enc_long = encoded.select(
        F.col(id_col), F.posexplode(F.col(codes_col)).alias("s", "cid")
    )
    scored = (
        enc_long.join(F.broadcast(cells), ["s", "cid"])
        .groupBy(id_col, "qid")
        .agg(F.sum("d2").alias("d2"))
    )
    w = Window.partitionBy("qid").orderBy("d2", id_col)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "qid",
            F.col(id_col),
            # 6dp quantization through decimal (order-independent law
            # unchanged), then double as the FINAL representation — the
            # driver's pandas canon hashes dtypes, and a decimal final
            # (object-dtype Decimal) can never match DuckDB's float64
            # even when numerically identical (round-5 red row).
            F.round(F.col("d2").cast("double"), 6)
            .cast("decimal(18,6)")
            .cast("double")
            .alias("adc_d2"),
        )
    )
