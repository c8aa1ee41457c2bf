"""Deduplication operators for training-data pipelines.

All variants are pure DataFrame compositions (exploded inverted indexes +
joins + aggregates) so Catalyst plans the shuffles; no Python in the hot
path. Hash primitives are md5-hex (shared verbatim by the DuckDB oracles),
compared lexicographically — engine-portable "min-hash" without relying on
any engine-specific 64-bit hash.

Scale notes (100 TB): shingle explosion multiplies rows by ~n_tokens; the
inverted-index join shuffles on the shingle/band key, whose cardinality is
huge (good distribution) but can contain hot shingles — the ``df_filter``
frequency cut below is the standard mitigation (drop shingles appearing in
more than ``max_df`` docs: they only generate candidate pairs that jaccard
verification would reject anyway, and they are exactly the skewed keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hemera_indexer_spark.functions.rounding import round_double

from hemera_indexer_spark.operators.text import fingerprint


# ------------------------------------------------------------------ exact
def exact_duplicate_clusters(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: clusters of identical normalized text.
    Returns (fp, cluster_size, min_doc_id) for clusters with size >= 2."""
    return (
        df.select(F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("cluster_size"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .where(F.col("cluster_size") >= 2)
    )


# ---------------------------------------------------------------- shingles
def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 2, distinct: bool = True
) -> DataFrame:
    """Word n-gram shingles per doc: (doc_id, shingle).

    ``distinct=True`` dedups shingles per doc — a FULL shuffle of the
    pipeline's biggest intermediate. Pass ``distinct=False`` whenever the
    consumer is duplicate-insensitive (MinHash ``min`` aggregation) or will
    prune to a tiny subset first (LSH verification dedups after the
    candidate semi-join): the explode then stays map-only, no shuffle.

    ``text_col`` may also be an ARRAY column (pre-tokenized sequences, the
    north-rule table's ``tokens:array<int>``): elements are stringified and
    shingled directly — token-id n-grams instead of word n-grams, no
    lower/trim normalization (token ids are already canonical)."""
    import pyspark.sql.types as _T

    dt = df.schema[text_col].dataType
    if isinstance(dt, _T.ArrayType):
        w = F.transform(F.col(text_col), lambda x: x.cast("string"))
    else:
        w = F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
    # MATERIALIZE the word array into a column before any per-element
    # access: expressions referenced inside a higher-order-function lambda
    # are not common-subexpression-eliminated, so element_at(split(...), i)
    # re-runs the split for EVERY element — O(words^2) regex work per doc
    # (measured 7x slower on the bigram path).
    base = df.select(F.col(id_col).alias("doc_id"), w.alias("_w"))
    arr = F.col("_w")
    if n == 1:
        sh = arr
    elif n == 2:
        # the common case: zip the array against itself shifted by one —
        # two O(len) slices + one O(len) zip_with, all codegen'd
        sz = F.size(arr)
        sh = F.zip_with(
            F.slice(arr, 1, sz - 1),
            F.slice(arr, 2, sz - 1),
            lambda a, b: F.concat_ws("_", a, b),
        )
    else:
        # branch, don't clamp: with size < n the un-guarded sequence would
        # DESCEND (0, -1, ...) and element_at(arr, 0) is a runtime error
        idx = F.when(
            F.size(arr) >= n, F.sequence(F.lit(0), F.size(arr) - n)
        ).otherwise(F.array().cast("array<int>"))
        sh = F.transform(
            idx,
            lambda i: F.concat_ws(
                "_",
                *[F.element_at(arr, (i + j + 1).cast("int")) for j in range(n)],
            ),
        )
    out = base.select("doc_id", F.explode(sh).alias("shingle")).where(
        F.col("shingle") != ""
    )
    return out.distinct() if distinct else out


def _df_filter(shingles: DataFrame, max_df: int | None) -> DataFrame:
    if max_df is None:
        return shingles
    hot = (
        shingles.groupBy("shingle")
        .count()
        .where(F.col("count") > max_df)
        .select("shingle")
    )
    return shingles.join(F.broadcast(hot), "shingle", "left_anti")


# ----------------------------------------------------------- n-gram jaccard
def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.6,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard >= threshold, via an
    inverted-index self-join (candidates share >=1 shingle) + verification.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    # the shingle table feeds three plan branches (sizes + both join sides);
    # cache it so the explode+distinct shuffle runs once (Spark's
    # ContextCleaner unpersists it when the DataFrame goes out of scope)
    sh = _df_filter(word_shingles(df, id_col, text_col, n), max_df).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            round_double(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------------ minhash
#: Version tag of the MinHash family. Bump whenever the per-seed hash
#: function changes (v1 = md5-per-seed, v2 = chunked 4-md5 family below —
#: the round-3 change invalidated any v1 signatures). Persist this next to
#: any stored signature / band-bucket artifact and REBUILD on mismatch:
#: signatures from different families must never be compared or banded
#: together (their collision probabilities are unrelated).
MINHASH_FAMILY_VERSION = 2


def _minhash_aggs(k: int) -> list:
    """The k per-doc ``min`` aggregates of the chunked MinHash family:
    seed s uses the 8-hex-char (32-bit) substring chunk ``s % 4`` of
    ``md5((s // 4) || '|' || shingle)`` — so k seeds cost ceil(k/4) md5
    evaluations per shingle instead of k (md5 over the shingle text is the
    dominant per-row cost of the whole signature stage, and shorter chunk
    strings also shrink the agg state and the band bucket strings).
    Lexicographic min over a uniform 32-bit hex chunk is a valid minhash;
    exactly reproducible in ANSI SQL (substr over md5)."""
    return [
        F.min(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(s // 4), F.col("shingle"))),
                (s % 4) * 8 + 1,
                8,
            )
        ).alias(f"_h{s}")
        for s in range(k)
    ]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    k: int = 8,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """k-permutation MinHash (chunked family, see ``_minhash_aggs``).
    Returns (doc_id, seed, minhash).

    Physical shape: ONE pass over the shingle table with k parallel ``min``
    aggregates (all map-side combined), then an unpivot to the long form —
    NOT a k-way seed cross join, which would multiply the shuffle by k. At
    web scale the shingle table is the biggest intermediate in the whole
    dedup pipeline; never widen it — and never build it twice: callers that
    already hold the (doc_id, shingle) table pass it via ``shingles``.
    Duplicate shingles don't change a ``min``, so the default build skips
    the per-doc distinct — the explode stays map-only and the only shuffle
    is the map-side-combined groupBy(doc_id)."""
    sh = (
        shingles
        if shingles is not None
        else word_shingles(df, id_col, text_col, n, distinct=False)
    )
    wide = sh.groupBy("doc_id").agg(*_minhash_aggs(k))
    stack_args = ", ".join(f"{s}, _h{s}" for s in range(k))
    return wide.selectExpr(
        "doc_id", f"stack({k}, {stack_args}) AS (seed, minhash)"
    ).withColumn("seed", F.col("seed").cast("int"))


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding: signature rows group into ``bands`` bands of
    r = k/bands rows; docs sharing any band bucket become candidates;
    candidates are verified with exact Jaccard. Returns
    (doc_a, doc_b, jaccard).

    Precision is governed by r (collision prob per band = s^r, 50%-recall
    point s* ≈ (1/bands)^(1/r)): r=2 banding measured 58,812 candidate
    pairs on a 5k-doc corpus whose true >=0.5 dup set is 256; r=4 (the
    default, s* ≈ 0.71) measured 465 — a 126x cut in verification work
    with zero recall loss on near-identical dups. At 100 TB the
    verification stage is O(candidates), so r is THE knob that keeps it
    O(true dups)."""
    if k % bands != 0:
        # a remainder band would silently change recall (seeds beyond the
        # last full band would be hashed but never banded) — make the
        # contract explicit instead
        raise ValueError(f"k ({k}) must be divisible by bands ({bands})")
    rows_per_band = k // bands
    # ONE map-only explode (NO distinct, NO cache): MinHash mins are
    # duplicate-insensitive, and verification dedups AFTER pruning to the
    # candidate docs. The corpus-wide distinct was the biggest shuffle in
    # the whole pipeline; caching the exploded table (larger than the
    # input) cost more than re-running a map-only explode from parquet.
    sh = word_shingles(df, id_col, text_col, n, distinct=False)
    # band buckets straight from the WIDE per-doc aggregate: one
    # map-side-combined groupBy(doc_id) computes all k mins, and each band's
    # bucket string is a column concat + map-only explode. (The earlier
    # stack-unpivot + groupBy(doc_id, band) + collect_list/sort form paid a
    # SECOND full shuffle of k rows per doc for the same strings.)
    wide = sh.groupBy("doc_id").agg(*_minhash_aggs(k))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"_h{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    band = wide.select(
        "doc_id", F.explode(band_structs).alias("_bb")
    ).select("doc_id", F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket"))
    a = band.alias("a")
    b = band.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        # tiny after LSH, but feeds two branches (verification join +
        # candidate-doc semi-join) — cache so the whole minhash/banding
        # pipeline runs once, not three times
        .cache()
    )
    # verify candidates with exact jaccard on the same shingle sets. Only
    # docs that appear in some candidate pair matter from here on — after
    # LSH that set is tiny relative to the corpus, so the semi-join prunes
    # EVERY verification branch (common-shingle join AND the size
    # denominators) down to the candidates: the 100 TB-critical cut. The
    # sizes are per-doc totals, so computing them from the pruned table
    # yields identical values for every doc that survives to the output.
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # distinct runs HERE, after the broadcast semi-join pruned the exploded
    # table down to candidate docs — a shuffle of O(candidates), not O(corpus)
    sh_cand = (
        sh.join(F.broadcast(cand_docs), "doc_id", "left_semi")
        .distinct()
        .cache()
    )
    sizes = sh_cand.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = sh_cand.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh_cand.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            round_double(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------- cluster resolution (CC)
def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    check_every: int = 2,
) -> DataFrame:
    """Resolve near-dup PAIRS into clusters: (doc_id, cluster_id) where
    cluster_id is the minimum doc id reachable through the pair graph — the
    step that turns pairwise dedup output into actionable keep/drop sets.

    Min-label propagation: every node starts labeled with itself; each round
    takes the min of its own label and its neighbors' labels; converged when
    a round changes nothing. Rounds needed = graph diameter — near-dup
    clusters are tiny (duplicates of one document), so this is a handful of
    equi-join shuffles, each O(|edges|); the driver only checks a change
    COUNT (no data ever collects). ``check_every`` rounds are chained into
    ONE Spark action before each convergence check: the fixpoint is
    monotone, so "last chained round changed nothing" still implies global
    convergence, and the per-action driver fixed cost is paid half as often.
    This is the standard Spark CC shape (label propagation;
    large-star/small-star is the same idea with better worst-case rounds
    for pathological graphs).

    Raises RuntimeError if ``max_iter`` rounds pass without convergence —
    silently returning partially-propagated labels would split clusters on
    long transitive chains."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .cache()  # re-read every round; never recompute the pair pipeline
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .cache()
    )
    check_every = max(1, check_every)
    done = 0
    converged = False
    while done < max_iter and not converged:
        steps = min(check_every, max_iter - done)
        cur = labels
        chg = None
        for _ in range(steps):
            neighbor_min = (
                edges.join(cur, edges.b == cur.node)
                .groupBy("a")
                .agg(F.min("label").alias("nmin"))
            )
            nxt = cur.join(
                neighbor_min, cur.node == neighbor_min.a, "left"
            ).select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
                (F.col("nmin") < F.col("label")).alias("_chg"),
            )
            chg = nxt
            cur = nxt.drop("_chg")
        new_labels = chg.cache()
        # only the LAST chained round's change count is inspected: labels
        # only ever decrease, so a no-change round proves the fixpoint.
        converged = new_labels.where(F.col("_chg")).count() == 0
        labels.unpersist()
        labels = new_labels.drop("_chg")
        done += steps
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "pair-graph diameter exceeds max_iter (pathological chain); "
            "raise max_iter or switch to large-star/small-star"
        )
    out = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    edges.unpersist()
    return out


def connected_components_star(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 40,
) -> DataFrame:
    """Alternating large-star / small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
    pathological-graph companion to ``connected_components``: label
    propagation needs diameter rounds (fine for tiny near-dup clusters,
    hopeless for a million-node chain), star contraction converges in
    O(log^2 n) rounds on ANY graph shape.

    Each round is two self-describing DataFrame steps over the edge set:

    - large-star: every node u points its LARGER neighbors at the minimum
      of its neighborhood ∪ itself.
    - small-star: every node u points its not-larger neighbors (and
      itself) at that minimum.

    The edge set converges to a star forest: (center, member) pairs.
    Output matches ``connected_components``: (doc_id, cluster_id) with
    cluster_id = the component's minimum id, every member (including the
    center) listed."""
    # undirected edge list (a, b), deduped, self-loops dropped
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .cache()
    )
    all_nodes = (
        edges.select(F.col("a").alias("doc_id"))
        .unionByName(edges.select(F.col("b").alias("doc_id")))
        .distinct()
        .cache()
    )
    all_nodes.count()

    def _nbr_min(directed: DataFrame) -> DataFrame:
        return directed.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )

    for _ in range(max_iter):
        # large-star: reduce at every node u over its FULL neighborhood;
        # emit (v, m) for the strictly larger neighbors. The emission union
        # over all u REPLACES the edge set (each undirected edge is covered
        # from its smaller endpoint's reduce).
        both = edges.select("a", "b").toDF("u", "v").unionByName(
            edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        m = _nbr_min(both)
        ls = (
            both.where(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star: orient every edge to its smaller endpoint, reduce at
        # u over the smaller neighbors; emit (v, m) for each plus (u, m).
        oriented = ls.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        m2 = _nbr_min(oriented)
        new_edges = (
            oriented.join(m2, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(m2.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .where(F.col("a") != F.col("b"))
            .distinct()
            # localCheckpoint (eager) truncates the LOGICAL plan, not just
            # execution: each round's plan references the previous round
            # several times, so without truncation the analyzer's tree
            # grows exponentially with rounds and overflows
            .localCheckpoint()
        )
        # stable edge set == star forest of minima: one count action per
        # round over the symmetric difference
        changed = (
            new_edges.unionByName(edges)
            .groupBy("a", "b")
            .count()
            .where(F.col("count") == 1)
            .count()
        )
        edges.unpersist()
        edges = new_edges
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # star forest edges are (member, center) with center = component min;
    # centers label themselves via the left join fallback.
    labels = edges.select(
        F.greatest("a", "b").alias("doc_id"), F.least("a", "b").alias("cluster_id")
    )
    out = all_nodes.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    return out


def connected_components_auto(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    driver_threshold: int = 1_000_000,
    max_iter: int = 25,
) -> DataFrame:
    """Scale-adaptive cluster resolution. The pair graph of a dedup run is
    O(duplicates), usually tiny next to the corpus — but label propagation
    pays several Spark actions of fixed cost per round regardless of size.
    This hybrid mirrors Spark's own small-side rule (broadcast when it
    fits): count the edges first (one action over the — typically cached —
    pair pipeline); at or below ``driver_threshold`` collect them and run
    an exact union-find on the driver (bounded by the threshold, stated
    here loudly: this is a deliberate metadata-scale collect, not a data
    collect); above it, fall back to the distributed label propagation.
    Output is identical either way: (doc_id, cluster_id = component min)."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .distinct()
        .cache()
    )
    # ONE action decides AND fetches: take(threshold + 1) returns every
    # edge when the graph is driver-sized and over-fills by exactly one
    # row when it is not — the earlier count-then-collect pair cost two
    # Spark actions over the (cached) pair pipeline for the same
    # information. The over-fetch bound is the threshold itself, which
    # was always the stated driver-memory budget.
    rows = edges.take(driver_threshold + 1)
    if len(rows) > driver_threshold:
        out = connected_components(edges, "a", "b", max_iter=max_iter)
        edges.unpersist()
        return out
    edges.unpersist()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        a, b = r["a"], r["b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root so the representative is the component min
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    labels = [(node, find(node)) for node in parent]
    spark = pairs.sparkSession
    schema_src = pairs.schema[src].dataType
    out_schema = (
        f"doc_id {schema_src.simpleString()}, cluster_id {schema_src.simpleString()}"
    )
    return spark.createDataFrame(labels, out_schema)


def keep_drop_from_cc(cc: DataFrame) -> DataFrame:
    """The keep rule in ONE place: keep the cluster's min id (= the
    cluster_id label), drop the rest. Input: (doc_id, cluster_id) from any
    connected-components variant."""
    return cc.select(
        "doc_id", "cluster_id", (F.col("doc_id") == F.col("cluster_id")).alias("keep")
    )


def keep_best_from_cc(
    cc: DataFrame, scores: DataFrame, score_col: str = "score"
) -> DataFrame:
    """Production keep rule: within each duplicate cluster keep the
    HIGHEST-scoring doc (quality, length, recency — whatever ``scores``
    carries), ties broken by min doc_id. ``keep_drop_from_cc`` keeps the
    min id — fine for determinism, but a pipeline curating training data
    wants the best representative, not the lowest id. Input: cc =
    (doc_id, cluster_id) from any connected-components variant; scores =
    (doc_id, score_col). One equi-join + one window partitioned by
    cluster — clusters are tiny, so the window never skews."""
    from pyspark.sql import Window

    labeled = cc.join(scores, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(score_col), F.asc("doc_id")
    )
    return labeled.withColumn("keep", F.row_number().over(w) == 1)


def dedup_keep_drop(pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """Keep/drop decision per clustered doc: keep the cluster's min id, drop
    the rest. Returns (doc_id, cluster_id, keep:boolean)."""
    return keep_drop_from_cc(connected_components(pairs, src, dst))


# -------------------------------------------------- duplicated-span detect
def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    stride: int = 1,
) -> DataFrame:
    """Exact duplicated-SPAN detection — the substring-dedup shape of
    "Deduplicating Training Data Makes Language Models Better" (Lee et al.,
    2022): find every ``window``-word span that occurs verbatim in more
    than one document (or more than once in the same document), so a
    pipeline can cut the span rather than drop whole near-dup docs.

    Physical shape: slide a word window over each doc (materialized array +
    ``transform`` over start indices — O(len·window) concat per doc, no
    quadratic regex re-evaluation), hash each span (md5, oracle-portable),
    explode to (doc_id, pos, span_hash), and keep hashes whose occurrence
    count across the corpus exceeds 1 — a single map-side-combined groupBy
    on the span hash, equi-joined back to occurrences (never a self-join;
    no broadcast hint — the duplicated-hash set is O(corpus duplication)
    and can be huge on web crawls, so the planner/AQE picks the join side).
    The occurrence explode feeds both the aggregate and the probe side and
    is deliberately NOT cached: it is map-only from source, and caching an
    intermediate larger than the input costs more than a second scan.
    Returns (span_hash, n_occurrences, n_docs, doc_id, pos) one row per
    occurrence of a duplicated span."""
    w = F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
    base = df.select(F.col(id_col).alias("doc_id"), w.alias("_w"))
    arr = F.col("_w")
    # branch, don't clamp: Spark's sequence() rejects stop < start, and the
    # If expression evaluates only the taken branch, so short docs yield []
    starts = F.when(
        F.size(arr) >= window,
        F.sequence(F.lit(0), F.size(arr) - window, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    spans = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("pos"),
            F.md5(
                F.concat_ws(" ", F.slice(arr, i + 1, window))
            ).alias("span_hash"),
        ),
    )
    occ = base.select(
        "doc_id", F.explode(spans).alias("s")
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.span_hash").alias("span_hash"))
    dup_hashes = (
        occ.groupBy("span_hash")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_occurrences") >= 2)
    )
    return occ.join(dup_hashes, "span_hash").select(
        "span_hash", "n_occurrences", "n_docs", "doc_id", "pos"
    )


# -------------------------------------------------- benchmark decontamination
def _span_hash_arrays(
    df: DataFrame, id_col: str, text_col: str, window: int, stride: int
) -> DataFrame:
    """(doc_id, _spans): per-doc array of md5 hashes of every ``window``-word
    span at ``stride`` — the shared span derivation of the decontamination
    operators (one map-only pass, no shuffle)."""
    w = F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
    base = df.select(F.col(id_col).alias("doc_id"), w.alias("_w"))
    arr = F.col("_w")
    starts = F.when(
        F.size(arr) >= window,
        F.sequence(F.lit(0), F.size(arr) - window, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        starts,
        lambda i: F.md5(F.concat_ws(" ", F.slice(arr, i + 1, window))),
    )
    return base.select("doc_id", sh.alias("_spans"))


def cross_corpus_span_overlap(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    stride: int = 1,
) -> DataFrame:
    """Benchmark decontamination: training documents that contain a
    ``window``-word span appearing verbatim in the benchmark/eval corpus —
    the n-gram contamination check every LLM data pipeline runs before
    training (the GPT-3/PaLM 13-gram overlap procedure, shrunk to word
    windows).

    Physical shape: the benchmark side reduces to its DISTINCT span-hash
    set (benchmarks are tiny next to 100 TB of training data), which
    BROADCASTS to the training scan. The training side is ONE map-only
    pass: each doc carries its span-hash ARRAY plus its span count
    (``size`` computed before the explode), so the per-doc denominator
    never needs a corpus-wide aggregate; the explode + broadcast semi-join
    + groupBy touch only rows that hit the benchmark set, and the final
    denominator join pairs the map-only projection with the (usually tiny)
    contaminated-doc aggregate — left unhinted so AQE broadcasts it when
    it is actually small instead of trusting an assumption.
    Returns (doc_id, n_hits, n_spans, contamination) per contaminated
    training doc, where contamination = n_hits / n_spans."""
    def span_arrays(df: DataFrame) -> DataFrame:
        return _span_hash_arrays(df, id_col, text_col, window, stride)

    bench_spans = (
        span_arrays(bench)
        .select(F.explode("_spans").alias("span_hash"))
        .distinct()
    )
    # ONE pass over the training side: the per-doc span count rides along
    # the explode (a constant int per row), so the denominator needs no
    # second regex+hash scan of the corpus — the semi-join keeps every left
    # column and the groupBy recovers (n_hits, n_spans) together.
    occ = span_arrays(train).select(
        "doc_id",
        F.size("_spans").alias("n_spans"),
        F.explode("_spans").alias("span_hash"),
    )
    return (
        occ.join(F.broadcast(bench_spans), "span_hash", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"), F.first("n_spans").alias("n_spans"))
        .select(
            "doc_id",
            "n_hits",
            "n_spans",
            round_double(F.col("n_hits") / F.col("n_spans"), 6).alias("contamination"),
        )
    )


def bloom_span_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    stride: int = 1,
    k: int = 3,
    prefix_len: int = 6,
) -> DataFrame:
    """Decontamination via a BLOOM SURROGATE of the benchmark span set —
    the scale path when the bench side is too big to broadcast raw
    (``cross_corpus_span_overlap`` broadcasts the distinct span hashes;
    fine for benchmarks, not for checking a corpus against another CORPUS).

    Each span hash maps to ``k`` positions — the first ``prefix_len`` hex
    chars of md5(span_hash + '#' + i) — a domain of 16^prefix_len cells.
    The bench side reduces to its DISTINCT (i, position) pairs: at most
    k x |distinct bench spans| rows of ``prefix_len`` chars, and BOUNDED
    ABOVE by k x 16^prefix_len regardless of bench size — that bound is
    the point: the surrogate saturates at the filter size while raw span
    hashes grow with the corpus. A training span is bloom-POSITIVE iff all
    k of its positions appear (classic Bloom semantics as an equi-join —
    left unhinted so AQE broadcasts the surrogate when it fits and
    shuffle-joins when it does not).

    Guarantees, matching a Bloom filter's: NO false negatives (every truly
    contaminated span hits all k positions by construction — tested as a
    superset law against ``cross_corpus_span_overlap``); false positives
    at rate ~(1 - e^(-k·n/m))^k for n distinct bench spans, m =
    16^prefix_len — flagged docs are candidates to verify or to drop
    conservatively. Deterministic and engine-portable (md5 both sides).

    Returns the same shape as ``cross_corpus_span_overlap``:
    (doc_id, n_hits, n_spans, contamination), where n_hits counts
    bloom-positive span OCCURRENCES."""
    def pos_i(col, i):
        return F.substring(
            F.md5(F.concat(col, F.lit(f"#{i}"))), 1, prefix_len
        )

    bench_spans = (
        _span_hash_arrays(bench, id_col, text_col, window, stride)
        .select(F.explode("_spans").alias("span_hash"))
        .distinct()
    )
    bench_pos = [
        bench_spans.select(pos_i(F.col("span_hash"), i).alias(f"_p{i}"))
        .distinct()
        for i in range(k)
    ]
    # STAGED probe, one position at a time: a span is bloom-positive iff
    # ALL k positions hit, so probing position 0 first (a broadcast
    # semi-join on the per-position distinct table) discards the
    # overwhelmingly common all-negative spans after ONE position md5 —
    # positions 1..k-1 are computed only for the survivors of the
    # previous stage. At fill ratio f per position the stage-1 survivor
    # stream is ~f of the corpus spans (a few % at benchmark-sized
    # filters), so the k-way work and the k× row explode of the earlier
    # single-shot probe never happen for clean spans (measured 1.2s ->
    # 0.7s at sf0.1; guide §3.2's Bloom idea applied to the Bloom
    # surrogate itself). Conjunction of the k semi-joins == the old
    # k_hit == k test, so the surviving occurrence SET is identical, and
    # n_hits is now simply the surviving-occurrence count per doc
    # (each occurrence is one row — no hit_rows/k recovery needed).
    # (An earlier form pre-collapsed occurrences to (span, n_occ) with a
    # corpus-wide groupBy before probing; 8-word spans are almost never
    # repeated inside one doc, so that full span-stream shuffle bought a
    # ~1x dedup — it was the single biggest exchange in the whole query,
    # guide §2.4's "remove shuffles outright".)
    surv = _span_hash_arrays(train, id_col, text_col, window, stride).select(
        "doc_id",
        F.size("_spans").alias("n_spans"),
        F.explode("_spans").alias("span_hash"),
    )
    # semi-joins left UNHINTED: each per-position table is bounded by
    # min(|bench spans|, 16^prefix_len) — benchmark-sized in practice but
    # potentially hundreds of MB at the 16^prefix_len bound, so AQE picks
    # broadcast when it fits and shuffle-joins when it does not (measured
    # faster than a forced broadcast even at sf0.1)
    for i in range(k):
        surv = (
            surv.withColumn(f"_p{i}", pos_i(F.col("span_hash"), i))
            .join(bench_pos[i], f"_p{i}", "left_semi")
            .drop(f"_p{i}")
        )
    return (
        surv.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.first("n_spans").alias("n_spans"),
        )
        .select(
            "doc_id",
            "n_hits",
            "n_spans",
            round_double(F.col("n_hits") / F.col("n_spans"), 6).alias("contamination"),
        )
    )


# ----------------------------------------------------- deterministic split
def dataset_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, int] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic, engine-portable train/val/test assignment: bucket =
    first 4 hex digits of md5(salt|id) mod 100, mapped to named splits by
    cumulative weight. Stable across runs, engines and cluster sizes
    (md5 is the same everywhere — Spark's xxhash64/rand are not), and
    embarrassingly parallel (a pure projection, no shuffle). Returns the
    input plus a ``split`` column."""
    return df.withColumn(
        "split", _split_expr(F.col(id_col), weights, salt)
    )


def _split_expr(key, weights: dict[str, int] | None, salt: str):
    """The md5-bucket split rule over an arbitrary key COLUMN — shared by
    ``dataset_split`` (key = the doc id) and ``leakage_safe_split``
    (key = the near-dup cluster representative)."""
    weights = weights or {"train": 90, "val": 5, "test": 5}
    if sum(weights.values()) != 100:
        raise ValueError("split weights must sum to 100")
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(salt), key)), 1, 4),
        16, 10,
    ).cast("int") % 100
    expr = None
    acc = 0
    for name, wgt in weights.items():
        acc += wgt
        cond = h < acc
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return expr


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    weights: dict[str, int] | None = None,
    salt: str = "split",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Dedup-aware train/val/test assignment: near-duplicate documents
    NEVER straddle a split boundary. ``dataset_split`` hashes each doc
    independently, so two near-identical docs can land one in train and
    one in test — exactly the train/test contamination Lee et al. (2022,
    "Deduplicating Training Data Makes Language Models Better") measure
    leaking benchmark answers into training. Here the split key is the
    doc's near-dup CLUSTER representative (connected-components min over
    the ``pairs`` edge list), so an entire duplicate cluster moves as one
    unit; singletons hash by their own id, identical to ``dataset_split``.

    Scale shape: one CC resolution over the pair graph (O(duplicates),
    tiny next to the corpus — the scale-adaptive ``connected_components_
    auto``), one broadcast-or-shuffle left join of the corpus against the
    cluster map (bounded by clustered docs), then the same map-only
    md5-bucket projection. Returns the input plus ``split``."""
    cc = connected_components_auto(pairs, src=src, dst=dst).select(
        F.col("doc_id").alias("_lss_id"),
        F.col("cluster_id").alias("_lss_rep"),
    )
    joined = df.join(
        cc, df[id_col] == F.col("_lss_id"), "left"
    )
    key = F.coalesce(F.col("_lss_rep"), F.col(id_col))
    return joined.withColumn(
        "split", _split_expr(key, weights, salt)
    ).drop("_lss_id", "_lss_rep")


# ------------------------------------------------------------------ simhash
def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash over word unigrams via md5 nibbles: for each of the
    first 4 hex nibbles of md5(word), each of its 4 bits votes +1/-1; the
    sign of each bit's total forms the fingerprint. Docs sharing a simhash
    are near-dup candidates. ANSI-SQL-portable (nibble value via
    strpos('0123..f', ch)). Returns (doc_id, simhash)."""
    w = F.explode(
        F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
    ).alias("word")
    tok = df.select(F.col(id_col).alias("doc_id"), w).where(F.col("word") != "")
    h = F.md5(F.col("word"))
    hexmap = "0123456789abcdef"
    bit_sums = []
    for nib in range(4):
        nib_val = F.instr(F.lit(hexmap), F.substring(h, nib + 1, 1)) - 1
        for b in range(4):
            bit = F.floor(nib_val / (2 ** b)) % 2
            bit_sums.append(
                F.sum(bit * 2 - 1).alias(f"s_{nib * 4 + b}")
            )
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for i in range(16):
        term = F.when(F.col(f"s_{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.cast("int").alias("simhash"))


# -------------------------------------------------- chunk-level (line) dedup
def _first_occurrence_chunks(
    df: DataFrame, id_col: str, text_col: str, chunk_words: int
) -> DataFrame:
    """Shared chunk stream: (doc_id, chunk_idx, chunk, rk) where rk == 1
    marks the corpus-wide FIRST occurrence of the chunk text (first by
    (doc, position) — the C4 keep-first law). One window shuffle keyed by
    chunk text; everything before it is codegen."""
    w = F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
    base = df.select(F.col(id_col).alias("doc_id"), w.alias("_w")).where(
        (F.size("_w") > 0) & (F.element_at("_w", 1) != "")
    )
    arr = F.col("_w")
    cw = F.lit(chunk_words)
    n_chunks = F.ceil(F.size(arr) / cw).cast("int")
    chunks = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(F.slice(arr, i * cw + 1, cw), " "),
            )
        ).alias("chunk_idx", "chunk"),
    )
    first = F.row_number().over(
        Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    )
    return chunks.withColumn("rk", first)


def remove_duplicate_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 8,
) -> DataFrame:
    """The TRANSFORM half of C4-style chunk dedup (`chunk_dedup_counts`
    is the report half): drop every chunk already seen earlier in the
    corpus and reassemble each document from its surviving chunks, in
    original order. Returns (doc_id, clean_text, kept_chunks); a document
    whose every chunk is a repeat disappears from the output entirely
    (C4 drops emptied pages rather than emitting empty strings).

    Shape: the shared first-occurrence window (ONE shuffle keyed by chunk
    text) + a map-side-combined per-doc rollup whose collect_list is
    bounded by the doc's own chunk count — the reassembly never sees
    another document's rows."""
    kept = _first_occurrence_chunks(df, id_col, text_col, chunk_words).where(
        F.col("rk") == 1
    )
    order_then_text = F.transform(
        F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
        lambda s: s["chunk"],
    )
    return kept.groupBy("doc_id").agg(
        F.array_join(order_then_text, " ").alias("clean_text"),
        F.count("*").cast("long").alias("kept_chunks"),
    )


def chunk_dedup_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 8,
) -> DataFrame:
    """C4-style line-level exact dedup, counted: split each doc into
    consecutive ``chunk_words``-word chunks (the corpus's "lines" — the
    synthetic docs carry no newlines, so the line unit is a fixed word
    window), keep only the GLOBALLY FIRST occurrence of every distinct
    chunk (first by (doc, position)), and report per doc how much text
    survives. C4 (Raffel et al. 2020 §2.2) removes any three-sentence
    span seen before; this is the same keep-first-occurrence law at
    chunk granularity.

    Returns (doc_id, n_chunks, kept_chunks, kept_words).

    Shape: the word array is materialized into a column once (no-CSE-in-
    lambda rule), chunk texts come from an O(n_chunks) transform of
    slices (all codegen), and the only shuffle is the first-occurrence
    window keyed by the chunk text — O(total chunks) rows, the same
    order as any line-dedup pass over a web crawl; chunk texts spread
    uniformly so the key has no inherent skew. The per-doc rollup is a
    map-side-combined groupBy."""
    ranked = _first_occurrence_chunks(df, id_col, text_col, chunk_words)
    kept = F.when(F.col("rk") == 1, F.lit(1)).otherwise(F.lit(0))
    kept_words = F.when(
        F.col("rk") == 1, F.size(F.split(F.col("chunk"), " "))
    ).otherwise(F.lit(0))
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(kept).cast("long").alias("kept_chunks"),
        F.sum(kept_words).cast("long").alias("kept_words"),
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup pairs by n-gram containment:
    ``cont(a→b) = |S(a) ∩ S(b)| / |S(a)|`` — "a is (mostly) contained in
    b". Catches what Jaccard misses: a paragraph quoted inside a much
    longer page scores near 1.0 containment but tiny Jaccard (the union
    is dominated by the long doc). The standard complement to symmetric
    resemblance since Broder '97; in a training pipeline it flags
    sub-document duplication (boilerplate wrappers, quote farms,
    excerpt mirrors) that whole-doc dedup keeps.

    Returns (doc_a, doc_b, n_common, containment) for ORDERED pairs
    doc_a != doc_b with cont(a→b) >= threshold — both directions are
    evaluated; usually only one side of an excerpt/page pair survives
    the threshold, which is exactly the signal.

    Same inverted-index shape as ``jaccard_pairs`` (shared-shingle
    self-join + verification against the cached distinct-shingle table);
    ``max_df`` drops hot shingles before the join — at corpus scale the
    candidate generator MUST be LSH (``lsh_candidate_pairs``) with this
    as the verify step; the exact self-join is the oracle-checkable
    small-scale path."""
    sh = _df_filter(word_shingles(df, id_col, text_col, n), max_df).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    return (
        common.join(sa, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            round_double(F.col("n_common") / F.col("n_a"), 6)
            .cast("decimal(18,6)")
            .alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


# -------------------------------------------------- winnowing fingerprints
def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkes & Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every word ``k``-gram, then from
    each window of ``w`` consecutive hashes keep the minimum. Guarantee:
    any two documents sharing a run of at least ``w + k - 1`` tokens share
    at least one fingerprint, while only ~``2/(w+1)`` of all k-gram hashes
    are retained — a density-bounded alternative to full-shingle inverted
    indexes with a LOCALITY guarantee MinHash doesn't give (MinHash bounds
    whole-doc Jaccard; winnowing finds shared PASSAGES).

    Returns ``(doc_id, fp)`` with per-doc-distinct fingerprints.
    Docs shorter than ``w + k - 1`` words emit nothing (no full window).

    Hashes are md5-hex compared lexicographically — engine-portable (the
    DuckDB oracle shares them verbatim); winnowing only needs a total
    order, not integer arithmetic. Ties select one VALUE (set semantics),
    so the rightmost-min tie rule of the paper — which matters only for
    positional density — does not affect the fingerprint set.

    Scale shape: one map-only pass per doc (the k-gram hash array and the
    window minima are array ops inside whole-stage codegen; both arrays
    are MATERIALIZED columns first — Spark does not CSE expressions inside
    higher-order-function lambdas, the 7x bug class in this file's header).
    The explode multiplies rows by ~2·words/(w+1); downstream consumers
    shuffle on the fingerprint key like every inverted index here."""
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.trim(F.lower(F.col(text_col))), "\\s+").alias("_w"),
        )
        .withColumn("_n", F.size("_w"))
        .where(F.col("_n") >= k + w - 1)
    )
    hashes = F.transform(
        F.sequence(F.lit(1), F.col("_n") - k + 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("_w"), i, k))),
    )
    hb = base.select(
        "doc_id", hashes.alias("_h"), (F.col("_n") - k + 1).alias("_m")
    )
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.col("_m") - w + 1),
            lambda j: F.array_min(F.slice(F.col("_h"), j, w)),
        )
    )
    return hb.select("doc_id", F.explode(fps).alias("fp"))


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints —
    shared-passage detection. Inverted-index equi-join on the fingerprint
    key (never an all-pairs product); ``max_df`` drops fingerprints hot
    across more than that many docs BEFORE the join — they are exactly the
    skewed keys, and (boilerplate passages) exactly the matches a curation
    pass wants to ignore. Returns ``(doc_a, doc_b, shared_fps)`` with
    ``doc_a < doc_b``."""
    # cache the shared fingerprint stream: it feeds the hot-cut groupBy,
    # the anti-join, and BOTH sides of the pair join — uncached, the
    # md5-per-k-gram pass re-runs once per consumer (same rule as the
    # jaccard/minhash shingle branch)
    fp = winnow_fingerprints(df, id_col, text_col, k, w).cache()
    if max_df is not None:
        hot = (
            fp.groupBy("fp")
            .count()
            .where(F.col("count") > max_df)
            .select("fp")
        )
        fp = fp.join(F.broadcast(hot), "fp", "left_anti")
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, F.col("a.fp") == F.col("b.fp"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
