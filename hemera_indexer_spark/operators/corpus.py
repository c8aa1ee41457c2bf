"""Corpus-distribution statistics for training-data curation — the
aggregate views a data team reads before (and after) building a mixture:

- bigram PMI collocations (phrase mining / tokenizer-merge candidates),
- vocabulary coverage thresholds (how many types cover X% of tokens),
- per-source KL divergence against the corpus unigram distribution
  (mixture skew: which sources pull the distribution hardest),
- Zipf slope per language (distribution health: natural text sits near
  -1; spam / template farms flatten or steepen it),
- deterministic per-group sampling (inspection panels, eval carve-outs).

All pure DataFrame composition over a map-only exploded word stream;
every aggregate is map-side combined and nothing crosses the Python
boundary. Floating outputs follow the repo's oracle discipline: per-row
terms are rounded to 6dp and cast to decimal(18,6) BEFORE any sum, so
fold order (Spark partitioning, DuckDB vectorization) can never change
the result.

Reference anchor: the reference's aggregate jobs compute fixed daily
rollups over indexed rows (/root/reference/cli/aggregates.py,
indexer/aggr_jobs/*); these operators are the corpus-statistics analog
over the materialized text corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hemera_indexer_spark.functions.rounding import round_double

__all__ = [
    "word_stream",
    "bigram_stream",
    "bigram_pmi",
    "vocab_coverage",
    "source_kl",
    "zipf_slope",
    "per_group_sample",
    "doc_entropy",
    "hapax_ratio",
    "source_exclusivity",
    "dist_drift",
    "bm25_scores",
]


def word_stream(
    df: DataFrame, text_col: str = "text", *extra_cols: str
) -> DataFrame:
    """Map-only exploded word stream: one row per word occurrence, with
    ``extra_cols`` carried along. Lowercased, whitespace-split, empties
    dropped — the same normal form every text operator in the repo uses
    (and every DuckDB oracle mirrors verbatim)."""
    w = F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
    return (
        df.select(*extra_cols, F.explode(w).alias("w"))
        .where(F.col("w") != "")
    )


def bigram_stream(
    df: DataFrame, text_col: str = "text", *extra_cols
) -> DataFrame:
    """Map-only adjacent-bigram stream: one row per (x, y) pair, with
    ``extra_cols`` carried along — the bigram analog of ``word_stream``
    and the single normal form shared by ``bigram_pmi`` and
    ``bigram_logprob`` (one place to fix tokenization). The split word
    array is materialized into a column first (the repo's
    no-CSE-inside-lambda rule), bigrams come from a zip of the array
    against itself shifted by one (two O(len) slices + one zip_with, all
    codegen), empty tokens dropped on both sides.

    ``x``, ``y`` (the outputs) and ``_w``, ``bg`` (internals) are
    RESERVED: an extra column under any of those names would collide
    (duplicate/ambiguous columns downstream), so it is rejected here —
    alias it before calling."""
    w = F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
    base = df.select(*extra_cols, w.alias("_w"))
    keep = [c for c in base.columns if c != "_w"]
    reserved = {"x", "y", "_w", "bg"} & set(keep)
    if reserved:
        raise ValueError(
            f"bigram_stream extra_cols collide with reserved names "
            f"{sorted(reserved)}; alias them before calling"
        )
    arr = F.col("_w")
    sz = F.size(arr)
    return (
        base.where(sz >= 2)
        .select(
            *keep,
            F.explode(
                F.zip_with(
                    F.slice(arr, 1, sz - 1),
                    F.slice(arr, 2, sz - 1),
                    lambda a, b: F.struct(a.alias("x"), b.alias("y")),
                )
            ).alias("bg"),
        )
        .select(*keep, "bg.x", "bg.y")
        .where((F.col("x") != "") & (F.col("y") != ""))
    )


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-k adjacent-word collocations by pointwise mutual information:
    ``pmi = ln( p(x,y) / (p(x)·p(y)) )`` with p(x,y) over the bigram
    stream and p(x) over the unigram stream. The classic phrase-mining
    score (Church & Hanks 1990); in an LLM pipeline it surfaces
    tokenizer-merge candidates and template boilerplate.

    Shape: the split word array is materialized into a column once (the
    repo's no-CSE-inside-lambda rule), bigrams come from a zip of the
    array against itself shifted by one (two O(len) slices + one
    zip_with, all codegen), and both count tables are map-side-combined
    groupBys. ``min_count`` prunes the bigram table BEFORE the joins;
    the unigram (vocabulary) side is broadcast — vocabulary ≪ corpus is
    the standing assumption of every text pipeline here. Totals ride an
    unpartitioned window over the already-aggregated (tiny) tables, so
    no second corpus scan.

    Output ordering ties break on (x, y); the pmi used for ordering is
    the rounded decimal, so rank is as reproducible as the values."""
    pairs = bigram_stream(df, text_col)
    big = pairs.groupBy("x", "y").agg(F.count("*").alias("c_xy"))
    uni = word_stream(df, text_col).groupBy("w").agg(F.count("*").alias("c"))
    n_big = F.sum("c_xy").over(Window.partitionBy())
    n_uni = F.sum("c").over(Window.partitionBy())
    # total BEFORE the min_count prune: p(x,y) is over all bigrams, not
    # just the frequent ones
    big = big.withColumn("n_big", n_big).where(F.col("c_xy") >= min_count)
    uni = uni.withColumn("n_uni", n_uni)
    ux = uni.select(
        F.col("w").alias("x"), F.col("c").alias("c_x"), "n_uni"
    )
    uy = uni.select(F.col("w").alias("y"), F.col("c").alias("c_y"))
    out = (
        big.join(F.broadcast(ux), "x")
        .join(F.broadcast(uy), "y")
        .select(
            "x",
            "y",
            "c_xy",
            F.round(
                F.log(
                    (F.col("c_xy") / F.col("n_big"))
                    / (
                        (F.col("c_x") / F.col("n_uni"))
                        * (F.col("c_y") / F.col("n_uni"))
                    )
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("pmi"),
        )
    )
    return out.orderBy(F.desc("pmi"), F.asc("x"), F.asc("y")).limit(top_k)


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    thresholds: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """For each coverage threshold t: the smallest vocabulary rank (types
    ordered by frequency desc, word asc) whose cumulative token share
    reaches t — the "how big a vocab covers 99% of tokens" curve read
    before sizing a tokenizer.

    The corpus-sized work is one map-side-combined unigram count; the
    cumulative window runs over the VOCABULARY (types, not tokens) in a
    single unpartitioned sort — the standing vocabulary ≪ corpus
    assumption (millions of types from a 100 TB corpus is a one-node
    sort). The 3-row threshold table is broadcast onto it."""
    uni = word_stream(df, text_col).groupBy("w").agg(
        F.count("*").alias("c")
    )
    wr = Window.orderBy(F.desc("c"), F.asc("w"))
    cum = (
        uni.withColumn("rank", F.row_number().over(wr))
        .withColumn(
            "cum",
            F.sum("c").over(
                wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("total", F.sum("c").over(Window.partitionBy()))
    )
    spark = df.sparkSession
    thr = spark.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"
    )
    return (
        cum.join(
            F.broadcast(thr),
            F.col("cum") / F.col("total")
            >= F.col("threshold") - F.lit(1e-12),
        )
        .groupBy("threshold")
        .agg(F.min("rank").alias("vocab_rank"))
        .select(
            F.col("threshold").cast("decimal(18,6)").alias("threshold"),
            "vocab_rank",
        )
    )


def source_kl(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-source KL divergence of the source's unigram distribution from
    the whole-corpus distribution: ``KL(p_s ‖ p_corpus) = Σ_w p_s(w) ·
    ln(p_s(w)/p(w))`` — the mixture-skew score (which sources drag the
    training distribution hardest; CCNet/Pile-style curation reads this
    next to the token budget).

    ONE corpus pass: per-(source, word) counts are the only
    occurrence-stream shuffle; the global word counts are re-aggregated
    FROM that table (vocabulary-sized input), not from a second scan.
    Per-word terms round to decimal(18,6) before the per-source sum, so
    the fold is order-independent (oracle-exact under any partitioning).
    KL ≥ 0 up to that rounding."""
    sc = (
        word_stream(df, text_col, group_col)
        .groupBy(group_col, "w")
        .agg(F.count("*").alias("c_sw"))
    )
    gc = sc.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    gc = gc.withColumn("n_tot", F.sum("c_w").over(Window.partitionBy()))
    sc = sc.withColumn(
        "n_src",
        F.sum("c_sw").over(Window.partitionBy(group_col)),
    )
    term = (
        sc.join(F.broadcast(gc), "w")
        .select(
            group_col,
            "n_src",
            F.round(
                (F.col("c_sw") / F.col("n_src"))
                * F.log(
                    (F.col("c_sw") / F.col("n_src"))
                    / (F.col("c_w") / F.col("n_tot"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("t"),
        )
    )
    return term.groupBy(group_col).agg(
        F.first("n_src").alias("n_words"),
        F.sum("t").cast("decimal(18,6)").alias("kl"),
    )


def zipf_slope(
    df: DataFrame, text_col: str = "text", group_col: str | None = None
) -> DataFrame:
    """Least-squares slope of log10(frequency) against log10(rank) per
    group (rank by frequency desc, word asc): the Zipf exponent.
    Natural-language corpora sit near -1; template/spam sources flatten
    toward 0 or collapse steeply — a one-number distribution-health
    probe per language or source.

    Determinism: the slope is computed from the closed form
    ``(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`` where x = log10(rank) and
    y = log10(freq) are rounded to decimal(18,6) PER ROW first — all
    four sums are exact decimal folds (order-independent), and only the
    final scalar expression runs in floating point. ``covar_pop`` /
    ``regr_slope`` would fold doubles in partition order and flake
    against the oracle at the last ulp.

    The ranking window partitions by group (or runs unpartitioned for a
    whole-corpus slope) over the vocabulary-sized count table."""
    cols = [group_col] if group_col else []
    uni = word_stream(df, text_col, *cols).groupBy(*cols, "w").agg(
        F.count("*").alias("c")
    )
    wr = Window.partitionBy(*cols).orderBy(F.desc("c"), F.asc("w"))
    xy = uni.select(
        *cols,
        F.round(F.log10(F.row_number().over(wr).cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("x"),
        F.round(F.log10(F.col("c").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("y"),
    )
    agg = xy.groupBy(*cols).agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double") / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    return agg.select(
        *cols,
        F.col("n").alias("n_types"),
        F.round(slope, 6).cast("decimal(18,6)").alias("slope"),
    )


def per_group_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    prefilter_factor: int | None = None,
) -> DataFrame:
    """Deterministic k-per-group sample: rank rows inside each group by
    ``md5(id)`` (id as tie-break) and keep the first k. The same rows
    come back on every engine, cluster size, and retry — the property
    ``df.sample`` cannot give — which is what eval carve-outs and
    human-inspection panels need.

    Default form: one window shuffle keyed by the group column. Sorting
    a whole group through a single ``row_number`` partition makes the
    dominant group a straggler once groups reach billions of rows, so
    ``prefilter_factor`` (use ~4) enables the exact two-phase form:

    1. count each group (tiny agg), broadcast the counts;
    2. keep only rows whose first 32 md5 bits fall under
       ``factor * k / n`` of the hash space — the k smallest hashes of a
       group are certainly among them whenever >= k rows survive, so the
       window then sorts ~factor*k candidate rows per group instead of n;
    3. exactness guard: any group with < k survivors (Chernoff-rare for
       factor >= 4, routine for tiny groups whose fraction saturates
       below 1 only through rounding) falls back to ranking all its
       rows, so the result is bit-identical to the one-phase form.

    No driver-side action in either form; the guard is a broadcast
    anti/semi join on the (small) short-group set."""
    order_hash = F.md5(F.col(id_col).cast("string"))
    wr = Window.partitionBy(group_col).orderBy(order_hash, F.col(id_col))
    out_cols = (group_col, id_col, "rk")
    if prefilter_factor is None:
        return (
            df.withColumn("rk", F.row_number().over(wr))
            .where(F.col("rk") <= k)
            .select(*out_cols)
        )
    slim = df.select(group_col, id_col)
    cnts = slim.groupBy(group_col).agg(F.count("*").alias("_n"))
    # md5's leading 8 hex chars are uniform over [0, 2^32); keep a row iff
    # hash32 < frac * 2^32. ceil via +1 keeps frac*2^32 truncation from
    # starving a group that needed the boundary value.
    hash32 = F.conv(F.substring(order_hash, 1, 8), 16, 10).cast("long")
    frac = F.least(
        F.lit(1.0),
        F.lit(float(prefilter_factor)) * F.lit(float(k)) / F.col("_n"),
    )
    thresh = (frac * F.lit(float(2**32))).cast("long") + F.lit(1)
    surv = slim.join(F.broadcast(cnts), group_col).where(hash32 < thresh)
    short = (
        surv.groupBy(group_col)
        .agg(F.count("*").alias("_s"))
        .where(F.col("_s") < k)
        .select(group_col)
    )
    cand = surv.select(group_col, id_col).join(
        F.broadcast(short), group_col, "left_anti"
    ).unionByName(
        slim.join(F.broadcast(short), group_col, "left_semi")
    )
    return (
        cand.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= k)
        .select(*out_cols)
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc average bigram conditional log-probability under the
    corpus's own bigram LM: ``mean over adjacent pairs of
    ln(c(x,y)/c(x·))`` where ``c(x·)`` counts x as a bigram PREFIX.
    The next step up from the unigram perplexity proxy
    (``q_unigram_logprob``): repetitive/templated docs score near 0,
    incoherent word salad scores far negative. No smoothing is needed —
    the model is fit on the corpus being scored, so every observed
    bigram has count ≥ 1.

    Shape mirrors ``bigram_pmi``: one materialized word array, zip-
    shifted bigram stream, map-side-combined count tables with the
    prefix side derived FROM the bigram table (no extra corpus pass),
    both model tables broadcast onto the scoring stream. Per-pair terms
    round to decimal(18,6) before the per-doc fold (order-independent).
    """
    pairs = bigram_stream(df, text_col, F.col(id_col).alias("doc_id"))
    # ONE pass over the corpus: pre-aggregate the bigram stream to
    # (doc, x, y) occurrence counts — everything downstream (model
    # tables, scoring, per-doc fold) derives from that aggregate, so the
    # raw stream is never cached or re-scanned. The per-occurrence mean
    # equals the count-weighted mean over distinct pairs because lp is a
    # function of (x, y) alone.
    dxy = pairs.groupBy("doc_id", "x", "y").agg(
        F.count("*").alias("c_dxy")
    )
    big = dxy.groupBy("x", "y").agg(F.sum("c_dxy").alias("c_xy"))
    pre = big.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    lp = (
        F.round(F.log(F.col("c_xy") / F.col("c_x")), 6)
        .cast("decimal(18,6)")
        .alias("lp")
    )
    scored = (
        dxy.join(F.broadcast(big), ["x", "y"])
        .join(F.broadcast(pre), "x")
        .select("doc_id", "c_dxy", lp)
    )
    return scored.groupBy("doc_id").agg(
        F.sum("c_dxy").cast("long").alias("n_bigrams"),
        round_double(
            F.sum(F.col("c_dxy") * F.col("lp")).cast("double")
            / F.sum("c_dxy"),
            6,
        )
        .cast("decimal(18,6)")
        .alias("avg_logprob"),
    )


def source_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Cross-source contamination matrix: for every source pair (a < b),
    the count and Jaccard similarity of their distinct word-``n``-gram
    sets — the pairwise generalization of benchmark decontamination
    (which checks ONE eval set against the corpus; this checks every
    source against every other, the view that catches mirror sites and
    cross-source scrapes before they skew a mixture).

    Scale shape: shingles are dedup'd TO SOURCE GRANULARITY first
    (``word_shingles(distinct=True)`` keyed by source — one shuffle of
    the occurrence stream), so the self-join on shingle produces at most
    |sources|² rows PER DISTINCT SHINGLE — bounded by the source count,
    not document frequency; no hot-shingle guard needed. The per-source
    set sizes are a tiny broadcast."""
    from hemera_indexer_spark.operators.dedup import word_shingles

    sh = word_shingles(df, group_col, text_col, n=n, distinct=True)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("src_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("src_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("src_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("src_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            round_double(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            )
            .cast("decimal(18,6)")
            .alias("jaccard"),
        )
    )


def doc_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram Shannon entropy (nats) — the lexical-diversity
    quality signal (low entropy = template/boilerplate/keyword-stuffed
    docs; the C4/Gopher pipelines threshold on signals of this family).

    Returns (doc_id, n_words, n_types, entropy) with
    ``entropy = -Σ_w (c_w/n)·ln(c_w/n)`` over the doc's word counts.

    Shape: one map-only explode, ONE shuffle keyed by (doc, word), the
    per-doc total rides a window over the already-aggregated count table
    (no second corpus scan). Per-term values are rounded to 6dp and cast
    to decimal(18,6) BEFORE the final per-doc sum, so the fold is
    order-independent across engines and partitionings (repo oracle
    discipline).

    Reference anchor: the reference computes per-entity daily statistics
    in its aggr jobs (/root/reference/indexer/aggr_jobs/*); this is the
    per-document statistics analog over the text corpus."""
    tf = (
        word_stream(df, text_col, F.col(id_col).alias("_doc"))
        .groupBy("_doc", "w")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c").over(Window.partitionBy("_doc"))
    p = F.col("c") / F.col("_n")
    term = (
        tf.withColumn("_n", n)
        .select(
            "_doc",
            "_n",
            F.round(-p * F.log(p), 6).cast("decimal(18,6)").alias("_t"),
        )
    )
    return term.groupBy(F.col("_doc").alias(id_col)).agg(
        F.max("_n").alias("n_words"),
        F.count("*").alias("n_types"),
        F.sum("_t").cast("decimal(18,6)").alias("entropy"),
    )


def hapax_ratio(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Hapax-legomena fraction per group: share of the group's vocabulary
    that occurs exactly once. A second lexical-diversity lens — natural
    text sits near 0.4-0.6; scraped template farms and deduplicated spam
    collapse it, OCR noise inflates it.

    Returns (group, n_types, n_hapax, hapax_ratio). One occurrence-stream
    shuffle keyed by (group, word), then a tiny per-group aggregate."""
    uni = (
        word_stream(df, text_col, F.col(group_col).alias("_g"))
        .groupBy("_g", "w")
        .agg(F.count("*").alias("c"))
    )
    return uni.groupBy(F.col("_g").alias(group_col)).agg(
        F.count("*").alias("n_types"),
        F.sum((F.col("c") == 1).cast("bigint")).alias("n_hapax"),
        round_double(
            F.sum((F.col("c") == 1).cast("bigint")) / F.count("*"), 6
        )
        .cast("decimal(18,6)")
        .alias("hapax_ratio"),
    )


def source_exclusivity(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-source n-gram exclusivity: of each source's DISTINCT n-gram
    shingles, what fraction appears in NO other source. The summary dual
    of ``source_overlap``'s pairwise matrix — a source with near-zero
    exclusivity is a mirror/re-scrape of the rest of the mixture and adds
    no new text; near-one means unique (or noisy) content.

    Returns (group, n_shingles, n_exclusive, excl_ratio).

    Shape: shingles dedup to SOURCE granularity first (one shuffle of
    the occurrence stream, same trick as ``source_overlap``), the
    per-shingle source count rides a window over that distinct table
    (second shuffle keyed by shingle — O(distinct shingles), not
    occurrences), then a tiny per-source aggregate."""
    from hemera_indexer_spark.operators.dedup import word_shingles

    sh = word_shingles(df, group_col, text_col, n=n, distinct=True)
    n_src = F.count("*").over(Window.partitionBy("shingle"))
    tagged = sh.withColumn("_ns", n_src)
    return tagged.groupBy(F.col("doc_id").alias(group_col)).agg(
        F.count("*").alias("n_shingles"),
        F.sum((F.col("_ns") == 1).cast("bigint")).alias("n_exclusive"),
        round_double(
            F.sum((F.col("_ns") == 1).cast("bigint")) / F.count("*"), 6
        )
        .cast("decimal(18,6)")
        .alias("excl_ratio"),
    )


def dist_drift(
    df: DataFrame,
    flag_col,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Unigram distribution drift between two document populations, per
    group: the L1 distance ``Σ_w |p_A(w) - p_B(w)|`` over the union
    vocabulary (2× the total-variation distance). The monitoring
    statistic an incremental-ingest pipeline alarms on — compare this
    epoch's (or shard's) token distribution against the committed
    corpus; a jump means the upstream source changed under you.

    ``flag_col`` is a boolean Column splitting rows into population A
    (true) and B (false). Returns (group, n_types, n_a, n_b, l1_dist).

    The raw L1 sum is published instead of TVD = L1/2: per-term values
    are rounded to 6dp decimals before the sum (fold-order-independent),
    and halving the decimal sum afterwards would land exactly on 7dp
    half-boundaries where Spark and DuckDB round differently.

    Shape: one occurrence-stream shuffle keyed by (group, word) with the
    A/B split as two conditional counts in the SAME aggregate (absent
    words are zero counts — the union vocabulary falls out for free);
    population totals ride windows over the aggregated table."""
    ws = word_stream(
        df,
        text_col,
        F.col(group_col).alias("_g"),
        flag_col.cast("boolean").alias("_fa"),
    )
    counts = ws.groupBy("_g", "w").agg(
        F.sum(F.col("_fa").cast("bigint")).alias("c_a"),
        F.sum((~F.col("_fa")).cast("bigint")).alias("c_b"),
    )
    wg = Window.partitionBy("_g")
    # empty-population guard: a group whose words all fall in ONE
    # population would divide by zero (NULL terms silently skipped by
    # SUM — the most-drifted case reporting the least drift). Treat the
    # empty population as the zero measure: its ratio is 0, the L1
    # collapses to Σ p_other = 1.0, and n_a/n_b = 0 tells the consumer
    # which side vanished.
    na = F.sum("c_a").over(wg)
    nb = F.sum("c_b").over(wg)
    p_a = F.when(na > 0, F.col("c_a") / na).otherwise(F.lit(0.0))
    p_b = F.when(nb > 0, F.col("c_b") / nb).otherwise(F.lit(0.0))
    term = counts.select(
        "_g",
        na.alias("_na"),
        nb.alias("_nb"),
        round_double(F.abs(p_a - p_b), 6).cast("decimal(18,6)").alias("_t"),
    )
    return term.groupBy(F.col("_g").alias(group_col)).agg(
        F.count("*").alias("n_types"),
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.sum("_t").cast("decimal(18,6)").alias("l1_dist"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed term set —
    the classic IR scorer a curation pipeline uses for query-focused
    carve-outs (eval-adjacent retrieval sets, topic probes). Returns
    (id, n_terms_hit, bm25) for docs matching at least one term.

    Formula (Lucene's non-negative idf variant):
        idf(t)   = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
        score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Shapes: the word stream aggregates ONCE into per-doc lengths and a
    term-filtered tf table (the filter lands before the shuffle — only
    query-term occurrences are keyed); df/idf is a |terms|-row broadcast;
    N and avgdl are two bounded driver actions (a count and a 1-row agg).
    Per-term contributions round to 6dp and sum as decimal(18,6) — the
    module's order-independent fold discipline, which also absorbs any
    last-ulp ln() divergence between engines."""
    import math

    words = word_stream(df, text_col, id_col).cache()
    try:
        dl = words.groupBy(id_col).agg(F.count("*").alias("_dl"))
        # ONE bounded action for both scalars (doc count + total words)
        # instead of a count plus a dl-aggregate collect: the array-form
        # word count (size of the empty-filtered split) equals the
        # exploded stream's count by construction, and dl itself stays
        # lazy until the scoring join needs it.
        tok = F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
        n_words_arr = F.size(F.filter(tok, lambda w: w != ""))
        hdr = df.agg(
            F.count("*").alias("n"), F.sum(n_words_arr).alias("s")
        ).collect()[0]
        n_docs = hdr["n"]
        avgdl = hdr["s"] / float(n_docs)
        tf = (
            words.where(F.col("w").isin(list(query_terms)))
            .groupBy(id_col, "w")
            .agg(F.count("*").alias("_tf"))
        )
        dfreq = {
            r["w"]: r["df"]
            for r in tf.groupBy("w")
            .agg(F.countDistinct(id_col).alias("df"))
            .collect()
        }
        idf = {
            t: math.log((n_docs - dfreq.get(t, 0) + 0.5)
                        / (dfreq.get(t, 0) + 0.5) + 1.0)
            for t in query_terms
        }
        idf_col = F.create_map(
            *[x for t in query_terms for x in (F.lit(t), F.lit(idf[t]))]
        )
        contrib = F.round(
            idf_col[F.col("w")]
            * (F.col("_tf") * F.lit(k1 + 1.0))
            / (
                F.col("_tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * (F.col("_dl") / F.lit(avgdl))
                )
            ),
            6,
        ).cast("decimal(18,6)")
        return (
            tf.join(dl, id_col)
            .select(id_col, contrib.alias("_c"))
            .groupBy(id_col)
            .agg(
                F.count("*").alias("n_terms_hit"),
                F.sum("_c").cast("double").alias("bm25"),
            )
        )
    finally:
        words.unpersist()
