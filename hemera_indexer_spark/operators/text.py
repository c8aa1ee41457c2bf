"""Text-analysis operators for training-data pipelines, all JVM-side
(built-in pyspark.sql.functions; no Python in the hot path):

- tokenization + token counting (whitespace and a BPE-ish regex),
- quality scoring (length / stopword / punctuation ratios),
- language ID (marker-word n-gram heuristic),
- document fingerprinting (normalized-text hash).

Each builder returns Columns so it fuses into whole-stage codegen with
whatever scan/filter surrounds it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hemera_indexer_spark.functions.rounding import round_double

# BPE-ish token pattern: runs of lowercase alphanumerics (text is lowercased
# first). Deliberately simple so the DuckDB oracle can share it verbatim.
BPE_TOKEN_RE = "[a-z0-9]+"

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "la", "et", "est"),
    "es": ("el", "los", "y", "es"),
}


def words(text: Column) -> Column:
    return F.split(F.trim(text), "\\s+")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish regex token count."""
    return F.regexp_count(F.lower(text), F.lit(BPE_TOKEN_RE))


def stopword_ratio(text: Column) -> Column:
    w = words(F.lower(text))
    stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    return round_double(stop / F.greatest(F.size(w), F.lit(1)), 6)


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(text) - F.length(F.regexp_replace(text, "[^a-zA-Z0-9 ]", ""))
    return round_double(n_punct / F.greatest(F.length(text), F.lit(1)), 6)


def avg_word_len(text: Column) -> Column:
    w = words(text)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return round_double(total / F.greatest(F.size(w), F.lit(1)), 6)


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality: long enough, not stopword-/punct-degenerate.
    The exact formula is arbitrary; it is pinned so the oracle can mirror it."""
    n = token_count_ws(text)
    length_term = F.least(n / F.lit(20.0), F.lit(1.0))
    stop_term = F.lit(1.0) - stopword_ratio(text)
    punct_term = F.lit(1.0) - punct_ratio(text)
    return round_double(
        F.lit(0.4) * length_term + F.lit(0.3) * stop_term + F.lit(0.3) * punct_term,
        6,
    )


def lang_marker_score(text: Column, lang: str) -> Column:
    w = words(F.lower(text))
    return F.size(F.filter(w, lambda x: x.isin(*LANG_MARKERS[lang])))


def lang_id(text: Column) -> Column:
    """Marker-word language heuristic: argmax of marker counts with a
    deterministic tie order (en > de > fr > es), 'und' (undetermined) when
    no marker hits."""
    scores = [(lang, lang_marker_score(text, lang)) for lang in LANG_MARKERS]
    best = scores[0][1]
    for _, s in scores[1:]:
        best = F.greatest(best, s)
    expr = F.lit("und")
    # first language (in declaration order) achieving the max wins
    for lang, s in reversed(scores):
        expr = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text —
    the cheap canonical-form hash used for exact-dup detection."""
    return F.md5(F.regexp_replace(F.trim(F.lower(text)), "\\s+", " "))


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Intra-document repetition (the Gopher/MassiveText repeated-n-gram
    quality signal, Rae et al. 2021 §A1.1): per doc, the fraction of word
    n-grams that are repeats of an earlier n-gram in the SAME doc —
    ``1 - distinct/total``. Returns (doc_id, n_ngrams, n_uniq, rep_ratio).

    One map-only shingle explode (shared ``word_shingles`` builder — the
    CSE-safe zip_with form) + one groupBy(doc). The exact countDistinct
    here is per-DOC (partial aggregation carries (doc, shingle) pairs,
    i.e. the ngram stream itself) — at corpus scale this shuffle is
    O(ngrams), the same order as any shingle pipeline stage, and the
    groupBy key (doc_id) is perfectly spreadable."""
    from hemera_indexer_spark.operators.dedup import word_shingles

    sh = word_shingles(df, id_col, text_col, n=n, distinct=False)
    return sh.groupBy("doc_id").agg(
        F.count("*").alias("n_ngrams"),
        F.countDistinct("shingle").alias("n_uniq"),
        round_double(
            F.lit(1.0) - F.countDistinct("shingle") / F.count("*"), 6
        ).alias("rep_ratio"),
    )


#: Gopher-rule thresholds (Rae et al. 2021, Table A1) — pinned so the
#: oracle can mirror them verbatim.
GOPHER_MIN_WORDS = 5
GOPHER_MAX_WORDS = 10_000
GOPHER_MIN_AVG_WORD_LEN = 2.0
GOPHER_MAX_AVG_WORD_LEN = 12.0
GOPHER_MIN_STOP_HITS = 2
GOPHER_MAX_PUNCT_RATIO = 0.3


def stopword_hits(text: Column) -> Column:
    w = words(F.lower(text))
    return F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))


def with_gopher_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document quality filter: each rule as a named boolean
    column plus the conjunction ``keep`` — kept as columns (not a filter)
    so pipelines can audit per-rule rejection rates. Pure Column algebra,
    codegen-fused with the scan."""
    t = F.col(text_col)
    n_words = token_count_ws(t)
    awl = avg_word_len(t)
    hits = stopword_hits(t)
    pr = punct_ratio(t)
    flag_wc = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    flag_awl = (awl >= GOPHER_MIN_AVG_WORD_LEN) & (
        awl <= GOPHER_MAX_AVG_WORD_LEN
    )
    flag_stop = hits >= GOPHER_MIN_STOP_HITS
    flag_punct = pr <= GOPHER_MAX_PUNCT_RATIO
    return df.select(
        "*",
        n_words.alias("n_words"),
        hits.alias("stop_hits"),
        flag_wc.alias("ok_word_count"),
        flag_awl.alias("ok_avg_word_len"),
        flag_stop.alias("ok_stopwords"),
        flag_punct.alias("ok_punct"),
        (flag_wc & flag_awl & flag_stop & flag_punct).alias("keep"),
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        "*",
        token_count_ws(t).alias("n_tok_ws"),
        token_count_bpe(t).alias("n_tok_bpe"),
        stopword_ratio(t).alias("stop_ratio"),
        punct_ratio(t).alias("punct_ratio"),
        avg_word_len(t).alias("avg_word_len"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fp"),
    )


# ------------------------------------------------------------- PII scrub
#: Redaction patterns chosen to parse identically under Java regex (Spark)
#: and RE2 (DuckDB): plain character classes, no backrefs, no lookaround.
#: Order matters — email first, or its user@host digits would be half-eaten
#: by the looser patterns.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b\+?[0-9][0-9()\- ]{7,14}[0-9]\b", "<PHONE>"),
)


def scrub_pii(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """Regex PII redaction — the standard pre-training scrub stage (emails,
    IPs, phone numbers replaced with typed placeholder tokens) plus a
    per-type hit count for curation dashboards. Returns the input's id
    column, ``scrubbed`` text and one ``n_<name>`` count per pattern.

    All-JVM: a chain of ``regexp_replace`` and ``regexp_count`` Columns
    fused into the scan's codegen stage — zero shuffles, embarrassingly
    parallel at any scale. Counts are taken against the PRE-scrub text so
    an earlier replacement can't mask a later pattern's count; replacements
    run in declaration order over the accumulating result (document order
    in ``PII_PATTERNS`` is load-bearing — email first). Patterns must stay
    in the Java-regex intersection with RE2 (no backrefs or lookaround) so
    engine-portable oracles reproduce them verbatim."""
    t = F.col(text_col)
    scrubbed = t
    for _, rx, token in patterns:
        scrubbed = F.regexp_replace(scrubbed, rx, token)
    return df.select(
        F.col(id_col).alias("doc_id"),
        scrubbed.alias("scrubbed"),
        *[
            F.regexp_count(t, F.lit(rx)).alias(f"n_{name}")
            for name, rx, _ in patterns
        ],
    )


def feature_hashing(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 64,
    signed: bool = True,
) -> DataFrame:
    """Hashing-trick sparse text features (Weinberger et al., ICML'09):
    each word hashes into one of ``n_features`` buckets; the signed
    variant adds an independent ±1 hash so collision noise cancels in
    expectation (the unbiased estimator the paper recommends). Returns
    long-form sparse rows (doc_id, feature, val) — the input a linear
    quality/topic classifier trains on without ever materializing a
    vocabulary.

    Scale shape: the explode is map-only and the (doc, feature) groupBy
    is map-side combined — at most ``n_features`` rows per doc cross the
    shuffle regardless of document length, so shuffle bytes are bounded
    by O(docs · n_features) at any corpus size. No vocabulary pass, no
    dictionary broadcast, no Python.

    Determinism: bucket = first 4 md5 hex digits mod n_features, sign =
    5th digit parity — md5 is engine-portable (Spark's xxhash64 is not;
    the same rule as ``dataset_split``, operators/dedup.py:757), and the
    ±1 integer sums are exact, so no decimal routing is needed."""
    from hemera_indexer_spark.operators.corpus import word_stream

    ws = word_stream(df, text_col, id_col)
    m = F.md5(F.col("w"))
    bucket = (
        F.conv(F.substring(m, 1, 4), 16, 10).cast("int") % n_features
    ).alias("feature")
    sign = (
        F.when(F.conv(F.substring(m, 5, 1), 16, 10).cast("int") % 2 == 0, 1)
        .otherwise(-1)
        if signed
        else F.lit(1)
    )
    return (
        ws.select(F.col(id_col), bucket, sign.alias("_s"))
        .groupBy(id_col, "feature")
        .agg(F.sum("_s").cast("long").alias("val"))
    )
