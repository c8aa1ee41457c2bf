"""Distributed BPE (byte-pair-encoding) tokenizer training over the
corpus — the missing half of the token toolbox (tokens.py consumes a
``tokens`` column; this is how a pipeline LEARNS the tokenizer that
produces one).

Reference analog: the reference ships token/vocab plumbing only as
consumed columns (hemera-indexer has no trainer; SURVEY.md §2.10 scopes
the LLM-pipeline ops as beyond-reference additions). Algorithm per
Sennrich et al., "Neural Machine Translation of Rare Words with Subword
Units" (ACL 2016), marker-free within pre-tokenized words (the GPT-2
convention: a regex pre-tokenizer splits text into words; merges never
cross word boundaries).

Why this shape scales to a 100 TB corpus:

- ONE corpus-sized pass (``word_frequencies``: explode + map-side-
  combined groupBy). Everything after operates on the DISTINCT-word
  vocabulary — orders of magnitude smaller than the corpus (Heaps'
  law), and the only state the training loop carries.
- Each merge iteration is one vocab-sized aggregate (pair counts,
  map-side combined) plus one vocab-sized map (the fold that applies
  the merge). No shuffle grows with corpus size.
- The driver collects exactly ONE row per iteration (the argmax pair)
  — n_merges rows total, never data.
- The merge fold is a JVM higher-order function (``aggregate``), so
  the hot loop never crosses the Python boundary. Encoding
  (``encode_words``) is the one Arrow-batched pandas UDF, applied to
  DISTINCT words only and joined back — the standard vocab-memoized
  encode.
- Lineage is cut every iteration with an eager ``localCheckpoint`` on
  the vocab (without it the plan tree grows by one fold per merge and
  analysis cost turns quadratic).

Determinism: ties on pair count break lexicographically (x asc, y asc),
so the learned merge list is a pure function of the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = [
    "word_frequencies",
    "with_symbols",
    "pair_counts",
    "merge_pair_expr",
    "learn_bpe",
    "encode_words",
    "bpe_encode",
]


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace-split, lowercased text. The single
    corpus-sized pass of BPE training; map-side combined."""
    return (
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def with_symbols(vocab: DataFrame, word_col: str = "word") -> DataFrame:
    """Add the initial symbol sequence: one single-character symbol per
    character (marker-free; merges stay within the word)."""
    return vocab.withColumn(
        "syms",
        F.expr(f"filter(split({word_col}, ''), s -> s <> '')"),
    )


def pair_counts(vocab: DataFrame, freq_col: str = "freq") -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency:
    (x, y, cnt). Vocab-sized explode + map-side-combined groupBy —
    the per-iteration aggregate of the training loop.

    The size guard matters twice: ``sequence(1, 0)`` DESCENDS in Spark
    (it would emit [1, 0], not []), and out-of-range ``element_at``
    raises under ANSI mode (Spark 4 default)."""
    pairs = vocab.select(
        F.col(freq_col).alias("_f"),
        F.explode(
            F.expr(
                "IF(size(syms) >= 2,"
                " transform(sequence(1, size(syms) - 1),"
                "  i -> struct(element_at(syms, i) AS x,"
                "              element_at(syms, i + 1) AS y)),"
                " CAST(array() AS array<struct<x:string,y:string>>))"
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .agg(F.sum("_f").alias("cnt"))
    )


def merge_pair_expr(x: str, y: str):
    """Column expression applying ONE merge (x, y) -> xy to ``syms``
    with greedy leftmost semantics: fold left; when the accumulator's
    last symbol is x and the incoming symbol is y, replace the last
    element with the merged symbol (so 'a a a' under (a,a) yields
    ['aa','a'], and the merged symbol immediately participates in
    later merges of the same pass only as the LEFT side — the standard
    BPE fold).

    JVM-side ``aggregate`` HOF; guarded by a cheap containment test so
    untouched words skip the fold entirely (If branches evaluate
    lazily). x/y come from our own pair_counts output (corpus-derived
    symbols) but are escaped defensively for quoting. ANSI-safety:
    ``try_element_at`` (NULL, not error, on the empty accumulator) and
    the nested size guard keep every index in range."""
    qx = x.replace("\\", "\\\\").replace("'", "\\'")
    qy = y.replace("\\", "\\\\").replace("'", "\\'")
    merged = (x + y).replace("\\", "\\\\").replace("'", "\\'")
    fold = (
        "aggregate(syms, CAST(array() AS array<string>),"
        f" (acc, s) -> IF(try_element_at(acc, -1) = '{qx}' AND s = '{qy}',"
        f"  concat(slice(acc, 1, size(acc) - 1), array('{merged}')),"
        "  concat(acc, array(s))))"
    )
    touched = (
        f"exists(sequence(1, size(syms) - 1),"
        f" i -> element_at(syms, i) = '{qx}'"
        f"   AND element_at(syms, i + 1) = '{qy}')"
    )
    return F.expr(
        f"IF(size(syms) < 2, syms, IF({touched}, {fold}, syms))"
    )


def learn_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_freq: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train BPE: returns (merges, final vocab DataFrame with columns
    word, freq, syms). Stops early when the best remaining pair's
    weighted count drops below ``min_freq``.

    Driver-side per iteration: ONE collected row (the argmax pair) —
    bounded and by design; the vocab itself never leaves the cluster.
    The vocab is eagerly localCheckpoint-ed each iteration to keep the
    plan tree flat (one fold per merge would otherwise nest n_merges
    deep)."""
    vocab = with_symbols(word_frequencies(df, text_col))
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("x"), F.asc("y"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_freq:
            break
        x, y = top[0]["x"], top[0]["y"]
        merges.append((x, y))
        old = vocab
        vocab = vocab.withColumn("syms", merge_pair_expr(x, y)).localCheckpoint(
            eager=True
        )
        old.unpersist()
    return merges, vocab


def encode_words(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """Encode DISTINCT words with a learned merge list -> adds
    ``bpe_syms: array<string>``. Rank-greedy application (always merge
    the lowest-rank applicable pair, leftmost on rank ties) — identical
    to applying the merges one-by-one in training order, which is how
    GPT-2's encoder replays its merge table.

    The one pandas UDF in this module, and deliberately so: per-word
    encoding is an inherently sequential loop over a learned table, not
    expressible as a fixed-depth Column expression once the merge list
    is long (chaining n_merges folds nests the plan n_merges deep).
    Arrow-batched, merge table broadcast via closure (vocab-of-merges
    sized), and applied to DISTINCT words only — callers join the
    result back to the corpus (see ``bpe_encode``)."""
    rank = {pair: i for i, pair in enumerate(merges)}

    def enc(word: str) -> list[str]:
        syms = list(word)
        while len(syms) >= 2:
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def enc_udf(s: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}
        out = []
        for w in s:
            if w not in memo:
                memo[w] = enc(w)
            out.append(memo[w])
        return pd.Series(out)

    return words.withColumn("bpe_syms", enc_udf(F.col(word_col)))


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus encode: (id, bpe_tokens array<string>) — tokenize, encode
    the DISTINCT word set once, broadcast-join back, reassemble in
    original word order. The join side is vocab-sized; at corpus scale
    mark it broadcast-able (Heaps' law keeps the distinct-word table in
    dimension-table territory for natural-language corpora)."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("pos", "word"),
    ).where(F.col("word") != "")
    vocab = encode_words(toks.select("word").distinct(), merges)
    return (
        toks.join(F.broadcast(vocab), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "bpe_syms"))
                ).getField("bpe_syms")
            ).alias("bpe_tokens")
        )
    )
