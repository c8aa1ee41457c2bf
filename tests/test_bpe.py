"""Distributed BPE trainer (operators/bpe.py) vs a pure-Python
reference implementation of Sennrich et al.'s algorithm (marker-free
variant). The reference is deliberately independent: dict-of-counts,
greedy leftmost fold, lexicographic tie-break — if the Spark fold or
the argmax ordering drifts, these diverge."""

from __future__ import annotations

import collections

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hemera_indexer_spark.operators.bpe import (
    bpe_encode,
    encode_words,
    learn_bpe,
    merge_pair_expr,
    pair_counts,
    with_symbols,
    word_frequencies,
)


# ------------------------------------------------------------------ reference
def ref_word_freq(texts):
    wf = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                wf[w] += 1
    return wf


def ref_merge(syms, x, y):
    out = []
    for s in syms:
        if out and out[-1] == x and s == y:
            out[-1] = x + y
        else:
            out.append(s)
    return out


def ref_learn(texts, n_merges, min_freq=2):
    wf = ref_word_freq(texts)
    vocab = {w: list(w) for w in wf}
    merges = []
    for _ in range(n_merges):
        pc = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        if not pc:
            break
        # max count, then lexicographic (x, y) ascending
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (x, y), _ = best
        merges.append((x, y))
        vocab = {w: ref_merge(s, x, y) for w, s in vocab.items()}
    return merges, vocab


def ref_encode(word, merges):
    rank = {p: i for i, p in enumerate(merges)}
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


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "the cat sat on the mat the cat",
]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )


# ------------------------------------------------------------------ units
def test_word_frequencies(spark):
    got = {
        r["word"]: r["freq"]
        for r in word_frequencies(_docs(spark, CORPUS), "text").collect()
    }
    assert got == dict(ref_word_freq(CORPUS))


def test_merge_pair_greedy_leftmost(spark):
    # 'aaa' under (a,a) -> ['aa','a']; 'abab' under (a,b) -> ['ab','ab']
    df = spark.createDataFrame(
        [("aaa",), ("abab",), ("b",), ("",)], "word string"
    )
    out = {
        r["word"]: r["syms"]
        for r in with_symbols(df)
        .withColumn("syms", merge_pair_expr("a", "a"))
        .collect()
    }
    assert out["aaa"] == ["aa", "a"]
    assert out["abab"] == ["a", "b", "a", "b"]
    assert out["b"] == ["b"]
    assert out[""] == []
    out2 = {
        r["word"]: r["syms"]
        for r in with_symbols(df)
        .withColumn("syms", merge_pair_expr("a", "b"))
        .collect()
    }
    assert out2["abab"] == ["ab", "ab"]


def test_merge_pair_quoting(spark):
    # symbols containing quotes/backslashes must not break the expr
    df = spark.createDataFrame([("a'b\\c",)], "word string")
    out = (
        with_symbols(df)
        .withColumn("syms", merge_pair_expr("a", "'"))
        .withColumn("syms", merge_pair_expr("a'", "b"))
        .collect()
    )
    assert out[0]["syms"] == ["a'b", "\\", "c"]


def test_pair_counts_weighted(spark):
    vocab = with_symbols(
        spark.createDataFrame([("ab", 3), ("b", 5), ("abc", 1)], "word string, freq long")
    )
    got = {(r["x"], r["y"]): r["cnt"] for r in pair_counts(vocab).collect()}
    assert got == {("a", "b"): 4, ("b", "c"): 1}


# ------------------------------------------------------------------ training
def test_learn_bpe_matches_reference(spark):
    merges, vocab = learn_bpe(_docs(spark, CORPUS), "text", n_merges=12)
    ref_merges, ref_vocab = ref_learn(CORPUS, 12)
    assert merges == ref_merges
    got = {r["word"]: r["syms"] for r in vocab.collect()}
    assert got == ref_vocab


def test_learn_bpe_min_freq_stops(spark):
    # every word unique, each char pair seen once -> nothing reaches min_freq=2
    merges, _ = learn_bpe(_docs(spark, ["ab cd", "ef gh"]), "text", n_merges=5)
    assert merges == []
    # with min_freq=1 it merges until pairs are exhausted
    merges1, _ = learn_bpe(
        _docs(spark, ["ab ab"]), "text", n_merges=10, min_freq=1
    )
    assert merges1 == [("a", "b")]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=6),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=5,
    )
)
def test_learn_bpe_property(spark, texts):
    merges, vocab = learn_bpe(_docs(spark, texts), "text", n_merges=6)
    ref_merges, ref_vocab = ref_learn(texts, 6)
    assert merges == ref_merges
    got = {r["word"]: r["syms"] for r in vocab.collect()}
    assert got == ref_vocab


# ------------------------------------------------------------------ encoding
def test_encode_words_matches_reference(spark):
    merges, _ = learn_bpe(_docs(spark, CORPUS), "text", n_merges=10)
    words = sorted(ref_word_freq(CORPUS))
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: r["bpe_syms"] for r in encode_words(df, merges).collect()}
    for w in words:
        assert got[w] == ref_encode(w, merges), w


def test_encode_equals_training_segmentation(spark):
    # replaying the merge table rank-greedily must reproduce the
    # training-time segmentation of every training word
    merges, vocab = learn_bpe(_docs(spark, CORPUS), "text", n_merges=12)
    trained = {r["word"]: r["syms"] for r in vocab.collect()}
    enc = encode_words(
        spark.createDataFrame([(w,) for w in trained], "word string"), merges
    )
    got = {r["word"]: r["bpe_syms"] for r in enc.collect()}
    assert got == trained


def test_bpe_encode_corpus(spark):
    merges, _ = learn_bpe(_docs(spark, CORPUS), "text", n_merges=8)
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(_docs(spark, CORPUS), "text", merges).collect()
    }
    for i, t in enumerate(CORPUS):
        want = []
        for w in t.lower().split():
            want.extend(ref_encode(w, merges))
        assert out[i] == want, i
