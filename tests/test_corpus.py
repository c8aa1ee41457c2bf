"""Unit tests for corpus-distribution operators (operators/corpus.py)
and chunk-level dedup (operators/dedup.py::chunk_dedup_counts) on tiny
crafted frames — the oracle gate covers the sf0.01 end; these pin the
laws on inputs small enough to check by hand."""

import math

import pytest
from pyspark.sql import functions as F

from hemera_indexer_spark.operators.corpus import (
    bigram_pmi,
    per_group_sample,
    source_kl,
    vocab_coverage,
    zipf_slope,
)
from hemera_indexer_spark.operators.dedup import chunk_dedup_counts


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_chunk_dedup_first_occurrence_wins(spark):
    # doc 1 owns chunk "a b"; doc 2 repeats it and adds a fresh chunk
    d = _docs(
        spark,
        [
            (1, "s", "a b"),
            (2, "s", "a b c d"),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in chunk_dedup_counts(d, chunk_words=2).collect()
    }
    assert out[1] == {"doc_id": 1, "n_chunks": 1, "kept_chunks": 1, "kept_words": 2}
    # doc 2's "a b" chunk is a repeat (doc 1 is first by (doc, pos));
    # its "c d" chunk survives
    assert out[2] == {"doc_id": 2, "n_chunks": 2, "kept_chunks": 1, "kept_words": 2}


def test_chunk_dedup_trailing_partial_chunk(spark):
    d = _docs(spark, [(1, "s", "a b c")])
    (r,) = chunk_dedup_counts(d, chunk_words=2).collect()
    assert r["n_chunks"] == 2 and r["kept_chunks"] == 2 and r["kept_words"] == 3


def test_chunk_dedup_within_doc_repeat(spark):
    # the SAME doc repeating a chunk keeps only the first occurrence —
    # intra-doc boilerplate is removed too (position breaks the tie)
    d = _docs(spark, [(7, "s", "x y x y")])
    (r,) = chunk_dedup_counts(d, chunk_words=2).collect()
    assert r["n_chunks"] == 2 and r["kept_chunks"] == 1 and r["kept_words"] == 2


def test_bigram_pmi_known_values(spark):
    # corpus: "a b" x3 plus "c d" once -> bigrams: (a,b) x3, (c,d) x1
    d = _docs(
        spark,
        [(i, "s", "a b") for i in range(3)] + [(9, "s", "c d")],
    )
    rows = bigram_pmi(d, min_count=2, top_k=10).collect()
    assert len(rows) == 1  # (c,d) pruned by min_count
    (r,) = rows
    # p(a,b)=3/4; p(a)=p(b)=3/8 -> pmi = ln((3/4)/(9/64)) = ln(16/3)
    assert r["x"] == "a" and r["y"] == "b" and r["c_xy"] == 3
    assert float(r["pmi"]) == pytest.approx(math.log(16 / 3), abs=1e-6)


def test_vocab_coverage_monotone(spark):
    d = _docs(spark, [(1, "s", "a a a a b b c d")])
    out = {
        float(r["threshold"]): r["vocab_rank"]
        for r in vocab_coverage(d, thresholds=(0.5, 0.75, 1.0)).collect()
    }
    # a covers 4/8 = 50%; a+b covers 75%; all four needed for 100%
    assert out == {0.5: 1, 0.75: 2, 1.0: 4}


def test_source_kl_zero_for_identical_distributions(spark):
    # two sources with the SAME word distribution -> KL = 0 both
    d = _docs(
        spark,
        [(1, "s1", "a a b"), (2, "s2", "a a b")],
    )
    for r in source_kl(d).collect():
        assert float(r["kl"]) == pytest.approx(0.0, abs=2e-6)


def test_source_kl_positive_for_skewed_source(spark):
    d = _docs(
        spark,
        [(1, "skew", "a a a a"), (2, "flat", "a b c d")],
    )
    out = {r["source"]: float(r["kl"]) for r in source_kl(d).collect()}
    assert out["skew"] > 0.1 and out["flat"] > 0.0


def test_zipf_slope_exact_on_constructed_powerlaw(spark):
    # frequencies 100, 10, 1 at ranks 1, 2, 3... but rank ordering uses
    # freq desc so x = log10(1,2,3), y = log10(100,10,1). Not a perfect
    # line; instead construct a perfect Zipf s=-1 line on ranks 1,10,100
    # is impossible with integer ranks — use freqs 4,2,1 and just check
    # the slope is negative and finite.
    d = _docs(spark, [(1, "s", "a a a a b b c")])
    (r,) = zipf_slope(d).collect()
    assert r["n_types"] == 3
    assert float(r["slope"]) < 0


def test_zipf_slope_per_group_matches_whole_when_single_group(spark):
    d = _docs(spark, [(1, "s", "a a b"), (2, "s", "a c c b b")])
    whole = zipf_slope(d).collect()[0]["slope"]
    d2 = d.withColumn("lang", F.lit("xx"))
    grouped = zipf_slope(d2, group_col="lang").collect()[0]["slope"]
    assert whole == grouped


def test_per_group_sample_deterministic_across_partitionings(spark):
    d = _docs(
        spark,
        [(i, f"s{i % 3}", "w") for i in range(100)],
    )
    a = sorted(
        tuple(r) for r in per_group_sample(d, "source", "doc_id", 5).collect()
    )
    b = sorted(
        tuple(r)
        for r in per_group_sample(
            d.repartition(7), "source", "doc_id", 5
        ).collect()
    )
    assert a == b
    per_src = {}
    for src, _, rk in a:
        per_src.setdefault(src, []).append(rk)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_src.values())
