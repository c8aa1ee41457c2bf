"""DSIR importance resampling (operators/dsir.py): selection law,
determinism, coverage, and smoothing-floor behavior."""

import pytest

from hemera_indexer_spark.operators.dsir import dsir_topk, dsir_weights


@pytest.fixture(scope="module")
def corpora(spark):
    # target speaks "alpha beta gamma"; raw pool mixes target-like docs
    # (even ids) with "omega sigma tau" docs (odd ids)
    target = spark.createDataFrame(
        [(1000 + i, "alpha beta gamma alpha beta") for i in range(10)],
        "doc_id bigint, text string",
    )
    raw = spark.createDataFrame(
        [
            (
                i,
                "alpha beta gamma beta alpha gamma"
                if i % 2 == 0
                else "omega sigma tau sigma omega tau",
            )
            for i in range(20)
        ],
        "doc_id bigint, text string",
    )
    return raw, target


def test_topk_selects_target_like_docs(corpora):
    raw, target = corpora
    sel = dsir_topk(raw, target, k=10, n_features=32).collect()
    assert len(sel) == 10
    assert all(r["doc_id"] % 2 == 0 for r in sel), sel


def test_target_like_weights_dominate(corpora):
    raw, target = corpora
    w = {r["doc_id"]: float(r["log_weight"]) for r in dsir_weights(
        raw, target, n_features=32
    ).collect()}
    assert len(w) == 20
    worst_like = min(v for d, v in w.items() if d % 2 == 0)
    best_unlike = max(v for d, v in w.items() if d % 2 == 1)
    assert worst_like > best_unlike


def test_deterministic(corpora):
    raw, target = corpora
    a = sorted(map(tuple, dsir_topk(raw, target, k=5).collect()))
    b = sorted(map(tuple, dsir_topk(raw, target, k=5).collect()))
    assert a == b


def test_empty_docs_drop_out(spark, corpora):
    _, target = corpora
    raw = spark.createDataFrame(
        [(1, "alpha beta"), (2, "   "), (3, "")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"] for r in dsir_weights(raw, target).collect()}
    assert got == {1}


def test_unigram_only_mode(corpora):
    raw, target = corpora
    sel = dsir_topk(
        raw, target, k=10, n_features=32, use_bigrams=False
    ).collect()
    assert all(r["doc_id"] % 2 == 0 for r in sel)


# ---------------------------------------------------------------------
# leakage_safe_split (operators/dedup.py) — dedup-aware split laws
# ---------------------------------------------------------------------

def test_leakage_split_clusters_move_as_one(spark):
    from hemera_indexer_spark.operators.dedup import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id bigint, text string"
    )
    # chains: (0-1-2), (10-11), plus many singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    out = {r["doc_id"]: r["split"] for r in leakage_safe_split(
        docs, pairs, "doc_id"
    ).collect()}
    assert len(out) == 200
    assert out[0] == out[1] == out[2]
    assert out[10] == out[11]


def test_leakage_split_singletons_match_dataset_split(spark):
    from hemera_indexer_spark.operators.dedup import (
        dataset_split,
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1)], "doc_a bigint, doc_b bigint"
    )
    safe = {r["doc_id"]: r["split"] for r in leakage_safe_split(
        docs, pairs, "doc_id"
    ).collect()}
    plain = {r["doc_id"]: r["split"] for r in dataset_split(
        docs, "doc_id"
    ).collect()}
    for i in range(2, 100):  # everything outside the one cluster
        assert safe[i] == plain[i], i
    # the cluster splits by its representative (min id = 0)
    assert safe[0] == safe[1] == plain[0]
