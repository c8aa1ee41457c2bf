"""Hard-sigmoid GD quality classifier (operators/classifier.py):
separability, determinism, 9dp weight-quantization family law, frozen
scoring of unseen docs, and the bias-only empty-doc path."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from hemera_indexer_spark.operators.classifier import (
    quality_filter,
    score_documents,
    train_classifier,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, "alpha beta gamma delta" if i % 2 == 0 else "omega sigma tau rho",
         i % 2 == 0)
        for i in range(80)
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, y boolean"
    ).cache()


def test_separable_corpus_classifies_perfectly(corpus):
    res = quality_filter(corpus, "y", n_features=32, iters=2, lr="0.05")
    j = res.join(corpus.select("doc_id", "y"), "doc_id")
    assert j.where(F.col("keep") != F.col("y")).count() == 0


def test_training_is_deterministic(corpus):
    w1 = train_classifier(corpus, "y", n_features=32, iters=2, lr="0.05")
    w2 = train_classifier(corpus, "y", n_features=32, iters=2, lr="0.05")
    assert w1 == w2


def test_weights_are_9dp_quantized(corpus):
    w = train_classifier(corpus, "y", n_features=32, iters=3, lr="0.037")
    for x in w:
        assert isinstance(x, Decimal)
        assert x == x.quantize(Decimal("1e-9"))


def test_frozen_weights_score_unseen_docs(spark, corpus):
    w = train_classifier(corpus, "y", n_features=32, iters=2, lr="0.05")
    unseen = spark.createDataFrame(
        [(1000, "alpha gamma beta"), (1001, "tau omega sigma")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["keep"] for r in score_documents(unseen, w).collect()}
    assert got == {1000: True, 1001: False}


def test_empty_doc_gets_bias_only_score(spark, corpus):
    w = train_classifier(corpus, "y", n_features=32, iters=2, lr="0.05")
    blank = spark.createDataFrame(
        [(1, "   "), (2, "")], "doc_id bigint, text string"
    )
    rows = score_documents(blank, w).collect()
    assert len(rows) == 2
    # both featureless docs score σ_h(bias) — identical
    assert rows[0]["score"] == rows[1]["score"]


def test_lr_must_be_string(corpus):
    # a float lr would silently leave the exact-arithmetic chain
    with pytest.raises(TypeError):
        train_classifier(corpus, "y", lr=0.05)
