"""Product quantization (operators/pq.py): determinism, code-domain,
top-1-exactness-on-separated-clusters, and map-only-encode laws."""

import pytest
from pyspark.sql import functions as F

from hemera_indexer_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_train,
)

DIM = 16


def _vec(i, spread=0.0):
    """Deterministic vector; ``spread`` shifts the whole vector so two
    groups of ids land in well-separated regions."""
    return [
        round(spread + 0.01 * ((i * 7 + d * 3) % 11), 6)
        for d in range(DIM)
    ]


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, _vec(i, spread=0.0 if i % 2 == 0 else 5.0)) for i in range(40)]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).cache()


def test_train_is_deterministic(emb):
    b1 = pq_train(emb, in_dim=DIM, m=4, ks=2, iters=2)
    b2 = pq_train(emb, in_dim=DIM, m=4, ks=2, iters=2)
    assert b1 == b2


def test_codes_shape_and_domain(emb):
    book = pq_train(emb, in_dim=DIM, m=4, ks=2, iters=2)
    rows = pq_encode(emb, book, in_dim=DIM).collect()
    assert len(rows) == 40
    for r in rows:
        assert len(r["codes"]) == 4
        for s, c in enumerate(r["codes"]):
            assert c in book[s], (s, c)


def test_encode_is_map_only(emb):
    # map-only = no SHUFFLE of the corpus; the single-row codebook
    # BroadcastExchange is the broadcast-small-side rule, not a shuffle
    book = pq_train(emb, in_dim=DIM, m=4, ks=2, iters=2)
    plan = pq_encode(emb, book, in_dim=DIM)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan


def test_adc_top1_respects_separated_clusters(emb):
    # two clusters 5.0 apart: every query's ADC neighbors must share its
    # cluster parity — quantization error is << the cluster separation
    res = pq_adc_topk(
        emb, in_dim=DIM, query_ids=[0, 1, 2, 3], k=5, m=4, ks=2, iters=2
    ).collect()
    assert len(res) == 20
    for r in res:
        assert r["vec_id"] % 2 == r["qid"] % 2, r


def test_adc_reuses_trained_book(emb):
    book = pq_train(emb, in_dim=DIM, m=4, ks=2, iters=2)
    a = pq_adc_topk(
        emb, in_dim=DIM, query_ids=[0, 1], k=3, m=4, ks=2, iters=2
    ).collect()
    b = pq_adc_topk(
        emb, in_dim=DIM, query_ids=[0, 1], k=3, book=book
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_dropped_code_never_wins(spark):
    # 3 identical vectors + ks=2: one init centroid loses all members on
    # round 1 and drops out; encoding and ADC must stay well-defined
    rows = [(i, [1.0] * DIM) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    book = pq_train(df, in_dim=DIM, m=2, ks=2, iters=2)
    res = pq_adc_topk(df, in_dim=DIM, query_ids=[0], k=3, book=book).collect()
    assert len(res) == 3
    assert all(float(r["adc_d2"]) == 0.0 for r in res)
