"""Persisted IVF ANN index: equality law vs the inline ivf_topk, CDC
maintenance against the frozen quantizer, the retrain/drift policy, and the
widened seq domain that keeps a retrain from tying with a same-version sync.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"
QIDS = [3, 17, 42]


def _src_schema():
    return T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )


def _mk_source(spark, root):
    from hemera_indexer_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark, root, _src_schema(), num_buckets=4, key_col="vec_id",
        seq_col="seq",
    )
    t.bulk_load(
        spark.read.parquet(f"{SF}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
    )
    return t


def _merge(table, spark, rows, epoch):
    df = spark.createDataFrame(
        rows, "vec_id long, seq long, embedding array<float>, op string"
    )
    assert table.merge_upsert(df, epoch_id=epoch)


def _vec(i, dim=64):
    # deterministic synthetic vector, distinct from the corpus
    return [float((i * 31 + d * 7) % 13) - 6.0 for d in range(dim)]


def _topk_set(df):
    return {tuple(r) for r in df.collect()}


def test_index_topk_equals_inline_on_synced_index(spark, tmp_path):
    """The core law: a freshly built index answers EXACTLY what the inline
    (train-every-call) path answers — same quantizer code path, zero
    training passes at query time."""
    from hemera_indexer_spark.operators.ivf_index import IVFIndex
    from hemera_indexer_spark.operators.similarity import ivf_topk

    src = _mk_source(spark, str(tmp_path / "src"))
    idx = IVFIndex.build_from_table(spark, str(tmp_path / "idx"), src, ncells=8)
    assert idx.synced_version() == src.snapshot["version"]
    assert idx.trained_version() == src.snapshot["version"]
    got = _topk_set(idx.topk(src, QIDS, k=5, nprobe=3))
    want = _topk_set(
        ivf_topk(src.current_state(), QIDS, k=5, ncells=8, nprobe=3)
    )
    assert got == want and got


def test_update_from_changes_is_incremental_and_idempotent(spark, tmp_path):
    from hemera_indexer_spark.operators.ivf_index import IVFIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    idx = IVFIndex.build_from_table(spark, str(tmp_path / "idx"), src, ncells=8)
    before = {r["vec_id"]: r["cell"] for r in idx.assignments().collect()}
    trained0 = idx.trained_version()
    # epoch 1: insert 9001, move vec 5, delete vec 7, empty vec 11's vector
    _merge(
        src,
        spark,
        [
            (9001, 100, _vec(9001), "update"),
            (5, 101, _vec(5), "update"),
            (7, 102, None, "delete"),
            (11, 103, [], "update"),
        ],
        epoch=1,
    )
    assert idx.update_from_changes(src)
    after = {r["vec_id"]: r["cell"] for r in idx.assignments().collect()}
    assert 9001 in after
    assert 7 not in after and 11 not in after
    # untouched keys keep their assignment (O(changed) maintenance)
    untouched = set(before) - {5, 7, 11}
    assert all(after[k] == before[k] for k in untouched)
    # the quantizer itself is FROZEN: training metadata unchanged
    assert idx.trained_version() == trained0
    assert idx.drift(src) > 0
    # already synced: no-op
    assert idx.update_from_changes(src) is False
    assert {r["vec_id"]: r["cell"] for r in idx.assignments().collect()} == after


def test_retrain_restores_equality_law(spark, tmp_path):
    from hemera_indexer_spark.operators.ivf_index import IVFIndex
    from hemera_indexer_spark.operators.similarity import ivf_topk

    src = _mk_source(spark, str(tmp_path / "src"))
    idx = IVFIndex.build_from_table(spark, str(tmp_path / "idx"), src, ncells=8)
    _merge(
        src,
        spark,
        [(9000 + i, 200 + i, _vec(i), "update") for i in range(10)],
        epoch=1,
    )
    assert idx.update_from_changes(src)
    assert idx.retrain(src)
    assert idx.trained_version() == src.snapshot["version"]
    assert idx.drift(src) == 0.0
    got = _topk_set(idx.topk(src, QIDS, k=5, nprobe=3))
    want = _topk_set(
        ivf_topk(src.current_state(), QIDS, k=5, ncells=8, nprobe=3)
    )
    assert got == want and got


def test_retrain_beats_same_version_sync(spark, tmp_path):
    """A retrain at the SAME source version as a just-run sync must replace
    that sync's assignments (widened seq domain: 2v+1 beats 2v) — otherwise
    the last sync batch's old-quantizer cells would pair with the new
    centroids, an inconsistent generation."""
    from hemera_indexer_spark.operators.ivf_index import IVFIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    idx = IVFIndex.build_from_table(spark, str(tmp_path / "idx"), src, ncells=8)
    # shift enough mass that retraining moves centroids (and assignments)
    _merge(
        src,
        spark,
        [(9100 + i, 300 + i, _vec(100 + i), "update") for i in range(60)],
        epoch=1,
    )
    assert idx.update_from_changes(src)
    assert idx.retrain(src)  # same source version as the sync
    # every assignment equals a from-scratch build at this corpus state
    fresh = IVFIndex.build_from_table(
        spark, str(tmp_path / "idx2"), src, ncells=8
    )
    got = sorted(map(tuple, idx.assignments().collect()))
    want = sorted(map(tuple, fresh.assignments().collect()))
    assert got == want and got
    assert idx.centroids() == fresh.centroids()


def test_maybe_retrain_policy(spark, tmp_path):
    from hemera_indexer_spark.operators.ivf_index import IVFIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    idx = IVFIndex.build_from_table(spark, str(tmp_path / "idx"), src, ncells=8)
    assert idx.maybe_retrain(src) == "noop"
    _merge(src, spark, [(9500, 400, _vec(9500), "update")], epoch=1)
    assert idx.maybe_retrain(src, max_drift=0.5) == "sync"
    n = idx.rows_at_train()
    _merge(
        src,
        spark,
        [(9600 + i, 500 + i, _vec(i), "update") for i in range(n // 2 + 1)],
        epoch=2,
    )
    assert idx.maybe_retrain(src, max_drift=0.5) == "retrain"
    assert idx.trained_version() == src.snapshot["version"]


def test_family_and_non_index_guards(spark, tmp_path):
    from hemera_indexer_spark.operators.dedup_index import IndexFamilyError
    from hemera_indexer_spark.operators.ivf_index import IVFIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    root = str(tmp_path / "idx")
    idx = IVFIndex.build_from_table(spark, root, src, ncells=8)
    assert idx.table.update_properties({"ivf_family": "999"})
    with pytest.raises(IndexFamilyError, match="family v999"):
        IVFIndex.load(spark, root)
    with pytest.raises(IndexFamilyError, match="not an IVFIndex"):
        IVFIndex(src)
