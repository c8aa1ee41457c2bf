"""Persisted PQ index (operators/pq_index.py): equality law vs the
inline pq_adc_topk, incremental CDC maintenance, retrain policy, and
family pinning."""

import pytest
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"
QIDS = [0, 1, 2]
PQ_KW = dict(in_dim=64, m=4, ks=4)


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
    return [float((i * 31 + d * 7) % 13) - 6.0 for d in range(dim)]


def _topk_set(df):
    return {tuple(r) for r in df.collect()}


def test_index_topk_equals_inline_on_fresh_index(spark, tmp_path):
    from hemera_indexer_spark.operators.pq import pq_adc_topk
    from hemera_indexer_spark.operators.pq_index import PQIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    idx = PQIndex.build_from_table(
        spark, str(tmp_path / "idx"), src, **PQ_KW
    )
    inline = pq_adc_topk(
        src.current_state().select("vec_id", "embedding"),
        query_ids=QIDS, k=5, iters=2, **PQ_KW,
    )
    assert _topk_set(idx.topk(src, QIDS, k=5)) == _topk_set(inline)
    assert idx.synced_version() == src.snapshot["version"]


def test_update_from_changes_incremental_and_idempotent(spark, tmp_path):
    from hemera_indexer_spark.operators.pq_index import PQIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    idx = PQIndex.build_from_table(
        spark, str(tmp_path / "idx"), src, **PQ_KW
    )
    n0 = idx.codes().count()
    book0 = idx.codebook()

    _merge(src, spark, [
        (9000, 100, _vec(1), "update"),
        (9001, 101, _vec(2), "update"),
        (0, 102, None, "delete"),
    ], epoch=1)
    assert idx.update_from_changes(src) is True
    assert idx.codebook() == book0  # frozen quantizer
    got = {r["vec_id"] for r in idx.codes().collect()}
    assert 9000 in got and 9001 in got and 0 not in got
    assert idx.codes().count() == n0 + 2 - 1
    # codes are against the frozen book: every code < ks
    for r in idx.codes().collect():
        assert len(r["codes"]) == 4
        assert all(0 <= c < 4 for c in r["codes"])
    # idempotent: already synced
    assert idx.update_from_changes(src) is False


def test_emptied_vector_tombstones(spark, tmp_path):
    from hemera_indexer_spark.operators.pq_index import PQIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    idx = PQIndex.build_from_table(
        spark, str(tmp_path / "idx"), src, **PQ_KW
    )
    # vec 1's embedding becomes NULL: unencodable, must leave the index
    _merge(src, spark, [(1, 200, None, "update")], epoch=1)
    assert idx.update_from_changes(src) is True
    assert 1 not in {r["vec_id"] for r in idx.codes().collect()}


def test_retrain_restores_equality_law(spark, tmp_path):
    from hemera_indexer_spark.operators.pq import pq_adc_topk
    from hemera_indexer_spark.operators.pq_index import PQIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    idx = PQIndex.build_from_table(
        spark, str(tmp_path / "idx"), src, **PQ_KW
    )
    _merge(src, spark, [
        (9000 + i, 100 + i, _vec(i), "update") for i in range(40)
    ], epoch=1)
    idx.update_from_changes(src)
    assert idx.drift(src) > 0
    assert idx.retrain(src) is True
    assert idx.trained_version() == src.snapshot["version"]
    inline = pq_adc_topk(
        src.current_state().select("vec_id", "embedding"),
        query_ids=QIDS, k=5, iters=2, **PQ_KW,
    )
    assert _topk_set(idx.topk(src, QIDS, k=5)) == _topk_set(inline)


def test_maybe_retrain_policy(spark, tmp_path):
    from hemera_indexer_spark.operators.pq_index import PQIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    idx = PQIndex.build_from_table(
        spark, str(tmp_path / "idx"), src, **PQ_KW
    )
    assert idx.maybe_retrain(src) == "noop"
    _merge(src, spark, [(9000, 100, _vec(5), "update")], epoch=1)
    assert idx.maybe_retrain(src, max_drift=0.9) == "sync"
    _merge(src, spark, [
        (9100 + i, 200 + i, _vec(i), "update") for i in range(300)
    ], epoch=2)
    assert idx.maybe_retrain(src, max_drift=0.25) == "retrain"


def test_family_and_param_pinning(spark, tmp_path):
    from hemera_indexer_spark.operators.dedup_index import IndexFamilyError
    from hemera_indexer_spark.operators.pq_index import PQIndex

    src = _mk_source(spark, str(tmp_path / "src"))
    idx = PQIndex.build_from_table(
        spark, str(tmp_path / "idx"), src, **PQ_KW
    )
    idx.table.update_properties({"pq_family": "999"})
    with pytest.raises(IndexFamilyError):
        PQIndex.load(spark, str(tmp_path / "idx"))
    # a non-index table refuses too
    with pytest.raises(IndexFamilyError):
        PQIndex(src)


def _write_vec_epoch(log_dir, epoch, rows, seq0):
    """1-partition changelog epoch with an embedding payload column —
    the test_ivf_index fixture shape (all-nullable arrow schema; see the
    pyarrow not-null write gotcha in tests/test_model_walk.py)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            pa.field("seq", pa.int64()),
            pa.field("epoch", pa.int64()),
            pa.field("partition", pa.int32()),
            pa.field("doc_id", pa.string()),
            pa.field("op", pa.string()),
            pa.field("embedding", pa.list_(pa.float32())),
            pa.field("rollback_to_seq", pa.int64()),
        ]
    )
    cols = {
        "seq": [seq0 + i for i in range(len(rows))],
        "epoch": [epoch] * len(rows),
        "partition": [0] * len(rows),
        "doc_id": [r[0] for r in rows],
        "op": [r[1] for r in rows],
        "embedding": [r[2] for r in rows],
        "rollback_to_seq": [None] * len(rows),
    }
    path = os.path.join(log_dir, f"epoch={epoch:05d}", "partition=000")
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.Table.from_pydict(cols, schema=schema),
        os.path.join(path, "events.parquet"),
    )


def test_vector_index_sink_maintains_pq_index_through_ingest(spark, tmp_path):
    """The IVFIndexSink/VectorIndexSink protocol drives a PQIndex through
    a CDC replay unchanged: codes stay synced at commit granularity
    (inserts encoded against the frozen book, deletes tombstoned), the
    log fence tracks the last epoch, and a re-driven controller moves
    nothing."""
    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.operators.pq_index import PQIndex
    from hemera_indexer_spark.streaming import StreamController
    from hemera_indexer_spark.streaming.sinks import VectorIndexSink

    state_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    log = str(tmp_path / "log")
    _write_vec_epoch(
        log, 0,
        [(f"a{i}", "update", _vec(i, 16)) for i in range(12)],
        seq0=0,
    )
    _write_vec_epoch(
        log, 1,
        [("a3", "delete", None), ("b1", "update", _vec(100, 16)),
         ("a5", "update", _vec(205, 16))],
        seq0=20,
    )
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), state_schema, num_buckets=4
    )
    idx = PQIndex.build_from_table(
        spark, str(tmp_path / "idx"), table,
        in_dim=16, m=4, ks=2, id_col="doc_id",
    )
    sink = VectorIndexSink(
        table, idx, id_col="doc_id", vec_col="embedding", max_drift=0.5
    )
    StreamController(
        spark, table, log, 1, sinks=[sink], max_batch_epochs=1
    ).run()
    assert sink.committed_epoch() == 1
    assert idx.synced_version() == table.snapshot["version"]
    live = {r["doc_id"] for r in table.current_state().collect()}
    indexed = {r["vec_id"] for r in idx.codes().collect()}
    assert indexed == live
    assert "a3" not in indexed and "b1" in indexed

    # fenced re-drive: nothing moves
    v = idx.table.snapshot["version"]
    StreamController(
        spark, table, log, 1,
        sinks=[VectorIndexSink(table, idx, id_col="doc_id",
                               vec_col="embedding")],
        max_batch_epochs=1,
    ).run()
    idx.table.refresh()
    assert idx.table.snapshot["version"] == v
