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
    # epoch 1: insert 9001, move vec 5, delete vec 7, empty vec 11's
    # vector, zero out vec 13's (zero-norm = unindexable by cosine)
    _merge(
        src,
        spark,
        [
            (9001, 100, _vec(9001), "update"),
            (5, 101, _vec(5), "update"),
            (7, 102, None, "delete"),
            (11, 103, [], "update"),
            (13, 104, [0.0] * 64, "update"),
        ],
        epoch=1,
    )
    assert idx.update_from_changes(src)
    after = {r["vec_id"]: r["cell"] for r in idx.assignments().collect()}
    assert 9001 in after
    assert 7 not in after and 11 not in after and 13 not in after
    # untouched keys keep their assignment (O(changed) maintenance)
    untouched = set(before) - {5, 7, 11, 13}
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


def _write_vec_epoch(log_dir, epoch, rows, seq0):
    """1-partition changelog epoch carrying an `embedding` payload column
    (additive evolution adds it to the state table on first sight).
    rows = [(doc_id, op, emb|None)]. All-nullable arrow schema — see the
    pyarrow not-null write gotcha in tests/test_model_walk.py."""
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


def test_ivf_index_sink_maintains_index_through_ingest(spark, tmp_path):
    """Full CDC replay with an IVFIndexSink: the persisted ANN index stays
    synced at commit granularity (inserts assigned, deletes dropped), the
    empty-corpus cold start self-heals via the drift-triggered retrain,
    the log fence tracks the last epoch, and a re-driven controller moves
    nothing (fenced)."""
    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.operators.ivf_index import IVFIndex
    from hemera_indexer_spark.streaming import StreamController
    from hemera_indexer_spark.streaming.sinks import IVFIndexSink

    schema = T.StructType(
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
        spark, str(tmp_path / "lake"), schema, num_buckets=4
    )
    idx = IVFIndex.build_from_table(
        spark, str(tmp_path / "idx"), table, ncells=4,
        id_col="doc_id", vec_col="embedding",
    )
    sink = IVFIndexSink(
        table, idx, id_col="doc_id", vec_col="embedding", max_drift=0.5
    )
    StreamController(
        spark, table, log, 1, sinks=[sink], max_batch_epochs=1
    ).run()
    assert sink.committed_epoch() == 1
    assert idx.synced_version() == table.snapshot["version"]
    live = {
        r["doc_id"]
        for r in table.current_state().where(
            F.col("embedding").isNotNull()
        ).collect()
    }
    assigned = {r["vec_id"] for r in idx.assignments().collect()}
    assert assigned == live and "a3" not in assigned and "b1" in assigned
    # the index answers: top-1 neighbor of a0 among the ingested vectors
    res = idx.topk(table, ["a0"], k=1, nprobe=2,
                   id_col="doc_id", vec_col="embedding").collect()
    assert len(res) == 1 and res[0]["neighbor_id"] != "a0"
    # re-drive: fenced; neither fence nor index move
    v = idx.table.snapshot["version"]
    StreamController(
        spark, LakeTable.load(spark, str(tmp_path / "lake")), log, 1,
        sinks=[IVFIndexSink(table, idx, id_col="doc_id",
                            vec_col="embedding", max_drift=0.5)],
        max_batch_epochs=1,
    ).run()
    idx.table.refresh()
    assert idx.table.snapshot["version"] == v
    assert sink.committed_epoch() == 1


def test_structured_ingest_maintains_ivf_index(spark, tmp_path):
    """Streaming parity for the ANN index: StructuredIngest drives the
    same IVFIndexSink through foreachBatch (event_schema declares the
    embedding payload column — a streaming source schema is fixed, unlike
    the batch controller's footer discovery); after draining, assignments
    equal the live vector-bearing docs, and a restarted query over the
    drained checkpoint moves nothing."""
    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.operators.ivf_index import IVFIndex
    from hemera_indexer_spark.streaming.sinks import IVFIndexSink
    from hemera_indexer_spark.streaming.structured import StructuredIngest

    state_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    event_schema = T.StructType(
        [
            T.StructField("seq", T.LongType()),
            T.StructField("epoch", T.LongType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("op", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("rollback_to_seq", T.LongType()),
        ]
    )
    log = str(tmp_path / "log")
    _write_vec_epoch(
        log, 0, [(f"a{i}", "update", _vec(i, 16)) for i in range(12)], seq0=0
    )
    _write_vec_epoch(
        log, 1,
        [("a3", "delete", None), ("b1", "update", _vec(100, 16))],
        seq0=20,
    )
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), state_schema, num_buckets=4
    )
    idx = IVFIndex.build_from_table(
        spark, str(tmp_path / "idx"), table, ncells=4,
        id_col="doc_id", vec_col="embedding",
    )
    StructuredIngest(
        spark, table, log, 1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        index_sink=IVFIndexSink(
            table, idx, id_col="doc_id", vec_col="embedding", max_drift=0.5
        ),
        event_schema=event_schema,
    ).start(available_now=True).awaitTermination(300)
    assert idx.synced_version() == table.snapshot["version"]
    live = {
        r["doc_id"]
        for r in table.current_state()
        .where(F.col("embedding").isNotNull())
        .collect()
    }
    assigned = {r["vec_id"] for r in idx.assignments().collect()}
    assert assigned == live and "a3" not in assigned and "b1" in assigned
    # restart over the drained checkpoint: nothing moves
    v = idx.table.snapshot["version"]
    StructuredIngest(
        spark, table, log, 1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        index_sink=IVFIndexSink(
            table, idx, id_col="doc_id", vec_col="embedding", max_drift=0.5
        ),
        event_schema=event_schema,
    ).start(available_now=True).awaitTermination(300)
    idx.table.refresh()
    assert idx.table.snapshot["version"] == v


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
