"""RTBF across derived indexes: `apply_purge` fast-forwards an in-sync
index across a source `purge_keys` in O(purged keys).

Laws under test:
- purge_keys's aggressive snapshot expire breaks changes_since from any
  pre-purge cursor BY DESIGN (retained snapshots would vacuum-protect
  the payload) — demonstrated, not assumed;
- apply_purge removes the purged keys' derived rows (band signatures /
  value projection), fast-forwards the cursor to the post-purge head in
  ONE fenced commit, and subsequent incremental syncs work again;
- physical mode leaves NO retained index file containing the purged
  doc's derived values (disk-level proof, mirroring the purge_keys
  payload-absence test);
- equality law: the fast-forwarded index state equals a fresh rebuild
  from the post-purge source.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from hemera_indexer_spark.lake import LakeTable

SRC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("text", T.StringType()),
        T.StructField("n_tok", T.LongType()),
    ]
)

ROWS = [
    ("a", 1, "the quick brown fox jumps over the lazy dog today", 10),
    ("b", 2, "completely different text about spark engines and parquet", 9),
    ("c", 3, "a third document with some middling unrelated content here", 10),
    ("d", 4, "target text that doc d will nearly duplicate verbatim soon", 11),
]


def _mk_source(spark, root):
    t = LakeTable.create(spark, str(root), SRC_SCHEMA, num_buckets=4)
    t.merge_upsert(
        spark.createDataFrame(
            [(*r, "update") for r in ROWS],
            "doc_id string, seq long, text string, n_tok long, op string",
        ),
        epoch_id=0,
    )
    return t


def _scan_strings(root):
    """Every string value in every retained parquet file under root."""
    vals = set()
    for f in glob.glob(os.path.join(str(root), "**", "*.parquet"),
                       recursive=True):
        tb = pq.read_table(f)
        for name in tb.schema.names:
            col = tb.column(name)
            if str(col.type) in ("string", "large_string"):
                vals.update(x for x in col.to_pylist() if x is not None)
    return vals


def test_signature_index_apply_purge(spark, tmp_path):
    from hemera_indexer_spark.operators.dedup_index import SignatureIndex

    src = _mk_source(spark, tmp_path / "src")
    idx = SignatureIndex.build_from_table(
        spark, str(tmp_path / "idx"), src, text_col="text"
    )
    purged_bands = {
        r[c]
        for r in idx.table.current_state().where("doc_id = 'b'").collect()
        for c in r.asDict()
        if c.startswith("b") and r[c] is not None
    }
    assert purged_bands

    src.purge_keys(["b"])
    # the documented breakage: the pre-purge cursor cannot sync anymore
    with pytest.raises(FileNotFoundError):
        idx.update_from_changes(src, text_col="text")

    out = idx.apply_purge(["b"], src)
    assert out["applied"] and out["synced_version"] == src.snapshot["version"]
    live = {r["doc_id"] for r in idx.table.current_state().collect()}
    assert live == {"a", "c", "d"}

    # equality law vs a fresh rebuild from the post-purge source
    fresh = SignatureIndex.build(
        spark, str(tmp_path / "idx2"), src.current_state(), text_col="text"
    )
    cols = ["doc_id", "b0", "b1", "b2", "b3"]
    got = sorted(map(tuple, idx.table.current_state().select(*cols).collect()))
    want = sorted(
        map(tuple, fresh.table.current_state().select(*cols).collect())
    )
    assert got == want

    # disk-level RTBF: no retained index file holds b's band values
    on_disk = _scan_strings(tmp_path / "idx")
    assert not (purged_bands & on_disk), purged_bands & on_disk

    # the cursor is whole again: later source commits sync incrementally
    src.merge_upsert(
        spark.createDataFrame(
            [("e", 20, "a brand new document arriving after the purge", 8,
              "update")],
            "doc_id string, seq long, text string, n_tok long, op string",
        ),
        epoch_id=1,
    )
    assert idx.update_from_changes(src, text_col="text")
    assert idx.synced_version() == src.snapshot["version"]
    live2 = {r["doc_id"] for r in idx.table.current_state().collect()}
    assert live2 == {"a", "c", "d", "e"}

    # idempotent: a re-driven apply_purge at the same head is a no-op
    assert idx.apply_purge(["b"], src)["applied"] is False


def test_secondary_index_apply_purge(spark, tmp_path):
    from hemera_indexer_spark.operators.secondary_index import SecondaryIndex

    src = _mk_source(spark, tmp_path / "src")
    sidx = SecondaryIndex.build_from_table(
        spark, str(tmp_path / "sidx"), src, "n_tok", num_buckets=4
    )
    src.purge_keys(["d"])
    with pytest.raises(FileNotFoundError):
        sidx.update_from_changes(src)

    out = sidx.apply_purge(["d"], src)
    assert out["applied"]
    # lookup (including the rewritten sorted projection) forgets the key
    got = {r["doc_id"] for r in sidx.lookup(9, 11).collect()}
    assert got == {"a", "b", "c"}
    assert sidx.is_projection_fresh()
    # disk-level: the key may survive in its tombstone row (same as the
    # source's purge_keys — RTBF scrubs the DERIVED payload, not the
    # identifier), but no retained file pairs 'd' with a value anymore
    for f in glob.glob(
        os.path.join(str(tmp_path / "sidx"), "**", "*.parquet"),
        recursive=True,
    ):
        tb = pq.read_table(f)
        if {"doc_id", "n_tok"} <= set(tb.schema.names):
            for r in tb.to_pylist():
                assert not (r["doc_id"] == "d" and r["n_tok"] is not None), f

    # cursor whole again
    src.merge_upsert(
        spark.createDataFrame(
            [("e", 20, "post purge arrival", 11, "update")],
            "doc_id string, seq long, text string, n_tok long, op string",
        ),
        epoch_id=1,
    )
    assert sidx.update_from_changes(src)
    got2 = {r["doc_id"] for r in sidx.lookup(9, 11).collect()}
    assert got2 == {"a", "b", "c", "e"}


VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _mk_vec_source(spark, root):
    t = LakeTable.create(
        spark, str(root), VEC_SCHEMA, num_buckets=4, key_col="vec_id"
    )
    t.bulk_load(
        spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding").limit(200)
    )
    return t


def _vec_merge(t, spark, rows, epoch):
    t.merge_upsert(
        spark.createDataFrame(
            rows, "vec_id long, seq long, embedding array<float>, op string"
        ),
        epoch_id=epoch,
    )


def test_ivf_index_apply_purge(spark, tmp_path):
    from hemera_indexer_spark.operators.ivf_index import IVFIndex

    src = _mk_vec_source(spark, tmp_path / "src")
    idx = IVFIndex.build_from_table(spark, str(tmp_path / "idx"), src, ncells=4)
    victim = src.current_state().select("vec_id").head()["vec_id"]

    src.purge_keys([victim])
    with pytest.raises(FileNotFoundError):
        idx.update_from_changes(src)

    out = idx.apply_purge([victim], src)
    assert out["applied"] and out["synced_version"] == src.snapshot["version"]
    assert idx.assignments().where(f"vec_id = {victim}").count() == 0
    # disk-level: no retained index file pairs the victim with a cell
    for f in glob.glob(
        os.path.join(str(tmp_path / "idx"), "**", "*.parquet"),
        recursive=True,
    ):
        tb = pq.read_table(f)
        if {"vec_id", "cell"} <= set(tb.schema.names):
            for r in tb.to_pylist():
                assert not (
                    r["vec_id"] == victim and r["cell"] is not None
                ), f
    # cursor whole again: post-purge commits sync incrementally against
    # the FROZEN quantizer (centroids rode the snapshot untouched)
    _vec_merge(
        src, spark,
        [(999999, 50, [float(d % 7) - 3.0 for d in range(64)], "update")],
        epoch=1,
    )
    assert idx.update_from_changes(src)
    assert idx.assignments().where("vec_id = 999999").count() == 1


def test_pq_index_apply_purge(spark, tmp_path):
    from hemera_indexer_spark.operators.pq_index import PQIndex

    src = _mk_vec_source(spark, tmp_path / "src")
    idx = PQIndex.build_from_table(
        spark, str(tmp_path / "idx"), src, in_dim=64, m=8, ks=16
    )
    victim = src.current_state().select("vec_id").head()["vec_id"]

    src.purge_keys([victim])
    with pytest.raises(FileNotFoundError):
        idx.update_from_changes(src)

    out = idx.apply_purge([victim], src)
    assert out["applied"]
    assert idx.codes().where(f"vec_id = {victim}").count() == 0
    for f in glob.glob(
        os.path.join(str(tmp_path / "idx"), "**", "*.parquet"),
        recursive=True,
    ):
        tb = pq.read_table(f)
        if {"vec_id", "codes"} <= set(tb.schema.names):
            for r in tb.to_pylist():
                assert not (
                    r["vec_id"] == victim and r["codes"] is not None
                ), f
    _vec_merge(
        src, spark,
        [(999999, 50, [float(d % 7) - 3.0 for d in range(64)], "update")],
        epoch=1,
    )
    assert idx.update_from_changes(src)
    assert idx.codes().where("vec_id = 999999").count() == 1
