"""Property-based check of the index-maintenance law: for ANY sequence of
update/delete/empty-text events split into ANY batches, maintaining the
SignatureIndex from the source table's change feed after each batch equals
building it fresh from the final state — the invariant that guards round
stamping, source-delete handling and emptied-doc eviction."""

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

DOCS = [f"d{i}" for i in range(5)]
# small word pool so near-dup band buckets collide often (the interesting case)
WORDS = ["alpha", "beta", "gamma", "delta"]

event_st = st.tuples(
    st.integers(0, len(DOCS) - 1),                         # doc index
    st.sampled_from(["update", "update", "delete"]),       # update-heavy mix
    st.lists(st.integers(0, len(WORDS) - 1), min_size=0, max_size=6),
)


def _src_schema():
    return T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("text", T.StringType()),
        ]
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(event_st, min_size=1, max_size=24),
    split=st.integers(1, 24),
)
def test_incremental_index_equals_rebuild(spark, tmp_path_factory, events, split):
    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.operators.dedup_index import SignatureIndex

    root = tmp_path_factory.mktemp("prop_idx")
    src = LakeTable.create(spark, str(root / "src"), _src_schema(), num_buckets=2)
    idx = SignatureIndex.build_from_table(
        spark, str(root / "idx"), src, text_col="text", k=8, bands=2
    )
    rows = [
        (
            DOCS[di],
            seq,
            " ".join(WORDS[w] for w in toks),  # may be "" -> zero shingles
            op,
        )
        for seq, (di, op, toks) in enumerate(events, start=1)
    ]
    batches = [rows[i : i + split] for i in range(0, len(rows), split)]
    for e, batch in enumerate(batches):
        df = spark.createDataFrame(
            batch, "doc_id string, seq long, text string, op string"
        )
        assert src.merge_upsert(df, epoch_id=e)
        idx.update_from_changes(src, text_col="text")

    fresh = SignatureIndex.build_from_table(
        spark, str(root / "fresh"), src, text_col="text", k=8, bands=2
    )
    cols = ["doc_id", "b0", "b1"]
    got = sorted(map(tuple, idx.table.current_state().select(*cols).collect()))
    want = sorted(map(tuple, fresh.table.current_state().select(*cols).collect()))
    assert got == want
