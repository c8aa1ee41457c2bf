"""Partial-update (patch) CDC events: the column-wise fold law and its
incremental form.

The law under test everywhere: NULL payload = unchanged, deletes reset
(columns set before the last delete never resurrect), per-column value =
last setter by seq after the last delete. `merge_patch` must equal
`patch_fold` over the concatenated log for ANY batch split, including
batches that re-deliver duplicates of already-applied events — the
engine's delivery contract."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hemera_indexer_spark.operators.patch import patch_fold

SCH = "k string, seq long, op string, a long, b string"


def _table_schema():
    return T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]
    )


def _mk_table(spark, tmp_path, name="t", **kw):
    from hemera_indexer_spark.lake.table import LakeTable

    return LakeTable.create(
        spark, str(tmp_path / name), _table_schema(), key_col="k",
        num_buckets=2, **kw
    )


def _state(tbl):
    return sorted(
        map(tuple, tbl.current_state().select("k", "a", "b", "seq").collect())
    )


def _fold(spark, rows):
    df = spark.createDataFrame(rows, SCH)
    out = patch_fold(df, "k", "seq", ["a", "b"])
    return sorted(map(tuple, out.select("k", "a", "b", "seq").collect()))


# ---------------------------------------------------------------- fold law
def test_patch_fold_null_means_unchanged(spark):
    rows = [("k1", 1, "patch", 10, "x"), ("k1", 2, "patch", None, "y")]
    assert _fold(spark, rows) == [("k1", 10, "y", 2)]


def test_patch_fold_delete_resets_columns(spark):
    rows = [
        ("k1", 1, "patch", 10, "x"),
        ("k1", 2, "delete", None, None),
        ("k1", 3, "patch", None, "y"),
    ]
    # a must NOT resurrect across the delete
    assert _fold(spark, rows) == [("k1", None, "y", 3)]


def test_patch_fold_trailing_delete_drops_key(spark):
    rows = [("k1", 1, "patch", 10, "x"), ("k1", 2, "delete", None, None)]
    assert _fold(spark, rows) == []


def test_patch_fold_delete_payload_ignored(spark):
    # a delete event carrying payload contributes position only
    rows = [
        ("k1", 1, "delete", 99, "junk"),
        ("k1", 2, "patch", 1, None),
    ]
    assert _fold(spark, rows) == [("k1", 1, None, 2)]


# ----------------------------------------------------------- merge_patch
def test_merge_patch_matches_fold_simple(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path)
    rows = [
        ("k1", 1, "patch", 10, None),
        ("k1", 2, "patch", None, "b1"),
        ("k2", 3, "insert", 5, "full"),
        ("k1", 4, "delete", None, None),
        ("k1", 5, "patch", None, "b2"),
        ("k2", 6, "patch", 7, None),
    ]
    for e, lo in enumerate(range(0, len(rows), 2)):
        assert tbl.merge_patch(
            spark.createDataFrame(rows[lo : lo + 2], SCH), epoch_id=e
        )
    assert _state(tbl) == _fold(spark, rows)


def test_merge_patch_duplicate_redelivery_is_noop(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path)
    b1 = [("k1", 1, "patch", 10, "x"), ("k1", 2, "patch", 20, None)]
    tbl.merge_patch(spark.createDataFrame(b1, SCH), epoch_id=0)
    before = _state(tbl)
    # re-deliver an OLD setter of a alongside a new setter of b: the stale
    # a=10 must not beat the applied a=20
    b2 = [("k1", 1, "patch", 10, "x"), ("k1", 3, "patch", None, "new")]
    tbl.merge_patch(spark.createDataFrame(b2, SCH), epoch_id=1)
    assert _state(tbl) == [("k1", 20, "new", 3)]
    # full duplicate batch = pure no-op on state values
    tbl.merge_patch(spark.createDataFrame(b2, SCH), epoch_id=2)
    assert _state(tbl) == [("k1", 20, "new", 3)]
    assert before == [("k1", 20, "x", 2)]


def test_merge_patch_duplicate_delete_does_not_re_reset(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path)
    tbl.merge_patch(
        spark.createDataFrame(
            [
                ("k1", 1, "patch", 10, "x"),
                ("k1", 2, "delete", None, None),
                ("k1", 3, "patch", None, "y"),
            ],
            SCH,
        ),
        epoch_id=0,
    )
    assert _state(tbl) == [("k1", None, "y", 3)]
    # the delete@2 is re-delivered AFTER the row moved past it: it is a
    # duplicate (seq <= committed 3) and must not reset b='y'
    tbl.merge_patch(
        spark.createDataFrame([("k1", 2, "delete", None, None)], SCH),
        epoch_id=1,
    )
    assert _state(tbl) == [("k1", None, "y", 3)]


def test_merge_patch_tombstone_blocks_resurrection_by_duplicates(
    spark, tmp_path
):
    tbl = _mk_table(spark, tmp_path)
    tbl.merge_patch(
        spark.createDataFrame(
            [("k1", 1, "patch", 10, "x"), ("k1", 2, "delete", None, None)],
            SCH,
        ),
        epoch_id=0,
    )
    assert _state(tbl) == []
    # re-delivered pre-delete patch must NOT resurrect the row
    tbl.merge_patch(
        spark.createDataFrame([("k1", 1, "patch", 10, "x")], SCH), epoch_id=1
    )
    assert _state(tbl) == []
    # a genuinely new patch resurrects with ONLY its own columns
    tbl.merge_patch(
        spark.createDataFrame([("k1", 5, "patch", None, "z")], SCH), epoch_id=2
    )
    assert _state(tbl) == [("k1", None, "z", 5)]


def test_merge_patch_epoch_fence(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path)
    b = spark.createDataFrame([("k1", 1, "patch", 10, None)], SCH)
    assert tbl.merge_patch(b, epoch_id=1)
    assert not tbl.merge_patch(b, epoch_id=1)
    assert not tbl.merge_patch(b, epoch_id=0)


def test_merge_patch_schema_evolution_absent_column_unchanged(
    spark, tmp_path
):
    tbl = _mk_table(spark, tmp_path)
    tbl.merge_patch(
        spark.createDataFrame([("k1", 1, "patch", 10, "x")], SCH), epoch_id=0
    )
    tbl.evolve_schema([T.StructField("lang", T.StringType())])
    # batch without the evolved column: lang stays NULL/unchanged
    tbl.merge_patch(
        spark.createDataFrame([("k1", 2, "patch", 20, None)], SCH), epoch_id=1
    )
    # batch setting only lang: a/b unchanged
    tbl.merge_patch(
        spark.createDataFrame(
            [("k1", 3, "patch", None, None, "en")],
            SCH + ", lang string",
        ),
        epoch_id=2,
    )
    rows = tbl.current_state().select("k", "a", "b", "lang", "seq").collect()
    assert sorted(map(tuple, rows)) == [("k1", 20, "x", "en", 3)]


def test_merge_patch_refuses_rollback_fact_and_missing_identity(
    spark, tmp_path
):
    tbl = _mk_table(spark, tmp_path)
    with pytest.raises(ValueError, match="rollback"):
        tbl.merge_patch(
            spark.createDataFrame([("k1", 1, "rollback", None, None)], SCH)
        )
    with pytest.raises(ValueError, match="identity"):
        tbl.merge_patch(
            spark.createDataFrame([("k1",)], "k string").withColumn(
                "op", F.lit("patch")
            )
        )
    fact = _mk_table(
        spark, tmp_path, name="f", properties={"table_type": "fact"}
    )
    with pytest.raises(ValueError, match="state-table"):
        fact.merge_patch(spark.createDataFrame([], SCH))


# ------------------------------------------------------------ property law
KEYS = ["d0", "d1", "d2"]

event_st = st.tuples(
    st.integers(0, len(KEYS) - 1),
    st.sampled_from(["patch", "patch", "patch", "delete"]),
    st.one_of(st.none(), st.integers(0, 9)),          # a (None = unchanged)
    st.one_of(st.none(), st.sampled_from(["p", "q"])),  # b
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(event_st, min_size=1, max_size=28),
    split=st.integers(1, 28),
    dup_stride=st.integers(2, 5),
)
def test_merge_patch_equals_fold_any_split_with_redelivery(
    spark, tmp_path_factory, events, split, dup_stride
):
    rows = [
        (KEYS[ki], seq, op, a, b)
        for seq, (ki, op, a, b) in enumerate(events, start=1)
    ]
    tbl = _mk_table(spark, tmp_path_factory.mktemp("patch_prop"))
    batches = [rows[i : i + split] for i in range(0, len(rows), split)]
    for e, batch in enumerate(batches):
        # re-deliver every dup_stride-th already-applied event (duplicates
        # by construction: identical rows, seqs below the committed floor)
        seen = rows[: e * split]
        batch = seen[::dup_stride] + batch
        assert tbl.merge_patch(spark.createDataFrame(batch, SCH), epoch_id=e)
    assert _state(tbl) == _fold(spark, rows)
