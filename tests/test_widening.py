"""Type-widening schema evolution (`LakeTable.widen_schema`) — Iceberg
V3-style type promotion as a metadata-only commit.

Laws under test:

- widening is metadata-only: old (narrow) files stay on disk and serve
  through the widened read schema; values are intact;
- every write entry point up-casts a writer that still supplies the
  pre-widen type, so the LWW fold across narrow and wide files is exact;
- the KEY column is refused (bucket hash is type-sensitive);
- non-widening changes are refused loudly;
- time travel to a pre-widen version serves the narrow schema;
- `changes_since` across a widen boundary compares old-narrow vs
  new-wide correctly (state join AND fact exceptAll);
- a widened zone-mapped column keeps `read(ranges=)` safe.
"""

import decimal

import pytest
from pyspark.sql import types as T

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.lake.table import _is_widening

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("score", T.IntegerType()),
        T.StructField("ratio", T.FloatType()),
    ]
)

UPD_DDL = "doc_id string, seq long, score int, ratio float, op string"


def _mk(spark, root, **kw):
    t = LakeTable.create(spark, root, SCHEMA, num_buckets=2, **kw)
    rows = [(f"d{i}", i, i * 10, float(i) / 2, "upsert") for i in range(8)]
    t.merge_upsert(spark.createDataFrame(rows, UPD_DDL), epoch_id=0)
    return t


# ------------------------------------------------------------ pure law
@pytest.mark.parametrize(
    "old,new,ok",
    [
        (T.ByteType(), T.ShortType(), True),
        (T.ByteType(), T.LongType(), True),
        (T.ShortType(), T.IntegerType(), True),
        (T.IntegerType(), T.LongType(), True),
        (T.IntegerType(), T.DoubleType(), True),
        (T.IntegerType(), T.DecimalType(18, 2), True),
        (T.IntegerType(), T.DecimalType(11, 2), False),  # headroom 9 < 10
        (T.LongType(), T.DecimalType(22, 2), True),
        (T.LongType(), T.DecimalType(20, 2), False),  # headroom 18 < 20
        (T.FloatType(), T.DoubleType(), True),
        (T.DecimalType(10, 2), T.DecimalType(18, 4), True),
        (T.DecimalType(10, 2), T.DecimalType(10, 4), False),  # headroom shrinks
        (T.DecimalType(10, 2), T.DecimalType(12, 1), False),  # scale shrinks
        # refusals: identity, narrowing, cross-family
        (T.LongType(), T.LongType(), False),
        (T.LongType(), T.IntegerType(), False),
        (T.DoubleType(), T.FloatType(), False),
        (T.IntegerType(), T.FloatType(), False),
        (T.DoubleType(), T.DecimalType(38, 6), False),
        (T.FloatType(), T.DecimalType(38, 6), False),
        (T.IntegerType(), T.StringType(), False),
        (T.StringType(), T.LongType(), False),
    ],
)
def test_is_widening_matrix(old, new, ok):
    assert _is_widening(old, new) is ok


# ------------------------------------------------------------ engine laws
def test_widen_is_metadata_only_and_values_survive(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    files_before = sorted(f["path"] for f in t.snapshot["files"])
    t.widen_schema({"score": T.LongType(), "ratio": T.DoubleType()})
    assert sorted(f["path"] for f in t.snapshot["files"]) == files_before
    got = {r.doc_id: (r.score, r.ratio) for r in t.current_state().collect()}
    assert got["d3"] == (30, 1.5)
    types = {f.name: f.dataType for f in t.current_state().schema.fields}
    assert isinstance(types["score"], T.LongType)
    assert isinstance(types["ratio"], T.DoubleType)


def test_narrow_writer_still_folds_after_widen(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.widen_schema({"score": T.LongType()})
    # a writer built against the OLD schema keeps sending int scores
    upd = spark.createDataFrame(
        [("d3", 100, 999, 0.0, "upsert"), ("d8", 101, 888, 0.0, "upsert")],
        UPD_DDL,
    )
    assert t.merge_upsert(upd, epoch_id=1)
    got = {r.doc_id: r.score for r in t.current_state().collect()}
    assert got["d3"] == 999 and got["d8"] == 888 and got["d0"] == 0
    # post-widen values exceeding int range round-trip (the point of widening)
    big = 2**40
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 200, big, 0.0, "upsert")],
            "doc_id string, seq long, score long, ratio float, op string",
        ),
        epoch_id=2,
    )
    assert {r.score for r in t.current_state().where("doc_id='d0'").collect()} == {big}


def test_widen_key_column_refused(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        T.StructType(
            [
                T.StructField("k", T.IntegerType()),
                T.StructField("seq", T.LongType()),
                T.StructField("is_deleted", T.BooleanType(), False),
                T.StructField("v", T.StringType()),
            ]
        ),
        num_buckets=2,
        key_col="k",
    )
    with pytest.raises(ValueError, match="bucket"):
        t.widen_schema({"k": T.LongType()})


def test_widen_refuses_non_widening(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    for bad in [
        {"seq": T.IntegerType()},        # narrowing
        {"ratio": T.DecimalType(38, 6)}, # float->decimal unsupported by reader
        {"score": T.FloatType()},        # int->float unsupported by reader
        {"nope": T.LongType()},          # unknown column
    ]:
        with pytest.raises(ValueError):
            t.widen_schema(bad)


def test_time_travel_serves_pre_widen_schema(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v0 = t.snapshot["version"]
    t.widen_schema({"score": T.LongType()})
    old = t.as_of(v0)
    types = {f.name: f.dataType for f in old.current_state().schema.fields}
    assert isinstance(types["score"], T.IntegerType)
    assert {r.score for r in old.current_state().where("doc_id='d3'").collect()} == {30}


def test_changes_since_across_widen_state(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v0 = t.snapshot["version"]
    t.widen_schema({"score": T.LongType()})
    t.merge_upsert(
        spark.createDataFrame([("d3", 100, 999, 0.0, "upsert")], UPD_DDL),
        epoch_id=1,
    )
    ch = {(r.change_op, r.doc_id, r.score) for r in t.changes_since(v0).collect()}
    assert ch == {("update", "d3", 999)}


def test_changes_since_across_widen_fact(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "f"),
        T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("seq", T.LongType()),
                T.StructField("amount", T.IntegerType()),
            ]
        ),
        num_buckets=2,
        properties={"table_type": "fact"},
    )
    t.insert_if_absent(
        spark.createDataFrame(
            [("a", 1, 10), ("b", 2, 20)], "doc_id string, seq long, amount int"
        ),
        epoch_id=0,
    )
    v0 = t.snapshot["version"]
    t.widen_schema({"amount": T.LongType()})
    t.insert_if_absent(
        spark.createDataFrame([("c", 3, 30)], "doc_id string, seq long, amount int"),
        epoch_id=1,
    )
    # exceptAll across the widen boundary: narrow old side vs wide new side
    ch = {(r.change_op, r.doc_id, r.amount) for r in t.changes_since(v0).collect()}
    assert ch == {("insert", "c", 30)}


def test_widened_zone_map_column_stays_safe(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), stats_cols=("score",))
    t.widen_schema({"score": T.DecimalType(18, 2)})
    t.merge_upsert(
        spark.createDataFrame(
            [("d9", 50, decimal.Decimal("12345.00"), 0.0, "upsert")],
            "doc_id string, seq long, score decimal(18,2), ratio float, op string",
        ),
        epoch_id=1,
    )
    # decimal footers are non-JSON-safe -> new files carry no zone map for
    # score; ranges= must KEEP them (pruning-only contract), and the scan
    # must still apply nothing beyond file skipping
    rows = t.read(ranges={"score": (10000, None)}).collect()
    assert any(r.doc_id == "d9" for r in rows)
    got = {r.doc_id: r.score for r in t.current_state().collect()}
    assert got["d9"] == decimal.Decimal("12345.00")
    assert got["d3"] == decimal.Decimal("30.00")


def test_widen_concurrent_commit_raises(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    stale = LakeTable(spark, t.root)
    stale.refresh()  # pin the pre-widen snapshot (handles load lazily)
    t.widen_schema({"score": T.LongType()})
    from hemera_indexer_spark.lake import ConcurrentCommitError

    with pytest.raises(ConcurrentCommitError):
        stale.widen_schema({"ratio": T.DoubleType()})
    stale.refresh()
    stale.widen_schema({"ratio": T.DoubleType()})
    types = {f.name: f.dataType for f in stale.schema.fields}
    assert isinstance(types["ratio"], T.DoubleType)
    assert isinstance(types["score"], T.LongType)
