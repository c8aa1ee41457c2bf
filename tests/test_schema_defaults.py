"""Column DEFAULT values (Iceberg V3 initial/write defaults), metadata
only on both sides: `evolve_schema(fields, defaults=...)` makes rows in
pre-add files read the INITIAL default (per-file-generation mapping, no
rewrite) and fills the WRITE default when a writer omits the column —
except in `merge_patch`, where a missing column means "unchanged"."""

import pytest
from pyspark.sql import functions as F, types as T

from hemera_indexer_spark.lake import LakeTable

STATE = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("val", T.StringType()),
    ]
)


def _mk(spark, root, docs=6):
    t = LakeTable.create(spark, root, STATE, num_buckets=2)
    t.merge_upsert(
        spark.createDataFrame(
            [(f"d{i}", i + 1, f"v{i}", "upsert") for i in range(docs)],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=0,
    )
    return t


def _col(t, c):
    return {r["doc_id"]: r[c] for r in t.current_state().collect()}


def _add_tag(t, default="D"):
    t.evolve_schema(
        [T.StructField("tag", T.StringType(), True)], defaults={"tag": default}
    )


def test_initial_default_serves_pre_add_rows(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v_pre = t.snapshot["version"]
    before_paths = sorted(f["path"] for f in t.snapshot["files"])
    _add_tag(t)
    assert sorted(f["path"] for f in t.snapshot["files"]) == before_paths
    got = _col(t, "tag")
    assert got and all(v == "D" for v in got.values())
    # time travel to pre-add serves no such column
    assert "tag" not in t.as_of(v_pre).schema.fieldNames()


def test_write_default_vs_explicit_null_vs_value(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    _add_tag(t)
    # writer OMITS the column -> write default
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 100, "x0", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=1,
    )
    # writer supplies explicit NULL -> NULL (presence beats default)
    t.merge_upsert(
        spark.createDataFrame(
            [("d1", 101, "x1", None, "upsert")],
            "doc_id string, seq long, val string, tag string, op string",
        ),
        epoch_id=2,
    )
    # writer supplies a value -> the value
    t.merge_upsert(
        spark.createDataFrame(
            [("d2", 102, "x2", "T", "upsert")],
            "doc_id string, seq long, val string, tag string, op string",
        ),
        epoch_id=3,
    )
    got = _col(t, "tag")
    assert got["d0"] == "D"
    assert got["d1"] is None
    assert got["d2"] == "T"
    assert got["d3"] == "D"  # untouched pre-add row: initial default


def test_compact_materializes_defaults_unchanged(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    _add_tag(t)
    t.merge_upsert(
        spark.createDataFrame(
            [("d2", 102, "x2", "T", "upsert")],
            "doc_id string, seq long, val string, tag string, op string",
        ),
        epoch_id=3,
    )
    want = _col(t, "tag")
    assert t.compact()
    assert _col(t, "tag") == want


def test_merge_patch_missing_column_stays_unchanged(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "p"), STATE, num_buckets=2,
    )
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 1, "v0", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=0,
    )
    _add_tag(t)
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 2, "v1", "T", "upsert")],
            "doc_id string, seq long, val string, tag string, op string",
        ),
        epoch_id=1,
    )
    assert _col(t, "tag")["d0"] == "T"
    # a PATCH that omits tag must leave "T" in place, not default it
    t.merge_patch(
        spark.createDataFrame(
            [("d0", 3, "patched", "update")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=2,
    )
    got = t.current_state().collect()[0]
    assert got["val"] == "patched"
    assert got["tag"] == "T"


def test_default_follows_rename_and_dies_with_drop(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    _add_tag(t)
    t.rename_column("tag", "label")
    # initial default still serves pre-add rows under the new name
    assert all(v == "D" for v in _col(t, "label").values())
    # write default follows the rename
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 100, "x", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=1,
    )
    assert _col(t, "label")["d0"] == "D"
    # drop removes the default; a re-add WITHOUT default reads NULL
    t.drop_column("label")
    t.evolve_schema([T.StructField("label", T.StringType(), True)])
    assert all(v is None for v in _col(t, "label").values())


def test_fact_changes_since_across_default_add(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "f"),
        T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("seq", T.LongType()),
                T.StructField("ts", T.LongType()),
            ]
        ),
        num_buckets=2, properties={"table_type": "fact"},
    )
    t.insert_if_absent(
        spark.createDataFrame(
            [(f"d{i}", i, 1000 + i) for i in range(10)],
            "doc_id string, seq long, ts long",
        ),
        epoch_id=0,
    )
    v = t.snapshot["version"]
    t.evolve_schema(
        [T.StructField("src", T.StringType(), True)], defaults={"src": "S"}
    )
    t.insert_if_absent(
        spark.createDataFrame(
            [("x1", 100, 9001)], "doc_id string, seq long, ts long"
        ),
        epoch_id=1,
    )
    ch = t.changes_since(v).collect()
    # pre-add rows must NOT spuriously diff (both sides read the default)
    assert {r["change_op"] for r in ch} == {"insert"} and len(ch) == 1
    assert ch[0]["src"] == "S"  # write default on the new row


def test_validation(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="non-added"):
        t.evolve_schema(
            [T.StructField("tag", T.StringType(), True)],
            defaults={"val": "x"},
        )
    with pytest.raises(ValueError, match="plain scalar"):
        t.evolve_schema(
            [T.StructField("tag", T.ArrayType(T.LongType()), True)],
            defaults={"tag": [1, 2]},
        )
    # a type-incompatible default would silently cast to NULL at every
    # fill site — rejected at evolve time instead
    # ANSI mode surfaces the bad cast as an error ("not castable"),
    # non-ANSI as a NULL ("casts to NULL") — both rejected
    with pytest.raises(ValueError, match="casts to NULL|not castable"):
        t.evolve_schema(
            [T.StructField("n", T.LongType(), True)],
            defaults={"n": "not-a-number"},
        )
    # numeric widening stays allowed (int default on a double column)
    t.evolve_schema(
        [T.StructField("w", T.DoubleType(), True)], defaults={"w": 1}
    )
    assert "w" in t.schema.fieldNames()


def test_lww_across_default_boundary(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    _add_tag(t)
    # winner in an OLD file -> default; winner post-add explicit -> value
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 100, "new", "X", "upsert")],
            "doc_id string, seq long, val string, tag string, op string",
        ),
        epoch_id=1,
    )
    got = _col(t, "tag")
    assert got["d0"] == "X" and got["d1"] == "D"
    # delete then re-insert without the column -> write default, not stale
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 101, None, "delete"), ("d0", 102, "back", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=2,
    )
    assert _col(t, "tag")["d0"] == "D"
