"""CHECK constraints (Delta Lake ADD CONSTRAINT analog).

Laws under test:
- a violating batch raises CheckViolationError and is a clean NO-OP:
  nothing written, version unchanged, epoch fence untouched (the batch
  can be fixed and retried under the same epoch_id);
- SQL three-valued semantics: rows violate only when the predicate is
  FALSE — NULL passes, so delete tombstones (payloads nulled) and
  schema-evolution NULL fills never trip payload checks;
- declaration is validated against the table schema (bad column or
  non-boolean predicate fails at set_check, not at the first write);
- checks are versioned properties: drop_check lifts enforcement,
  clones/restores carry the constraint set with the data;
- enforcement covers every write path: merge_upsert, merge_patch,
  insert_if_absent (fact), bulk_load.
"""

import pytest
from pyspark.sql import types as T

from hemera_indexer_spark.lake import CheckViolationError, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("score", T.LongType()),
    ]
)

BATCH_DDL = "doc_id string, seq long, score long, op string"


def _mk(spark, root, **kw):
    t = LakeTable.create(spark, root, SCHEMA, num_buckets=2, **kw)
    t.set_check("score_range", "score BETWEEN 0 AND 100")
    return t


def _batch(spark, rows):
    return spark.createDataFrame(rows, BATCH_DDL)


def test_violating_batch_is_clean_noop(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge_upsert(_batch(spark, [("d1", 1, 50, "upsert")]), epoch_id=0)
    v = t.snapshot["version"]
    with pytest.raises(CheckViolationError) as ei:
        t.merge_upsert(
            _batch(spark, [("d2", 2, 50, "upsert"), ("d3", 3, 999, "upsert")]),
            epoch_id=1,
        )
    assert ei.value.counts == {"score_range": 1}
    assert ei.value.samples["score_range"][0]["doc_id"] == "d3"
    # clean no-op: no files, no version bump, fence untouched
    assert t.snapshot["version"] == v
    assert t.committed_epoch() == 0
    # the FIXED batch retries under the SAME epoch_id and lands
    assert t.merge_upsert(
        _batch(spark, [("d2", 2, 50, "upsert"), ("d3", 3, 99, "upsert")]),
        epoch_id=1,
    )
    assert t.current_state().count() == 3


def test_null_passes_and_tombstones_exempt(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    # NULL score passes (SQL three-valued CHECK semantics)
    t.merge_upsert(_batch(spark, [("d1", 1, None, "upsert")]), epoch_id=0)
    # a delete event never trips payload checks (payload nulled pre-check)
    t.merge_upsert(_batch(spark, [("d1", 2, -5, "delete")]), epoch_id=1)
    assert t.current_state().count() == 0


def test_declaration_validated(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=2)
    with pytest.raises(ValueError, match="does not analyze"):
        t.set_check("bad_col", "no_such_column > 0")
    with pytest.raises(ValueError, match="boolean"):
        t.set_check("not_bool", "score + 1")
    with pytest.raises(ValueError, match="name"):
        t.set_check("bad name!", "score > 0")
    # op is part of the uniform predicate surface
    t.set_check("known_op", "op IN ('insert', 'update', 'upsert', 'delete')")
    assert set(t.checks()) == {"known_op"}


def test_drop_check_lifts_enforcement(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(CheckViolationError):
        t.merge_upsert(_batch(spark, [("d1", 1, 999, "upsert")]), epoch_id=0)
    t.drop_check("score_range")
    assert t.checks() == {}
    assert t.merge_upsert(_batch(spark, [("d1", 1, 999, "upsert")]), epoch_id=0)
    with pytest.raises(KeyError):
        t.drop_check("score_range")


def test_fact_insert_and_bulk_load_enforced(spark, tmp_path):
    fact = LakeTable.create(
        spark,
        str(tmp_path / "f"),
        SCHEMA,
        num_buckets=2,
        properties={"table_type": "fact"},
    )
    fact.set_check("score_range", "score BETWEEN 0 AND 100")
    with pytest.raises(CheckViolationError) as ei:
        fact.insert_if_absent(
            _batch(spark, [("d1", 1, -1, "insert")]), epoch_id=0
        )
    assert ei.value.op_name == "insert_if_absent"
    assert fact.committed_epoch() == -1 or fact.snapshot["files"] == []

    t = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(CheckViolationError) as ei2:
        t.bulk_load(
            spark.createDataFrame(
                [("d1", 200)], "doc_id string, score long"
            )
        )
    assert ei2.value.op_name == "bulk_load"
    assert t.snapshot["files"] == []


def test_merge_patch_enforced_nulls_unchanged(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge_upsert(_batch(spark, [("d1", 1, 50, "upsert")]), epoch_id=0)
    # NULL patch column = unchanged -> passes the check by construction
    t.merge_patch(_batch(spark, [("d1", 2, None, "patch")]), epoch_id=1)
    with pytest.raises(CheckViolationError):
        t.merge_patch(_batch(spark, [("d1", 3, 500, "patch")]), epoch_id=2)
    row = t.current_state().collect()[0]
    assert row["score"] == 50 and t.committed_epoch() == 1


def test_checks_travel_with_clone(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge_upsert(_batch(spark, [("d1", 1, 50, "upsert")]), epoch_id=0)
    c = t.clone_to(str(tmp_path / "clone"))
    assert c.checks() == {"score_range": "score BETWEEN 0 AND 100"}
    with pytest.raises(CheckViolationError):
        c.merge_upsert(_batch(spark, [("d2", 2, 101, "upsert")]), epoch_id=1)
