"""SQL facade: lake tables as Spark temp views (``register_view`` /
``LakeCatalog.register_views``).

Invariants under test:
- a registered view equals ``current_state()`` and is queryable with
  plain ``spark.sql`` (including cross-view joins);
- the view is PINNED to the snapshot at registration — commits after
  registration are invisible until re-registration (same-name replace);
- ``raw=True`` exposes the pre-fold multi-version scan;
- time-travel handles (``as_of``) register views of retained history;
- ``register_views()`` pins every view at ONE catalog version: a table
  head racing ahead of the catalog is invisible to the SQL surface.
"""

import pytest
from pyspark.sql import types as T

from hemera_indexer_spark.lake import LakeCatalog, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("val", T.StringType()),
    ]
)


def _mk_table(spark, root, tag, n=5):
    t = LakeTable.create(spark, root, SCHEMA, num_buckets=2)
    t.merge_upsert(
        spark.createDataFrame(
            [(f"d{i}", i + 1, f"{tag}{i}", "upsert") for i in range(n)],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=0,
    )
    return t


def _upsert_d0(spark, t, val, epoch_id=1):
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 100, val, "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=epoch_id,
    )


def _drop(spark, *names):
    for n in names:
        spark.catalog.dropTempView(n)


def test_view_matches_current_state(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), "a")
    v = t.register_view("sqlv_state")
    try:
        assert v == t.snapshot["version"]
        rows = {
            r["doc_id"]: r["val"]
            for r in spark.sql(
                "SELECT doc_id, val FROM sqlv_state ORDER BY doc_id"
            ).collect()
        }
        want = {
            r["doc_id"]: r["val"] for r in t.current_state().collect()
        }
        assert rows == want and len(rows) == 5
        # resolved view: tombstone column is folded away, not exposed
        assert "is_deleted" not in spark.table("sqlv_state").columns
    finally:
        _drop(spark, "sqlv_state")


def test_view_pinned_until_reregistered(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), "a")
    t.register_view("sqlv_pin")
    try:
        _upsert_d0(spark, t, "newer")
        # the view still reads the registration-time snapshot's files
        assert (
            spark.sql(
                "SELECT val FROM sqlv_pin WHERE doc_id = 'd0'"
            ).collect()[0]["val"]
            == "a0"
        )
        # re-register (same name replaces) -> head is visible
        t.register_view("sqlv_pin")
        assert (
            spark.sql(
                "SELECT val FROM sqlv_pin WHERE doc_id = 'd0'"
            ).collect()[0]["val"]
            == "newer"
        )
    finally:
        _drop(spark, "sqlv_pin")


def test_raw_view_exposes_multiversion_scan(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), "a")
    _upsert_d0(spark, t, "newer")
    t.register_view("sqlv_raw", raw=True)
    try:
        raw = spark.sql(
            "SELECT count(*) AS n FROM sqlv_raw WHERE doc_id = 'd0'"
        ).collect()[0]["n"]
        assert raw == 2  # both versions pre-fold
        assert t.current_state().where("doc_id = 'd0'").count() == 1
    finally:
        _drop(spark, "sqlv_raw")


def test_as_of_view_time_travel(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), "a")
    v1 = t.snapshot["version"]
    _upsert_d0(spark, t, "newer")
    pinned = t.as_of(v1).register_view("sqlv_v1")
    try:
        assert pinned == v1
        assert (
            spark.sql(
                "SELECT val FROM sqlv_v1 WHERE doc_id = 'd0'"
            ).collect()[0]["val"]
            == "a0"
        )
    finally:
        _drop(spark, "sqlv_v1")


def test_catalog_register_views_consistent_pair(spark, tmp_path):
    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    a = _mk_table(spark, str(tmp_path / "a"), "a")
    b = _mk_table(spark, str(tmp_path / "b"), "b")
    cat.register("a", a.root)
    cat.register("b", b.root)
    cat.advance()
    pinned = cat.register_views(prefix="cat_")
    try:
        assert set(pinned) == {"cat_a", "cat_b"}
        # cross-view join in plain SQL over ONE catalog snapshot
        joined = spark.sql(
            "SELECT a.doc_id, a.val AS av, b.val AS bv "
            "FROM cat_a a JOIN cat_b b USING (doc_id) ORDER BY doc_id"
        ).collect()
        assert len(joined) == 5
        assert joined[0]["av"] == "a0" and joined[0]["bv"] == "b0"

        # a table head racing AHEAD of the catalog is invisible to the
        # SQL surface, even after re-registration at the same catalog
        # snapshot (views pin the cataloged versions, not the heads)
        _upsert_d0(spark, a, "ahead")
        cat.register_views(prefix="cat_")
        assert (
            spark.sql(
                "SELECT val FROM cat_a WHERE doc_id = 'd0'"
            ).collect()[0]["val"]
            == "a0"
        )
        # advancing the catalog and re-registering exposes it
        cat.advance(["a"])
        pinned2 = cat.register_views(prefix="cat_")
        assert pinned2["cat_a"] > pinned["cat_a"]
        assert (
            spark.sql(
                "SELECT val FROM cat_a WHERE doc_id = 'd0'"
            ).collect()[0]["val"]
            == "ahead"
        )
    finally:
        _drop(spark, "cat_a", "cat_b")
