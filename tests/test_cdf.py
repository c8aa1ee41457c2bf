"""changes_since(cdf=True): Delta-CDF-shaped feed with update pre/post
images. The laws under test:

- insert/delete rows are identical to the net feed's;
- an update emits exactly TWO rows, preimage carrying the OLD payload and
  postimage the NEW one;
- it stays a NET feed (upsert-then-rollback across the span is silent;
  intermediate hops collapse);
- additive schema evolution serves the preimage with NULL for columns the
  old snapshot never had;
- fact tables ignore the flag (no updates in append-only history).
"""

from pyspark.sql import types as T

from hemera_indexer_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("val", T.StringType()),
    ]
)


def _mk(spark, root):
    t = LakeTable.create(spark, root, SCHEMA, num_buckets=4)
    t.merge_upsert(
        spark.createDataFrame(
            [(f"d{i}", i + 1, f"v{i}", "upsert") for i in range(6)],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=0,
    )
    return t


def _rows(df):
    return {
        (r["change_op"], r["doc_id"]): (r["seq"], r["val"])
        for r in df.collect()
    }


def test_cdf_update_pre_and_post_images(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v0 = t.snapshot["version"]
    t.merge_upsert(
        spark.createDataFrame(
            [
                ("d1", 100, "patched", "upsert"),   # update
                ("d2", 101, None, "delete"),        # delete
                ("x9", 102, "fresh", "upsert"),     # insert
            ],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=1,
    )
    # second hop on the same key: CDF is net, so only v0 -> head matters
    t.merge_upsert(
        spark.createDataFrame(
            [("d1", 200, "patched-again", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=2,
    )
    got = _rows(t.changes_since(v0, cdf=True))
    assert got == {
        ("update_preimage", "d1"): (2, "v1"),
        ("update_postimage", "d1"): (200, "patched-again"),
        ("delete", "d2"): (3, "v2"),
        ("insert", "x9"): (102, "fresh"),
    }
    # insert/delete rows agree with the net feed; update collapses to one
    net = _rows(t.changes_since(v0))
    assert net[("delete", "d2")] == got[("delete", "d2")]
    assert net[("insert", "x9")] == got[("insert", "x9")]
    assert net[("update", "d1")] == got[("update_postimage", "d1")]
    assert len(net) == 3 and len(got) == 4


def test_cdf_net_silence_and_empty_span(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v0 = t.snapshot["version"]
    assert t.changes_since(v0, cdf=True).count() == 0
    # upsert then roll back to the starting state: net feed stays silent
    t.merge_upsert(
        spark.createDataFrame(
            [("d3", 300, "temp", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=1,
    )
    t.merge_upsert(
        spark.createDataFrame(
            [("d3", 301, "v3", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=2,
    )
    got = _rows(t.changes_since(v0, cdf=True))
    # d3's value equals the original but seq moved: that IS an update
    assert set(got) == {
        ("update_preimage", "d3"), ("update_postimage", "d3"),
    }
    assert got[("update_preimage", "d3")] == (4, "v3")
    assert got[("update_postimage", "d3")] == (301, "v3")


def test_cdf_preimage_nulls_for_evolved_columns(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v0 = t.snapshot["version"]
    t.evolve_schema([T.StructField("lang", T.StringType())])
    evolved = spark.createDataFrame(
        [("d4", 400, "evolved", "en", "upsert")],
        "doc_id string, seq long, val string, lang string, op string",
    )
    t.merge_upsert(evolved, epoch_id=1)
    rows = {
        r["change_op"]: r for r in t.changes_since(v0, cdf=True).collect()
    }
    assert rows["update_preimage"]["lang"] is None
    assert rows["update_preimage"]["val"] == "v4"
    assert rows["update_postimage"]["lang"] == "en"


def test_cdf_on_fact_table_matches_net(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "f"),
        T.StructType([
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("val", T.StringType()),
        ]),
        num_buckets=2,
        properties={"table_type": "fact"},
    )
    t.insert_if_absent(
        spark.createDataFrame(
            [("a", 1, "x")], "doc_id string, seq long, val string"
        ),
        epoch_id=0,
    )
    v0 = t.snapshot["version"]
    t.insert_if_absent(
        spark.createDataFrame(
            [("b", 2, "y")], "doc_id string, seq long, val string"
        ),
        epoch_id=1,
    )
    net = t.changes_since(v0).collect()
    cdf = t.changes_since(v0, cdf=True).collect()
    assert sorted(map(tuple, net)) == sorted(map(tuple, cdf))
    assert [r["change_op"] for r in cdf] == ["insert"]


def test_key_history_distinct_states(spark, tmp_path):
    """key_history: one entry per DISTINCT resolved state across retained
    snapshots, None where absent/deleted, and unrelated commits (other
    buckets) don't add entries."""
    t = _mk(spark, str(tmp_path / "t"))  # v1: d0..d5 live
    t.merge_upsert(
        spark.createDataFrame(
            [("d1", 50, "second", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=1,
    )  # v2: d1 -> second
    t.merge_upsert(
        spark.createDataFrame(
            [("d1", 60, None, "delete")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=2,
    )  # v3: d1 deleted
    t.merge_upsert(
        spark.createDataFrame(
            [("zz", 70, "other-bucket-ish", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=3,
    )  # v4: d1 unchanged
    t.merge_upsert(
        spark.createDataFrame(
            [("d1", 80, "reborn", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=4,
    )  # v5: d1 back
    hist = t.key_history("d1")
    states = [(h["version"], h["row"] and h["row"]["val"]) for h in hist]
    # v4 (unrelated key) must NOT appear unless zz shares d1's bucket and
    # left the row unchanged — either way no new STATE entry for d1
    # v0 is the empty CREATE snapshot: the key is absent there
    assert [s for _, s in states] == [None, "v1", "second", None, "reborn"]
    assert states[0][0] == 0 and states[-1][0] == 5
    assert all(h["row"] is None or "is_deleted" not in h["row"] for h in hist)
    # absent key: a single None entry spanning all snapshots
    ghost = t.key_history("never-existed")
    assert [h["row"] for h in ghost] == [None]


def test_lookup_many_matches_state_and_prunes(spark, tmp_path):
    """lookup_many: one bucket-pruned job resolves a key set identically
    to filtering current_state; deleted and absent keys yield no row."""
    t = _mk(spark, str(tmp_path / "t"))
    t.merge_upsert(
        spark.createDataFrame(
            [("d2", 99, None, "delete")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=1,
    )
    keys = ["d0", "d2", "d4", "ghost"]
    got = {
        r["doc_id"]: r["val"] for r in t.lookup_many(keys).collect()
    }
    from pyspark.sql import functions as F

    want = {
        r["doc_id"]: r["val"]
        for r in t.current_state()
        .where(F.col("doc_id").isin(keys))
        .collect()
    }
    assert got == want == {"d0": "v0", "d4": "v4"}
    import pytest as _pt

    with _pt.raises(ValueError, match="at least one key"):
        t.lookup_many([])
