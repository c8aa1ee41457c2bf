"""TIMESTAMP AS OF time travel (`as_of_time`) and age-floor retention
(`expire_snapshots(older_than_s=)`): every commit stamps `committed_at`,
the timestamp lookup pins the newest snapshot at-or-before the asked
time, and a wall-clock horizon keeps history that a version-count
policy alone would drop."""

import pytest
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


def _mk(spark, root, epochs=4):
    t = LakeTable.create(spark, root, SCHEMA, num_buckets=2)
    for e in range(epochs):
        t.merge_upsert(
            spark.createDataFrame(
                [("d0", e + 1, f"v{e}", "upsert")],
                "doc_id string, seq long, val string, op string",
            ),
            epoch_id=e,
        )
    return t


def test_commit_stamps_present_and_monotone(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    snaps = t.snapshots()
    ats = [s["committed_at"] for s in snaps]
    assert all(a is not None for a in ats)
    assert ats == sorted(ats)


def test_as_of_time_pins_the_right_version(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    snaps = t.snapshots()
    for s in snaps:
        pinned = t.as_of_time(s["committed_at"])
        assert pinned.snapshot["version"] == s["version"]
    # between two commits -> the earlier one
    mid = (snaps[1]["committed_at"] + snaps[2]["committed_at"]) / 2
    assert t.as_of_time(mid).snapshot["version"] == snaps[1]["version"]
    # far future -> head
    assert (
        t.as_of_time(snaps[-1]["committed_at"] + 10**6).snapshot["version"]
        == t.snapshot["version"]
    )


def test_as_of_time_before_creation_raises(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    first = t.snapshots()[0]["committed_at"]
    with pytest.raises(ValueError, match="no retained snapshot"):
        t.as_of_time(first - 1000.0)


def test_age_floor_retains_young_history(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), epochs=5)
    n = len(t.snapshots())
    # keep_last=1 would normally drop everything but the head; a huge
    # age floor retains every (young) snapshot
    assert t.expire_snapshots(keep_last=1, older_than_s=10**6) == 0
    assert len(t.snapshots()) == n
    # age floor 0: everything outside the window is old enough
    removed = t.expire_snapshots(keep_last=2, older_than_s=0.0)
    assert removed == n - 2
    assert len(t.snapshots()) == 2
