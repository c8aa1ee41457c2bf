"""LakeMirror: changelog APPLY (the ingress half of the WAL loop).

Laws: (1) replica state == source state after sync — through duplicates,
rollback retractions and mid-stream schema evolution; (2) sync is
incremental (only new envelope directories apply) and re-drives are
fenced no-ops; (3) the replica orders on version_to, so a source
ROLLBACK-restored old value (lower payload seq) still wins on the
replica; (4) a hole in the envelope chain raises instead of silently
skipping changes."""

import os
import shutil

import pytest
from pyspark.sql import functions as F, types as T

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
from hemera_indexer_spark.streaming import StreamController
from hemera_indexer_spark.streaming.mirror import (
    FeedGapError,
    LakeMirror,
    MIRROR_SEQ_COL,
)
from hemera_indexer_spark.streaming.sinks import ChangelogExportSink


def _assert_same_state(source: LakeTable, mirror: LakeMirror):
    src = source.current_state()
    rep = mirror.state()
    assert sorted(rep.columns) == sorted(src.columns)
    rep = rep.select(*src.columns)
    assert src.exceptAll(rep).count() == 0
    assert rep.exceptAll(src).count() == 0


def _tiny_state_schema():
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("val", T.StringType()),
        ]
    )


def _upd(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, seq long, op string, val string"
    )


def test_mirror_replicates_controller_run(spark, tiny_log, tmp_path):
    # Full loop: changelog -> StreamController -> lake -> envelope feed
    # -> LakeMirror -> replica. The tiny log carries duplicates, a
    # rollback (epoch 6) and schema evolution (epoch 5), so equality here
    # proves the mirror through all three.
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    feed = str(tmp_path / "export")
    sink = ChangelogExportSink(table, feed)
    StreamController(
        spark, table, tiny_log.out_dir, 4, sinks=[sink], max_batch_epochs=2
    ).run()
    assert len([d for d in os.listdir(feed) if d.startswith("chg_v")]) > 1

    m = LakeMirror(spark, feed, str(tmp_path / "replica"))
    applied = m.sync()
    assert applied > 1  # multi-directory chain, not one big batch
    _assert_same_state(table, m)
    # evolved column rode the feed
    assert "lang" in m.dest.schema.fieldNames()


def test_mirror_sync_incremental_and_redrive_fenced(spark, tmp_path):
    src = LakeTable.create(
        spark, str(tmp_path / "src"), _tiny_state_schema(),
        num_buckets=4, key_col="doc_id", seq_col="seq",
    )
    feed = str(tmp_path / "feed")
    sink = ChangelogExportSink(src, feed)
    src.merge_upsert(_upd(spark, [(1, 10, "update", "a"), (2, 11, "update", "b")]))
    sink.sync(epoch=0)
    m = LakeMirror(spark, feed, str(tmp_path / "replica"))
    assert m.sync() == 1
    v_after_first = m.dest.snapshot["version"]
    # nothing new -> no-op, no commit
    assert m.sync() == 0
    assert m.dest.snapshot["version"] == v_after_first

    src.merge_upsert(_upd(spark, [(1, 20, "update", "a2"), (2, 21, "delete", None)]))
    sink.sync(epoch=1)
    assert m.sync() == 1  # only the NEW directory
    _assert_same_state(src, m)
    assert m.state().where("doc_id = 2").count() == 0  # delete applied

    # re-driving an already-applied directory is fenced to a no-op
    v = m.dest.snapshot["version"]
    v_from, v_to, path = sorted(
        (int(d[5:].split("_")[0]), int(d[5:].split("_")[1]),
         os.path.join(feed, d))
        for d in os.listdir(feed) if d.startswith("chg_v")
    )[-1]
    m._apply_dir(path, v_to)
    assert m.dest.snapshot["version"] == v


def test_mirror_rollback_retraction_beats_payload_seq(spark, tmp_path):
    # A source rollback_to restores an OLD image whose payload seq is
    # LOWER than what the replica already applied. The replica must take
    # it anyway — version_to (not payload seq) is the replica seq domain.
    src = LakeTable.create(
        spark, str(tmp_path / "src"), _tiny_state_schema(),
        num_buckets=4, key_col="doc_id", seq_col="seq",
    )
    feed = str(tmp_path / "feed")
    sink = ChangelogExportSink(src, feed)
    src.merge_upsert(_upd(spark, [(7, 10, "update", "old")]))
    sink.sync(epoch=0)
    restore_v = src.snapshot["version"]
    src.merge_upsert(_upd(spark, [(7, 99, "update", "new")]))
    sink.sync(epoch=1)
    m = LakeMirror(spark, feed, str(tmp_path / "replica"))
    m.sync()
    assert m.state().collect()[0]["val"] == "new"

    src.rollback_to(restore_v)
    sink.sync(epoch=2)
    m.sync()
    row = m.state().collect()[0]
    assert row["val"] == "old" and row["seq"] == 10
    _assert_same_state(src, m)


def test_mirror_gap_raises(spark, tmp_path):
    src = LakeTable.create(
        spark, str(tmp_path / "src"), _tiny_state_schema(),
        num_buckets=4, key_col="doc_id", seq_col="seq",
    )
    feed = str(tmp_path / "feed")
    sink = ChangelogExportSink(src, feed)
    for i in range(3):
        src.merge_upsert(_upd(spark, [(1, 10 + i, "update", f"v{i}")]))
        sink.sync(epoch=i)
    dirs = sorted(d for d in os.listdir(feed) if d.startswith("chg_v"))
    assert len(dirs) == 3
    shutil.rmtree(os.path.join(feed, dirs[1]))  # hole in the chain
    m = LakeMirror(spark, feed, str(tmp_path / "replica"))
    with pytest.raises(FeedGapError, match="chain break"):
        m.sync()


def test_mirror_state_shape_matches_source(spark, tmp_path):
    src = LakeTable.create(
        spark, str(tmp_path / "src"), _tiny_state_schema(),
        num_buckets=4, key_col="doc_id", seq_col="seq",
    )
    feed = str(tmp_path / "feed")
    sink = ChangelogExportSink(src, feed)
    src.merge_upsert(_upd(spark, [(3, 5, "update", "x")]))
    sink.sync(epoch=0)
    m = LakeMirror(spark, feed, str(tmp_path / "replica"))
    m.sync()
    # bookkeeping column hidden from the user-facing view, present inside
    assert MIRROR_SEQ_COL not in m.state().columns
    assert MIRROR_SEQ_COL in m.dest.schema.fieldNames()
    # replica cursor lives in the source-version domain
    assert m.applied_version == src.snapshot["version"]


def _replica_disk_vals(root, key_val):
    """Every stored 'val' for a key across ALL replica parquet files —
    the ground truth a propagated purge must empty."""
    import glob

    import pyarrow.parquet as pq

    out = []
    for p in glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                       recursive=True):
        t = pq.read_table(p)
        if "doc_id" not in t.column_names or "val" not in t.column_names:
            continue
        for row in t.to_pylist():
            if row["doc_id"] == key_val:
                out.append(row["val"])
    return out


def test_mirror_purge_propagates_physical_forget(spark, tmp_path):
    # RTBF through the replication chain: source purge_keys ->
    # exporter apply_purge (keys-only purge directory, NO images) ->
    # mirror runs a REAL purge_keys on the replica. After the sync the
    # purged payload exists in no retained replica file, and a later
    # re-insert of the key in the source still wins on the replica
    # (the widened seq domain: purge tombstone at the odd slot).
    src = LakeTable.create(
        spark, str(tmp_path / "src"), _tiny_state_schema(),
        num_buckets=4, key_col="doc_id", seq_col="seq",
    )
    feed = str(tmp_path / "feed")
    replica_root = str(tmp_path / "replica")
    sink = ChangelogExportSink(src, feed)
    src.merge_upsert(_upd(spark, [(1, 10, "update", "secret"),
                                  (2, 11, "update", "keep")]))
    sink.sync(epoch=0)
    m = LakeMirror(spark, feed, replica_root)
    m.sync()
    assert _replica_disk_vals(replica_root, 1) == ["secret"]

    src.purge_keys([1])
    assert sink.apply_purge([1])
    # purge dir carries NO payload images (RTBF feeds must not
    # re-export what they delete)
    pdirs = sorted(d for d in os.listdir(feed) if d.startswith("chg_v"))
    prows = spark.read.parquet(os.path.join(feed, pdirs[-1])).collect()
    assert all(r["purge"] and r["after"] is None and r["before"] is None
               for r in prows)
    assert m.sync() == 1
    vals = _replica_disk_vals(replica_root, 1)
    assert vals and all(v is None for v in vals)  # tombstone skeleton only
    assert {r["doc_id"] for r in m.state().collect()} == {2}
    _assert_same_state(src, m)

    # re-insert after the purge: 2*v_next beats the replica purge
    # tombstone's odd slot (would TIE and lose in an unwidened domain)
    src.merge_upsert(_upd(spark, [(1, 999, "update", "reborn")]))
    sink.sync(epoch=1)
    m.sync()
    got = {r["doc_id"]: r["val"] for r in m.state().collect()}
    assert got == {1: "reborn", 2: "keep"}
    _assert_same_state(src, m)


@pytest.mark.parametrize("seed", [11, 23])
def test_mirror_walk_matches_source(spark, tmp_path, seed):
    # Seeded interleaving of every source verb the feed must survive:
    # merges (upserts + deletes), compaction and rebucketing (NET-empty
    # envelope dirs), retention at keep_last=1 (legal only because the
    # per-step sync keeps the cursor at the head), snapshot restore
    # (retraction envelopes), purge (apply_purge propagation) and bloom
    # retunes (properties-only commits). After every step the exporter
    # syncs and the replica must equal the source exactly.
    import random

    rng = random.Random(seed)
    src = LakeTable.create(
        spark, str(tmp_path / "src"), _tiny_state_schema(),
        num_buckets=4, key_col="doc_id", seq_col="seq",
    )
    feed = str(tmp_path / "feed")
    sink = ChangelogExportSink(src, feed)
    m = LakeMirror(spark, feed, str(tmp_path / "replica"))
    seq = 0
    ops = []

    def merge_batch():
        nonlocal seq
        rows = []
        for _ in range(rng.randint(1, 6)):
            k = rng.randrange(12)
            seq += 1
            if rng.random() < 0.25:
                rows.append((k, seq, "delete", None))
            else:
                rows.append((k, seq, "update", f"v{seq}"))
        src.merge_upsert(
            spark.createDataFrame(
                rows, "doc_id long, seq long, op string, val string"
            )
        )

    merge_batch()
    # cursor to head BEFORE any maintenance can expire the seed commit —
    # the documented retention discipline: keep_last must retain at least
    # the exporter's lag, and an every-step sync keeps the lag at zero
    sink.sync(epoch=0)
    m.sync()
    for step in range(12):
        r = rng.random()
        purged = None
        if r < 0.45:
            op = "merge"
            merge_batch()
        elif r < 0.60:
            op = "compact"
            src.compact()
        elif r < 0.70:
            op = "rebucket"
            if src.num_buckets < 16:
                src.rebucket(src.num_buckets * 2)
        elif r < 0.78:
            op = "retention"
            src.expire_snapshots(keep_last=1)
            src.vacuum_orphans()
        elif r < 0.86:
            op = "rollback"
            vs = sorted(s["version"] for s in src.snapshots())
            if len(vs) > 1:
                src.rollback_to(rng.choice(vs[:-1]))
        elif r < 0.94:
            op = "purge"
            live = sorted(
                r2["doc_id"] for r2 in src.current_state().collect()
            )
            if live:
                purged = rng.choice(live)
                src.purge_keys([purged])
        else:
            op = "bloom"
            src.set_bloom(rng.choice([0, 512]), hashes=2)
        ops.append(op)
        if purged is not None:
            sink.apply_purge([purged])
        else:
            sink.sync(epoch=step + 1)
        m.sync()
        _assert_same_state(src, m)
    assert {"merge"} < set(ops), ops


def test_export_sink_refuses_fact_tables(spark, tmp_path):
    # The envelope shape and the mirror's per-key LWW fold assume state
    # semantics; a fact table (no per-key uniqueness) would silently
    # collapse history. Loud at construction, not at first sync.
    fact = LakeTable.create(
        spark, str(tmp_path / "fact"), _tiny_state_schema(),
        num_buckets=4, key_col="doc_id", seq_col="seq",
        properties={"table_type": "fact"},
    )
    with pytest.raises(ValueError, match="STATE tables only"):
        ChangelogExportSink(fact, str(tmp_path / "feed"))


def test_mirror_refuses_non_replica_dest(spark, tmp_path):
    # A pre-existing table at dest_root that was NOT created by the mirror
    # folds on its own seq column (_src_version absent) — deletes carry a
    # NULL after-image seq and would silently lose the LWW fold. The
    # mirror must refuse at construction, before any envelope applies.
    src = LakeTable.create(
        spark, str(tmp_path / "src"), _tiny_state_schema(),
        num_buckets=4, key_col="doc_id", seq_col="seq",
    )
    feed = str(tmp_path / "feed")
    sink = ChangelogExportSink(src, feed)
    src.merge_upsert(_upd(spark, [(1, 5, "update", "x")]))
    sink.sync(epoch=0)
    # an ordinary state table already lives where the replica should go
    LakeTable.create(
        spark, str(tmp_path / "replica"), _tiny_state_schema(),
        num_buckets=4, key_col="doc_id", seq_col="seq",
    )
    with pytest.raises(ValueError, match="not a mirror replica"):
        LakeMirror(spark, feed, str(tmp_path / "replica"))


def test_mirror_propagates_rename_and_drop(spark, tmp_path):
    """Law (5): source rename_column/drop_column propagate through the
    feed. Envelope images carry head-time names, so each directory ships
    the source's schema log (`_schema_log.json` sidecar) and the mirror
    replays unapplied renames/drops onto the replica BEFORE merging —
    otherwise additive evolution would re-ADD a renamed column and the
    replica would silently fork from the source."""
    src = LakeTable.create(
        spark, str(tmp_path / "src"), _tiny_state_schema(),
        num_buckets=4, key_col="doc_id", seq_col="seq",
    )
    feed = str(tmp_path / "feed")
    sink = ChangelogExportSink(src, feed)
    src.merge_upsert(_upd(spark, [(1, 10, "update", "a"), (2, 11, "update", "b")]))
    sink.sync(epoch=0)
    m = LakeMirror(spark, feed, str(tmp_path / "replica"))
    m.sync()
    _assert_same_state(src, m)

    # rename mid-feed; post-rename envelopes speak the NEW name
    src.rename_column("val", "body")
    src.merge_upsert(
        spark.createDataFrame(
            [(1, 20, "update", "a2"), (3, 21, "update", "c")],
            "doc_id long, seq long, op string, body string",
        )
    )
    sink.sync(epoch=1)
    assert m.sync() == 1
    assert "body" in m.dest.schema.fieldNames()
    assert "val" not in m.dest.schema.fieldNames()
    _assert_same_state(src, m)
    # the pre-rename replica row reads through the replica's own mapping
    assert m.state().where("doc_id = 2").collect()[0]["body"] == "b"

    # drop propagates too, and a re-add arrives as a FRESH column
    src.drop_column("body")
    src.merge_upsert(
        spark.createDataFrame(
            [(4, 30, "update")], "doc_id long, seq long, op string"
        )
    )
    sink.sync(epoch=2)
    m.sync()
    assert "body" not in m.dest.schema.fieldNames()
    _assert_same_state(src, m)
    src.evolve_schema([T.StructField("body", T.StringType(), True)])
    src.merge_upsert(
        spark.createDataFrame(
            [(5, 40, "update", "fresh")],
            "doc_id long, seq long, op string, body string",
        )
    )
    sink.sync(epoch=3)
    m.sync()
    _assert_same_state(src, m)
    got = {r["doc_id"]: r["body"] for r in m.state().collect()}
    assert got[5] == "fresh"
    assert got[1] is None  # dropped history never resurrects on the replica

    # a FROM-SCRATCH replay of the whole feed converges through every
    # historical schema change (each dir carries its own log prefix)
    m2 = LakeMirror(spark, feed, str(tmp_path / "replica2"))
    m2.sync()
    _assert_same_state(src, m2)


def test_mirror_schema_replay_fenced_by_sid(spark, tmp_path):
    """Regression: schema-log replay must be fenced by the source sid
    watermark, not inferred from column presence. Two histories break
    presence inference, both only AFTER the sync that re-adds a name:

    1. drop-then-re-add of the same column: the stale drop entry (still
       in every later sidecar) would re-drop the re-added replica column
       on the NEXT sync, NULL-filling its whole replica history;
    2. rename-then-re-add of the OLD name: the stale rename entry would
       see both names present and refuse with 'recreate the replica'.
    """
    src = LakeTable.create(
        spark, str(tmp_path / "src"), _tiny_state_schema(),
        num_buckets=4, key_col="doc_id", seq_col="seq",
    )
    feed = str(tmp_path / "feed")
    sink = ChangelogExportSink(src, feed)
    src.merge_upsert(_upd(spark, [(1, 10, "update", "a")]))
    sink.sync(epoch=0)
    m = LakeMirror(spark, feed, str(tmp_path / "replica"))
    m.sync()

    # --- case 1: drop then re-add 'val', then KEEP SYNCING ---
    src.drop_column("val")
    src.evolve_schema([T.StructField("val", T.StringType(), True)])
    src.merge_upsert(
        spark.createDataFrame(
            [(2, 20, "update", "fresh")],
            "doc_id long, seq long, op string, val string",
        )
    )
    sink.sync(epoch=1)
    m.sync()
    got = {r["doc_id"]: r["val"] for r in m.state().collect()}
    assert got[2] == "fresh"
    # the sync AFTER the re-add: the stale drop entry must stay fenced
    src.merge_upsert(
        spark.createDataFrame(
            [(3, 30, "update", "later")],
            "doc_id long, seq long, op string, val string",
        )
    )
    sink.sync(epoch=2)
    m.sync()
    got = {r["doc_id"]: r["val"] for r in m.state().collect()}
    assert got[2] == "fresh", "stale drop entry replayed — re-added column lost"
    assert got[3] == "later"
    _assert_same_state(src, m)

    # --- case 2: rename val->body, then re-add the OLD name 'val' ---
    src.rename_column("val", "body")
    src.evolve_schema([T.StructField("val", T.StringType(), True)])
    src.merge_upsert(
        spark.createDataFrame(
            [(4, 40, "update", "b4", "v4")],
            "doc_id long, seq long, op string, body string, val string",
        )
    )
    sink.sync(epoch=3)
    m.sync()  # old code: ValueError('recreate the replica from scratch')
    src.merge_upsert(
        spark.createDataFrame(
            [(5, 50, "update", "b5", "v5")],
            "doc_id long, seq long, op string, body string, val string",
        )
    )
    sink.sync(epoch=4)
    m.sync()
    _assert_same_state(src, m)
    got = {r["doc_id"]: (r["body"], r["val"]) for r in m.state().collect()}
    assert got[4] == ("b4", "v4")
    assert got[5] == ("b5", "v5")

    # from-scratch replay still converges (fresh replica, fresh fence)
    m2 = LakeMirror(spark, feed, str(tmp_path / "replica2"))
    m2.sync()
    _assert_same_state(src, m2)
