"""Metadata-only column rename / drop (Iceberg field-ID semantics via a
schema log): `rename_column` / `drop_column` commit O(1) metadata, old
files keep their physical names and are served through a per-file
schema-generation (`sid`) name mapping, and a dropped-then-re-added
column never resurrects stale physical data.

Reference analog: hemera-indexer evolves PG columns with Alembic ALTER
TABLE; the lake form must stay correct under merge-on-read folds, time
travel, CDF, zone maps, and every maintenance rewrite."""

import os

import pytest
from pyspark.sql import functions as F, types as T

from hemera_indexer_spark.lake import LakeTable

STATE = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("val", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


def _mk_state(spark, root, epochs=3, docs=8):
    t = LakeTable.create(spark, root, STATE, num_buckets=2)
    for e in range(epochs):
        t.merge_upsert(
            spark.createDataFrame(
                [
                    (f"d{i}", e * 100 + i, f"v{e}-{i}", e * 10 + i, "upsert")
                    for i in range(docs)
                ],
                "doc_id string, seq long, val string, n long, op string",
            ),
            epoch_id=e,
        )
    return t


def _state_map(t, col):
    return {r["doc_id"]: r[col] for r in t.current_state().collect()}


def test_rename_is_metadata_only_and_reads_old_files(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    before_paths = sorted(f["path"] for f in t.snapshot["files"])
    want = _state_map(t, "val")
    t.rename_column("val", "body")
    assert sorted(f["path"] for f in t.snapshot["files"]) == before_paths
    assert "body" in t.schema.fieldNames()
    assert "val" not in t.schema.fieldNames()
    assert _state_map(t, "body") == want
    # legacy entries carry no sid stamp; generation bumped once
    assert all("sid" not in f for f in t.snapshot["files"])
    assert t.schema_id == 1


def test_merge_after_rename_folds_across_generations(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    t.rename_column("val", "body")
    # new writers speak the NEW name; fold must cross old+new files
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 900, "new-d0", 99, "upsert"),
             ("d9", 901, "new-d9", 77, "upsert")],
            "doc_id string, seq long, body string, n long, op string",
        ),
        epoch_id=10,
    )
    got = _state_map(t, "body")
    assert got["d0"] == "new-d0" and got["d9"] == "new-d9"
    assert got["d1"] == "v2-1"  # old physical name still serves
    # new files are stamped with the current generation
    sids = {f.get("sid", 0) for f in t.snapshot["files"]}
    assert sids == {0, 1}


def test_time_travel_serves_the_old_name(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    v = t.snapshot["version"]
    want = _state_map(t, "val")
    t.rename_column("val", "body")
    old = t.as_of(v)
    assert "val" in old.schema.fieldNames()
    assert {r["doc_id"]: r["val"] for r in old.current_state().collect()} == want


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    t.drop_column("val")
    assert "val" not in t.schema.fieldNames()
    assert "val" not in t.current_state().columns
    # re-add the SAME name: pre-drop physical bytes must read as NULL
    t.evolve_schema([T.StructField("val", T.StringType(), True)])
    vals = _state_map(t, "val")
    assert all(v is None for v in vals.values())
    # and a post-re-add write is visible while old rows stay NULL
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 900, "fresh", 1, "upsert")],
            "doc_id string, seq long, val string, n long, op string",
        ),
        epoch_id=10,
    )
    vals = _state_map(t, "val")
    assert vals["d0"] == "fresh"
    assert vals["d1"] is None


def test_rename_to_previously_dropped_name(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    want_n = _state_map(t, "n")
    t.drop_column("val")
    t.rename_column("n", "val")  # new name collides with DROPPED physical
    got = _state_map(t, "val")
    assert got == want_n  # serves the old 'n' bytes, never the old 'val'


def test_refusals(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    for bad in ("doc_id", "seq", "is_deleted"):
        with pytest.raises(ValueError, match="control column"):
            t.rename_column(bad, "x")
        with pytest.raises(ValueError, match="control column"):
            t.drop_column(bad)
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("val", "n")
    with pytest.raises(ValueError, match="invalid column name"):
        t.rename_column("val", "bad name!")
    with pytest.raises(ValueError, match="no column"):
        t.drop_column("nope")


def test_check_constraint_reference_refused(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    t.set_check("n_nonneg", "n >= 0")
    with pytest.raises(ValueError, match="CHECK"):
        t.rename_column("n", "count")
    with pytest.raises(ValueError, match="CHECK"):
        t.drop_column("n")
    t.drop_check("n_nonneg")
    t.rename_column("n", "count")
    assert "count" in t.schema.fieldNames()


def test_branch_handles_refused(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    t.create_branch("audit")
    b = t.branch("audit")
    with pytest.raises(ValueError, match="main-table verb"):
        b.rename_column("val", "body")
    with pytest.raises(ValueError, match="main-table verb"):
        b.drop_column("val")


FACT = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("src", T.StringType()),
    ]
)


def _mk_fact(spark, root, epochs=5):
    t = LakeTable.create(
        spark,
        root,
        FACT,
        num_buckets=2,
        properties={"table_type": "fact"},
        stats_cols=("ts",),
    )
    for e in range(epochs):
        t.insert_if_absent(
            spark.createDataFrame(
                [
                    (f"d{e}-{i}", e * 100 + i, e * 1000 + i, f"s{e}")
                    for i in range(20)
                ],
                "doc_id string, seq long, ts long, src string",
            ),
            epoch_id=e,
        )
    return t


def test_zone_map_pruning_survives_rename(spark, tmp_path):
    t = _mk_fact(spark, str(tmp_path / "f"))
    t.rename_column("ts", "event_ts")
    assert t.stats_cols == ("event_ts",)
    # old entries keep stats under the PHYSICAL name 'ts'; pruning on the
    # logical name must still skip disjoint old files
    lo, hi = 2000, 2999
    kept = t._select_files(ranges={"event_ts": (lo, hi)})
    assert 0 < len(kept) < len(t._select_files())
    rows = sorted(
        (r["doc_id"], r["event_ts"])
        for r in t.read(ranges={"event_ts": (lo, hi)})
        .where(f"event_ts BETWEEN {lo} AND {hi}")
        .collect()
    )
    assert len(rows) == 20 and all(lo <= x <= hi for _, x in rows)
    # post-rename writes record stats under the NEW physical name and prune
    t.insert_if_absent(
        spark.createDataFrame(
            [(f"z{i}", 900 + i, 9000 + i, "s9") for i in range(5)],
            "doc_id string, seq long, event_ts long, src string",
        ),
        epoch_id=9,
    )
    kept2 = t._select_files(ranges={"event_ts": (9000, 9999)})
    assert all((f.get("sid", 0) == 1) for f in kept2)


def test_compact_migrates_history_to_current_names(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    t.rename_column("val", "body")
    want = _state_map(t, "body")
    assert t.compact()
    t.refresh()
    # every rewritten live file is at the head generation
    assert {f.get("sid", 0) for f in t.snapshot["files"]} == {1}
    assert _state_map(t, "body") == want
    # physical parquet of compacted files carries the NEW name
    import pyarrow.parquet as pq

    p = os.path.join(t.root, t.snapshot["files"][0]["path"])
    assert "body" in pq.read_metadata(p).schema.to_arrow_schema().names


def test_changes_since_presents_current_names(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    v = t.snapshot["version"]
    t.rename_column("val", "body")
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 900, "after", 5, "upsert"),
             ("d1", 901, None, 6, "delete")],
            "doc_id string, seq long, body string, n long, op string",
        ),
        epoch_id=10,
    )
    ch = {r["doc_id"]: r for r in t.changes_since(v).collect()}
    assert "body" in t.changes_since(v).columns
    assert ch["d0"]["change_op"] == "update" and ch["d0"]["body"] == "after"
    assert ch["d1"]["change_op"] == "delete" and ch["d1"]["body"] == "v2-1"


def test_changes_since_diverged_log_raises(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    v_pre = t.snapshot["version"]
    t.rename_column("val", "body")
    t.rollback_to(v_pre)
    t.drop_column("n")  # DIFFERENT op at the same sid slot: logs diverge
    with pytest.raises(ValueError, match="schema log diverged"):
        t.changes_since(v_pre + 1)  # the rename snapshot
    # a full read is the documented rebase path and stays healthy
    assert "n" not in t.current_state().columns


def test_clone_preserves_mapping(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    t.rename_column("val", "body")
    want = _state_map(t, "body")
    c = t.clone_to(str(tmp_path / "clone"))
    assert _state_map(c, "body") == want
    # and the clone keeps evolving independently
    c.rename_column("body", "text")
    assert _state_map(c, "text") == want
    assert _state_map(t, "body") == want


def test_delete_where_rewrites_renamed_history(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    t.rename_column("n", "count")
    assert t.delete_where(F.col("count") % 2 == 1)
    got = _state_map(t, "count")
    assert got and all(v % 2 == 0 for v in got.values())


def test_old_writer_names_map_into_renamed_column(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    t.rename_column("val", "body")
    # a writer that never heard about the rename keeps sending `val`
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 900, "stale-name-write", 1, "upsert")],
            "doc_id string, seq long, val string, n long, op string",
        ),
        epoch_id=10,
    )
    assert _state_map(t, "body")["d0"] == "stale-name-write"
    assert "val" not in t.schema.fieldNames()


def test_writer_sending_both_names_new_wins(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    t.rename_column("val", "body")
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 900, "old-name", "new-name", 2, "upsert")],
            "doc_id string, seq long, val string, body string, n long, "
            "op string",
        ),
        epoch_id=10,
    )
    assert _state_map(t, "body")["d0"] == "new-name"


def test_dropped_column_writes_are_discarded(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    t.drop_column("val")
    # old writer still sends `val`: discarded, not resurrected, no error
    t.merge_upsert(
        spark.createDataFrame(
            [("d0", 900, "ghost", 3, "upsert")],
            "doc_id string, seq long, val string, n long, op string",
        ),
        epoch_id=10,
    )
    assert "val" not in t.current_state().columns
    assert _state_map(t, "n")["d0"] == 3


def test_controller_ingest_through_mid_stream_rename(spark, tmp_path):
    """The CDC loop survives an operator renaming a payload column while
    the feed keeps speaking the OLD name: ingest half the log, rename,
    resume — final state must equal the oracle with every event's value
    landed in the renamed column, and the controller must NOT re-ADD the
    old name via additive evolution."""
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
    from hemera_indexer_spark.streaming import StreamController
    from hemera_indexer_spark.oracle import expected_live_rows

    log = str(tmp_path / "log")
    generate_changelog(
        log,
        ChangelogSpec(
            n_docs=80,
            n_epochs=4,
            events_per_epoch=120,
            n_partitions=2,
            seed=7,
            schema_evolution_epoch=2,
            rollback_epochs=(3,),
        ),
    )
    t = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    StreamController(spark, t, log, 2).run(max_epochs=2)
    t.refresh()
    t.rename_column("source", "origin")
    StreamController(spark, t, log, 2).run()
    t.refresh()
    exp = expected_live_rows(log, 2)
    got = sorted(
        (r.asDict(recursive=True) for r in t.current_state().collect()),
        key=lambda d: d["doc_id"],
    )
    assert len(got) == len(exp)
    assert all(g["tokens"] == e["tokens"] for g, e in zip(got, exp))
    assert all(g["origin"] == e["source"] for g, e in zip(got, exp))
    assert "source" not in t.schema.fieldNames()
    assert "lang" in t.schema.fieldNames()


def test_fact_changes_since_across_rename(spark, tmp_path):
    """Fact-table changes_since diffs resolved old vs new snapshots; the
    old side serves ITS generation's names and must be remapped onto the
    current ones — otherwise a renamed column reads NULL on the old side
    and every old row reports as changed."""
    t = _mk_fact(spark, str(tmp_path / "f"), epochs=2)
    v = t.snapshot["version"]
    t.rename_column("ts", "event_ts")
    t.insert_if_absent(
        spark.createDataFrame(
            [(f"n{i}", 500 + i, 5000 + i, "s5") for i in range(3)],
            "doc_id string, seq long, event_ts long, src string",
        ),
        epoch_id=5,
    )
    ch = t.changes_since(v).collect()
    ops = {r["change_op"] for r in ch}
    assert ops == {"insert"}  # pre-rename rows are NOT spuriously changed
    assert len(ch) == 3
    assert all(r["event_ts"] >= 5000 for r in ch)


def test_secondary_index_follows_source_rename(spark, tmp_path):
    """A derived index configured by source column NAME keeps syncing
    after the source renames that column (the feed-side name resolves
    through the source's schema log; the index's own column name stays
    stable), and a source DROP raises the rebuild-me error instead of
    silently corrupting the index."""
    from hemera_indexer_spark.operators.secondary_index import SecondaryIndex

    src_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    src = LakeTable.create(
        spark, str(tmp_path / "src"), src_schema, num_buckets=4,
        key_col="doc_id", seq_col="seq",
    )
    src.merge_upsert(
        spark.createDataFrame(
            [(i, i, 100 + i, "upsert") for i in range(20)],
            "doc_id long, seq long, n_chars long, op string",
        ),
        epoch_id=0,
    )
    idx = SecondaryIndex.build_from_table(
        spark, str(tmp_path / "idx"), src, "n_chars", num_buckets=4
    )
    src.rename_column("n_chars", "char_count")
    src.merge_upsert(
        spark.createDataFrame(
            [(1, 1000, 500, "upsert"), (50, 1001, 501, "upsert")],
            "doc_id long, seq long, char_count long, op string",
        ),
        epoch_id=1,
    )
    assert idx.update_from_changes(src)
    got = {tuple(r) for r in idx.lookup(500, 501).collect()}
    want = {
        (r["doc_id"], r["char_count"])
        for r in src.current_state()
        .where(F.col("char_count").between(500, 501))
        .collect()
    }
    # index serves its OWN stable column name; values must match
    assert {g[0] for g in got} == {w[0] for w in want} == {1, 50}
    assert {g[1] for g in got} == {500, 501}
    # a source DROP of the indexed column raises the rebuild-me error
    src.drop_column("char_count")
    src.merge_upsert(
        spark.createDataFrame(
            [(2, 2000, "upsert")], "doc_id long, seq long, op string"
        ),
        epoch_id=2,
    )
    with pytest.raises(ValueError, match="no longer exists"):
        idx.update_from_changes(src)


def test_signature_index_follows_source_rename(spark, tmp_path):
    from hemera_indexer_spark.operators.dedup_index import SignatureIndex

    src_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("text", T.StringType()),
        ]
    )
    src = LakeTable.create(
        spark, str(tmp_path / "src"), src_schema, num_buckets=4,
        key_col="doc_id", seq_col="seq",
    )
    src.merge_upsert(
        spark.createDataFrame(
            [(i, i, f"the quick brown fox jumps over dog {i}", "upsert")
             for i in range(8)],
            "doc_id long, seq long, text string, op string",
        ),
        epoch_id=0,
    )
    idx = SignatureIndex.build_from_table(
        spark, str(tmp_path / "sig"), src, text_col="text",
        id_col="doc_id", num_buckets=4,
    )
    src.rename_column("text", "body")
    src.merge_upsert(
        spark.createDataFrame(
            [(100, 1000, "the quick brown fox jumps over dog 0", "upsert")],
            "doc_id long, seq long, body string, op string",
        ),
        epoch_id=1,
    )
    # sync still configured with the OLD name resolves through the log
    assert idx.update_from_changes(src)
    assert idx.synced_version() == src.snapshot["version"]


def test_purge_keys_on_renamed_table(spark, tmp_path):
    t = _mk_state(spark, str(tmp_path / "t"))
    t.rename_column("val", "body")
    rep = t.purge_keys(["d0"])
    assert rep
    assert "d0" not in _state_map(t, "body")
    assert _state_map(t, "body")["d1"] == "v2-1"
