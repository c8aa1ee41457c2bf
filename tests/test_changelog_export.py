"""ChangelogExportSink: Debezium-shaped egress. Laws: envelope replay
reconstructs the table state (through rollbacks and schema evolution),
update envelopes carry both images, re-driven groups are idempotent
(same dirs, cursor stable), and the epoch fence participates in the
committed floor."""

import os

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
from hemera_indexer_spark.streaming import StreamController
from hemera_indexer_spark.streaming.sinks import ChangelogExportSink


def _chg_dirs(out):
    return sorted(d for d in os.listdir(out) if d.startswith("chg_v"))


def _replay(spark, out):
    """Fold the exported envelopes in version order into {key: after}."""
    state = {}
    for d in _chg_dirs(out):
        rows = spark.read.parquet(os.path.join(out, d)).collect()
        for r in sorted(rows, key=lambda r: r["version_to"]):
            if r["op"] == "d":
                state.pop(r["doc_id"], None)
            else:
                state[r["doc_id"]] = r["after"].asDict()
    return state


def test_envelope_replay_reconstructs_state(spark, tiny_log, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    out = str(tmp_path / "export")
    sink = ChangelogExportSink(table, out)
    StreamController(
        spark, table, tiny_log.out_dir, 4, sinks=[sink], max_batch_epochs=2
    ).run()

    assert _chg_dirs(out), "no envelopes exported"
    replayed = _replay(spark, out)
    live = {
        r["doc_id"]: r.asDict()
        for r in table.current_state().collect()
    }
    assert set(replayed) == set(live)
    for k, row in live.items():
        assert replayed[k]["tokens"] == row["tokens"], k
        # evolved column: envelopes written before the evolution epoch
        # have no 'lang' key — both spellings mean NULL
        assert replayed[k].get("lang") == row["lang"], k


def test_update_envelopes_carry_both_images(spark, tiny_log, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    out = str(tmp_path / "export")
    sink = ChangelogExportSink(table, out)
    StreamController(
        spark, table, tiny_log.out_dir, 4, sinks=[sink], max_batch_epochs=2
    ).run()
    ups = sink.feed().where("op = 'u'").collect()
    assert ups, "expected update envelopes across groups"
    for r in ups:
        assert r["before"] is not None and r["after"] is not None
        assert r["before"] != r["after"]
    cs = sink.feed().where("op = 'c'").collect()
    assert cs and all(r["before"] is None for r in cs)


def test_redrive_is_idempotent_and_fence_advances(spark, tiny_log, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    out = str(tmp_path / "export")
    sink = ChangelogExportSink(table, out)
    StreamController(
        spark, table, tiny_log.out_dir, 4, sinks=[sink], max_batch_epochs=2
    ).run()
    dirs1 = _chg_dirs(out)
    cur1 = sink._load_cursor()
    assert sink.committed_epoch() == cur1["epoch"] >= 0

    # fenced re-run: no new envelope dirs, cursor version unchanged
    StreamController(
        spark, table, tiny_log.out_dir, 4,
        sinks=[ChangelogExportSink(table, out)], max_batch_epochs=2,
    ).run()
    assert _chg_dirs(out) == dirs1
    assert sink._load_cursor()["version"] == cur1["version"]


def test_attach_time_vs_backfill_initial_version(spark, tiny_log, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    StreamController(spark, table, tiny_log.out_dir, 4).run()
    n_live = table.current_state().count()

    # attach-time: nothing to export (cursor starts at current version)
    out_a = str(tmp_path / "attach")
    sink_a = ChangelogExportSink(table, out_a)
    assert sink_a.sync(epoch=99) is False
    assert not _chg_dirs(out_a)

    # backfill: initial_version=0 exports the whole state as 'c'
    out_b = str(tmp_path / "backfill")
    sink_b = ChangelogExportSink(table, out_b, initial_version=0)
    assert sink_b.sync(epoch=99) is True
    feed = sink_b.feed()
    assert feed.count() == n_live
    assert feed.where("op <> 'c'").count() == 0


def test_structured_ingest_streaming_parity(spark, tmp_path):
    """Streaming parity: StructuredIngest drives the export sink through
    its after_commit hook; the replayed envelope state equals the live
    table, and a drained-checkpoint restart exports nothing new."""
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )
    from hemera_indexer_spark.streaming.structured import StructuredIngest

    spec = ChangelogSpec(
        n_docs=200, n_epochs=5, events_per_epoch=300,
        n_partitions=4, seed=11, schema_evolution_epoch=None,
        rollback_epochs=(3,),
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(log_dir, spec)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    out = str(tmp_path / "export")
    sink = ChangelogExportSink(table, out)
    ingest = StructuredIngest(
        spark, table, log_dir, spec.n_partitions,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=6,
        index_sink=sink,
    )
    q = ingest.start(available_now=True)
    q.awaitTermination(300)

    replayed = _replay(spark, out)
    live = {r["doc_id"]: r.asDict() for r in table.current_state().collect()}
    assert set(replayed) == set(live)
    assert all(replayed[k]["tokens"] == live[k]["tokens"] for k in live)

    dirs1 = _chg_dirs(out)
    q2 = ingest.start(available_now=True)
    q2.awaitTermination(120)
    assert _chg_dirs(out) == dirs1
