"""Per-epoch metrics journal (`StreamController(metrics_dir=)`): the
queryable face of RunStats. Laws pinned here:

- one journal row per PROCESSED epoch; fenced/skipped epochs journal
  nothing (a fenced re-run of the whole log adds zero rows);
- the journaled event counts equal both RunStats and the log's truth;
- resume across processes journals each epoch exactly once;
- a repair re-drive journals SECOND attempts (new state version in the
  metric_id) instead of deduping them away — the journal is a history of
  attempts, not a keyed state table.
"""

from pyspark.sql import functions as F

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
from hemera_indexer_spark.sources.generator import ChangelogSpec, generate_changelog
from hemera_indexer_spark.streaming import StreamController


def _setup(spark, tmp_path, name, **spec_kw):
    log = str(tmp_path / f"{name}-log")
    generate_changelog(
        log,
        ChangelogSpec(
            n_docs=60, n_epochs=6, events_per_epoch=120, n_partitions=2,
            **spec_kw,
        ),
    )
    t = LakeTable.create(
        spark, str(tmp_path / f"{name}-lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    return log, t, str(tmp_path / f"{name}-metrics")


def _journal(spark, mdir):
    return LakeTable.load(spark, mdir).read()


def test_journal_matches_runstats_and_fences(spark, tmp_path):
    log, t, mdir = _setup(spark, tmp_path, "m1")
    ctl = StreamController(spark, t, log, 2, metrics_dir=mdir)
    stats = ctl.run()
    j = _journal(spark, mdir)
    rows = {r["epoch"]: r for r in j.collect()}
    done = [e for e in stats.epochs if not e.skipped]
    assert sorted(rows) == sorted(e.epoch for e in done)
    for e in done:
        assert rows[e.epoch]["events"] == e.events
        assert rows[e.epoch]["strategy"] == e.strategy
        assert rows[e.epoch]["wall_ms"] >= 1
    assert stats.total_events == sum(r["events"] for r in rows.values())
    # fenced re-run: a fresh controller over the fully-committed log must
    # skip every epoch and journal nothing new
    n0 = j.count()
    again = StreamController(spark, t, log, 2, metrics_dir=mdir).run()
    assert all(e.skipped for e in again.epochs) or not again.epochs
    assert _journal(spark, mdir).count() == n0


def test_resume_journals_each_epoch_once(spark, tmp_path):
    log, t, mdir = _setup(spark, tmp_path, "m2")
    StreamController(spark, t, log, 2, metrics_dir=mdir).run(max_epochs=2)
    # fresh handles, as a restarted process would build them
    t2 = LakeTable.load(spark, t.root)
    StreamController(spark, t2, log, 2, metrics_dir=mdir).run()
    j = _journal(spark, mdir)
    per_epoch = (
        j.groupBy("epoch").agg(F.count("*").alias("n")).collect()
    )
    assert all(r["n"] == 1 for r in per_epoch)
    assert len(per_epoch) == 6


def test_repair_redrive_journals_second_attempts(spark, tmp_path):
    log, t, mdir = _setup(spark, tmp_path, "m3")
    ctl = StreamController(spark, t, log, 2, metrics_dir=mdir)
    ctl.run()
    first = {r["metric_id"] for r in _journal(spark, mdir).collect()}
    ctl.repair_range(3)
    j = _journal(spark, mdir).collect()
    ids = {r["metric_id"] for r in j}
    assert first < ids  # strictly grew: the re-drive journaled again
    # epochs >= 3 now carry (at least) two attempts, earlier ones still one
    attempts = {}
    for r in j:
        attempts[r["epoch"]] = attempts.get(r["epoch"], 0) + 1
    assert all(n >= 2 for e, n in attempts.items() if e >= 3)
    assert all(n == 1 for e, n in attempts.items() if e < 3)


def test_rollback_epoch_and_quarantine_columns(spark, tmp_path):
    log, t, mdir = _setup(
        spark, tmp_path, "m4", rollback_epochs=(3,)
    )
    StreamController(spark, t, log, 2, metrics_dir=mdir).run()
    rows = {r["epoch"]: r for r in _journal(spark, mdir).collect()}
    assert sum(r["rollbacks"] for r in rows.values()) >= 1
    assert all(r["tenant"] == "" for r in rows.values())
