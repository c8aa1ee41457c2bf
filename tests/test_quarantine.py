"""Dead-letter quarantine: malformed events are diverted, never merged.

The reference logs-and-skips items its exporters cannot convert rather than
poisoning the batch (postgres_item_exporter.py:104-118); here the analog is
a parquet dead-letter directory plus a footer-proof fast path that keeps the
clean-log cost at zero.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
from hemera_indexer_spark.sources.generator import (
    ChangelogSpec,
    generate_changelog,
)
from hemera_indexer_spark.streaming import StreamController

SPEC = dict(
    n_docs=200, n_epochs=4, events_per_epoch=300, n_partitions=2, seed=7
)

_EVENT_PA_SCHEMA = pa.schema(
    [
        pa.field("seq", pa.int64()),
        pa.field("epoch", pa.int64()),
        pa.field("partition", pa.int32()),
        pa.field("doc_id", pa.string()),
        pa.field("op", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
        pa.field("rollback_to_seq", pa.int64()),
    ]
)


def _inject(log_dir: str, epoch: int, rows: list[dict], name: str) -> None:
    """Write a foreign-writer parquet file into one epoch/partition dir."""
    part_dir = os.path.join(log_dir, f"epoch={epoch:05d}", "partition=000")
    cols = {
        f.name: pa.array([r.get(f.name) for r in rows], type=f.type)
        for f in _EVENT_PA_SCHEMA
    }
    pq.write_table(
        pa.table(cols, schema=_EVENT_PA_SCHEMA),
        os.path.join(part_dir, name),
    )


def _replay(spark, log_dir, root, **kw):
    table = LakeTable.create(spark, str(root), SEQUENCES_SCHEMA, num_buckets=4)
    stats = StreamController(spark, table, log_dir, 2, **kw).run()
    return table, stats


def _state_rows(table):
    return sorted(
        (
            r.asDict(recursive=True)
            for r in table.current_state().collect()
        ),
        key=lambda d: d["doc_id"],
    )


def test_quarantine_diverts_malformed_and_preserves_state(spark, tmp_path):
    clean = str(tmp_path / "log_clean")
    dirty = str(tmp_path / "log_dirty")
    generate_changelog(clean, ChangelogSpec(**SPEC))
    generate_changelog(dirty, ChangelogSpec(**SPEC))
    bad = [
        # null LWW key
        {"seq": 900001, "epoch": 2, "partition": 0, "doc_id": None,
         "op": "update", "n_tok": 3},
        # null seq (ordering/fencing undefined)
        {"seq": None, "epoch": 2, "partition": 0, "doc_id": "doc-000x",
         "op": "insert", "n_tok": 1},
        # rollback with no target
        {"seq": 900002, "epoch": 2, "partition": 0, "doc_id": "doc-000y",
         "op": "rollback", "rollback_to_seq": None},
    ]
    _inject(dirty, 2, bad, "foreign-00000.parquet")

    base, _ = _replay(spark, clean, tmp_path / "lake_clean")
    qdir = str(tmp_path / "deadletter")
    table, stats = _replay(
        spark, dirty, tmp_path / "lake_dirty", quarantine_dir=qdir
    )

    # every malformed row diverted, tagged, none merged
    assert sum(e.quarantined for e in stats.epochs) == 3
    qfiles = glob.glob(os.path.join(qdir, "_src_epoch=*", "*.parquet"))
    assert qfiles
    qrows = pa.concat_tables([pq.read_table(f) for f in qfiles]).to_pylist()
    reasons = sorted(r["quarantine_reason"] for r in qrows)
    assert reasons == ["null_key", "null_seq", "rollback_without_target"]
    assert _state_rows(table) == _state_rows(base)


def test_quarantine_footer_mode_free_on_clean_log(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_changelog(log, ChangelogSpec(**SPEC))
    qdir = str(tmp_path / "deadletter")
    table, stats = _replay(
        spark, log, tmp_path / "lake", quarantine_dir=qdir
    )
    # footer null-counts prove the log clean: the divert pass never ran,
    # so the dead-letter dir was never even created
    assert sum(e.quarantined for e in stats.epochs) == 0
    assert not os.path.exists(qdir)


def test_quarantine_scan_always_catches_unknown_op(spark, tmp_path):
    # an unknown op STRING is footer-invisible (non-null everywhere) —
    # 'footer' mode documents that it passes through; 'always' catches it
    for mode, expect in (("footer", 0), ("always", 1)):
        log = str(tmp_path / f"log_{mode}")
        generate_changelog(log, ChangelogSpec(**SPEC))
        _inject(
            log, 1,
            [{"seq": 900100, "epoch": 1, "partition": 0,
              "doc_id": "doc-badop", "op": "frobnicate", "n_tok": 2}],
            "foreign-00000.parquet",
        )
        qdir = str(tmp_path / f"dl_{mode}")
        table, stats = _replay(
            spark, log, tmp_path / f"lake_{mode}",
            quarantine_dir=qdir, quarantine_scan=mode,
        )
        assert sum(e.quarantined for e in stats.epochs) == expect
        live = {
            r["doc_id"] for r in table.current_state().select("doc_id").collect()
        }
        # footer mode folds the row in as an ordinary upsert (documented);
        # always mode keeps it out of the state entirely
        assert ("doc-badop" in live) == (expect == 0)


def test_quarantine_rerun_is_idempotent(spark, tmp_path):
    # fenced re-drive of an already-committed group must not duplicate
    # dead-letter rows (deterministic overwrite path)
    log = str(tmp_path / "log")
    generate_changelog(log, ChangelogSpec(**SPEC))
    _inject(
        log, 3,
        [{"seq": None, "epoch": 3, "partition": 0, "doc_id": "doc-z",
          "op": "insert"}],
        "foreign-00000.parquet",
    )
    qdir = str(tmp_path / "dl")
    table, stats = _replay(
        spark, log, tmp_path / "lake", quarantine_dir=qdir
    )
    assert sum(e.quarantined for e in stats.epochs) == 1
    # second controller over the same committed table: all epochs fenced
    again = StreamController(
        spark, table, log, 2, quarantine_dir=qdir
    ).run()
    assert all(e.skipped for e in again.epochs) or not again.epochs
    qfiles = glob.glob(os.path.join(qdir, "_src_epoch=*", "*.parquet"))
    total = sum(pq.read_metadata(f).num_rows for f in qfiles)
    assert total == 1

    # re-drive under a DIFFERENT epoch grouping (fresh table, same
    # dead-letter dir): the source-epoch-partitioned dynamic overwrite
    # must rewrite, never duplicate
    _replay(
        spark, log, tmp_path / "lake2",
        quarantine_dir=qdir, max_batch_epochs=1,
    )
    qfiles = glob.glob(os.path.join(qdir, "_src_epoch=*", "*.parquet"))
    total = sum(pq.read_metadata(f).num_rows for f in qfiles)
    assert total == 1


def test_quarantine_refuses_hash_chained_log(spark, tmp_path):
    # a diverted event breaks chain continuity by construction — the
    # controller must crash loudly instead of letting a false divergence
    # wipe the partition via a synthetic rollback
    log = str(tmp_path / "log")

    def hash_epoch(epoch, rows):
        # rows: (seq, doc_id, chain_hash, parent_hash)
        n = len(rows)
        cols = {
            "seq": pa.array([r[0] for r in rows], pa.int64()),
            "epoch": pa.array([epoch] * n, pa.int64()),
            "partition": pa.array([0] * n, pa.int32()),
            "doc_id": pa.array([r[1] for r in rows]),
            "op": pa.array(["insert"] * n),
            "tokens": pa.array([[1]] * n, pa.list_(pa.int32())),
            "n_tok": pa.array([1] * n, pa.int32()),
            "source": pa.array(["web"] * n),
            "rollback_to_seq": pa.array([None] * n, pa.int64()),
            "chain_hash": pa.array([r[2] for r in rows]),
            "parent_hash": pa.array([r[3] for r in rows]),
        }
        d = os.path.join(log, f"epoch={epoch:05d}", "partition=000")
        os.makedirs(d)
        pq.write_table(pa.table(cols), os.path.join(d, "events.parquet"))

    hash_epoch(0, [(1, "doc_1", "h1", "h0"), (2, "doc_2", "h2", "h1")])
    # epoch 1: a malformed (NULL doc_id) event INSIDE the chain
    hash_epoch(1, [(3, None, "h3", "h2"), (4, "doc_3", "h4", "h3")])
    qdir = str(tmp_path / "dl")
    with pytest.raises(ValueError, match="hash-chained"):
        _replay(spark, log, tmp_path / "lake", quarantine_dir=qdir)
    # the evidence is on disk even though the run crashed
    assert glob.glob(os.path.join(qdir, "_src_epoch=*", "*.parquet"))


def test_quarantine_scan_validation(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    with pytest.raises(ValueError, match="quarantine_scan"):
        StreamController(
            spark, table, str(tmp_path), 2, quarantine_scan="sometimes"
        )


def test_structured_quarantine_parity(spark, tmp_path):
    """Streaming front-end diverts the same malformed events (no footer
    fast path — one filtered scan per micro-batch), and the dirty-log
    replay still converges to the clean-log oracle."""
    from hemera_indexer_spark.streaming.structured import StructuredIngest

    spec = ChangelogSpec(
        n_docs=200, n_epochs=4, events_per_epoch=300, n_partitions=2,
        seed=7, schema_evolution_epoch=None,
    )
    clean = str(tmp_path / "log_clean")
    dirty = str(tmp_path / "log_dirty")
    generate_changelog(clean, spec)
    generate_changelog(dirty, spec)
    _inject(
        dirty, 2,
        [{"seq": 900001, "epoch": 2, "partition": 0, "doc_id": None,
          "op": "update", "n_tok": 3},
         {"seq": None, "epoch": 2, "partition": 0, "doc_id": "doc-000x",
          "op": "insert", "n_tok": 1}],
        "foreign-00000.parquet",
    )
    base, _ = _replay(spark, clean, tmp_path / "lake_clean")
    table = LakeTable.create(
        spark, str(tmp_path / "lake_stream"), SEQUENCES_SCHEMA, num_buckets=4
    )
    qdir = str(tmp_path / "dl_stream")
    q = StructuredIngest(
        spark, table, dirty, 2,
        checkpoint_dir=str(tmp_path / "ckpt"),
        quarantine_dir=qdir,
    ).start(available_now=True)
    q.awaitTermination(300)
    table.refresh()
    assert _state_rows(table) == _state_rows(base)
    qfiles = glob.glob(os.path.join(qdir, "batch=*", "*.parquet"))
    qrows = [r for f in qfiles for r in pq.read_table(f).to_pylist()]
    assert sorted(r["quarantine_reason"] for r in qrows) == [
        "null_key", "null_seq"
    ]


def test_quarantine_recovers_after_log_repair(spark, tmp_path):
    """The error path's own prescribed recovery must work: after the
    operator repairs the log (removes the foreign file), a re-run must
    neither recount stale dead-letter rows nor re-raise — the group's
    epoch partitions are re-derived from the CURRENT log."""
    log = str(tmp_path / "log")
    generate_changelog(log, ChangelogSpec(**SPEC))
    foreign = os.path.join(
        log, "epoch=00002", "partition=000", "foreign-00000.parquet"
    )
    _inject(
        log, 2,
        [{"seq": None, "epoch": 2, "partition": 0, "doc_id": "doc-q",
          "op": "insert"}],
        "foreign-00000.parquet",
    )
    qdir = str(tmp_path / "dl")
    # 'always' mode: the divert pass runs every group, so the stale-count
    # trap (footer mode would skip the scan post-repair) is fully armed
    table, stats = _replay(
        spark, log, tmp_path / "lake",
        quarantine_dir=qdir, quarantine_scan="always",
    )
    assert sum(e.quarantined for e in stats.epochs) == 1
    # operator repairs the log exactly as instructed
    os.remove(foreign)
    table2, stats2 = _replay(
        spark, log, tmp_path / "lake_repaired",
        quarantine_dir=qdir, quarantine_scan="always",
    )
    assert sum(e.quarantined for e in stats2.epochs) == 0
    qfiles = glob.glob(os.path.join(qdir, "_src_epoch=*", "*.parquet"))
    assert sum(pq.read_metadata(f).num_rows for f in qfiles) == 0


def test_bigram_stream_reserved_name_collision(spark):
    import pytest as _pytest

    from hemera_indexer_spark.operators.corpus import bigram_stream

    df = spark.createDataFrame([("a b c", 1)], "text string, x int")
    with _pytest.raises(ValueError, match="reserved"):
        bigram_stream(df, "text", "x")


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_quarantine_fuzz_random_malformed_mixes(spark, tmp_path, seed):
    """Random malformed-row mixes across random epochs: state always
    equals the clean twin, counts always equal the injected total."""
    import random

    rng = random.Random(seed)
    spec = ChangelogSpec(**SPEC)
    clean = str(tmp_path / "log_clean")
    dirty = str(tmp_path / "log_dirty")
    generate_changelog(clean, spec)
    generate_changelog(dirty, spec)

    kinds = [
        lambda s: {"seq": s, "epoch": 0, "partition": 0, "doc_id": None,
                   "op": "update"},
        lambda s: {"seq": None, "epoch": 0, "partition": 0,
                   "doc_id": f"doc-f{s}", "op": "insert"},
        lambda s: {"seq": s, "epoch": 0, "partition": 0,
                   "doc_id": f"doc-f{s}", "op": "rollback",
                   "rollback_to_seq": None},
        lambda s: {"seq": s, "epoch": 0, "partition": 0,
                   "doc_id": f"doc-f{s}", "op": None},
    ]
    n_bad = rng.randint(1, 5)
    per_epoch: dict[int, list] = {}
    for i in range(n_bad):
        e = rng.randrange(spec.n_epochs)
        row = rng.choice(kinds)(900100 + i)
        row["epoch"] = e
        per_epoch.setdefault(e, []).append(row)
    for e, rows in per_epoch.items():
        _inject(dirty, e, rows, "foreign-00000.parquet")

    base, _ = _replay(spark, clean, tmp_path / "lake_clean")
    qdir = str(tmp_path / "dl")
    table, stats = _replay(
        spark, dirty, tmp_path / "lake_dirty",
        quarantine_dir=qdir, quarantine_scan="always",
        max_batch_epochs=rng.choice([1, 2, 8]),
    )
    assert sum(e.quarantined for e in stats.epochs) == n_bad
    qfiles = glob.glob(os.path.join(qdir, "_src_epoch=*", "*.parquet"))
    assert sum(pq.read_metadata(f).num_rows for f in qfiles) == n_bad
    assert _state_rows(table) == _state_rows(base)


def test_replay_quarantined_closes_the_loop(spark, tmp_path):
    """divert → fix → replay: corrected events merge with their original
    seqs, still-broken rows stay dead-lettered, rollbacks are refused,
    and a second replay is a no-op."""
    import pyspark.sql.functions as F

    clean = str(tmp_path / "log_clean")
    dirty = str(tmp_path / "log_dirty")
    generate_changelog(clean, ChangelogSpec(**SPEC))
    generate_changelog(dirty, ChangelogSpec(**SPEC))
    bad = [
        # fixable: op misspelled by a foreign writer
        {"seq": 900001, "epoch": 2, "partition": 0, "doc_id": "doc-rx1",
         "op": "upsert", "tokens": [1, 2, 3], "n_tok": 3, "source": "s"},
        # unfixable: no LWW key
        {"seq": 900002, "epoch": 2, "partition": 0, "doc_id": None,
         "op": "update", "n_tok": 1},
        # rollback with no target: the fix below supplies one, but a
        # VALID rollback is still refused by replay (repair_range's job)
        {"seq": 900003, "epoch": 2, "partition": 0, "doc_id": "doc-rx2",
         "op": "rollback", "rollback_to_seq": None},
    ]
    _inject(dirty, 2, bad, "foreign-00000.parquet")

    qdir = str(tmp_path / "deadletter")
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    ctl = StreamController(
        spark, table, dirty, 2, quarantine_dir=qdir,
        quarantine_scan="always",
    )
    ctl.run()
    assert "doc-rx1" not in {r["doc_id"] for r in _state_rows(table)}

    def fix(df):
        return df.withColumn(
            "op",
            F.when(F.col("op") == "upsert", F.lit("update"))
            .otherwise(F.col("op")),
        ).withColumn(
            "rollback_to_seq",
            F.when(
                F.col("op") == "rollback",
                F.coalesce(F.col("rollback_to_seq"), F.lit(900000)),
            ).otherwise(F.col("rollback_to_seq")),
        )

    rep = ctl.replay_quarantined(fix=fix)
    assert rep == {
        "replayed": 1, "still_quarantined": 1, "rollbacks_skipped": 1
    }
    table.refresh()
    rows = {r["doc_id"]: r for r in table.current_state().collect()}
    assert "doc-rx1" in rows and rows["doc-rx1"]["tokens"] == [1, 2, 3]

    # dead-letter dir keeps exactly the unfixable + the rollback
    qrows = pa.concat_tables(
        [pq.read_table(f) for f in glob.glob(
            os.path.join(qdir, "_src_epoch=*", "*.parquet"))]
    ).to_pylist()
    assert len(qrows) == 2
    assert sorted(r["quarantine_reason"] for r in qrows) == [
        "null_key", "rollback_replay_refused"
    ]

    # idempotent: nothing fixable remains
    rep2 = ctl.replay_quarantined(fix=fix)
    assert rep2 == {
        "replayed": 0, "still_quarantined": 1, "rollbacks_skipped": 1
    }


def test_replay_quarantined_late_seq_loses_lww(spark, tmp_path):
    """A replayed event whose key was later re-written by a HIGHER seq
    must lose the fold — late-arrival semantics, not a resurrection."""
    import pyspark.sql.functions as F

    log = str(tmp_path / "log")
    generate_changelog(log, ChangelogSpec(**SPEC))
    rows = [
        # a VALID high-seq write for the key (merges in the normal run) …
        {"seq": 950000, "epoch": 1, "partition": 0, "doc_id": "doc-lww",
         "op": "update", "tokens": [5], "n_tok": 1, "source": "s"},
        # … and a stale seq-1 write, malformed so it quarantines
        {"seq": 1, "epoch": 1, "partition": 0, "doc_id": "doc-lww",
         "op": "upsert", "tokens": [9, 9], "n_tok": 2, "source": "s"},
    ]
    _inject(log, 1, rows, "foreign-00000.parquet")
    qdir = str(tmp_path / "deadletter")
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    ctl = StreamController(
        spark, table, log, 2, quarantine_dir=qdir, quarantine_scan="always"
    )
    ctl.run()
    before = {r["doc_id"]: r for r in table.current_state().collect()}

    assert before["doc-lww"]["tokens"] == [5]

    def fix(df):
        return df.withColumn("op", F.lit("update"))

    rep = ctl.replay_quarantined(fix=fix)
    assert rep["replayed"] == 1
    table.refresh()
    after = {r["doc_id"]: r for r in table.current_state().collect()}
    # the live winner is untouched: seq 1 lost to the committed seq 950000
    assert after["doc-lww"] == before["doc-lww"]
