"""check_policy='quarantine': CHECK-violating events share the dead-letter
disposition of envelope malformations instead of aborting the ingest.

Laws under test:
- violating insert/update events are diverted with reason 'check:<name>',
  the clean remainder merges, and the final state equals the clean-log
  run (divert never changes survivors);
- the default policy stays 'abort' (merge raises CheckViolationError);
- delete/rollback are CONTROL events: their payloads are semantically
  void, so checks never divert them (a delete still applies);
- replay_quarantined re-evaluates the CURRENT check set — after
  drop_check the diverted rows replay into the state; while the check
  stands they stay dead-lettered (never crash the replay merge);
- config validation: 'quarantine' requires quarantine_dir.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hemera_indexer_spark.lake import CheckViolationError, LakeTable
from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
from hemera_indexer_spark.sources.generator import (
    ChangelogSpec,
    generate_changelog,
)
from hemera_indexer_spark.streaming import StreamController

SPEC = dict(
    n_docs=150, n_epochs=3, events_per_epoch=200, n_partitions=2, seed=11
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
    part_dir = os.path.join(log_dir, f"epoch={epoch:05d}", "partition=000")
    cols = {
        f.name: pa.array([r.get(f.name) for r in rows], type=f.type)
        for f in _EVENT_PA_SCHEMA
    }
    pq.write_table(
        pa.table(cols, schema=_EVENT_PA_SCHEMA),
        os.path.join(part_dir, name),
    )


def _mk_table(spark, root, check=("nonneg_ntok", "n_tok >= 0")):
    t = LakeTable.create(spark, str(root), SEQUENCES_SCHEMA, num_buckets=4)
    if check:
        t.set_check(*check)
    return t


def _state_rows(table):
    return sorted(
        (r.asDict(recursive=True) for r in table.current_state().collect()),
        key=lambda d: d["doc_id"],
    )


def _q_reasons(qdir):
    qfiles = glob.glob(os.path.join(qdir, "_src_epoch=*", "*.parquet"))
    if not qfiles:
        return []
    rows = pa.concat_tables(
        [pq.read_table(f) for f in qfiles], promote_options="default"
    ).to_pylist()
    return sorted(
        ((r["doc_id"], r["quarantine_reason"]) for r in rows),
        key=lambda p: (p[0] is None, p[0] or "", p[1]),
    )


def test_check_quarantine_diverts_and_preserves_state(spark, tmp_path):
    clean = str(tmp_path / "log_clean")
    dirty = str(tmp_path / "log_dirty")
    generate_changelog(clean, ChangelogSpec(**SPEC))
    generate_changelog(dirty, ChangelogSpec(**SPEC))
    _inject(
        dirty, 1,
        [
            # valid envelope, violating payload -> check divert
            {"seq": 900001, "epoch": 1, "partition": 0,
             "doc_id": "chk-bad", "op": "insert", "n_tok": -5},
            # envelope malformation in the same group -> same dead letter
            {"seq": 900002, "epoch": 1, "partition": 0, "doc_id": None,
             "op": "update", "n_tok": 3},
        ],
        "foreign-00000.parquet",
    )
    base = _mk_table(spark, tmp_path / "lake_clean")
    StreamController(spark, base, clean, 2).run()

    qdir = str(tmp_path / "dl")
    t = _mk_table(spark, tmp_path / "lake_dirty")
    stats = StreamController(
        spark, t, dirty, 2,
        quarantine_dir=qdir, check_policy="quarantine",
    ).run()

    assert sum(e.quarantined for e in stats.epochs) == 2
    assert _q_reasons(qdir) == [
        ("chk-bad", "check:nonneg_ntok"), (None, "null_key"),
    ]
    assert _state_rows(t) == _state_rows(base)


def test_default_policy_aborts(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_changelog(log, ChangelogSpec(**SPEC))
    _inject(
        log, 1,
        [{"seq": 900001, "epoch": 1, "partition": 0,
          "doc_id": "chk-bad", "op": "insert", "n_tok": -5}],
        "foreign-00000.parquet",
    )
    t = _mk_table(spark, tmp_path / "lake")
    with pytest.raises(CheckViolationError):
        StreamController(spark, t, log, 2).run()
    # loud abort is a clean stop: fix is a re-drive after drop/repair
    assert t.committed_epoch() < 1 or t.current_state().where(
        "doc_id = 'chk-bad'"
    ).count() == 0


def test_control_events_never_diverted(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_changelog(log, ChangelogSpec(**SPEC))
    # a DELETE whose (void) payload violates the check must still apply
    victim = "doc-00001"
    _inject(
        log, 2,
        [{"seq": 900003, "epoch": 2, "partition": 0,
          "doc_id": victim, "op": "delete", "n_tok": -9}],
        "foreign-00000.parquet",
    )
    qdir = str(tmp_path / "dl")
    t = _mk_table(spark, tmp_path / "lake")
    stats = StreamController(
        spark, t, log, 2,
        quarantine_dir=qdir, check_policy="quarantine",
    ).run()
    assert sum(e.quarantined for e in stats.epochs) == 0
    assert t.current_state().where(f"doc_id = '{victim}'").count() == 0


def test_replay_respects_current_checks(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_changelog(log, ChangelogSpec(**SPEC))
    _inject(
        log, 1,
        [{"seq": 900004, "epoch": 1, "partition": 0,
          "doc_id": "chk-late", "op": "insert", "n_tok": -2}],
        "foreign-00000.parquet",
    )
    qdir = str(tmp_path / "dl")
    t = _mk_table(spark, tmp_path / "lake")
    ctl = StreamController(
        spark, t, log, 2,
        quarantine_dir=qdir, check_policy="quarantine",
    )
    ctl.run()
    # while the check stands: the row stays dead-lettered, merge untouched
    rep = ctl.replay_quarantined()
    assert rep == {
        "replayed": 0, "still_quarantined": 1, "rollbacks_skipped": 0
    }
    assert _q_reasons(qdir) == [("chk-late", "check:nonneg_ntok")]
    # lift the constraint -> the row replays into the state
    t.drop_check("nonneg_ntok")
    rep2 = ctl.replay_quarantined()
    assert rep2["replayed"] == 1 and rep2["still_quarantined"] == 0
    assert t.current_state().where("doc_id = 'chk-late'").count() == 1
    assert _q_reasons(qdir) == []


def test_policy_validation(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "lake", check=None)
    with pytest.raises(ValueError, match="check_policy"):
        StreamController(
            spark, t, str(tmp_path), 2, check_policy="explode"
        )
    with pytest.raises(ValueError, match="requires quarantine_dir"):
        StreamController(
            spark, t, str(tmp_path), 2, check_policy="quarantine"
        )
