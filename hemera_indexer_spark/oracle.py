"""Single-threaded Python oracle fold over the change log.

The independent ground truth the Spark engine is asserted against —
semantics mirror the reference's conditional upsert + LWW dedup + reorg
repair:

- apply insert/update/delete iff ``event.seq > state[doc].seq``
  (/root/reference/indexer/exporters/postgres_item_exporter.py:110-133,
   /root/reference/common/models/current_token_balances.py:33);
- deletes keep a tombstone ``(doc_id, seq, is_deleted=True)`` — the analog of
  the ``reorg`` boolean column (/root/reference/common/models/blocks.py:42) —
  so a replayed stale event cannot resurrect a deleted row;
- ``rollback`` physically removes every state entry (tombstones included)
  on the event's log partition whose ``seq >= rollback_to_seq``
  (/root/reference/indexer/utils/reorg.py:12-50,
   /root/reference/indexer/jobs/export_reorg_job.py:41-65);
- epochs apply in epoch order; within an epoch, events apply in ``seq``
  order (delivery order inside a file is irrelevant — the engine's LWW
  compaction is order-insensitive by construction).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow.parquet as pq

from hemera_indexer_spark.functions import log_partition_py


@dataclass
class OracleRow:
    doc_id: str
    tokens: list | None
    n_tok: int | None
    source: str | None
    seq: int
    is_deleted: bool
    extra: dict  # evolved columns, e.g. {"lang": ...}


def read_log_rows(log_dir: str) -> list[dict]:
    """Read every (epoch, partition) file into plain dicts."""
    rows: list[dict] = []
    for epoch_d in sorted(os.listdir(log_dir)):
        if not epoch_d.startswith("epoch="):
            continue
        epoch = int(epoch_d.split("=")[1])
        ed = os.path.join(log_dir, epoch_d)
        for part_d in sorted(os.listdir(ed)):
            pdir = os.path.join(ed, part_d)
            for f in sorted(os.listdir(pdir)):
                if f.endswith(".parquet"):
                    t = pq.read_table(os.path.join(pdir, f))
                    for r in t.to_pylist():
                        r["epoch"] = epoch
                        rows.append(r)
    return rows


def fold(rows: list[dict], n_partitions: int) -> dict[str, OracleRow]:
    """Fold the full log; returns live+tombstone state keyed by doc_id."""
    state: dict[str, OracleRow] = {}
    base_cols = {
        "seq", "epoch", "partition", "doc_id", "op",
        "tokens", "n_tok", "source", "rollback_to_seq",
    }
    epochs = sorted({r["epoch"] for r in rows})
    for ep in epochs:
        batch = sorted(
            (r for r in rows if r["epoch"] == ep), key=lambda r: r["seq"]
        )
        for r in batch:
            op = r["op"]
            if op == "rollback":
                s = r["rollback_to_seq"]
                p = r["partition"]
                dead = [
                    k
                    for k, v in state.items()
                    if v.seq >= s and log_partition_py(k, n_partitions) == p
                ]
                for k in dead:
                    del state[k]
                continue
            k = r["doc_id"]
            cur = state.get(k)
            if cur is not None and r["seq"] <= cur.seq:
                continue  # stale or duplicate re-delivery
            if op == "delete":
                state[k] = OracleRow(k, None, None, None, r["seq"], True, {})
            else:
                extra = {
                    c: r[c] for c in r if c not in base_cols
                }
                state[k] = OracleRow(
                    k, r["tokens"], r["n_tok"], r["source"], r["seq"], False, extra
                )
    return state


def fold_facts(rows: list[dict], n_partitions: int) -> dict[tuple, dict]:
    """Ground truth for the append-only event-history fact table: every
    delivered event keyed by (doc_id, seq) — first delivery wins (insert-if-
    absent), duplicates are no-ops — minus events invalidated by a rollback
    (and re-added if re-delivered afterwards). Mirrors the reference's
    ON CONFLICT DO NOTHING fact sink + reorg leftover delete
    (/root/reference/indexer/exporters/postgres_item_exporter.py:126-130,
    /root/reference/indexer/jobs/export_reorg_job.py:41-65)."""
    facts: dict[tuple, dict] = {}
    epochs = sorted({r["epoch"] for r in rows})
    for ep in epochs:
        batch = sorted(
            (r for r in rows if r["epoch"] == ep), key=lambda r: r["seq"]
        )
        for r in batch:
            if r["op"] == "rollback":
                s, p = r["rollback_to_seq"], r["partition"]
                dead = [
                    k
                    for k in facts
                    if k[1] >= s and log_partition_py(k[0], n_partitions) == p
                ]
                for k in dead:
                    del facts[k]
                continue
            facts.setdefault((r["doc_id"], r["seq"]), r)
    return facts


def expected_fact_rows(log_dir: str, n_partitions: int) -> list[dict]:
    """Final fact-table content sorted by (doc_id, seq)."""
    facts = fold_facts(read_log_rows(log_dir), n_partitions)
    return [facts[k] for k in sorted(facts)]


def expected_live_rows(log_dir: str, n_partitions: int) -> list[dict]:
    """Final visible table state as list of dicts sorted by doc_id."""
    state = fold(read_log_rows(log_dir), n_partitions)
    out = []
    for k in sorted(state):
        v = state[k]
        if v.is_deleted:
            continue
        d = {
            "doc_id": v.doc_id,
            "tokens": v.tokens,
            "n_tok": v.n_tok,
            "source": v.source,
            "seq": v.seq,
        }
        d.update(v.extra)
        out.append(d)
    return out
