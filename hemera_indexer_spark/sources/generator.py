"""Deterministic synthetic change-log generator (M0 of SURVEY.md §7).

Writes one Parquet file per (epoch, partition) —
``{out}/epoch=NNNNN/partition=NNN/events.parquet`` — mirroring the
reference's range-file layout
(/root/reference/indexer/exporters/csv_file_item_exporter.py:86-94) so that
resume/lineage is testable at file granularity.

Distributional features required by FIXTURES.md §2, all seeded:
- multiple updates per doc within an epoch (in-batch LWW),
- duplicated events re-delivered in later epochs (idempotence),
- shuffled delivery order within an epoch file (LWW must win by seq),
- hot-key skew (top ``hot_fraction`` docs get ``hot_share`` of events),
- rollback events mid-replay (reorg analog),
- `lang` column appearing only from ``schema_evolution_epoch`` on
  (files BEFORE that epoch physically lack the column).

No Spark needed here — the generator and oracle are the independent ground
truth the engine is tested against.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from hemera_indexer_spark.functions import log_partition_py

LANGS = ("en", "de", "fr", "zh", "es")
SOURCES = ("web", "books", "code", "wiki")


@dataclass
class ChangelogSpec:
    n_docs: int = 1_000
    n_epochs: int = 8
    events_per_epoch: int = 2_000
    n_partitions: int = 4
    seed: int = 42
    vocab: int = 50_257
    max_tokens: int = 96
    hot_fraction: float = 0.01
    hot_share: float = 0.30
    p_insert: float = 0.25
    p_update: float = 0.60
    p_delete: float = 0.10
    dup_fraction: float = 0.05
    schema_evolution_epoch: int | None = 5
    rollback_epochs: tuple = (6,)
    langs: tuple = LANGS
    #: doc-id namespace prefix — tenant-scope it (e.g. "t1_doc") when
    #: several generated logs feed ONE shared table: the LWW key is
    #: doc_id alone, so ids must be unique across tenants.
    doc_prefix: str = "doc"


@dataclass
class GeneratedLog:
    out_dir: str
    spec: ChangelogSpec
    total_events: int
    files: list = field(default_factory=list)


def _doc_id(i: int, prefix: str = "doc") -> str:
    return f"{prefix}_{i:08d}"


def _event_arrow_schema(with_lang: bool) -> pa.schema:
    fields = [
        pa.field("seq", pa.int64(), nullable=False),
        pa.field("epoch", pa.int64(), nullable=False),
        pa.field("partition", pa.int32(), nullable=False),
        pa.field("doc_id", pa.string(), nullable=False),
        pa.field("op", pa.string(), nullable=False),
        pa.field("tokens", pa.list_(pa.int32()), nullable=True),
        pa.field("n_tok", pa.int32(), nullable=True),
        pa.field("source", pa.string(), nullable=True),
        pa.field("rollback_to_seq", pa.int64(), nullable=True),
    ]
    if with_lang:
        fields.append(pa.field("lang", pa.string(), nullable=True))
    return pa.schema(fields)


def generate_changelog_fast(out_dir: str, spec: ChangelogSpec) -> GeneratedLog:
    """Vectorized generator for bench-scale logs (10M+ events): builds each
    epoch column-wise in numpy / Arrow (ragged tokens via ListArray offsets),
    no per-event Python. Same schema and layout as ``generate_changelog``;
    duplicates/rollbacks are omitted (throughput benches measure the merge
    path — correctness of those paths is covered by the slow generator's
    oracle tests)."""
    rng = np.random.default_rng(spec.seed)
    n_hot = max(1, int(spec.n_docs * spec.hot_fraction))
    next_seq = 1
    result = GeneratedLog(out_dir=out_dir, spec=spec, total_events=0)

    for epoch in range(spec.n_epochs):
        with_lang = (
            spec.schema_evolution_epoch is not None
            and epoch >= spec.schema_evolution_epoch
        )
        n = spec.events_per_epoch
        seq = np.arange(next_seq, next_seq + n, dtype=np.int64)
        next_seq += n
        is_hot = rng.random(n) < spec.hot_share
        ids = np.where(
            is_hot,
            rng.integers(0, n_hot, n),
            rng.integers(0, spec.n_docs, n),
        )
        doc_ids = np.array([f"{spec.doc_prefix}_{i:08d}" for i in ids])
        partition = (ids % spec.n_partitions).astype(np.int32)
        draw = rng.random(n)
        is_delete = draw >= (spec.p_insert + spec.p_update)
        op = np.where(
            draw < spec.p_insert, "insert", np.where(is_delete, "delete", "update")
        )
        tok_lens = rng.integers(1, spec.max_tokens + 1, n).astype(np.int32)
        tok_lens[is_delete] = 0
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(tok_lens, out=offsets[1:])
        values = rng.integers(0, spec.vocab, int(offsets[-1])).astype(np.int32)
        tokens = pa.ListArray.from_arrays(
            offsets, pa.array(values), mask=pa.array(is_delete)
        )
        n_tok = pa.array(
            np.where(is_delete, 0, tok_lens), mask=is_delete, type=pa.int32()
        )
        src = pa.array(
            np.array(SOURCES)[rng.integers(0, len(SOURCES), n)],
            mask=is_delete,
            type=pa.string(),
        )
        cols = {
            "seq": pa.array(seq),
            "epoch": pa.array(np.full(n, epoch, dtype=np.int64)),
            "partition": pa.array(partition),
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "op": pa.array(op, type=pa.string()),
            "tokens": tokens,
            "n_tok": n_tok,
            "source": src,
            "rollback_to_seq": pa.nulls(n, pa.int64()),
        }
        if with_lang:
            lang_null = (rng.random(n) < 0.2) | is_delete
            cols["lang"] = pa.array(
                np.array(spec.langs)[rng.integers(0, len(spec.langs), n)],
                mask=lang_null,
                type=pa.string(),
            )
        table = pa.Table.from_pydict(cols, schema=_event_arrow_schema(with_lang))
        # shuffled delivery order
        table = table.take(pa.array(rng.permutation(n)))
        part_col = table.column("partition").to_numpy()
        for p in range(spec.n_partitions):
            sub = table.filter(pa.array(part_col == p))
            if sub.num_rows == 0:
                continue
            path = os.path.join(out_dir, f"epoch={epoch:05d}", f"partition={p:03d}")
            os.makedirs(path, exist_ok=True)
            fpath = os.path.join(path, "events.parquet")
            pq.write_table(sub, fpath, row_group_size=50_000)
            result.files.append(fpath)
        result.total_events += n
    return result


def generate_changelog(out_dir: str, spec: ChangelogSpec) -> GeneratedLog:
    rng = np.random.default_rng(spec.seed)
    n_hot = max(1, int(spec.n_docs * spec.hot_fraction))
    next_seq = 1
    prev_epoch_events: list[dict] = []
    result = GeneratedLog(out_dir=out_dir, spec=spec, total_events=0)

    for epoch in range(spec.n_epochs):
        with_lang = (
            spec.schema_evolution_epoch is not None
            and epoch >= spec.schema_evolution_epoch
        )
        fresh: list[dict] = []
        n_fresh = spec.events_per_epoch
        # vectorized draws for the whole epoch
        is_hot = rng.random(n_fresh) < spec.hot_share
        hot_ids = rng.integers(0, n_hot, n_fresh)
        cold_ids = rng.integers(0, spec.n_docs, n_fresh)
        op_draw = rng.random(n_fresh)
        tok_lens = rng.integers(1, spec.max_tokens + 1, n_fresh)
        src_ids = rng.integers(0, len(SOURCES), n_fresh)
        lang_ids = rng.integers(0, len(spec.langs), n_fresh)
        lang_null = rng.random(n_fresh) < 0.2

        for i in range(n_fresh):
            doc_i = int(hot_ids[i] if is_hot[i] else cold_ids[i])
            did = _doc_id(doc_i, spec.doc_prefix)
            if op_draw[i] < spec.p_insert:
                op = "insert"
            elif op_draw[i] < spec.p_insert + spec.p_update:
                op = "update"
            else:
                op = "delete"
            ev = {
                "seq": next_seq,
                "epoch": epoch,
                "partition": log_partition_py(did, spec.n_partitions),
                "doc_id": did,
                "op": op,
                "tokens": None,
                "n_tok": None,
                "source": None,
                "rollback_to_seq": None,
                "lang": None,
            }
            if op != "delete":
                toks = rng.integers(0, spec.vocab, int(tok_lens[i])).astype(np.int32)
                ev["tokens"] = toks.tolist()
                ev["n_tok"] = int(tok_lens[i])
                ev["source"] = SOURCES[src_ids[i]]
                if with_lang and not lang_null[i]:
                    ev["lang"] = spec.langs[lang_ids[i]]
            next_seq += 1
            fresh.append(ev)

        epoch_events = list(fresh)

        # rollback event (reorg analog): cancels effects with
        # seq >= rollback_to_seq on one log partition, placed ~60% through
        # the epoch's seq range, pointing back ~30% into the epoch.
        if epoch in spec.rollback_epochs and n_fresh >= 10:
            target = fresh[int(n_fresh * 0.30)]["seq"]
            part = int(rng.integers(0, spec.n_partitions))
            rb = {
                "seq": next_seq,
                "epoch": epoch,
                "partition": part,
                "doc_id": _doc_id(0, spec.doc_prefix),  # carrier only; rollback keys on partition
                "op": "rollback",
                "tokens": None,
                "n_tok": None,
                "source": None,
                "rollback_to_seq": int(target),
                "lang": None,
            }
            next_seq += 1
            # splice so roughly 60% of fresh events precede it by seq anyway
            epoch_events.append(rb)

        # duplicate re-delivery of earlier events (idempotence): same seq and
        # payload, delivered in THIS epoch's files.
        pool = prev_epoch_events + fresh
        n_dup = int(len(fresh) * spec.dup_fraction)
        if pool and n_dup:
            for j in rng.integers(0, len(pool), n_dup):
                d = dict(pool[int(j)])
                d["epoch"] = epoch
                epoch_events.append(d)

        # shuffle delivery order within the epoch
        order = rng.permutation(len(epoch_events))
        epoch_events = [epoch_events[int(k)] for k in order]

        # write one file per partition
        schema = _event_arrow_schema(with_lang)
        cols = [f.name for f in schema]
        for part in range(spec.n_partitions):
            rows = [e for e in epoch_events if e["partition"] == part]
            if not rows:
                continue
            data = {c: [r[c] for r in rows] for c in cols}
            table = pa.Table.from_pydict(data, schema=schema)
            path = os.path.join(
                out_dir, f"epoch={epoch:05d}", f"partition={part:03d}"
            )
            os.makedirs(path, exist_ok=True)
            fpath = os.path.join(path, "events.parquet")
            pq.write_table(table, fpath, row_group_size=50_000)
            result.files.append(fpath)
        result.total_events += len(epoch_events)
        prev_epoch_events = fresh

    return result
