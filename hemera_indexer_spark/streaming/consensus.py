"""Reorg *detection* — the chain-consensus check.

Analog of the reference's check_block_consensus_job
(/root/reference/indexer/jobs/check_block_consensus_job.py:36-77): the
reference walks fetched blocks' parent hashes against the stored chain and
spawns a repair (reorg) job when they diverge. Here the change log may carry
a per-partition hash chain (``chain_hash`` / ``parent_hash`` columns:
``parent_hash`` of an event must equal ``chain_hash`` of the previous event
on the same log partition). A divergence means the tail before the
divergent event was orphaned by a fork and the divergent event starts the
canonical repair — exactly a rollback:

1. **detect**: ``lag(chain_hash) over (partition by partition order by
   seq)`` != ``parent_hash`` → divergent events (one window shuffle, only
   over epochs that carry the hash columns).
2. **locate the fork point**: join each divergent event's ``parent_hash``
   back to the batch's ``chain_hash`` — the match is the last common
   ancestor; everything after it (``rollback_to_seq = ancestor_seq + 1``)
   is invalid. Divergences are rare, so this join is tiny.
3. **emit**: synthetic rollback records consumed by the StreamController's
   existing segmentation (merge-before → delete → merge-repair), marked
   ``inclusive_lo`` because — unlike an explicit rollback event, which is a
   bookkeeping row — the divergent event itself is a real update that must
   be applied after the delete.

Cross-batch scope: the controller persists each partition's chain tip
(max-seq ``chain_hash``) in the snapshot manifest (``last_hashes``) and a
short per-partition TAIL of recent ``(seq, chain_hash)`` pairs
(``hash_tails``), both fed back here. A fork whose divergent event is the
FIRST of its partition in a batch is detected against the previous batch's
tip, and a fork point that lies one or more batches back is located in the
tail — the rollback then targets ``ancestor_seq + 1``, rewriting only the
orphaned suffix instead of the whole partition. Only when the ancestor is
older than the retained tail does the rollback degrade, in order of
preference: to the floor of any EXPLICIT rollback for the same partition in
the batch (the upstream already declared ``seq < floor`` canonical — a
synthetic full wipe would discard rows the explicit rollback deliberately
preserved), else to ``rollback_to_seq=0``, a full partition re-sync
(mirroring the reference's re-fetch of the suspect range; the LWW merge
makes the replay idempotent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_COL = "chain_hash"
PARENT_COL = "parent_hash"


def has_hash_chain(columns: list[str]) -> bool:
    return HASH_COL in columns and PARENT_COL in columns


def detect_divergence(
    events: DataFrame,
    last_hashes: dict[int, str] | None = None,
    hash_tails: dict[int, list] | None = None,
    explicit_floors: dict[int, int] | None = None,
) -> list[dict]:
    """Return synthetic rollback records for every hash-chain divergence in
    ``events``: ``[{"seq", "partition", "rollback_to_seq", "inclusive_lo"}]``
    sorted by seq. ``last_hashes`` (partition -> last committed chain hash)
    extends the check across the batch boundary to each partition's first
    event. ``hash_tails`` (partition -> [[seq, chain_hash], ...], recent
    committed events) locates fork points OUTSIDE the batch so the rollback
    stays bounded; ``explicit_floors`` (partition -> rollback_to_seq of an
    explicit rollback event in the same batch) bounds the final fallback —
    never wipe below a floor the upstream has declared canonical."""
    ev = events.where(F.col("op") != "rollback").select(
        "seq", "partition", HASH_COL, PARENT_COL
    )
    w = Window.partitionBy("partition").orderBy(F.col("seq").asc())
    prev = F.lag(HASH_COL).over(w)
    if last_hashes:
        items = [(int(p), h) for p, h in last_hashes.items()]
        boundary = F.create_map(
            *[F.lit(x) for pair in items for x in pair]
        )[F.col("partition")]
        prev = F.coalesce(prev, boundary)
    divergent = (
        ev.withColumn("_prev_hash", prev)
        .where(
            F.col("_prev_hash").isNotNull()
            & (F.col(PARENT_COL) != F.col("_prev_hash"))
        )
        .select("seq", "partition", PARENT_COL)
    )
    # fork point: the batch event whose chain_hash equals the divergent
    # event's parent_hash (same partition, earlier seq). Divergences are
    # rare; broadcast them against the batch.
    anc = ev.select(
        F.col("partition").alias("_p"),
        F.col("seq").alias("_anc_seq"),
        F.col(HASH_COL).alias("_h"),
    )
    located = (
        divergent.join(
            anc,
            (F.col("_p") == F.col("partition"))
            & (F.col("_h") == F.col(PARENT_COL))
            & (F.col("_anc_seq") < F.col("seq")),
            "left",
        )
        .groupBy("seq", "partition", PARENT_COL)
        .agg(F.max("_anc_seq").alias("_anc"))
        .collect()
    )
    out = []
    for r in sorted(located, key=lambda r: r["seq"]):
        p = int(r["partition"])
        if r["_anc"] is not None:
            rb_to = r["_anc"] + 1
        else:
            # ancestor not in the batch: walk the committed tail (newest
            # first) for the divergent event's parent hash. A hit bounds the
            # rollback to the orphaned suffix; a miss degrades to the
            # explicit-rollback floor for the partition, else to 0 (full
            # partition re-sync).
            parent = r[PARENT_COL]
            tail_hit = None
            for s, h in sorted(
                (hash_tails or {}).get(p, []), key=lambda t: -t[0]
            ):
                if h == parent:
                    tail_hit = s
                    break
            if tail_hit is not None:
                rb_to = tail_hit + 1
            else:
                rb_to = (explicit_floors or {}).get(p, 0)
        out.append(
            {
                "seq": int(r["seq"]),
                "partition": int(r["partition"]),
                "rollback_to_seq": int(rb_to),
                "inclusive_lo": True,
            }
        )
    return out
