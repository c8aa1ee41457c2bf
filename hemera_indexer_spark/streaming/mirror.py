"""Changelog APPLY: replicate a LakeTable from its exported envelope feed.

``ChangelogExportSink`` (streaming/sinks.py) is the egress half of the
WAL loop: after each committed group it writes the state table's net
change feed as Debezium-shaped envelope directories

    chg_v<from>_<to>/  rows (<key>, op c|u|d, before, after,
                             version_from, version_to, epoch)

``LakeMirror`` is the ingress half: it tails those directories and
applies them to a DESTINATION LakeTable, giving cross-region replication
/ disaster recovery / blue-green reader promotion over nothing but the
feed — the consumer never touches the source table's files (the
reference ships state to downstreams by re-exporting from PG,
/root/reference/indexer/exporters/postgres_item_exporter.py:23-70; the
envelope feed is that export bus re-expressed as data files).

Replica ordering law — the WHOLE point of this module: the replica's LWW
seq domain is ``2 * version_to`` (the SOURCE SNAPSHOT VERSION, widened),
never the source rows' own seqs. The feed is a NET feed; a source
rollback RETRACTS a key to an older image whose payload seq is LOWER
than what the replica already holds, so folding on payload seq would
silently keep the rolled-back value forever. Folding on the source
version makes every later envelope beat every earlier one, and
re-applying the same envelope tie (target-wins) — idempotent by the same
law every sink in this engine uses. The domain is WIDENED (even slots
for syncs) for the same reason IVFIndex widens its
(operators/ivf_index.py): a replica-side ``purge_keys`` stamps its
tombstone at footer-max + 1 — the ODD slot between two sync versions —
so a key re-inserted in the source right after a purge still wins on the
replica instead of tying with the purge tombstone and losing.
(SignatureIndex round-stamping, operators/dedup_index.py, applied to
whole-row replication.)

Crash/retry discipline: one ``merge_upsert(epoch_id=version_to)`` per
envelope directory — the replica's manifest epoch (source-version
domain) is the sync cursor, and the snapshot flip commits data + cursor
atomically. A re-driven apply of an already-applied directory is fenced
to a no-op; a crash between directories re-drives from the cursor.
Schema evolution rides the feed: a directory whose ``after`` struct
carries new fields additively evolves the replica first (idempotent,
commit-free when already present).

Gaps fail loudly: each directory must chain (``version_from`` == the
replica's cursor). A vacuumed/missing intermediate directory would
otherwise silently produce a replica that disagrees with the source for
every key whose change fell in the hole.

RTBF rides the chain: a source ``purge_keys`` breaks ``changes_since``
by design (pre-purge snapshots must expire), so the exporter ships a
PURGE DIRECTORY instead (``ChangelogExportSink.apply_purge`` — keys
only, NO images: a right-to-be-forgotten feed must not re-export the
payload it is deleting). The mirror recognizes it and runs a real
``purge_keys`` on the replica — tombstone + compact + expire + vacuum,
so no retained REPLICA file holds the purged payload either — then
fast-forwards the cursor, fenced.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..lake.table import LakeTable

# Non-key columns an envelope directory may carry: the sync shape
# (ChangelogExportSink.sync) plus the purge marker (apply_purge dirs)
_ENVELOPE_COLS = frozenset(
    {"op", "before", "after", "version_from", "version_to", "epoch", "purge"}
)
# Replica-side seq column: the source snapshot version each row was last
# touched at. Prefixed to stay clear of any source payload column.
MIRROR_SEQ_COL = "_src_version"


class FeedGapError(RuntimeError):
    """An envelope directory is missing between the replica's cursor and
    the next available directory — applying across the hole would
    silently lose every change inside it."""


class LakeMirror:
    """Apply a ``ChangelogExportSink`` feed to a replica LakeTable.

    ``LakeMirror(spark, feed_dir, dest_root).sync()`` creates the replica
    on first contact (schema inferred from the first envelope directory)
    and applies every pending directory in version order. Safe to re-run
    from cron/CLI at any cadence; each run costs O(new envelope rows).
    """

    def __init__(
        self,
        spark: SparkSession,
        feed_dir: str,
        dest_root: str,
        num_buckets: int = 16,
    ):
        self.spark = spark
        self.feed_dir = feed_dir
        self.dest_root = dest_root
        self.num_buckets = num_buckets
        self.dest: LakeTable | None = (
            LakeTable.load(spark, dest_root)
            if os.path.exists(os.path.join(dest_root, "meta"))
            else None
        )
        if self.dest is not None and self.dest.seq_col != MIRROR_SEQ_COL:
            # An existing table at dest_root that was NOT created by a
            # mirror would be silently folded on the wrong column: the
            # replica's LWW law lives in _src_version (widened source
            # versions + purge tombstones), and a table keyed on e.g. the
            # payload's own seq would drop deletes (after-image seq is
            # NULL) and diverge without any error. Refuse loudly instead.
            raise ValueError(
                f"{dest_root} exists but is not a mirror replica: its seq "
                f"column is {self.dest.seq_col!r}, expected "
                f"{MIRROR_SEQ_COL!r}. Point the mirror at an empty "
                f"dest_root and it will create the replica itself."
            )

    # ------------------------------------------------------------ cursor
    @property
    def applied_version(self) -> int:
        """Source snapshot version the replica is synced to (-1: none)."""
        if self.dest is None:
            return -1
        return self.dest.snapshot["manifest"]["epoch_id"]

    def pending(self) -> list[tuple[int, int, str]]:
        """Envelope directories newer than the cursor, version-ordered."""
        out = []
        for d in os.listdir(self.feed_dir):
            if not d.startswith("chg_v"):
                continue
            parts = d[len("chg_v"):].split("_")
            v_from, v_to = int(parts[0]), int(parts[1])
            if v_to > self.applied_version:
                out.append((v_from, v_to, os.path.join(self.feed_dir, d)))
        return sorted(out, key=lambda t: t[1])

    # -------------------------------------------------------------- sync
    def sync(self) -> int:
        """Apply all pending envelope directories; returns how many."""
        n = 0
        for v_from, v_to, path in self.pending():
            cursor = self.applied_version
            if cursor >= 0 and v_from != cursor:
                raise FeedGapError(
                    f"envelope chain break: replica is at source version "
                    f"{cursor} but the next directory covers "
                    f"v{v_from}->v{v_to}; the feed for "
                    f"v{cursor}->v{v_from} is missing from {self.feed_dir}"
                )
            self._apply_dir(path, v_to)
            n += 1
        return n

    # --------------------------------------------------------- internals
    @staticmethod
    def _key_col(env: DataFrame) -> str:
        keys = [c for c in env.columns if c not in _ENVELOPE_COLS]
        if len(keys) != 1:
            raise ValueError(
                f"not an envelope directory: expected exactly one key "
                f"column besides {sorted(_ENVELOPE_COLS)}, got {keys}"
            )
        return keys[0]

    @staticmethod
    def _payload_fields(env: DataFrame) -> list[T.StructField]:
        # ``after`` carries the full state row minus the key; is_deleted
        # is the replica table's OWN internal column (op 'd' encodes
        # deletion in the feed), so it is never a payload field.
        after = next(f for f in env.schema.fields if f.name == "after")
        return [
            f for f in after.dataType.fields if f.name != "is_deleted"
        ]

    def _ensure_dest(self, env: DataFrame, key: str) -> LakeTable:
        if self.dest is not None:
            return self.dest
        key_type = next(
            f.dataType for f in env.schema.fields if f.name == key
        )
        fields = [
            T.StructField(key, key_type),
            T.StructField(MIRROR_SEQ_COL, T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            *[
                T.StructField(f.name, f.dataType, True)
                for f in self._payload_fields(env)
            ],
        ]
        self.dest = LakeTable.create(
            self.spark,
            self.dest_root,
            T.StructType(fields),
            num_buckets=self.num_buckets,
            key_col=key,
            seq_col=MIRROR_SEQ_COL,
            properties={"mirror_feed": self.feed_dir},
        )
        return self.dest

    @staticmethod
    def _sidecar_log(path: str) -> list[dict]:
        p = os.path.join(path, "_schema_log.json")
        if not os.path.exists(p):
            return []
        import json

        with open(p) as f:
            return json.load(f).get("schema_log", [])

    #: replica property holding the highest SOURCE schema-log sid already
    #: replayed — the replay fence. Presence-of-column inference alone is
    #: wrong across drop-then-re-add (the stale drop entry would re-drop
    #: the re-added column on every later sync, NULL-filling its replica
    #: history) and rename-then-re-add-of-the-old-name (the rename branch
    #: would see both names and refuse forever).
    SCHEMA_SID_PROP = "mirror_schema_sid"

    def _apply_schema_log(self, dest: LakeTable, log: list[dict]) -> None:
        """Replay the source's renames/drops onto the replica BEFORE
        merging a directory exported after them — envelope images carry
        head-time names, so skipping this would make the additive-evolve
        step re-ADD a renamed column and silently fork the replica's
        state from the source's.

        Replay is FENCED by the source schema-log ``sid`` watermark
        persisted as a replica property: entries at or below it are
        already applied and never re-examined, which is what keeps a
        later drop-then-re-add (or rename-then-re-add of the old name)
        of the same column from replaying the stale entry against the
        re-added column. Within the unfenced suffix, applied-ness still
        falls back to schema presence (rename done iff old absent; drop
        done iff absent) so a crash between an applied entry and the
        watermark commit re-drives as a clean no-op. ``add`` entries are
        skipped (the payload-driven additive evolve handles them WITH
        types) but still advance the watermark."""
        if not log:
            return
        props = dest.snapshot.get("properties", {}) or {}
        fence = int(props.get(self.SCHEMA_SID_PROP, -1))
        todo = [e for e in log if int(e.get("sid", 0)) > fence]
        if not todo:
            return
        names = set(dest.schema.fieldNames())
        for e in todo:
            op = e["op"]
            if op == "rename" and e["old"] in names:
                if e["new"] in names:
                    raise ValueError(
                        f"mirror: cannot replay source rename "
                        f"{e['old']!r}->{e['new']!r}: replica already has "
                        f"both columns (feed written by a pre-sidecar "
                        f"exporter?) — recreate the replica from scratch"
                    )
                dest.rename_column(e["old"], e["new"])
                names = set(dest.schema.fieldNames())
            elif op == "drop" and e["col"] in names:
                dest.drop_column(e["col"])
                names = set(dest.schema.fieldNames())
        dest.update_properties(
            {self.SCHEMA_SID_PROP: str(max(int(e.get("sid", 0)) for e in todo))}
        )

    def _apply_dir(self, path: str, v_to: int) -> None:
        # Each directory is read with ITS OWN schema (never mergeSchema):
        # pre-evolution directories legitimately carry narrower images.
        env = self.spark.read.parquet(path)
        key = self._key_col(env)
        dest = self._ensure_dest(env, key)
        if key != dest.key_col:
            raise ValueError(
                f"feed key column {key!r} != replica key column "
                f"{dest.key_col!r} — wrong feed for this replica?"
            )
        self._apply_schema_log(dest, self._sidecar_log(path))
        payload = self._payload_fields(env)
        new_fields = [
            f for f in payload if f.name not in dest.schema.fieldNames()
        ]
        if new_fields:
            dest.evolve_schema(new_fields)  # idempotent, additive
        upd = env.select(
            F.col(key),
            # widened domain: syncs land on EVEN slots; a replica-side
            # purge tombstone (footer max + 1) takes the odd slot between
            F.lit(2 * v_to).cast("long").alias(MIRROR_SEQ_COL),
            F.when(F.col("op") == "d", F.lit("delete"))
            .when(F.col("op") == "c", F.lit("insert"))
            .otherwise(F.lit("update"))
            .alias("op"),
            *[F.col(f"after.{f.name}").alias(f.name) for f in payload],
        )
        # Fence = the replica manifest epoch in the SOURCE-VERSION domain;
        # snapshot flip commits rows + cursor atomically, so a re-driven
        # directory is a clean no-op and a crash resumes exactly here.
        if "purge" not in env.columns:
            dest.merge_upsert(upd, epoch_id=v_to)
            return
        # Purge directory (ChangelogExportSink.apply_purge): every row is
        # a keys-only 'd' envelope. The replica PHYSICALLY forgets — a
        # plain tombstone would leave the purged payload readable in
        # pre-compaction replica files — and the driver collect is
        # O(purged keys), the same bound purge_keys takes as input.
        # ORDER IS LOAD-BEARING: purge FIRST, fenced cursor merge LAST.
        # A crash after the purge re-drives into an idempotent re-purge;
        # the reverse order would fence the re-drive out after a crash
        # and silently skip the physical purge forever.
        keys = [r[0] for r in env.select(key).collect()]
        if keys:
            dest.purge_keys(keys)
        dest.merge_upsert(upd, epoch_id=v_to)

    # ------------------------------------------------------------- reads
    def state(self, strategy: str = "sql") -> DataFrame:
        """The replica, shaped like the SOURCE's ``current_state`` (the
        mirror bookkeeping column dropped)."""
        if self.dest is None:
            raise FileNotFoundError("mirror has not synced yet")
        return self.dest.current_state(strategy).drop(MIRROR_SEQ_COL)
