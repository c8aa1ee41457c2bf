"""Persisted IVF (inverted-file) ANN index: the cell-probe counterpart to
``SignatureIndex`` (operators/dedup_index.py), closing the gap that
``ivf_topk`` re-trains its coarse quantizer (iters+1 full-corpus passes) on
every call. At 100 TB the quantizer is trained ONCE, persisted, and reused
by every query batch; only assignment of CHANGED vectors is incremental.

Layout (one LakeTable, one atomic commit domain):

- Assignment rows — (vec_id, seq, is_deleted, cell), LWW by vec_id, so
  maintenance inherits the lake's exactly-once epoch fencing, deletes,
  time travel and rollback discipline for free.
- The quantizer itself — ncells x dim doubles — rides the SAME snapshot as
  a JSON table property (``ivf_centroids``). It is a bounded metadata
  artifact (the thing any IVF build broadcasts), and storing it in the
  snapshot makes centroids + assignments flip together: a reader can never
  observe assignments from one quantizer generation with centroids from
  another.

Family/param pinning follows the SignatureIndex contract: the family
version (seed rule + exact-decimal Lloyd mean + cosine metric,
``similarity.IVF_FAMILY_VERSION``) and ncells are pinned at create time and
``load`` refuses a mismatch loudly — assignments from different quantizer
families must be rebuilt, never mixed.

Equality law (tested): on an index freshly built/retrained from a corpus
snapshot, ``index.topk(...)`` returns exactly what the inline
``ivf_topk(...)`` returns on that corpus — both run the ONE shared
``train_ivf_quantizer`` / ``ivf_probe_topk`` code path. After incremental
``update_from_changes`` syncs, results are approximate in the usual IVF
sense (new vectors are quantized against the FROZEN centroids; the
centroids themselves drift from the data) — ``drift()`` measures how far,
and ``maybe_retrain()`` is the policy knob.

Analog of the reference's re-usable derived caches that avoid re-deriving
state per block range (/root/reference/indexer/jobs/export_token_id_infos_
job.py) — here the cached derivation is quantizer training, the dominant
fixed cost of corpus-scale ANN.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hemera_indexer_spark.lake.table import LakeTable
from hemera_indexer_spark.operators.dedup_index import IndexFamilyError
from hemera_indexer_spark.operators.similarity import (
    IVF_FAMILY_VERSION,
    _argmax_cell,
    centroids_df,
    ivf_probe_topk,
    train_ivf_quantizer,
)


class IVFIndex:
    """Persisted IVF coarse quantizer + per-vector cell assignments."""

    def __init__(self, table: LakeTable):
        self.table = table
        p = table.snapshot["properties"]
        try:
            self.family = int(p["ivf_family"])
            self.ncells = int(p["ivf_ncells"])
        except KeyError as e:
            raise IndexFamilyError(
                f"table at {table.root} has no {e.args[0]} property — "
                "not an IVFIndex table"
            ) from None
        if self.family != IVF_FAMILY_VERSION:
            raise IndexFamilyError(
                f"persisted assignments are IVF family v{self.family}, "
                f"engine is v{IVF_FAMILY_VERSION}: rebuild the index "
                "(quantizers from mixed families partition space "
                "incompatibly)"
            )

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def build_from_table(
        cls,
        spark: SparkSession,
        root: str,
        source: LakeTable,
        ncells: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        num_buckets: int = 16,
    ) -> "IVFIndex":
        """Train the quantizer on the source corpus and persist centroids +
        assignments in ONE commit, recording the sync point (the source's
        snapshot version is the index manifest epoch — the SignatureIndex
        cursor discipline)."""
        v = source.snapshot["version"]
        schema = T.StructType(
            [
                T.StructField("vec_id", source.schema[id_col].dataType),
                T.StructField("seq", T.LongType()),
                T.StructField("is_deleted", T.BooleanType(), False),
                T.StructField("cell", T.IntegerType()),
            ]
        )
        table = LakeTable.create(
            spark,
            root,
            schema,
            num_buckets=num_buckets,
            key_col="vec_id",
            seq_col="seq",
            properties={
                "ivf_family": str(IVF_FAMILY_VERSION),
                "ivf_ncells": str(ncells),
            },
        )
        idx = cls(table)
        idx._train_and_assign(source, v, id_col, vec_col, epoch_id=v)
        return idx

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "IVFIndex":
        return cls(LakeTable.load(spark, root))

    # ---------------------------------------------------------------- state
    def centroids(self) -> list[tuple[int, list[float]]]:
        """The persisted refined quantizer. Python's json round-trips
        doubles exactly (repr-based), so these are bit-identical to the
        trained values — the equality law depends on that."""
        raw = json.loads(self.table.snapshot["properties"]["ivf_centroids"])
        return [(int(c), [float(x) for x in v]) for c, v in raw]

    def trained_version(self) -> int:
        """Source snapshot version the quantizer was TRAINED at (distinct
        from :meth:`synced_version` — assignments can be synced far past the
        training point; that gap is what :meth:`drift` measures)."""
        return int(self.table.snapshot["properties"]["ivf_trained_version"])

    def rows_at_train(self) -> int:
        return int(self.table.snapshot["properties"]["ivf_rows_at_train"])

    def synced_version(self) -> int:
        """Source snapshot version the ASSIGNMENTS last synced to — the
        index table's own manifest epoch, committed atomically with the
        assignment rows (no separate cursor to lose)."""
        return self.table.committed_epoch()

    def assignments(self) -> DataFrame:
        return self.table.current_state().select("vec_id", "cell")

    # ---------------------------------------------------------- maintenance
    @staticmethod
    def _seq_for(version: int, trained: bool) -> int:
        """Index seqs live in a WIDENED maintenance-round domain:
        2*version for incremental syncs, 2*version+1 for (re)trains. The
        merge's target-wins-on-tie law means a retrain stamped at the bare
        source version would TIE with (and lose to) assignment rows a sync
        already wrote at that same version — stale assignments would pair
        with the new centroids, an inconsistent generation. The widened
        domain keeps both verbs monotone in source version while letting a
        retrain at version v beat the sync at v, and the next sync at v' > v
        beat the retrain. Seq values are internal to the index — nothing
        external depends on them."""
        return 2 * version + (1 if trained else 0)

    def _valid(self, df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        # NULL, empty AND zero-norm vectors are unindexable: cosine to any
        # centroid is 0/0 (an ANSI-mode DIVIDE_BY_ZERO crash, NaN
        # otherwise). Real corpora do contain zero embeddings (failed
        # encoder calls, padding rows); they drop out of the index like
        # empties — no cosine neighbor is definable for them.
        return df.where(
            F.col(vec_col).isNotNull()
            & F.exists(F.col(vec_col), lambda x: x != 0)
        )

    def _train_and_assign(
        self,
        source: LakeTable,
        target: int,
        id_col: str,
        vec_col: str,
        epoch_id: int | None,
    ) -> bool:
        from hemera_indexer_spark.lake.table import resolve_source_column

        src_vec = resolve_source_column(source, vec_col, "IVFIndex train")
        emb = self._valid(
            source.current_state().select(
                F.col(id_col), F.col(src_vec).alias(vec_col)
            ),
            id_col,
            vec_col,
        ).persist()  # training + assignment + count: 3 passes over it
        try:
            cents = train_ivf_quantizer(emb, self.ncells, id_col, vec_col)
            refined = centroids_df(self.table.spark, cents)
            seq_lit = (
                F.lit(self._seq_for(target, trained=True))
                .cast("long")
                .alias("seq")
            )
            rows = _argmax_cell(emb, refined, id_col, vec_col).select(
                "vec_id", seq_lit, F.lit("update").alias("op"), "cell"
            )
            # index keys whose source row vanished (or lost its vector)
            # since the last generation must tombstone, or a stale
            # assignment would keep surfacing its vec_id as a candidate
            stale = (
                self.table.current_state()
                .select("vec_id")
                .join(
                    emb.select(F.col(id_col).alias("vec_id")),
                    "vec_id",
                    "left_anti",
                )
                .select(
                    "vec_id",
                    seq_lit,
                    F.lit("delete").alias("op"),
                    F.lit(None).cast("int").alias("cell"),
                )
            )
            n = emb.count()
            return self.table.merge_upsert(
                rows.unionByName(stale),
                epoch_id=epoch_id,
                properties_update={
                    "ivf_centroids": json.dumps(cents),
                    "ivf_trained_version": str(target),
                    "ivf_rows_at_train": str(n),
                },
            )
        finally:
            emb.unpersist()

    def update_from_changes(
        self,
        source: LakeTable,
        since_version: int | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        properties_update: dict | None = None,
    ) -> bool:
        """Assign CHANGED vectors against the FROZEN persisted quantizer —
        O(changed rows), never O(corpus). Inserted/updated vectors get their
        nearest persisted cell; deletes (and rows whose vector emptied)
        tombstone out. Fenced on the source's current snapshot version, so
        a re-driven retry is a no-op. Returns False when already synced."""
        since = self.synced_version() if since_version is None else since_version
        if since < 0:
            raise ValueError(
                "index has never synced: build it with build_from_table() "
                "(which records the sync point) or pass since_version"
            )
        target = source.snapshot["version"]
        if target <= since:
            return False
        ch = source.changes_since(since).persist()
        try:
            from hemera_indexer_spark.lake.table import resolve_source_column

            src_vec = resolve_source_column(source, vec_col, "IVFIndex sync")
            ups = ch.where(F.col("change_op") != "delete").select(
                F.col(id_col), F.col(src_vec).alias(vec_col)
            )
            refined = centroids_df(self.table.spark, self.centroids())
            seq_lit = (
                F.lit(self._seq_for(target, trained=False))
                .cast("long")
                .alias("seq")
            )
            rows = _argmax_cell(
                self._valid(ups, id_col, vec_col), refined, id_col, vec_col
            ).select("vec_id", seq_lit, F.lit("update").alias("op"), "cell")
            null_cell = F.lit(None).cast("int").alias("cell")
            # an update that NULLs/empties the vector produces no assignment
            # row — without this anti-join its stale cell would keep
            # surfacing it as a candidate forever (the SignatureIndex
            # emptied-doc discipline)
            emptied = (
                ups.select(F.col(id_col).alias("vec_id"))
                .join(rows.select("vec_id"), "vec_id", "left_anti")
                .select("vec_id", seq_lit, F.lit("delete").alias("op"), null_cell)
            )
            dels = ch.where(F.col("change_op") == "delete").select(
                F.col(id_col).alias("vec_id"),
                seq_lit,
                F.lit("delete").alias("op"),
                null_cell,
            )
            return self.table.merge_upsert(
                rows.unionByName(emptied).unionByName(dels),
                epoch_id=target,
                properties_update=properties_update,
            )
        finally:
            ch.unpersist()

    def apply_purge(
        self,
        purged_ids: list,
        source: LakeTable,
        physical: bool = True,
        keep_last: int = 1,
    ) -> dict:
        """Fast-forward across a source ``purge_keys`` (RTBF) in
        O(purged keys) — same contract as ``SignatureIndex.apply_purge``:
        the purge's aggressive snapshot expire breaks ``changes_since``
        by design, but only the purged keys changed, so tombstoning
        their assignment rows (the cell is derived from the purged
        embedding) at the post-purge head is complete maintenance.
        Requires sync-at-purge (sync-then-purge discipline); rebuild
        otherwise. Tombstones stamp the SYNC slot of the widened seq
        domain (2*version) so a later retrain at the same version still
        out-sequences them. Note ``drift()`` measures from
        ``trained_version``, whose snapshot the purge likely expired —
        the next quantizer decision after a purge should be
        ``retrain()``, not ``maybe_retrain()``."""
        if self.synced_version() < 0:
            raise ValueError(
                "index has never synced; apply_purge fast-forwards an "
                "in-sync cursor — build_from_table() first"
            )
        target = source.snapshot["version"]
        if self.synced_version() >= target:
            return {"applied": False,
                    "synced_version": self.synced_version()}
        kt = next(
            f.dataType for f in self.table.schema.fields
            if f.name == "vec_id"
        )
        ids = self.table.spark.createDataFrame(
            [(i,) for i in purged_ids],
            T.StructType([T.StructField("vec_id", kt)]),
        )
        rows = ids.select(
            "vec_id",
            F.lit(self._seq_for(target, trained=False))
            .cast("long").alias("seq"),
            F.lit("delete").alias("op"),
            F.lit(None).cast("int").alias("cell"),
        )
        applied = self.table.merge_upsert(rows, epoch_id=target)
        out = {"applied": applied, "synced_version": self.synced_version()}
        if physical and applied:
            self.table.compact()
            out["snapshots_expired"] = self.table.expire_snapshots(
                keep_last=keep_last
            )
            out["files_vacuumed"] = self.table.vacuum_orphans()
        return out

    def drift(self, source: LakeTable, id_col: str = "vec_id") -> float:
        """Fraction of the corpus whose rows changed since the quantizer was
        TRAINED: distinct changed keys since ``trained_version`` over the
        corpus size at training. The retrain trigger — O(changed buckets)
        metadata-pruned read, one count action."""
        trained = self.trained_version()
        if source.snapshot["version"] <= trained:
            return 0.0
        changed = (
            source.changes_since(trained)
            .select(F.col(id_col))
            .distinct()
            .count()
        )
        base = max(self.rows_at_train(), 1)
        return changed / base

    def retrain(
        self,
        source: LakeTable,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> bool:
        """Full quantizer rebuild + reassignment of the whole corpus, in one
        commit (new centroids + new assignments + tombstones for vanished
        keys flip together). After this, the equality law vs the inline
        ``ivf_topk`` holds again."""
        target = source.snapshot["version"]
        # epoch_id=None: retrain is an operator action, not a change-feed
        # sync — but the manifest epoch must still advance to `target` so
        # update_from_changes resumes from here; merge_upsert's manifest
        # derives from epoch_id, so pass it when it moves forward.
        epoch = target if target > self.synced_version() else None
        return self._train_and_assign(source, target, id_col, vec_col, epoch)

    def maybe_retrain(
        self,
        source: LakeTable,
        max_drift: float = 0.25,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> str:
        """The steady-state maintenance verb: retrain when the corpus has
        drifted past ``max_drift`` since training, otherwise incrementally
        sync assignments. Returns which path ran ('retrain' | 'sync' |
        'noop')."""
        if self.drift(source, id_col) >= max_drift:
            self.retrain(source, id_col, vec_col)
            return "retrain"
        return (
            "sync"
            if self.update_from_changes(source, id_col=id_col, vec_col=vec_col)
            else "noop"
        )

    # --------------------------------------------------------------- lookup
    def topk(
        self,
        source: LakeTable,
        query_ids: list[int],
        k: int = 5,
        nprobe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """ANN top-k using the PERSISTED quantizer and assignments — zero
        training passes per query batch. Vectors are read from the source
        table (the index stores no vectors — it is metadata-sized next to
        the corpus); with a vec_id-bucketed source the candidate read
        prunes to the probed cells' members."""
        emb = self._valid(
            source.current_state().select(F.col(id_col), F.col(vec_col)),
            id_col,
            vec_col,
        )
        refined = centroids_df(self.table.spark, self.centroids())
        return ivf_probe_topk(
            emb,
            refined,
            self.assignments(),
            query_ids,
            k,
            nprobe,
            id_col,
            vec_col,
        )
