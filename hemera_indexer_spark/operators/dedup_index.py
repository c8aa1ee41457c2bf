"""Incremental near-dup detection: check NEW documents against an already
committed corpus without re-scanning it — the CDC x dedup bridge.

The reference's indexer re-materializes derived state incrementally per
block range (/root/reference/indexer/controller/stream_controller.py) rather
than recomputing from genesis; this module gives the dedup pipeline the same
property. Two layers:

- ``incremental_lsh_pairs(new, base)``: the pure DataFrame composition —
  MinHash-band the two sides and join NEW buckets against BASE buckets only
  (never base x base, the quadratic part a full-corpus run pays), then
  verify exact Jaccard on the candidate docs. This is the semantics both
  the persisted index and the DuckDB oracle replicate.

- ``SignatureIndex``: the persisted form. Per-doc wide band-bucket rows
  live in a :class:`~hemera_indexer_spark.lake.table.LakeTable` (LWW by
  doc_id), so index maintenance inherits the lake's exactly-once epoch
  fencing, deletes, time travel and rollback discipline for free, and
  ``update_from_changes`` consumes a source table's ``changes_since`` net
  feed — O(changed docs) maintenance, never O(corpus).

Scale notes (100 TB): banding a new micro-batch is O(batch); the candidate
join shuffles on (band, bucket) whose cardinality is corpus-sized (well
distributed). Verification re-reads ONLY candidate base docs from the
corpus table — with a doc_id-bucketed LakeTable the broadcast semi-join
prunes file reads to the candidates' buckets. The index deliberately does
NOT store shingle sets (that would be a second copy of the corpus); the
band buckets are ~bands * 8 * (k/bands) hex chars per doc regardless of
document length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hemera_indexer_spark.functions.rounding import round_double
from pyspark.sql import types as T

from hemera_indexer_spark.lake.table import LakeTable
from hemera_indexer_spark.operators.dedup import (
    MINHASH_FAMILY_VERSION,
    _minhash_aggs,
    word_shingles,
)


class IndexFamilyError(RuntimeError):
    """Persisted signatures were built by an incompatible MinHash family or
    LSH parameterization — they must be rebuilt, never mixed (signatures
    from different families have unrelated collision probabilities)."""


def _band_cols(k: int, bands: int) -> list[str]:
    return [f"b{b}" for b in range(bands)]


def band_buckets_wide(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Per-doc WIDE band buckets: (doc_id, b0..b{bands-1}) where each b_i is
    the comma-joined minhash chunk string of band i — the persisted unit of
    the signature index (one row per doc, LWW-upsertable by doc_id).

    Same physical shape as ``lsh_candidate_pairs``'s banding stage: one
    map-only shingle explode (duplicates don't move a ``min``), ONE
    map-side-combined groupBy(doc_id) computing all k mins, bucket strings
    as pure column concats."""
    if k % bands != 0:
        raise ValueError(f"k ({k}) must be divisible by bands ({bands})")
    r = k // bands
    sh = word_shingles(df, id_col, text_col, n, distinct=False)
    wide = sh.groupBy("doc_id").agg(*_minhash_aggs(k))
    return wide.select(
        "doc_id",
        *[
            F.concat_ws(
                ",", *[F.col(f"_h{b * r + i}") for i in range(r)]
            ).alias(f"b{b}")
            for b in range(bands)
        ],
    )


def _explode_bands(wide: DataFrame, bands: int, id_alias: str) -> DataFrame:
    """Wide bucket row -> (id_alias, band, bucket) long form. Map-only."""
    pairs = F.array(
        *[
            F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("bucket"))
            for b in range(bands)
        ]
    )
    return wide.select(
        F.col("doc_id").alias(id_alias), F.explode(pairs).alias("_bb")
    ).select(
        id_alias,
        F.col("_bb.band").alias("band"),
        F.col("_bb.bucket").alias("bucket"),
    )


def _verify_pairs(
    cand: DataFrame,
    new_docs: DataFrame,
    base_docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
    caches: list | None = None,
) -> DataFrame:
    """Exact-Jaccard verification of (new_id, base_id) candidates. Both
    corpora are pruned to candidate docs via broadcast semi-joins BEFORE the
    distinct / size / common-shingle shuffles — everything past the prune is
    O(candidates), the 100 TB-critical property.

    cand/sh_new/sh_base are cached for multi-branch plan reuse. The result
    is LAZY, so this function cannot unpersist them itself; pass ``caches``
    (a list) and they are appended for the caller to unpersist after its
    consuming action (try/finally, as update_from_changes does). Omitting
    ``caches`` is only acceptable for one-shot queries where session-end /
    LRU cleanup suffices — never in a long-lived ingest loop, where the
    per-group leak accumulates executor storage."""
    cand = cand.cache()
    new_ids = cand.select(F.col("new_id").alias("doc_id")).distinct()
    base_ids = cand.select(F.col("base_id").alias("doc_id")).distinct()
    sh_new = (
        word_shingles(new_docs, id_col, text_col, n, distinct=False)
        .join(F.broadcast(new_ids), "doc_id", "left_semi")
        .distinct()
        .cache()
    )
    sh_base = (
        word_shingles(base_docs, id_col, text_col, n, distinct=False)
        .join(F.broadcast(base_ids), "doc_id", "left_semi")
        .distinct()
        .cache()
    )
    if caches is not None:
        caches.extend([cand, sh_new, sh_base])
    size_new = sh_new.groupBy("doc_id").agg(F.count("*").alias("n_new"))
    size_base = sh_base.groupBy("doc_id").agg(F.count("*").alias("n_base"))
    common = (
        cand.join(sh_new.select(F.col("doc_id").alias("new_id"), "shingle"), "new_id")
        .join(
            sh_base.select(F.col("doc_id").alias("base_id"), "shingle"),
            ["base_id", "shingle"],
        )
        .groupBy("new_id", "base_id")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(size_new.select(F.col("doc_id").alias("new_id"), "n_new"), "new_id")
        .join(size_base.select(F.col("doc_id").alias("base_id"), "n_base"), "base_id")
        .select(
            "new_id",
            "base_id",
            round_double(
                F.col("n_common")
                / (F.col("n_new") + F.col("n_base") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def incremental_lsh_pairs(
    new_docs: DataFrame,
    base_docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs between a NEW batch and a BASE corpus: MinHash-band
    both sides, equi-join new buckets x base buckets (asymmetric — base x
    base pairs are never generated, which is what makes incremental checking
    O(batch x collision rate) instead of O(corpus^2 collision rate)), verify
    candidates with exact n-gram Jaccard. Returns (new_id, base_id, jaccard).

    Law (tested): equals ``lsh_candidate_pairs(new UNION base)`` restricted
    to pairs that cross the split — banding and verification are per-pair
    deterministic, so checking a batch against the corpus incrementally
    yields exactly what the full-corpus run would have said about those
    pairs. A doc_id present on both sides is excluded (it is an update of
    itself, not a duplicate)."""
    bn = _explode_bands(
        band_buckets_wide(new_docs, id_col, text_col, n, k, bands), bands, "new_id"
    )
    bb = _explode_bands(
        band_buckets_wide(base_docs, id_col, text_col, n, k, bands), bands, "base_id"
    )
    cand = (
        bn.join(bb, ["band", "bucket"])
        .where(F.col("new_id") != F.col("base_id"))
        .select("new_id", "base_id")
        .distinct()
    )
    return _verify_pairs(
        cand, new_docs, base_docs, id_col, text_col, n, threshold
    )


class SignatureIndex:
    """Persisted MinHash band-bucket index over a document corpus.

    One LWW row per doc: (doc_id, seq, b0..b{bands-1}). The LSH
    parameterization (family version, n, k, bands) is pinned in the lake
    table's properties at create time; ``load`` refuses a family/param
    mismatch loudly (:class:`IndexFamilyError`) because signatures from
    different families must be rebuilt, never mixed — the versioning
    contract ADVICE.md round 3 asked for, made structural.

    Analog of the reference's re-usable token/contract caches that avoid
    re-deriving state per block range (/root/reference/indexer/jobs/
    export_token_id_infos_job.py) — here the cached derivation is the
    signature scan, the dominant cost of corpus-scale dedup."""

    def __init__(self, table: LakeTable):
        self.table = table
        p = table.snapshot["properties"]
        try:
            self.family = int(p["minhash_family"])
            self.n = int(p["lsh_n"])
            self.k = int(p["lsh_k"])
            self.bands = int(p["lsh_bands"])
        except KeyError as e:  # not a signature-index table
            raise IndexFamilyError(
                f"table at {table.root} has no {e.args[0]} property — "
                "not a SignatureIndex table"
            ) from None
        if self.family != MINHASH_FAMILY_VERSION:
            raise IndexFamilyError(
                f"persisted signatures are family v{self.family}, engine is "
                f"v{MINHASH_FAMILY_VERSION}: rebuild the index (mixed "
                "families have unrelated collision probabilities)"
            )

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        n: int = 2,
        k: int = 16,
        bands: int = 4,
        num_buckets: int = 16,
        id_type: T.DataType | None = None,
    ) -> "SignatureIndex":
        if k % bands != 0:
            raise ValueError(f"k ({k}) must be divisible by bands ({bands})")
        schema = T.StructType(
            [
                T.StructField("doc_id", id_type or T.StringType()),
                T.StructField("seq", T.LongType()),
                # the engine's tombstone flag: without it in the state
                # schema, merge_upsert's select(*state_cols) would drop the
                # delete marker and tombstones would read back as live rows
                T.StructField("is_deleted", T.BooleanType(), False),
            ]
            + [T.StructField(c, T.StringType()) for c in _band_cols(k, bands)]
        )
        table = LakeTable.create(
            spark,
            root,
            schema,
            num_buckets=num_buckets,
            key_col="doc_id",
            seq_col="seq",
            properties={
                "minhash_family": str(MINHASH_FAMILY_VERSION),
                "lsh_n": str(n),
                "lsh_k": str(k),
                "lsh_bands": str(bands),
            },
        )
        return cls(table)

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "SignatureIndex":
        return cls(LakeTable.load(spark, root))

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        root: str,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 2,
        k: int = 16,
        bands: int = 4,
        num_buckets: int = 16,
    ) -> "SignatureIndex":
        """Create + bulk-sign a standalone corpus DataFrame (round 0, no
        sync cursor — use :meth:`build_from_table` when the corpus lives in
        a LakeTable and the index will be CDC-maintained)."""
        idx = cls.create(
            spark,
            root,
            n=n,
            k=k,
            bands=bands,
            num_buckets=num_buckets,
            id_type=docs.schema[id_col].dataType,
        )
        idx.upsert(docs, id_col, text_col, seq=0, epoch_id=None)
        return idx

    @classmethod
    def build_from_table(
        cls,
        spark: SparkSession,
        root: str,
        source: LakeTable,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 2,
        k: int = 16,
        bands: int = 4,
        num_buckets: int = 16,
    ) -> "SignatureIndex":
        """Bulk-sign a LakeTable corpus AND record the sync point (the
        source's current snapshot version rides the index manifest as its
        epoch), so ``update_from_changes(source)`` picks up from exactly
        this state with no caller-side cursor."""
        v = source.snapshot["version"]
        idx = cls.create(
            spark,
            root,
            n=n,
            k=k,
            bands=bands,
            num_buckets=num_buckets,
            id_type=source.schema[id_col].dataType,
        )
        idx.upsert(
            source.current_state().select(F.col(id_col), F.col(text_col)),
            id_col,
            text_col,
            seq=v,
            epoch_id=v,
        )
        return idx

    # ---------------------------------------------------------- maintenance
    def _wide(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        return band_buckets_wide(
            docs, id_col, text_col, n=self.n, k=self.k, bands=self.bands
        )

    def upsert(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        seq: int = 0,
        epoch_id: int | None = None,
        delete_ids: DataFrame | None = None,
    ) -> bool:
        """Sign ``docs`` and LWW-merge into the index at ``seq``;
        ``delete_ids`` (a one-column doc-id frame) drop out. Idempotent
        under ``epoch_id`` fencing like any lake merge.

        The index's seq domain is the MAINTENANCE ROUND (a source snapshot
        version), never the source rows' own seqs: the net change feed
        yields at most one row per key per round, so round-stamping makes
        cross-round LWW trivially correct — whereas carrying row seqs would
        let a source DELETE (reported with the OLD row's seq) tie the stored
        signature and lose (the merge's target-wins-on-tie law)."""
        rows = self._wide(docs, id_col, text_col).select(
            "*", F.lit(seq).cast("long").alias("seq"), F.lit("update").alias("op")
        )
        if delete_ids is not None:
            dels = delete_ids.select(
                F.col(delete_ids.columns[0]).alias("doc_id"),
                F.lit(seq).cast("long").alias("seq"),
                F.lit("delete").alias("op"),
                *[F.lit(None).cast("string").alias(c) for c in _band_cols(self.k, self.bands)],
            )
            rows = rows.unionByName(dels)
        return self.table.merge_upsert(rows, epoch_id=epoch_id)

    def synced_version(self) -> int:
        """The source snapshot version this index last synced to (-1 =
        never) — the index table's own manifest epoch, committed atomically
        WITH the signature rows, so there is no separate cursor to lose."""
        return self.table.committed_epoch()

    def update_from_changes(
        self,
        source: LakeTable,
        since_version: int | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        properties_update: dict | None = None,
    ) -> bool:
        """Maintain the index from a source table's net change feed
        (``changes_since``): re-sign inserted/updated docs, drop deleted
        ones — O(changed docs) work, never O(corpus).

        ``since_version`` defaults to :meth:`synced_version`, so steady-state
        callers just call ``idx.update_from_changes(src)`` after each source
        commit. Every row (update AND delete) is stamped seq = the source's
        CURRENT snapshot version, and the merge is fenced on that same
        version — a re-driven retry is a no-op, and the fence doubles as the
        persisted sync cursor. Returns False when already synced."""
        since = self.synced_version() if since_version is None else since_version
        if since < 0:
            raise ValueError(
                "index has never synced and no since_version given: build it "
                "with build_from_table() (which records the sync point) or "
                "pass since_version explicitly"
            )
        target = source.snapshot["version"]
        if target <= since:
            return False
        # the merge plan references the change feed three times (updates,
        # emptied-doc anti-join, deletes) and the signature aggregate twice
        # (rows + emptied-doc probe) — persist both or the full-outer
        # snapshot diff and the md5 shingle pass run 3x/2x per sync (the
        # dominant cost of the index sink, scripts/profile_sinks.py)
        ch = source.changes_since(since).persist()
        from hemera_indexer_spark.lake.table import resolve_source_column

        src_text = resolve_source_column(
            source, text_col, "SignatureIndex sync"
        )
        ups = ch.where(F.col("change_op") != "delete").select(
            F.col(id_col), F.col(src_text).alias(text_col)
        )
        seq_lit = F.lit(target).cast("long").alias("seq")
        wide = band_buckets_wide(
            ups, id_col, text_col, n=self.n, k=self.k, bands=self.bands
        ).select("*", seq_lit, F.lit("update").alias("op")).persist()
        null_bands = [
            F.lit(None).cast("string").alias(c)
            for c in _band_cols(self.k, self.bands)
        ]
        # an update that empties a doc's text yields NO wide row (zero
        # shingles -> nothing to min over); without this anti-join the STALE
        # signature would keep matching forever. No shingles = cannot be a
        # near-dup, so it drops out of the index like a delete.
        emptied = (
            ups.select(F.col(id_col).alias("doc_id"))
            .join(wide.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", seq_lit, F.lit("delete").alias("op"), *null_bands)
        )
        dels = ch.where(F.col("change_op") == "delete").select(
            F.col(id_col).alias("doc_id"),
            seq_lit,
            F.lit("delete").alias("op"),
            *null_bands,
        )
        try:
            return self.table.merge_upsert(
                wide.unionByName(emptied).unionByName(dels),
                epoch_id=target,
                properties_update=properties_update,
            )
        finally:
            wide.unpersist()
            ch.unpersist()

    def apply_purge(
        self,
        purged_ids: list,
        source: LakeTable,
        physical: bool = True,
        keep_last: int = 1,
    ) -> dict:
        """Fast-forward the index across a source ``purge_keys`` (RTBF)
        in O(purged keys) — the scalable alternative to a full rebuild.

        ``purge_keys`` must expire the source's pre-purge snapshots
        (retaining them would vacuum-protect the purged payload), which
        makes ``changes_since`` from any pre-purge cursor impossible BY
        DESIGN. But the purge mutated only the purged keys — its
        compact/expire/vacuum tail is pure reorganization — so the
        complete index maintenance is: tombstone those keys' signature
        rows (their band values are DERIVED FROM the purged payload and
        must go too) and fast-forward the sync cursor to the post-purge
        head, fenced in one commit. Requires the index to have been in
        sync at the moment of the purge (the documented sync-then-purge
        retention discipline); anything else changed since the old
        cursor would be silently missed — rebuild instead.

        ``physical=True`` finishes the RTBF: compact (the tombstone
        survives with NULL bands — no derived content), expire all but
        ``keep_last`` index snapshots and vacuum, so no retained index
        file holds the purged doc's band values. ``physical=False``
        leaves ordinary tombstones (payload-derived bands linger in
        pre-compaction files until maintenance). Admission REPORTS
        written by SignatureIndexSink are outside the index and need
        their own scrub if they may reference purged ids."""
        if self.synced_version() < 0:
            raise ValueError(
                "index has never synced; apply_purge fast-forwards an "
                "in-sync cursor — build_from_table() first"
            )
        target = source.snapshot["version"]
        if self.synced_version() >= target:
            return {"applied": False,
                    "synced_version": self.synced_version()}
        spark = self.table.spark
        kt = next(
            f.dataType for f in self.table.schema.fields
            if f.name == "doc_id"
        )
        ids = spark.createDataFrame(
            [(i,) for i in purged_ids],
            T.StructType([T.StructField("doc_id", kt)]),
        )
        rows = ids.select(
            "doc_id",
            F.lit(target).cast("long").alias("seq"),
            F.lit("delete").alias("op"),
            *[
                F.lit(None).cast("string").alias(c)
                for c in _band_cols(self.k, self.bands)
            ],
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

    # --------------------------------------------------------------- lookup
    def candidates(
        self,
        new_docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """(new_id, base_id) candidate pairs: band the new batch (O(batch)
        signature work — the corpus is NOT re-signed, that is the point of
        the index) and equi-join against the persisted buckets."""
        bn = _explode_bands(
            self._wide(new_docs, id_col, text_col), self.bands, "new_id"
        )
        bb = _explode_bands(
            self.table.current_state().select("doc_id", *_band_cols(self.k, self.bands)),
            self.bands,
            "base_id",
        )
        return (
            bn.join(bb, ["band", "bucket"])
            .where(F.col("new_id") != F.col("base_id"))
            .select("new_id", "base_id")
            .distinct()
        )

    def check(
        self,
        new_docs: DataFrame,
        base_docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.5,
        caches: list | None = None,
    ) -> DataFrame:
        """Full incremental near-dup check: persisted-bucket candidates +
        exact-Jaccard verification. ``base_docs`` is the corpus TEXT source
        for verification only — it is read pruned to candidate docs (pass a
        doc_id-bucketed LakeTable read so the semi-join skips files). Equal
        by law to ``incremental_lsh_pairs(new_docs, base_docs)`` whenever
        the index is in sync with ``base_docs``.

        Long-lived callers must pass ``caches`` and unpersist its contents
        after consuming the (lazy) result — see :func:`_verify_pairs`."""
        cand = self.candidates(new_docs, id_col, text_col)
        return _verify_pairs(
            cand, new_docs, base_docs, id_col, text_col, self.n, threshold,
            caches=caches,
        )


def curated_state(
    table: LakeTable,
    report_dir: str,
    min_jaccard: float | None = None,
) -> DataFrame:
    """Near-dup-free view of a state table: ``current_state()`` minus the
    docs the :class:`~hemera_indexer_spark.streaming.sinks.
    SignatureIndexSink` admission reports flagged against EARLIER-committed
    docs — the keep-first curation rule (the committed doc survives; the
    later near-dup arrival is excluded from the curated feed, the
    reference's derived-view discipline applied to corpus curation).

    The flag is sticky by design: it stands even if the base doc is later
    deleted. A flagged doc was redundant at its arrival cut, and sticky
    flags keep the curated view reproducible under replay instead of
    depending on the deletion order of other documents.

    Cost shape: the reports hold FLAGGED PAIRS only (tiny next to the
    corpus), so this is one distinct + one left-anti join on the key —
    O(state) regardless of how many epochs of reports have accumulated.

    ``min_jaccard`` further restricts to pairs at or above the given
    verified similarity (the reports already applied the sink's
    ``report_threshold`` at write time). A missing/empty ``report_dir``
    (sink never flagged anything) curates nothing."""
    import os

    spark = table.spark
    epoch_dirs = (
        sorted(
            os.path.join(report_dir, d)
            for d in os.listdir(report_dir)
            if d.startswith("epoch=")
        )
        if os.path.isdir(report_dir)
        else []
    )
    state = table.current_state()
    if not epoch_dirs:
        return state
    # leaf dirs passed explicitly: each is its own base path, so Spark
    # takes the epoch column from the data files (written by the sink)
    # instead of re-inferring it from the directory name
    rep = spark.read.parquet(*epoch_dirs)
    if min_jaccard is not None:
        rep = rep.where(F.col("jaccard") >= min_jaccard)
    flagged = rep.select(
        F.col("new_id").alias(table.key_col)
    ).distinct()
    return state.join(flagged, table.key_col, "left_anti")
