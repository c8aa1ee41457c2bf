#!/usr/bin/env python
"""CLI entry point for the CDC ingest engine — the spark-submit surface.

Cluster:
    python scripts/make_pyfiles.py          # builds dist/hemera_indexer_spark.zip
    spark-submit --py-files dist/hemera_indexer_spark.zip \
        scripts/run_ingest.py --log-dir /data/changelog --table-root /lake/sequences \
        --partitions 64 --num-buckets 4096

Local (no spark-submit needed):
    python scripts/run_ingest.py --log-dir ... --table-root ... --cores 32

Resumes from the table's checkpoint manifest automatically; prints
per-partition lineage and throughput on completion.

Blue/green staging: add ``--branch NAME`` to replay onto a named branch
(main readers see nothing), validate, then publish with
``lake_admin.py TABLE_ROOT branch-ff NAME`` (pure metadata).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-dir", required=True)
    ap.add_argument("--table-root", required=True)
    ap.add_argument("--partitions", type=int, required=True, help="change-log partitions")
    ap.add_argument("--num-buckets", type=int, default=128)
    ap.add_argument("--rebucket-target-rows", type=int, default=None,
                    help="grow-only layout policy: after each group, grow "
                         "the bucket count (next power of two, <=4x/call) "
                         "when physical rows per bucket exceed this")
    ap.add_argument("--cores", type=int, default=None, help="local-mode parallelism")
    ap.add_argument("--strategy", default="auto",
                    choices=["auto", "jvm", "arrow", "pandas", "sql"])
    ap.add_argument("--mode", default="mor", choices=["mor", "cow"])
    ap.add_argument("--max-epochs", type=int, default=None)
    ap.add_argument("--compact-max-deltas", type=int, default=8)
    ap.add_argument("--streaming", action="store_true",
                    help="drive with Structured Streaming (availableNow) instead of the batch loop")
    ap.add_argument("--entity-types", default="STATE",
                    help="comma list of outputs to materialize: STATE, FACTS,"
                         " EXPORTS, ALL (the reference's -E entity bitmask)")
    ap.add_argument("--fact-compact-max-files", type=int, default=None,
                    help="fact-table small-file maintenance: bin-pack "
                         "buckets holding more than this many files after "
                         "each group/batch (default: never)")
    ap.add_argument("--fact-compact-small-rows", type=int, default=1_000_000,
                    help="size-tier threshold: only files under this many "
                         "rows are pack candidates (bounds per-group write "
                         "amplification); 0 = no tier, full rewrite")
    ap.add_argument("--fact-retention-lag-seqs", type=int, default=None,
                    help="rolling fact retention: after each group, drop "
                         "history below (max seq - lag); acts only once "
                         "whole files fall below the cutoff")
    ap.add_argument("--fact-table-root", default=None,
                    help="append-only event-history fact table location "
                         "(implies FACTS; required when FACTS is selected)")
    ap.add_argument("--export-dir", default=None,
                    help="range-file export stream location (implies EXPORTS;"
                         " required when EXPORTS is selected)")
    ap.add_argument("--export-format", default="json", choices=["json", "csv"])
    ap.add_argument("--view-dir", default=None,
                    help="incrementally-maintained materialized aggregate "
                         "location (implies VIEWS)")
    ap.add_argument("--view-group-cols", default="source",
                    help="comma list of GROUP BY columns for the view")
    ap.add_argument("--view-sum-cols", default="n_tok",
                    help="comma list of columns the view sums")
    ap.add_argument("--dedup-index-dir", default=None,
                    help="maintain a near-dup MinHash signature index over "
                         "the state table at this root (SignatureIndexSink; "
                         "loaded if it exists, else built from the current "
                         "state before the run)")
    ap.add_argument("--dedup-index-text-col", default="tokens",
                    help="state column to shingle (array columns shingle as "
                         "token-id n-grams)")
    ap.add_argument("--dedup-report-dir", default=None,
                    help="with --dedup-index-dir: write a per-group near-dup "
                         "admission report (new docs vs the previously "
                         "committed corpus) under this dir, one parquet dir "
                         "per fenced epoch")
    ap.add_argument("--dedup-report-threshold", type=float, default=0.5,
                    help="verified-jaccard cutoff for the admission report")
    ap.add_argument("--ann-index-dir", default=None,
                    help="maintain an IVF vector index over an embedding "
                         "column of the state table at this root "
                         "(IVFIndexSink; loaded if it exists, else trained "
                         "from the current state before the run)")
    ap.add_argument("--ann-vec-col", default="embedding",
                    help="state column holding the vectors (array<float>)")
    ap.add_argument("--ann-ncells", type=int, default=16,
                    help="IVF cell count when building a new index")
    ap.add_argument("--ann-max-drift", type=float, default=None,
                    help="retrain the quantizer in-line when the corpus "
                         "drift since training exceeds this fraction "
                         "(default: never — retrain offline via "
                         "lake_admin.py ivf-maintain)")
    ap.add_argument("--secidx-dir", default=None,
                    help="maintain a value->key secondary index over a "
                         "payload column at this root (SecondaryIndexSink; "
                         "loaded if it exists, else built from the current "
                         "state before the run)")
    ap.add_argument("--secidx-value-col", default="n_tok",
                    help="state column the secondary index covers")
    ap.add_argument("--pq-index-dir", default=None,
                    help="also maintain a persisted product-quantization "
                         "code index over the vector column at this root "
                         "(PQIndex via VectorIndexSink; loaded if it "
                         "exists, else trained on the current state)")
    ap.add_argument("--pq-dim", type=int, default=64,
                    help="vector dimensionality for --pq-index-dir")
    ap.add_argument("--pq-m", type=int, default=4,
                    help="PQ subspaces (codes per vector)")
    ap.add_argument("--pq-ks", type=int, default=16,
                    help="PQ codes per subspace")
    ap.add_argument("--cdc-export-dir", default=None,
                    help="also emit a Debezium-shaped net change feed "
                         "(before/after images) under this directory "
                         "(ChangelogExportSink)")
    ap.add_argument("--cdc-export-initial-version", type=int, default=None,
                    help="export changes after this snapshot version "
                         "(default: attach-time; 0 = full backfill as "
                         "'c' envelopes on the first sync)")
    ap.add_argument("--secidx-maintain-after", type=int, default=None,
                    help="rewrite the value-sorted projection when it lags "
                         "the sync cursor by this many rounds (default: "
                         "never in-line — lookups stay correct through the "
                         "narrow-scan path; refresh offline)")
    ap.add_argument("--confirmation-lag", type=int, default=0,
                    help="stay this many epochs behind the log head (--delay analog)")
    ap.add_argument("--max-batch-epochs", type=int, default=8,
                    help="catch-up grouping cap: rollback-free epochs merged per commit")
    ap.add_argument("--expire-keep-last", type=int, default=0,
                    help="after the run, expire snapshots beyond the newest K and vacuum orphans")
    ap.add_argument("--replay-quarantine", action="store_true",
                    help="re-validate and replay the dead-letter dir "
                         "(requires --quarantine-dir); corrected events "
                         "merge with their original seqs, rollbacks are "
                         "refused (use --repair for those)")
    ap.add_argument("--map-op", action="append", default=[],
                    metavar="FROM=TO",
                    help="with --replay-quarantine: rewrite op FROM to TO "
                         "before re-validation (the common foreign-writer "
                         "fix, e.g. upsert=update); repeatable")
    ap.add_argument("--repair", default=None, metavar="LO..HI",
                    help="re-verify + re-drive a committed epoch range "
                         "(single-runner locked; 'LO..HI' or 'LO' alone "
                         "repairs LO through the committed head), then "
                         "continue the normal replay to the log head")
    ap.add_argument("--repair-lock-ttl", type=float, default=3600.0,
                    help="seconds before a crashed runner's repair lock may "
                         "be taken over")
    ap.add_argument("--tenant-col", default=None,
                    help="multi-tenant mode: stamp every row of this run "
                         "with TENANT-COL = TENANT-ID (the reference's "
                         "chain_id); several tenant runs may share one "
                         "table, each fenced independently")
    ap.add_argument("--tenant-id", default=None,
                    help="tenant value for --tenant-col; digits are stored "
                         "as a LONG column, anything else as STRING")
    ap.add_argument("--quarantine-dir", default=None,
                    help="dead-letter dir: malformed events (NULL "
                         "key/seq/op, unknown op, rollback without target) "
                         "are diverted here with a quarantine_reason column "
                         "instead of poisoning the merge")
    ap.add_argument("--quarantine-scan", default="footer",
                    choices=["footer", "always"],
                    help="'footer': divert pass only when Parquet footer "
                         "null-counts cannot prove the group clean (free on "
                         "clean logs; footer-INVISIBLE malformations — "
                         "unknown op strings, rollbacks with NULL target — "
                         "pass through); 'always': every group pays one "
                         "filtered scan and catches those too (streaming "
                         "mode always behaves like 'always')")
    ap.add_argument("--check-policy", default="abort",
                    choices=["abort", "quarantine"],
                    help="disposition of CHECK-constraint violations "
                         "(LakeTable.set_check): 'abort' raises "
                         "CheckViolationError before anything lands; "
                         "'quarantine' diverts violating insert/update "
                         "events to --quarantine-dir (required) with "
                         "reason 'check:<name>' and merges the clean "
                         "remainder (batch controller only)")
    ap.add_argument("--branch", default=None,
                    help="ingest onto a named BRANCH of the state table "
                         "(created at the current head if absent): blue/"
                         "green staging — main readers see nothing until "
                         "`lake_admin.py branch-ff NAME` publishes the "
                         "chain as pure metadata. Plain STATE ingest only "
                         "(no sinks/fact/catalog/expire: those follow the "
                         "publish)")
    ap.add_argument("--catalog-dir", default=None,
                    help="LakeCatalog root: auto-created; the state table "
                         "(and any index/fact sinks' tables) are registered "
                         "under fixed names and re-pinned after every "
                         "committed group, so catalog readers always see a "
                         "mutually-consistent multi-table point")
    ap.add_argument("--metrics-dir", default=None,
                    help="per-epoch processing journal: append one row per "
                         "processed epoch (events, rollbacks, wall_ms, "
                         "strategy, quarantined, tenant) into a fact "
                         "LakeTable at this path (batch controller only)")
    args = ap.parse_args()
    tenant_kw = {}
    if args.quarantine_dir is not None:
        tenant_kw["quarantine_dir"] = args.quarantine_dir
        tenant_kw["quarantine_scan"] = args.quarantine_scan
    if args.check_policy != "abort":
        tenant_kw["check_policy"] = args.check_policy
    if args.tenant_col is not None:
        if args.tenant_id is None:
            ap.error("--tenant-col requires --tenant-id")
        tid = int(args.tenant_id) if args.tenant_id.isdigit() else args.tenant_id
        # update, never replace: the quarantine keys may already be set
        tenant_kw.update({"tenant_col": args.tenant_col, "tenant_id": tid})
        if args.streaming:
            ap.error("--tenant-col uses the batch controller; drop --streaming")

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:  # under spark-submit the session config is external
        spark = active
    else:
        from hemera_indexer_spark.session import get_spark

        spark = get_spark("hemera-ingest", cores=args.cores)

    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA

    if os.path.exists(os.path.join(args.table_root, "meta", "VERSION")):
        table = LakeTable.load(spark, args.table_root)
    else:
        table = LakeTable.create(
            spark,
            args.table_root,
            SEQUENCES_SCHEMA,
            num_buckets=args.num_buckets,
            properties={"write_mode": args.mode},
        )

    # resolve the entity selection to the sink set (entity_type.py analog);
    # giving a location implies selecting that entity, for compatibility
    from hemera_indexer_spark.enumeration import EntityType, parse_entity_types

    entities = parse_entity_types(args.entity_types)
    if args.branch:
        if (
            entities != EntityType.STATE
            or args.fact_table_root or args.export_dir or args.view_dir
            or args.dedup_index_dir or args.ann_index_dir or args.secidx_dir
            or args.pq_index_dir or args.cdc_export_dir or args.catalog_dir
            or args.expire_keep_last or args.streaming
        ):
            ap.error(
                "--branch supports plain batch STATE ingest; sinks, "
                "catalog, retention and streaming run against main after "
                "`lake_admin.py branch-ff` publishes"
            )
        table = (
            table.branch(args.branch)
            if os.path.exists(
                os.path.join(
                    args.table_root, "meta", f"bref-{args.branch}.json"
                )
            )
            else table.create_branch(args.branch)
        )
    if args.fact_table_root:
        entities |= EntityType.FACTS
    if args.export_dir:
        entities |= EntityType.EXPORTS
    if args.view_dir:
        entities |= EntityType.VIEWS
    if args.dedup_index_dir:
        entities |= EntityType.DEDUP_INDEX
    if args.ann_index_dir:
        entities |= EntityType.ANN_INDEX
    if args.secidx_dir:
        entities |= EntityType.SEC_INDEX

    fact_table = None
    if EntityType.FACTS in entities:
        if not args.fact_table_root:
            ap.error("--entity-types FACTS requires --fact-table-root")
        from hemera_indexer_spark.schemas import FACTS_SCHEMA

        if os.path.exists(os.path.join(args.fact_table_root, "meta", "VERSION")):
            fact_table = LakeTable.load(spark, args.fact_table_root)
        else:
            fact_table = LakeTable.create(
                spark, args.fact_table_root, FACTS_SCHEMA,
                num_buckets=args.num_buckets,
                properties={"table_type": "fact"},
            )
    sinks = []
    if EntityType.EXPORTS in entities:
        if not args.export_dir:
            ap.error("--entity-types EXPORTS requires --export-dir")
        from hemera_indexer_spark.streaming.sinks import RangeFileSink

        sinks.append(RangeFileSink(args.export_dir, fmt=args.export_format))
    view_sink = None
    if EntityType.VIEWS in entities:
        if not args.view_dir:
            ap.error("--entity-types VIEWS requires --view-dir")
        from hemera_indexer_spark.streaming.sinks import IncrementalAggSink

        view_sink = IncrementalAggSink(
            table, args.view_dir,
            group_cols=tuple(c for c in args.view_group_cols.split(",") if c),
            sum_cols=tuple(c for c in args.view_sum_cols.split(",") if c),
        )
        sinks.append(view_sink)
    index_sink = None
    if EntityType.DEDUP_INDEX in entities:
        if not args.dedup_index_dir:
            ap.error("--entity-types DEDUP_INDEX requires --dedup-index-dir")
        from hemera_indexer_spark.operators.dedup_index import SignatureIndex
        from hemera_indexer_spark.streaming.sinks import SignatureIndexSink

        if os.path.exists(os.path.join(args.dedup_index_dir, "meta", "VERSION")):
            idx = SignatureIndex.load(spark, args.dedup_index_dir)
        else:
            idx = SignatureIndex.build_from_table(
                spark, args.dedup_index_dir, table,
                id_col=table.key_col, text_col=args.dedup_index_text_col,
            )
        index_sink = SignatureIndexSink(
            table, idx, text_col=args.dedup_index_text_col,
            report_dir=args.dedup_report_dir,
            report_threshold=args.dedup_report_threshold,
            fence_key=args.tenant_id if args.tenant_col else None,
        )
        sinks.append(index_sink)
    if EntityType.ANN_INDEX in entities:
        if not args.ann_index_dir:
            ap.error("--entity-types ANN_INDEX requires --ann-index-dir")
        from hemera_indexer_spark.operators.ivf_index import IVFIndex
        from hemera_indexer_spark.streaming.sinks import IVFIndexSink

        if os.path.exists(os.path.join(args.ann_index_dir, "meta", "VERSION")):
            ann = IVFIndex.load(spark, args.ann_index_dir)
        else:
            ann = IVFIndex.build_from_table(
                spark, args.ann_index_dir, table, ncells=args.ann_ncells,
                id_col=table.key_col, vec_col=args.ann_vec_col,
            )
        sinks.append(
            IVFIndexSink(
                table, ann, id_col=table.key_col, vec_col=args.ann_vec_col,
                max_drift=args.ann_max_drift,
                fence_key=args.tenant_id if args.tenant_col else None,
            )
        )
    if EntityType.SEC_INDEX in entities:
        if not args.secidx_dir:
            ap.error("--entity-types SEC_INDEX requires --secidx-dir")
        from hemera_indexer_spark.operators.secondary_index import (
            SecondaryIndex,
        )
        from hemera_indexer_spark.streaming.sinks import SecondaryIndexSink

        if os.path.exists(os.path.join(args.secidx_dir, "meta", "VERSION")):
            sidx = SecondaryIndex.load(spark, args.secidx_dir)
        else:
            sidx = SecondaryIndex.build_from_table(
                spark, args.secidx_dir, table, args.secidx_value_col,
            )
        sinks.append(
            SecondaryIndexSink(
                table, sidx, maintain_after=args.secidx_maintain_after,
                fence_key=args.tenant_id if args.tenant_col else None,
            )
        )
    if EntityType.PQ_INDEX in entities:
        if not args.pq_index_dir:
            ap.error("--entity-types PQ_INDEX requires --pq-index-dir")
        from hemera_indexer_spark.operators.pq_index import PQIndex
        from hemera_indexer_spark.streaming.sinks import VectorIndexSink

        if os.path.exists(os.path.join(args.pq_index_dir, "meta", "VERSION")):
            pidx = PQIndex.load(spark, args.pq_index_dir)
        else:
            pidx = PQIndex.build_from_table(
                spark, args.pq_index_dir, table,
                in_dim=args.pq_dim, m=args.pq_m, ks=args.pq_ks,
                id_col="doc_id", vec_col=args.ann_vec_col,
            )
        sinks.append(
            VectorIndexSink(
                table, pidx, id_col="doc_id", vec_col=args.ann_vec_col,
                max_drift=args.ann_max_drift,
                fence_key=args.tenant_id if args.tenant_col else None,
            )
        )
    if EntityType.CDC_EXPORT in entities:
        if not args.cdc_export_dir:
            ap.error("--entity-types CDC_EXPORT requires --cdc-export-dir")
        from hemera_indexer_spark.streaming.sinks import ChangelogExportSink

        sinks.append(
            ChangelogExportSink(
                table, args.cdc_export_dir,
                initial_version=args.cdc_export_initial_version,
            )
        )

    catalog_kw = {}
    if args.catalog_dir is not None:
        from hemera_indexer_spark.lake import LakeCatalog

        if os.path.exists(os.path.join(args.catalog_dir, "VERSION")):
            catalog = LakeCatalog.load(spark, args.catalog_dir)
        else:
            catalog = LakeCatalog.create(spark, args.catalog_dir)
        roots = {"state": args.table_root}
        if fact_table is not None:
            roots["fact"] = args.fact_table_root
        for nm, d in (
            ("dedup_index", args.dedup_index_dir),
            ("ann_index", args.ann_index_dir),
            ("sec_index", args.secidx_dir),
        ):
            if d:
                roots[nm] = d
        registered = set(catalog.versions())
        for nm, root in roots.items():
            if nm not in registered:
                catalog.register(nm, root)
        catalog_kw = {
            "catalog": catalog, "catalog_tables": sorted(roots),
        }

    t0 = time.monotonic()
    if args.replay_quarantine:
        if not args.quarantine_dir:
            ap.error("--replay-quarantine requires --quarantine-dir")
        if args.streaming:
            ap.error("--replay-quarantine uses the batch controller; "
                     "drop --streaming")
        from pyspark.sql import functions as F

        from hemera_indexer_spark.streaming import StreamController

        op_map = dict(m.split("=", 1) for m in args.map_op)

        def _fix(df):
            if not op_map:
                return df
            expr = None
            for frm, to in op_map.items():
                cond = F.col("op") == frm
                expr = (
                    F.when(cond, F.lit(to)) if expr is None
                    else expr.when(cond, F.lit(to))
                )
            return df.withColumn("op", expr.otherwise(F.col("op")))

        # tenant_kw already carries quarantine_dir/quarantine_scan (and the
        # tenant namespacing that scopes the dead-letter dir per tenant)
        ctl = StreamController(
            spark, table, args.log_dir, args.partitions,
            merge_strategy=args.strategy,
            **tenant_kw,
        )
        report = ctl.replay_quarantined(fix=_fix if op_map else None)
        print(json.dumps({"replay_quarantine": report}))
        return

    if args.repair is not None:
        if args.streaming:
            ap.error("--repair uses the batch controller; drop --streaming")
        from hemera_indexer_spark.streaming import StreamController

        part = args.repair.split("..")
        lo = int(part[0])
        hi = int(part[1]) if len(part) > 1 and part[1] else None
        # same layout/fact maintenance knobs as the batch path below: the
        # post-repair full-log re-drive is a long replay, and running it
        # without rebucketing / fact small-file compaction would accumulate
        # exactly the small files a normal run of this CLI would have packed
        stats = StreamController(
            spark, table, args.log_dir, args.partitions,
            merge_strategy=args.strategy,
            compact_max_deltas=args.compact_max_deltas,
            max_batch_epochs=args.max_batch_epochs,
            fact_table=fact_table,
            sinks=sinks,
            confirmation_lag=args.confirmation_lag,
            rebucket_target_rows=args.rebucket_target_rows,
            fact_compact_max_files=args.fact_compact_max_files,
            fact_compact_small_rows=args.fact_compact_small_rows or None,
            fact_retention_lag_seqs=args.fact_retention_lag_seqs,
            metrics_dir=args.metrics_dir,
            **tenant_kw, **catalog_kw,
        ).repair_range(lo, hi, lock_ttl_s=args.repair_lock_ttl)
        events = stats.total_events
    elif args.streaming:
        if any(s is not view_sink and s is not index_sink for s in sinks):
            # fail loudly rather than silently materializing only STATE;
            # the view sink, dedup index and fact table ARE streamable
            ap.error(
                "--streaming drives STATE (plus --view-dir, "
                "--dedup-index-dir and --fact-table-root) only; drop "
                "EXPORTS or use the batch loop"
            )
        if args.metrics_dir:
            ap.error("--metrics-dir journals from the batch controller; "
                     "drop --streaming")
        if args.check_policy != "abort":
            ap.error("--check-policy quarantine uses the batch "
                     "controller; streaming merges keep the abort "
                     "policy (CheckViolationError fails the query)")
        from hemera_indexer_spark.streaming.structured import StructuredIngest

        q = StructuredIngest(
            spark, table, args.log_dir, args.partitions,
            checkpoint_dir=os.path.join(args.table_root, "_stream_ckpt"),
            merge_strategy=args.strategy,
            compact_max_deltas=args.compact_max_deltas,
            view_sink=view_sink,
            fact_table=fact_table,
            quarantine_dir=args.quarantine_dir,
            index_sink=index_sink,
            fact_compact_max_files=args.fact_compact_max_files,
            fact_compact_small_rows=args.fact_compact_small_rows or None,
            fact_retention_lag_seqs=args.fact_retention_lag_seqs,
            **catalog_kw,
        ).start(available_now=True)
        q.awaitTermination()
        events = None
    else:
        from hemera_indexer_spark.streaming import StreamController

        stats = StreamController(
            spark, table, args.log_dir, args.partitions,
            merge_strategy=args.strategy,
            compact_max_deltas=args.compact_max_deltas,
            max_batch_epochs=args.max_batch_epochs,
            fact_table=fact_table,
            sinks=sinks,
            confirmation_lag=args.confirmation_lag,
            rebucket_target_rows=args.rebucket_target_rows,
            fact_compact_max_files=args.fact_compact_max_files,
            fact_compact_small_rows=args.fact_compact_small_rows or None,
            fact_retention_lag_seqs=args.fact_retention_lag_seqs,
            metrics_dir=args.metrics_dir,
            **tenant_kw, **catalog_kw,
        ).run(max_epochs=args.max_epochs)
        events = stats.total_events
    wall = time.monotonic() - t0
    quarantined = sum(
        e.quarantined for e in stats.epochs
    ) if not args.streaming else 0

    table.refresh()
    if args.tenant_col is not None:
        # tenant mode: the run's cursor lives in the namespaced
        # tenant_manifest property, not the default manifest (which
        # stays at -1 and would misreport a successful tenant run)
        tid = (
            int(args.tenant_id)
            if args.tenant_id.isdigit()
            else args.tenant_id
        )
        man = json.loads(
            table.snapshot["properties"].get(
                f"tenant_manifest:{tid}",
                '{"epoch_id": -1, "offsets": {}, "lineage": []}',
            )
        )
    else:
        man = table.snapshot["manifest"]
    out = {
        **({"branch": args.branch} if args.branch else {}),
        **({"tenant_id": args.tenant_id} if args.tenant_col else {}),
        "committed_epoch": man["epoch_id"],
        "offsets": {int(k): v for k, v in man["offsets"].items()},
        "wall_sec": round(wall, 2),
        "lineage": man["lineage"],
    }
    if events:
        out["events"] = events
        out["events_per_sec"] = round(events / wall, 1)
    if quarantined:
        out["quarantined"] = quarantined
    if view_sink is not None and view_sink.committed_epoch() >= 0:
        out["view"] = [r.asDict() for r in view_sink.view().collect()]
    if index_sink is not None:
        out["dedup_index_epoch"] = index_sink.committed_epoch()
        out["dedup_index_synced_version"] = index_sink.index.synced_version()
    if args.expire_keep_last:
        out["expired_snapshots"] = table.expire_snapshots(args.expire_keep_last)
        out["vacuumed_files"] = table.vacuum_orphans()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
