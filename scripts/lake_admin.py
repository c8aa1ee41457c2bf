"""Operational admin CLI for a LakeTable — the maintenance verbs an
operator runs OUTSIDE the ingest loop (the reference ships these as
standalone commands: hemera.py reorg / aggregates; here: health report,
named tags, DR clone, right-to-be-forgotten purge, retention, packing).

Usage:
    python scripts/lake_admin.py TABLE_ROOT health
    python scripts/lake_admin.py TABLE_ROOT history KEY
    python scripts/lake_admin.py TABLE_ROOT tag NAME [--version V]
    python scripts/lake_admin.py TABLE_ROOT rollback --version V
    python scripts/lake_admin.py TABLE_ROOT analyze [COL,COL...]
    python scripts/lake_admin.py TABLE_ROOT fsck [--deep]
    python scripts/lake_admin.py TABLE_ROOT scan-report [--keys K,K...]
        [--range COL:LO:HI ...] [--seq-at-least N]
    python scripts/lake_admin.py TABLE_ROOT checks
    python scripts/lake_admin.py TABLE_ROOT check-set NAME=PREDICATE
    python scripts/lake_admin.py TABLE_ROOT check-drop NAME
    python scripts/lake_admin.py TABLE_ROOT sql "SELECT ... FROM t ..."
        [--limit N]
    python scripts/lake_admin.py TABLE_ROOT clone DEST
    python scripts/lake_admin.py REPLICA_ROOT mirror FEED_DIR
        (apply a ChangelogExportSink envelope feed to a replica table —
        created on first sync; re-run at any cadence, O(new envelopes))
    python scripts/lake_admin.py TABLE_ROOT purge KEY[,KEY...] [--keep-last N]
        [--sig-index R[,R]] [--sec-index R] [--ivf-index R] [--pq-index R]
        [--export-feed DIR[,DIR]]
        (associated indexes AND export feeds are synced BEFORE the purge
        and apply_purge'd after — the complete RTBF playbook, replicas
        included, in one command)
    python scripts/lake_admin.py TABLE_ROOT expire [--keep-last N]
    python scripts/lake_admin.py TABLE_ROOT vacuum
    python scripts/lake_admin.py TABLE_ROOT compact [--strategy sql|jvm]
        [--zorder COL,COL [--zorder-splits N]]
    python scripts/lake_admin.py TABLE_ROOT pack [--max-files N] [--small-rows R]
    python scripts/lake_admin.py TABLE_ROOT truncate --before-seq N
    python scripts/lake_admin.py TABLE_ROOT maintain [--compact-depth N]
        [--max-files N] [--small-rows R] [--rebucket-rows R] [--keep-last N]
    python scripts/lake_admin.py TABLE_ROOT widen COL:TYPE[,COL:TYPE...]

Write-audit-publish:
    python scripts/lake_admin.py TABLE_ROOT staged
    python scripts/lake_admin.py TABLE_ROOT publish WAP_ID
    python scripts/lake_admin.py TABLE_ROOT discard WAP_ID

Branches (Iceberg refs):
    python scripts/lake_admin.py TABLE_ROOT branch-create NAME [--version V]
    python scripts/lake_admin.py TABLE_ROOT branch-list
    python scripts/lake_admin.py TABLE_ROOT branch-ff NAME
    python scripts/lake_admin.py TABLE_ROOT branch-drop NAME

Catalog / atomic multi-table publish (TABLE_ROOT is the CATALOG root):
    python scripts/lake_admin.py CAT_ROOT cat-create
    python scripts/lake_admin.py CAT_ROOT cat-register NAME=TABLE_ROOT
    python scripts/lake_admin.py CAT_ROOT cat-versions
    python scripts/lake_admin.py CAT_ROOT cat-publish NAME=WAP_ID[,NAME=WAP_ID]
    python scripts/lake_admin.py CAT_ROOT cat-recover
    python scripts/lake_admin.py CAT_ROOT cat-advance [NAME[,NAME...]]

ANN-index maintenance (TABLE_ROOT is the INDEX root; --source the corpus):
    python scripts/lake_admin.py IDX_ROOT ivf-build --source SRC [--ncells N]
    python scripts/lake_admin.py IDX_ROOT ivf-sync --source SRC
    python scripts/lake_admin.py IDX_ROOT ivf-drift --source SRC
    python scripts/lake_admin.py IDX_ROOT ivf-retrain --source SRC
    python scripts/lake_admin.py IDX_ROOT ivf-maintain --source SRC [--max-drift F]

Prints ONE JSON line per invocation (machine-consumable, like
run_ingest.py's report).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ivf(spark, args) -> dict:
    """ANN-index maintenance verbs: the SignatureIndex-style operational
    surface for the persisted IVF quantizer (operators/ivf_index.py) —
    build once, sync O(changed) after source commits, retrain on drift."""
    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.operators.ivf_index import IVFIndex

    if not args.source:
        raise SystemExit("ivf-* verbs require --source SRC_TABLE_ROOT")
    src = LakeTable.load(spark, args.source)
    kw = dict(id_col=args.id_col, vec_col=args.vec_col)
    if args.verb == "ivf-build":
        idx = IVFIndex.build_from_table(
            spark, args.table_root, src, ncells=args.ncells,
            num_buckets=args.num_buckets, **kw,
        )
        return {
            "built": args.table_root,
            "ncells": idx.ncells,
            "trained_version": idx.trained_version(),
            "rows_at_train": idx.rows_at_train(),
        }
    idx = IVFIndex.load(spark, args.table_root)
    if args.verb == "ivf-sync":
        return {
            "synced": idx.update_from_changes(src, **kw),
            "synced_version": idx.synced_version(),
        }
    if args.verb == "ivf-drift":
        return {
            "drift": round(idx.drift(src, id_col=args.id_col), 6),
            "trained_version": idx.trained_version(),
            "synced_version": idx.synced_version(),
        }
    if args.verb == "ivf-retrain":
        idx.retrain(src, **kw)
        return {
            "retrained": True,
            "trained_version": idx.trained_version(),
            "rows_at_train": idx.rows_at_train(),
        }
    # ivf-maintain
    action = idx.maybe_retrain(src, max_drift=args.max_drift, **kw)
    return {
        "action": action,
        "trained_version": idx.trained_version(),
        "synced_version": idx.synced_version(),
    }


def _catalog(spark, args) -> dict:
    """cat-* verbs: TABLE_ROOT positional is the CATALOG root."""
    from hemera_indexer_spark.lake import LakeCatalog

    root = args.table_root
    if args.verb == "cat-create":
        LakeCatalog.create(spark, root)
        return {"catalog_created": root}
    cat = LakeCatalog.load(spark, root)
    if args.verb == "cat-register":
        if not args.arg or "=" not in args.arg:
            raise SystemExit("cat-register requires NAME=TABLE_ROOT")
        name, _, troot = args.arg.partition("=")
        cat.register(name, troot)
        return {"registered": name, "catalog_version": cat.snapshot["version"]}
    if args.verb == "cat-versions":
        return {"catalog_version": cat.snapshot["version"],
                "tables": cat.versions()}
    if args.verb == "cat-advance":
        names = args.arg.split(",") if args.arg else None
        return {"pinned": cat.advance(names)}
    if args.verb == "cat-publish":
        if not args.arg:
            raise SystemExit(
                "cat-publish requires NAME=WAP_ID[,NAME=WAP_ID...]"
            )
        stages = dict(s.partition("=")[::2] for s in args.arg.split(","))
        return {"published": cat.publish_all(stages)}
    if args.verb == "cat-fsck":
        return cat.fsck(tables_deep=args.deep)
    # cat-recover
    done = cat.recover()
    return {"recovered": done}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("table_root")
    ap.add_argument(
        "verb",
        choices=[
            "health", "history", "tag", "rollback", "analyze", "fsck",
            "scan-report", "checks", "check-set", "check-drop", "sql",
            "clone", "purge", "expire", "vacuum",
            "compact", "pack", "maintain", "truncate", "staged", "publish",
            "discard",
            "widen", "rename-column", "drop-column",
            "branch-create", "branch-list", "branch-ff", "branch-drop",
            "ivf-build", "ivf-sync", "ivf-drift", "ivf-retrain",
            "ivf-maintain",
            "cat-create", "cat-register", "cat-versions", "cat-publish",
            "cat-recover", "cat-advance", "cat-fsck",
            "mirror",
        ],
    )
    ap.add_argument("arg", nargs="?", default=None,
                    help="tag NAME / clone DEST / purge KEY[,KEY...] / "
                         "widen COL:TYPE[,COL:TYPE...] / "
                         "rename-column OLD:NEW / drop-column COL")
    ap.add_argument("--version", type=int, default=None)
    ap.add_argument("--keep-last", type=int, default=None)
    ap.add_argument("--older-than-s", type=float, default=None,
                    help="expire: age floor in seconds — snapshots younger "
                         "than this are retained even outside keep_last "
                         "(wall-clock time-travel horizon)")
    ap.add_argument("--strategy", default="sql", choices=["sql", "jvm"])
    ap.add_argument("--max-files", type=int, default=1)
    ap.add_argument("--small-rows", type=int, default=None)
    ap.add_argument("--zorder", default=None,
                    help="compact: z-order layout columns, comma-separated")
    ap.add_argument("--zorder-splits", type=int, default=4)
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--source", default=None,
                    help="source corpus LakeTable root (ivf-* verbs)")
    ap.add_argument("--ncells", type=int, default=16)
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--num-buckets", type=int, default=16)
    ap.add_argument("--max-drift", type=float, default=0.25)
    ap.add_argument("--compact-depth", type=int, default=8,
                    help="maintain: compact buckets with >= this delta depth")
    ap.add_argument("--rebucket-rows", type=int, default=None,
                    help="maintain: rebucket when mean rows/bucket exceeds")
    ap.add_argument("--deep", action="store_true",
                    help="fsck: also cross-check every live file's parquet "
                         "footer row count against the manifest")
    ap.add_argument("--analyze-lag", type=int, default=None,
                    help="maintain: re-run column ANALYZE when colstats "
                         "staleness reaches this many commits (min 2)")
    ap.add_argument("--before-seq", type=int, default=None,
                    help="truncate: drop fact history with seq below this")
    ap.add_argument("--keys", default=None,
                    help="scan-report: probe keys, comma-separated "
                         "(coerced to the key column's type)")
    ap.add_argument("--range", dest="ranges", action="append", default=None,
                    help="scan-report: COL:LO:HI zone-map range (either "
                         "bound empty for one-sided; repeatable)")
    ap.add_argument("--seq-at-least", type=int, default=None,
                    help="scan-report: seq-fence pruning floor")
    ap.add_argument("--limit", type=int, default=100,
                    help="sql: max rows printed (driver-side cap)")
    ap.add_argument("--sig-index", default=None,
                    help="purge: SignatureIndex root(s), comma-separated — "
                         "synced before the purge, apply_purge'd after")
    ap.add_argument("--sec-index", default=None,
                    help="purge: SecondaryIndex root(s)")
    ap.add_argument("--ivf-index", default=None,
                    help="purge: IVFIndex root(s)")
    ap.add_argument("--pq-index", default=None,
                    help="purge: PQIndex root(s)")
    ap.add_argument("--export-feed", default=None,
                    help="purge: ChangelogExportSink feed dir(s), "
                         "comma-separated — synced before the purge, then "
                         "shipped a keys-only purge directory so replicas "
                         "(LakeMirror) physically forget too")
    ap.add_argument("--text-col", default="text",
                    help="purge: SignatureIndex text column for the "
                         "pre-purge sync")
    args = ap.parse_args()

    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.session import get_spark

    spark = get_spark("lake-admin", cores=args.cores,
                      shuffle_partitions=2 * args.cores)

    if args.verb.startswith("ivf-"):
        print(json.dumps(_ivf(spark, args)))
        return
    if args.verb.startswith("cat-"):
        print(json.dumps(_catalog(spark, args)))
        return
    if args.verb == "mirror":
        # TABLE_ROOT is the REPLICA root (created on first sync); arg is
        # the envelope feed directory a ChangelogExportSink writes.
        from hemera_indexer_spark.streaming.mirror import LakeMirror

        if not args.arg:
            ap.error("mirror requires a FEED_DIR")
        m = LakeMirror(spark, args.arg, args.table_root,
                       num_buckets=args.num_buckets)
        applied = m.sync()
        print(json.dumps({
            "mirrored": args.table_root,
            "feed": args.arg,
            "dirs_applied": applied,
            "source_version": m.applied_version,
            "rows": m.dest.stats_row_count(),
        }))
        return
    t = LakeTable.load(spark, args.table_root)

    if args.verb == "health":
        out = t.table_health()
    elif args.verb == "history":
        if not args.arg:
            ap.error("history requires a KEY")
        key = args.arg
        from pyspark.sql import types as T

        kt = next(f.dataType for f in t.schema.fields if f.name == t.key_col)
        if isinstance(kt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            key = int(key)
        elif isinstance(kt, (T.FloatType, T.DoubleType)):
            key = float(key)
        out = {"key": args.arg, "history": t.key_history(key)}
    elif args.verb == "tag":
        if not args.arg:
            ap.error("tag requires a NAME")
        # tag() itself resolves version=None to the CURRENT snapshot
        # before its property commit; just report what it named
        tagged_version = (
            args.version if args.version is not None
            else t.snapshot["version"]
        )
        t.tag(args.arg, version=args.version)
        out = {"tagged": args.arg, "version": tagged_version}
    elif args.verb == "checks":
        out = {"checks": t.checks()}
    elif args.verb == "check-set":
        if not args.arg or "=" not in args.arg:
            ap.error("check-set requires NAME=PREDICATE")
        name, pred = args.arg.split("=", 1)
        t.set_check(name, pred)
        out = {"check_set": name, "predicate": pred}
    elif args.verb == "check-drop":
        if not args.arg:
            ap.error("check-drop requires a NAME")
        t.drop_check(args.arg)
        out = {"check_dropped": args.arg}
    elif args.verb == "sql":
        # ad-hoc SQL over the table: registered as view `t` (resolved
        # live rows), pinned at the current snapshot for this one query
        if not args.arg:
            ap.error("sql requires a QUERY (the table is view `t`)")
        v = t.register_view("t")
        rows = [
            r.asDict(recursive=True)
            for r in spark.sql(args.arg).limit(args.limit).collect()
        ]
        out = {"version": v, "rows": rows, "n": len(rows)}
    elif args.verb == "fsck":
        out = t.fsck(deep=args.deep)
    elif args.verb == "scan-report":
        from pyspark.sql import types as T

        keys = None
        if args.keys:
            keys = [k for k in args.keys.split(",") if k]
            kt = next(
                f.dataType for f in t.schema.fields if f.name == t.key_col
            )
            if isinstance(
                kt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
            ):
                keys = [int(k) for k in keys]
            elif isinstance(kt, (T.FloatType, T.DoubleType)):
                keys = [float(k) for k in keys]
        ranges = None
        if args.ranges:
            ranges = {}
            for spec in args.ranges:
                col, _, rest = spec.partition(":")
                lo, _, hi = rest.partition(":")
                ct = next(
                    (f.dataType for f in t.schema.fields if f.name == col),
                    None,
                )

                def cv(s):
                    if s == "":
                        return None
                    if isinstance(
                        ct,
                        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
                    ):
                        return int(s)
                    if isinstance(ct, (T.FloatType, T.DoubleType)):
                        return float(s)
                    return s

                ranges[col] = (cv(lo), cv(hi))
        out = t.scan_report(
            seq_at_least=args.seq_at_least, ranges=ranges, key_values=keys
        )
    elif args.verb == "analyze":
        cols = [c for c in args.arg.split(",") if c] if args.arg else None
        out = {"analyzed": t.analyze(cols=cols)}
    elif args.verb == "rollback":
        if args.version is None:
            ap.error("rollback requires --version")
        new_head = t.rollback_to(args.version)
        out = {"rolled_back_to": args.version, "new_head": new_head,
               "committed_epoch": t.committed_epoch()}
    elif args.verb == "clone":
        if not args.arg:
            ap.error("clone requires a DEST path")
        c = t.clone_to(args.arg)
        out = {"cloned_to": args.arg,
               "rows": c.stats_row_count(),
               "committed_epoch": c.committed_epoch()}
    elif args.verb == "purge":
        if not args.arg:
            ap.error("purge requires KEY[,KEY...]")
        keys = [k for k in args.arg.split(",") if k]
        # coerce CLI strings to the key column's type (a long-keyed table
        # rejects string keys at the typed keys-DataFrame boundary)
        from pyspark.sql import types as T

        kt = next(f.dataType for f in t.schema.fields if f.name == t.key_col)
        if isinstance(kt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            keys = [int(k) for k in keys]
        elif isinstance(kt, (T.FloatType, T.DoubleType)):
            keys = [float(k) for k in keys]
        # sync-then-purge: derived indexes fast-forward via apply_purge
        # AFTER the purge, but their cursors must be at the head BEFORE
        # history expires — sync each one first, while it still can.
        idx_objs = []
        for spec, loader in (
            (args.sig_index, "SignatureIndex"),
            (args.sec_index, "SecondaryIndex"),
            (args.ivf_index, "IVFIndex"),
            (args.pq_index, "PQIndex"),
        ):
            if not spec:
                continue
            if loader == "SignatureIndex":
                from hemera_indexer_spark.operators.dedup_index import (
                    SignatureIndex as cls,
                )
            elif loader == "SecondaryIndex":
                from hemera_indexer_spark.operators.secondary_index import (
                    SecondaryIndex as cls,
                )
            elif loader == "IVFIndex":
                from hemera_indexer_spark.operators.ivf_index import (
                    IVFIndex as cls,
                )
            else:
                from hemera_indexer_spark.operators.pq_index import (
                    PQIndex as cls,
                )
            for root in spec.split(","):
                idx_objs.append((root, cls.load(spark, root)))
        for root, ix in idx_objs:
            if ix.synced_version() >= t.snapshot["version"]:
                continue
            kind = type(ix).__name__
            if kind == "SignatureIndex":
                ix.update_from_changes(t, text_col=args.text_col)
            elif kind in ("IVFIndex", "PQIndex"):
                ix.update_from_changes(
                    t, id_col=args.id_col, vec_col=args.vec_col
                )
            else:
                ix.update_from_changes(t)
        # export feeds follow the same sync-then-purge discipline: their
        # cursor must reach the head while pre-purge snapshots still exist
        feeds = []
        if args.export_feed:
            from hemera_indexer_spark.streaming.sinks import (
                ChangelogExportSink,
            )

            for fd in args.export_feed.split(","):
                s = ChangelogExportSink(t, fd)
                s.sync(epoch=s.committed_epoch())
                feeds.append((fd, s))
        out = t.purge_keys(
            keys,
            keep_last=args.keep_last if args.keep_last is not None else 1,
        )
        out["indexes"] = {
            root: ix.apply_purge(keys, t) for root, ix in idx_objs
        }
        out["export_feeds"] = {
            fd: s.apply_purge(keys) for fd, s in feeds
        }
    elif args.verb == "widen":
        if not args.arg:
            ap.error("widen requires COL:TYPE[,COL:TYPE...] "
                     "(e.g. n_tok:bigint,score:'decimal(18,2)')")
        from pyspark.sql import types as T

        changes = {}
        for spec in args.arg.split(","):
            col, _, ddl = spec.partition(":")
            if not ddl:
                ap.error(f"widen spec {spec!r} is not COL:TYPE")
            changes[col] = T.DataType.fromDDL(ddl)
        t.widen_schema(changes)
        out = {
            "widened": {c: dt.simpleString() for c, dt in changes.items()},
            "version": t.snapshot["version"],
        }
    elif args.verb == "rename-column":
        if not args.arg or ":" not in args.arg:
            ap.error("rename-column requires OLD:NEW")
        old, _, new = args.arg.partition(":")
        t.rename_column(old, new)
        out = {
            "renamed": {old: new},
            "schema_id": t.schema_id,
            "version": t.snapshot["version"],
        }
    elif args.verb == "drop-column":
        if not args.arg:
            ap.error("drop-column requires a COLUMN name")
        t.drop_column(args.arg)
        out = {
            "dropped": args.arg,
            "schema_id": t.schema_id,
            "version": t.snapshot["version"],
        }
    elif args.verb == "branch-create":
        if not args.arg:
            ap.error("branch-create requires a NAME")
        br = t.create_branch(args.arg, version=args.version)
        out = {"branch": args.arg,
               "base_version": br.snapshot["version"]}
    elif args.verb == "branch-list":
        out = {"branches": t.branches()}
    elif args.verb == "branch-ff":
        if not args.arg:
            ap.error("branch-ff requires a NAME")
        out = {"fast_forwarded": args.arg,
               "new_head": t.fast_forward(args.arg),
               "committed_epoch": t.committed_epoch()}
    elif args.verb == "branch-drop":
        if not args.arg:
            ap.error("branch-drop requires a NAME")
        out = {"dropped": args.arg,
               "abandoned_commits": t.drop_branch(args.arg)}
    elif args.verb == "staged":
        out = {"staged": t.staged_snapshots()}
    elif args.verb == "publish":
        if not args.arg:
            ap.error("publish requires a WAP_ID")
        out = {"published_version": t.publish_staged(args.arg)}
    elif args.verb == "discard":
        if not args.arg:
            ap.error("discard requires a WAP_ID")
        t.discard_staged(args.arg)
        out = {"discarded": args.arg}
    elif args.verb == "expire":
        out = {"snapshots_expired": t.expire_snapshots(
            keep_last=args.keep_last if args.keep_last is not None else 10,
            older_than_s=args.older_than_s)}
    elif args.verb == "vacuum":
        out = {"files_vacuumed": t.vacuum_orphans()}
    elif args.verb == "compact":
        zcols = tuple(args.zorder.split(",")) if args.zorder else ()
        out = {"compacted": t.compact(
            strategy=args.strategy,
            buckets=set(range(t.num_buckets)) if zcols else None,
            zorder=zcols, zorder_splits=args.zorder_splits)}
    elif args.verb == "truncate":
        if args.before_seq is None:
            ap.error("truncate requires --before-seq N")
        out = t.truncate_before(args.before_seq)
    elif args.verb == "maintain":
        from hemera_indexer_spark.lake import (
            MaintenancePolicy,
            run_maintenance,
        )

        out = run_maintenance(t, MaintenancePolicy(
            compact_delta_depth=args.compact_depth,
            pack_max_files=args.max_files,
            pack_small_rows=args.small_rows,
            rebucket_rows_per_bucket=args.rebucket_rows,
            expire_keep_last=(
                args.keep_last if args.keep_last is not None else 10
            ),
            analyze_lag=args.analyze_lag,
            strategy=args.strategy,
        ))
    else:  # pack
        zcols = tuple(args.zorder.split(",")) if args.zorder else ()
        out = {"packed": t.compact_files(
            max_files=args.max_files, small_rows=args.small_rows,
            zorder=zcols, zorder_splits=args.zorder_splits)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
