"""Model-based random walk over the FULL table-maintenance op set.

A seeded random sequence of merges, deletes, compactions, rebuckets,
retention sweeps, clones, tags and purges runs against a LakeTable while
a pure-Python dict model folds the same logical operations. After EVERY
op the table's `current_state()` must equal the model — the strongest
single statement that the maintenance surface is pure reorganization and
the mutation surface follows the LWW law, in every interleaving the walk
visits (not just the interleavings the targeted tests chose)."""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hemera_indexer_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("val", T.StringType()),
    ]
)

KEYS = [f"d{i}" for i in range(30)]


def _table_state(t):
    return {
        r["doc_id"]: (r["seq"], r["val"])
        for r in t.current_state().collect()
    }


def _model_state(model):
    return {
        k: (seq, val)
        for k, (seq, val, dead) in model.items()
        if not dead
    }


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_random_walk_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = str(tmp_path / f"walk{seed}")
    t = LakeTable.create(spark, root, SCHEMA, num_buckets=4)
    model: dict = {}
    seq = 0
    epoch = 0
    clones = 0
    # the payload column's rename chain: merges may speak ANY historical
    # name (the old-writer mapping steers them into the current one), and
    # rollback restores the chain as of the checkpoint
    names = ["val"]

    def cur_col():
        return names[-1]

    def tstate(tt):
        col = cur_col()
        return {
            r["doc_id"]: (r["seq"], r[col])
            for r in tt.current_state().collect()
        }

    def gen_rows():
        """A random batch and its would-be model delta (not yet applied)."""
        nonlocal seq
        rows, delta = [], {}
        for _ in range(rng.randint(1, 8)):
            k = rng.choice(KEYS)
            seq += 1
            if rng.random() < 0.2:
                rows.append((k, seq, None, "delete"))
                delta[k] = (seq, None, True)
            else:
                v = f"v{seq}"
                rows.append((k, seq, v, "upsert"))
                delta[k] = (seq, v, False)
        return rows, delta

    def _df(rows):
        # a random historical payload-column name: writers that never
        # heard about a rename keep working through the schema log
        col = rng.choice(names)
        return spark.createDataFrame(
            rows, f"doc_id string, seq long, {col} string, op string"
        )

    def merge_batch():
        nonlocal epoch
        rows, delta = gen_rows()
        epoch += 1
        t.merge_upsert(_df(rows), epoch_id=epoch)
        model.update(delta)

    def expected_cdf(old_model):
        """The Delta-CDF rows the engine must report from old -> now."""
        out = set()
        old_live = _model_state(old_model)
        new_live = _model_state(model)
        for k in set(old_live) | set(new_live):
            o, n = old_live.get(k), new_live.get(k)
            if o is None and n is not None:
                out.add(("insert", k, *n))
            elif o is not None and n is None:
                out.add(("delete", k, *o))
            elif o is not None and n is not None and o[0] != n[0]:
                out.add(("update_preimage", k, *o))
                out.add(("update_postimage", k, *n))
        return out

    def log_now():
        return list(t.snapshot.get("schema_log", []))

    checkpoints = [(0, dict(model), list(names), [])]
    ops = []
    for step in range(24):
        r = rng.random()
        if step == 3:
            op = "rename"  # every seed exercises at least one rename
        elif step < 2 or r < 0.41:
            op = "merge"
        elif r < 0.45:
            op = "rename"
        elif r < 0.55:
            op = "compact"
        elif r < 0.62:
            op = "rebucket"
        elif r < 0.68:
            op = "retention"
        elif r < 0.73:
            op = "clone"
        elif r < 0.78:
            op = "tag"
        elif r < 0.83:
            op = "purge"
        elif r < 0.87:
            op = "wap"
        elif r < 0.91:
            op = "branch"
        elif r < 0.94:
            op = "cdf"
        elif r < 0.97:
            op = "rollback"
        else:
            op = "maintain"
        ops.append(op)
        if op == "merge":
            merge_batch()
        elif op == "rename":
            # metadata-only rename mid-walk: the model is untouched (the
            # payload VALUES don't move), only the column's name does;
            # every later merge may still speak any historical name
            new = f"val{step}"
            t.rename_column(cur_col(), new)
            names.append(new)
        elif op == "wap":
            # stage -> (invisible) -> audit equals model+delta -> publish
            # applies / discard leaves the world untouched
            nonlocal_epoch = epoch + 1
            rows, delta = gen_rows()
            wid = f"w{step}"
            before = _model_state(model)
            assert t.merge_upsert(_df(rows), epoch_id=nonlocal_epoch,
                                  wap_id=wid)
            epoch = nonlocal_epoch
            assert tstate(t) == before, (seed, step, ops)
            staged_model = dict(model)
            staged_model.update(delta)
            assert tstate(t.audit_staged(wid)) == _model_state(
                staged_model
            ), (seed, step, ops)
            if rng.random() < 0.5:
                t.publish_staged(wid)
                model.update(delta)
            else:
                t.discard_staged(wid)
        elif op == "branch":
            # side-chain commits stay invisible to main until the
            # fast-forward publishes them in one metadata move; a dropped
            # branch leaves the world untouched (its files vacuum later)
            bname = f"b{step}"
            before = _model_state(model)
            br = t.create_branch(bname)
            staged_model = dict(model)
            for _ in range(rng.randint(1, 3)):
                rows, delta = gen_rows()
                epoch += 1
                br.merge_upsert(_df(rows), epoch_id=epoch)
                staged_model.update(delta)
            assert tstate(t) == before, (seed, step, ops)
            assert tstate(br) == _model_state(staged_model), (
                seed, step, ops,
            )
            if rng.random() < 0.5:
                t.fast_forward(bname)
                model.clear()
                model.update(staged_model)
            else:
                t.drop_branch(bname)
        elif op == "cdf":
            retained = {s["version"] for s in t.snapshots()}
            # the feed presents CURRENT names and refuses checkpoints
            # whose schema log diverged (rollback across a rename
            # followed by a different rename) — filter to prefix-clean
            # checkpoints, exactly what an incremental consumer must do
            cl = log_now()
            live_ckpts = [
                c for c in checkpoints
                if c[0] in retained and c[3] == cl[: len(c[3])]
            ]
            if live_ckpts:
                v0, m0, _, _ = rng.choice(live_ckpts)
                col = cur_col()
                got = {
                    (r2["change_op"], r2["doc_id"], r2["seq"], r2[col])
                    for r2 in t.changes_since(v0, cdf=True).collect()
                }
                assert got == expected_cdf(m0), (seed, step, v0, ops)
        elif op == "rollback":
            # restore to any retained checkpointed version; the model is
            # REPLACED by that checkpoint's fold — current_state equality
            # after the step then proves the restore is exact, and later
            # cdf ops prove changes_since stays NET across a restore
            retained = {s["version"] for s in t.snapshots()}
            live_ckpts = [c for c in checkpoints if c[0] in retained]
            if live_ckpts:
                v0, m0, n0, _ = rng.choice(live_ckpts)
                t.rollback_to(v0)
                model.clear()
                model.update(dict(m0))
                names[:] = list(n0)  # the restored snapshot's schema
        elif op == "maintain":
            from hemera_indexer_spark.lake import (
                MaintenancePolicy,
                run_maintenance,
            )

            run_maintenance(t, MaintenancePolicy(
                compact_delta_depth=rng.randint(1, 6),
                expire_keep_last=rng.randint(2, 5),
            ))
        elif op == "compact":
            t.compact(strategy=rng.choice(["sql", "jvm"]))
        elif op == "rebucket":
            if t.num_buckets < 32:
                t.rebucket(t.num_buckets * 2)
        elif op == "retention":
            t.expire_snapshots(keep_last=rng.randint(1, 3))
            t.vacuum_orphans()
        elif op == "clone":
            clones += 1
            c = t.clone_to(str(tmp_path / f"clone{seed}-{clones}"))
            assert tstate(c) == _model_state(model), (seed, step, ops)
        elif op == "tag":
            t.tag(f"s{step}")
            assert tstate(t.as_of_tag(f"s{step}")) == _model_state(
                model
            )
        else:  # purge a random LIVE key (if any)
            live = sorted(_model_state(model))
            if live:
                k = rng.choice(live)
                t.purge_keys([k])
                # the engine's purge tombstone takes seq = global max + 1;
                # mirror that in the model's counter so later upserts of
                # the purged key need a genuinely newer seq to win
                seq += 1
                model[k] = (seq, None, True)
        assert tstate(t) == _model_state(model), (seed, step, ops)
        # interleave the bloom surface with every other verb: retunes are
        # property-only (the model is untouched), and a bloom-pruned point
        # lookup after ANY op must agree with the model — compaction
        # backfill, rebucket re-hash, restore and purge all feed this
        if rng.random() < 0.3:
            t.set_bloom(rng.choice([0, 512, 2048]), hashes=rng.randint(1, 4))
        if rng.random() < 0.4:
            k = rng.choice(KEYS)
            live = _model_state(model)
            col = cur_col()
            got = [
                (r["doc_id"], r["seq"], r[col])
                for r in t.lookup(k).collect()
            ]
            want = [(k, *live[k])] if k in live else []
            assert got == want, (seed, step, k, ops)
        checkpoints.append(
            (t.snapshot["version"], dict(model), list(names), log_now())
        )
    # every seed ends with one FORCED restore (the random mix may not roll
    # the rollback verb), then a merge on top — restore + write-after-
    # restore both proven on all seeds
    retained = {s["version"] for s in t.snapshots()}
    v0, m0, n0, _ = rng.choice([c for c in checkpoints if c[0] in retained])
    t.rollback_to(v0)
    model.clear()
    model.update(dict(m0))
    names[:] = list(n0)
    assert tstate(t) == _model_state(model), (seed, "forced-rollback")
    merge_batch()
    assert tstate(t) == _model_state(model), (seed, "post-restore-merge")
    # the walk must have exercised a real mix
    assert {"merge", "rename"} <= set(ops)


# ===========================================================================
# Ingest-surface walk: the round-4 verbs the table walk above cannot reach —
# tenant-mode commits (two controllers, one shared table), quarantine
# diverts, SignatureIndexSink syncs + admission reports + curated view,
# purge_keys and clone_to — interleaved under a seeded schedule, with the
# pure-Python fold, the per-tenant quarantine ledger, the index sync cursor
# and the curated view all asserted after every step.
# ===========================================================================

import os

TOK_LEN = 12
TOK_CAP = 64  # CHECK-constraint cap: every normal row satisfies it


def _write_epoch(log_dir, epoch, rows):
    """Hand-crafted 1-partition changelog epoch.
    rows = [(doc_id|None, op, seq, tokens|None)].

    The schema is the generator's with every field made NULLABLE: this
    writer injects malformed rows (null doc_id), and pyarrow silently
    writes a null into a `not null` field as an INVALID parquet column
    (REQUIRED + missing values) that Spark then misreads with shifted
    values — the foreign-writer file must be honest about its nulls."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hemera_indexer_spark.sources.generator import _event_arrow_schema

    schema = pa.schema(
        [f.with_nullable(True) for f in _event_arrow_schema(False)]
    )
    cols = {
        "seq": [r[2] for r in rows],
        "epoch": [epoch] * len(rows),
        "partition": [0] * len(rows),
        "doc_id": [r[0] for r in rows],
        "op": [r[1] for r in rows],
        "tokens": [r[3] for r in rows],
        "n_tok": [len(r[3]) if r[3] is not None else None for r in rows],
        "source": ["walk"] * len(rows),
        "rollback_to_seq": [None] * len(rows),
    }
    path = os.path.join(log_dir, f"epoch={epoch:05d}", "partition=000")
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.Table.from_pydict(cols, schema=schema),
        os.path.join(path, "events.parquet"),
    )


def _toks(seq):
    return [seq * 3 + j for j in range(TOK_LEN)]


@pytest.mark.parametrize("seed", [3, 17, 29, 41, 57])
def test_ingest_walk_matches_model(spark, tmp_path, seed):
    from hemera_indexer_spark.operators.dedup_index import (
        SignatureIndex,
        curated_state,
    )
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
    from hemera_indexer_spark.streaming import StreamController
    from hemera_indexer_spark.streaming.sinks import SignatureIndexSink

    rng = random.Random(seed)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    # active CHECK for the whole walk: every normal row satisfies it, so
    # the fold oracle is unchanged and violations (append_chk) must take
    # the dead-letter path alongside envelope malformations
    table.set_check("tok_cap", f"tokens IS NULL OR size(tokens) <= {TOK_CAP}")
    tenants = (1, 2)
    logs = {t: str(tmp_path / f"log{t}") for t in tenants}
    for d in logs.values():
        os.makedirs(d, exist_ok=True)
    qdirs = {t: str(tmp_path / f"quar{t}") for t in tenants}
    reports = {t: str(tmp_path / f"rep{t}") for t in tenants}
    idx = {
        t: SignatureIndex.build_from_table(
            spark, str(tmp_path / f"idx{t}"), table,
            text_col="tokens", k=8, bands=2, num_buckets=4,
        )
        for t in tenants
    }
    # ONE secondary index SHARED by both tenant controllers — the
    # namespaced-fence shape (each sink keeps its own log-epoch fence;
    # the index content/cursor live in the shared source-version domain)
    from hemera_indexer_spark.operators.secondary_index import SecondaryIndex

    sidx = SecondaryIndex.build_from_table(
        spark, str(tmp_path / "sidx"), table, "n_tok", num_buckets=4
    )

    # model: per-tenant LWW fold keyed by doc_id -> (seq, tokens, dead);
    # plus the quarantine ledger and the committed seq high-water mark
    model = {t: {} for t in tenants}
    expected_quar = {t: 0 for t in tenants}
    next_epoch = {t: 0 for t in tenants}
    driven_epoch = {t: -1 for t in tenants}
    pending: dict[int, list] = {t: [] for t in tenants}  # undriven epochs
    seq = 0
    committed_max_seq = 0
    clones = 0

    def append_epoch(t, with_bad, with_dup, with_chk=False):
        nonlocal seq
        rows = []
        for _ in range(rng.randint(2, 5)):
            seq += 1
            k = f"t{t}_{rng.choice(KEYS)}"
            if rng.random() < 0.2:
                rows.append((k, "delete", seq, None))
            else:
                rows.append((k, "update", seq, _toks(seq)))
        if with_dup:
            # a NEW doc with tokens identical to a committed live doc ->
            # the admission report must flag it (jaccard 1.0, banding
            # always collides) and the curated view must exclude it
            live = [
                (k, tok)
                for m in model.values()
                for k, (s, tok, dead) in m.items()
                if not dead and tok is not None
            ]
            if live:
                _, tok = rng.choice(live)
                seq += 1
                rows.append((f"t{t}_x{seq}", "update", seq, list(tok)))
        if with_bad:
            for _ in range(rng.randint(1, 2)):
                seq += 1
                bad = rng.choice(
                    [
                        (None, "update", seq, _toks(seq)),  # null LWW key
                        (f"t{t}_{rng.choice(KEYS)}", "frobnicate", seq,
                         _toks(seq)),  # unknown op (footer-invisible)
                    ]
                )
                rows.append(bad)
        if with_chk:
            # valid envelope, CHECK-violating payload (tokens over the
            # cap) on a FRESH key -> must dead-letter, never fold
            seq += 1
            rows.append(
                (f"t{t}_chk{seq}", "update", seq, [seq] * (TOK_CAP + 1))
            )
        e = next_epoch[t]
        next_epoch[t] += 1
        _write_epoch(logs[t], e, rows)
        pending[t].append(rows)

    def drive(t):
        nonlocal committed_max_seq
        from hemera_indexer_spark.streaming.sinks import SecondaryIndexSink

        sink = SignatureIndexSink(
            table, idx[t], text_col="tokens",
            report_dir=reports[t], report_threshold=0.9,
        )
        ssink = SecondaryIndexSink(
            table, sidx, maintain_after=2, fence_key=str(t)
        )
        StreamController(
            spark, table, logs[t], 1,
            tenant_col="chain_id", tenant_id=t,
            quarantine_dir=qdirs[t], quarantine_scan="always",
            check_policy="quarantine",
            sinks=[sink, ssink],
        ).run()
        had_pending = bool(pending[t])
        for rows in pending[t]:
            driven_epoch[t] += 1
            for k, op, s, tok in sorted(rows, key=lambda r: r[2]):
                if (
                    k is None
                    or op not in ("update", "delete")
                    or (tok is not None and len(tok) > TOK_CAP)
                ):
                    expected_quar[t] += 1
                    continue
                cur = model[t].get(k)
                if cur is None or s > cur[0]:
                    model[t][k] = (s, tok, op == "delete")
                committed_max_seq = max(committed_max_seq, s)
        pending[t] = []
        table.refresh()
        if had_pending:
            assert sink.committed_epoch() == driven_epoch[t], (seed, ops)
            assert idx[t].synced_version() == table.snapshot["version"]

    def check_all():
        table.refresh()
        state = {
            tt: {} for tt in tenants
        }
        for r in table.current_state().collect():
            state[r["chain_id"]][r["doc_id"]] = (r["seq"], r["tokens"])
        for tt in tenants:
            want = {
                k: (s, tok)
                for k, (s, tok, dead) in model[tt].items()
                if not dead
            }
            assert state[tt] == want, (seed, step, ops, tt)
            # quarantine ledger: diverted rows never merged, all counted
            import glob as _g

            q_files = _g.glob(
                os.path.join(qdirs[tt], "**", "*.parquet"), recursive=True
            )
            got_q = spark.read.parquet(qdirs[tt]).count() if q_files else 0
            assert got_q == expected_quar[tt], (seed, step, ops, tt)
            # curated view == state minus report-flagged arrivals
            flagged = set()
            if os.path.isdir(reports[tt]):
                dirs = [
                    os.path.join(reports[tt], d)
                    for d in os.listdir(reports[tt])
                    if d.startswith("epoch=")
                ]
                if dirs:
                    flagged = {
                        r["new_id"]
                        for r in spark.read.parquet(*dirs).collect()
                    }
            got_cur = {
                r["doc_id"]
                for r in curated_state(table, reports[tt]).collect()
            }
            want_cur = {
                k for m in state.values() for k in m
            } - flagged
            assert got_cur == want_cur, (seed, step, ops, tt)
        # the SHARED secondary index answers exactly the state filter
        # whenever its cursor is at the table head (drives sync it;
        # maintenance/purge ops between drives legitimately leave it
        # behind — lookups then reflect the last synced cut)
        if sidx.synced_version() == table.snapshot["version"]:
            want_l = {
                r["doc_id"]
                for r in table.current_state()
                .where(F.col("n_tok").between(10, 30))
                .collect()
            }
            got_l = {r["doc_id"] for r in sidx.lookup(10, 30).collect()}
            assert got_l == want_l, (seed, step, ops)

    ops = []
    step = 0
    for step in range(16):
        r = rng.random()
        if step < 2 or r < 0.30:
            op = "append"
        elif r < 0.42:
            op = "append_bad"
        elif r < 0.50:
            op = "append_dup"
        elif r < 0.56:
            op = "append_chk"
        elif r < 0.74:
            op = "drive"
        elif r < 0.80:
            op = "compact"
        elif r < 0.84:
            op = "rebucket"
        elif r < 0.88:
            op = "retention"
        elif r < 0.92:
            op = "purge"
        elif r < 0.96:
            op = "clone"
        else:
            op = "tag"
        t = rng.choice(tenants)
        ops.append(f"{op}:{t}")
        if op == "append":
            append_epoch(t, with_bad=False, with_dup=False)
        elif op == "append_bad":
            append_epoch(t, with_bad=True, with_dup=False)
        elif op == "append_dup":
            append_epoch(t, with_bad=False, with_dup=True)
        elif op == "append_chk":
            append_epoch(t, with_bad=False, with_dup=False, with_chk=True)
        elif op == "drive":
            drive(t)
        elif op == "compact":
            table.compact(strategy=rng.choice(["sql", "jvm"]))
        elif op == "rebucket":
            if table.num_buckets < 16:
                table.rebucket(table.num_buckets * 2)
        elif op == "retention":
            # the real-world retention discipline: snapshots may only
            # expire once every change-feed consumer's cursor is at (or
            # past) the oldest retained snapshot — sync both indexes first
            for tt in tenants:
                if idx[tt].synced_version() < table.snapshot["version"]:
                    idx[tt].update_from_changes(table, text_col="tokens")
            if sidx.synced_version() < table.snapshot["version"]:
                sidx.update_from_changes(table)
            table.expire_snapshots(keep_last=rng.randint(2, 3))
            table.vacuum_orphans()
        elif op == "purge":
            live = sorted(
                k
                for tt in tenants
                for k, (s, tok, dead) in model[tt].items()
                if not dead
            )
            if live:
                k = rng.choice(live)
                # the sync-then-purge discipline (apply_purge's contract):
                # bring every consumer's cursor to the head WHILE history
                # is still retained, then purge, then fast-forward
                for tt2 in tenants:
                    if idx[tt2].synced_version() < table.snapshot["version"]:
                        idx[tt2].update_from_changes(table, text_col="tokens")
                if sidx.synced_version() < table.snapshot["version"]:
                    sidx.update_from_changes(table)
                table.purge_keys([k])
                committed_max_seq += 1
                tt = int(k[1])
                model[tt][k] = (committed_max_seq, None, True)
                # RTBF reaches derived artifacts too: the signature /
                # secondary indexes hold shingle hashes and sorted
                # projections OF THE PURGED PAYLOAD, and purge's
                # aggressive expire (required — retained snapshots would
                # vacuum-protect the payload) breaks incremental sync by
                # design. apply_purge is the O(purged) playbook: drop the
                # derived rows and fast-forward the cursor in one fenced
                # commit (tests/test_index_purge.py proves the equality
                # law vs a full rebuild).
                for tt2 in tenants:
                    idx[tt2].apply_purge([k], table)
                sidx.apply_purge([k], table)
        elif op == "clone":
            clones += 1
            c = table.clone_to(str(tmp_path / f"clone{clones}"))
            got = {
                (r["chain_id"], r["doc_id"], r["seq"])
                for r in c.current_state().collect()
            }
            want = {
                (tt, k, s)
                for tt in tenants
                for k, (s, tok, dead) in model[tt].items()
                if not dead
            }
            assert got == want, (seed, step, ops)
        else:  # tag
            table.tag(f"w{step}")
            n_live = sum(
                1
                for tt in tenants
                for _, (_, _, dead) in model[tt].items()
                if not dead
            )
            assert table.as_of_tag(f"w{step}").current_state().count() == n_live
        check_all()
    # drain: drive both tenants so every appended epoch is asserted folded
    # (recorded in ops — an arbitrary seed's random schedule may contain
    # no mid-walk drive, but the drain guarantees one always happens)
    for t in (2, 1):
        drive(t)
        ops.append(f"drive:{t}")
    # guarantee the near-dup admission machinery fired at least once:
    # duplicate a TENANT-1 live doc (all of tenant 1's commits are in
    # idx[1] after the drain drive above, so the flag is deterministic)
    base = next(
        (
            (k, tok)
            for k, (s, tok, dead) in sorted(model[1].items())
            if not dead and tok is not None
        ),
        None,
    )
    assert base is not None, (seed, "walk left tenant 1 with no live docs")
    seq += 1
    e = next_epoch[1]
    next_epoch[1] += 1
    rows = [(f"t1_x{seq}", "update", seq, list(base[1]))]
    _write_epoch(logs[1], e, rows)
    pending[1].append(rows)
    drive(1)
    flagged = {
        r["new_id"]
        for r in spark.read.parquet(
            *(
                os.path.join(reports[1], d)
                for d in os.listdir(reports[1])
                if d.startswith("epoch=")
            )
        ).collect()
    }
    assert f"t1_x{seq}" in flagged, (seed, ops)
    check_all()
    names = {o.split(":")[0] for o in ops}
    assert {"append", "drive"} <= names, (seed, ops)
