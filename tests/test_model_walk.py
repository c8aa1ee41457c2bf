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


@pytest.mark.parametrize("seed", [11, 23])
def test_random_walk_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = str(tmp_path / f"walk{seed}")
    t = LakeTable.create(spark, root, SCHEMA, num_buckets=4)
    model: dict = {}
    seq = 0
    epoch = 0
    clones = 0

    def merge_batch():
        nonlocal seq, epoch
        rows = []
        for _ in range(rng.randint(1, 8)):
            k = rng.choice(KEYS)
            seq += 1
            if rng.random() < 0.2:
                rows.append((k, seq, None, "delete"))
                model[k] = (seq, None, True)
            else:
                v = f"v{seq}"
                rows.append((k, seq, v, "upsert"))
                model[k] = (seq, v, False)
        epoch += 1
        t.merge_upsert(
            spark.createDataFrame(
                rows, "doc_id string, seq long, val string, op string"
            ),
            epoch_id=epoch,
        )

    ops = []
    for step in range(24):
        r = rng.random()
        if step < 2 or r < 0.55:
            op = "merge"
        elif r < 0.65:
            op = "compact"
        elif r < 0.72:
            op = "rebucket"
        elif r < 0.80:
            op = "retention"
        elif r < 0.88:
            op = "clone"
        elif r < 0.94:
            op = "tag"
        else:
            op = "purge"
        ops.append(op)
        if op == "merge":
            merge_batch()
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
            assert _table_state(c) == _model_state(model), (seed, step, ops)
        elif op == "tag":
            t.tag(f"s{step}")
            assert _table_state(t.as_of_tag(f"s{step}")) == _model_state(
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
        assert _table_state(t) == _model_state(model), (seed, step, ops)
    # the walk must have exercised a real mix
    assert {"merge"} < set(ops)
