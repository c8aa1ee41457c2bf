"""Marginal-cost profile of the exporter fan-out: replay the SAME change
log through increasingly loaded sink configurations and report wall time
per config (best-of-N, alternated to decorrelate box noise).

Configs:
  state          — state table only (the baseline merge path)
  +facts         — dual output: state + append-only history (FactSink)
  +facts+pack    — same, with fact small-file compaction each group
  +index         — state + CDC-maintained near-dup signature index

Usage: TMPDIR=/dev/shm SPARK_LOCAL_DIR=/dev/shm/spark-tmp \
       python scripts/profile_sinks.py [events] [reps]
Prints one JSON line; appends nothing (copy results into BENCH.md by
hand with the window's loadavg context, per the measurement discipline).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hemera_indexer_spark.lake import LakeTable  # noqa: E402
from hemera_indexer_spark.schemas import (  # noqa: E402
    FACTS_SCHEMA,
    SEQUENCES_SCHEMA,
)
from hemera_indexer_spark.session import get_spark  # noqa: E402
from hemera_indexer_spark.sources.generator import (  # noqa: E402
    ChangelogSpec,
    generate_changelog,
)
from hemera_indexer_spark.streaming import StreamController  # noqa: E402


def run_config(spark, log_dir, spec, work, name):
    root = os.path.join(work, f"{name}-{time.monotonic_ns()}")
    state = LakeTable.create(
        spark, os.path.join(root, "state"), SEQUENCES_SCHEMA, num_buckets=128
    )
    kw = {}
    sinks = []
    if name.startswith("+facts"):
        kw["fact_table"] = LakeTable.create(
            spark, os.path.join(root, "facts"), FACTS_SCHEMA,
            num_buckets=128, properties={"table_type": "fact"},
        )
        if name == "+facts+pack":
            kw["fact_compact_max_files"] = 1
    if name == "+index":
        from hemera_indexer_spark.operators.dedup_index import SignatureIndex
        from hemera_indexer_spark.streaming.sinks import SignatureIndexSink

        idx = SignatureIndex.build_from_table(
            spark, os.path.join(root, "idx"), state, text_col="tokens",
            k=8, bands=2,
        )
        sinks.append(SignatureIndexSink(state, idx, text_col="tokens"))
    t0 = time.monotonic()
    StreamController(
        spark, state, log_dir, spec.n_partitions, sinks=sinks,
        max_batch_epochs=1,  # per-epoch commits: the maintenance-cadence shape
        **kw
    ).run()
    wall = time.monotonic() - t0
    shutil.rmtree(root, ignore_errors=True)
    return wall


def main():
    events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    work = os.environ.get("SINK_PROFILE_DIR", "/dev/shm/sink_profile")
    os.makedirs(work, exist_ok=True)
    spark = get_spark("sink-profile", cores=16, shuffle_partitions=32)
    spec = ChangelogSpec(
        n_docs=events // 5,
        n_epochs=4,
        events_per_epoch=events // 4,
        n_partitions=8,
        seed=42,
        schema_evolution_epoch=None,
        rollback_epochs=(),
    )
    # stamp the event count into the path: a stale log from a previous
    # run with a DIFFERENT size would silently inflate events_per_sec
    log_dir = os.path.join(work, f"log-{events}")
    if not os.path.isdir(log_dir):
        generate_changelog(log_dir, spec)
    configs = (
        sys.argv[3].split(",") if len(sys.argv) > 3
        else ["state", "+facts", "+facts+pack", "+index"]
    )
    # warm the JVM once on the cheapest config (outside the timed region)
    run_config(spark, log_dir, spec, work, "state")
    print(json.dumps({"loadavg_1min": os.getloadavg()[0]}))
    best = {c: float("inf") for c in configs}
    raw = {c: [] for c in configs}
    for _ in range(reps):
        for c in configs:  # alternate configs inside each rep
            w = run_config(spark, log_dir, spec, work, c)
            raw[c].append(round(w, 2))
            best[c] = min(best[c], w)
    print(json.dumps({
        "events": events,
        "best_sec": {c: round(v, 2) for c, v in best.items()},
        "raw_sec": raw,
        "events_per_sec_best": {
            c: round(events / v, 0) for c, v in best.items()
        },
    }))


if __name__ == "__main__":
    main()
