"""hemera_indexer_spark — a from-scratch PySpark-native CDC / incremental-ingest
engine with the query and data-processing capabilities of
HemeraProtocol/hemera-indexer (reference read-only at /root/reference).

Architecture (Spark-first, NOT a port):

- ``lake``       — bucketed copy-on-write Parquet table format with atomic
                   snapshot commits, per-file column stats, epoch-id fencing
                   and additive schema evolution (Iceberg semantics built on
                   public Spark + filesystem primitives; the container ships
                   no Iceberg jar).
- ``operators``  — LWW compaction, merge-upsert, rollback, dedup (exact /
                   MinHash-LSH / SimHash / n-gram Jaccard), similarity search,
                   text analysis, multimodal plumbing.
- ``sources``    — deterministic change-log generator + partition/epoch-pruned
                   change-log reader.
- ``functions``  — scalar helpers (hex codecs, bucketing, hashing).
- ``plans``      — predicate combinators (specification algebra) and the
                   incremental daily/period aggregate layer.
- ``streaming``  — the epoch driver loop: checkpointed resume, exactly-once
                   commits, reorg-rollback handling, lineage metrics.
"""

__version__ = "0.1.0"
