"""Adaptive batched enrichment — the multicall / BatchWorkExecutor analog.

The reference batches external lookups (multicall RPC) and adapts the batch
size under failure: halve on error, crawl back up after a cooldown
(/root/reference/indexer/executors/batch_work_executor.py:24,92-111;
multicall vectorization under indexer/utils/multicall_hemera/). The Spark
shape of that pattern is a ``mapInPandas`` operator: each task streams its
partition through a user-provided VECTORIZED enrich function in bounded
chunks, so

- the external service sees batched calls (one per chunk, never per row),
- a poison/overload failure shrinks the chunk geometrically and retries —
  only the failing chunk pays, the partition keeps streaming,
- sustained success doubles the chunk back toward the target (the 120 s
  cooldown maps to a success-streak threshold — wall-clock cooldowns don't
  belong in deterministic tasks),
- task retries are safe because the operator holds no cross-batch state.

``enrich_fn`` must be a pure function of its input chunk (pd.DataFrame →
pd.DataFrame with the output schema); at 100 TB this is the only sane
contract, since any chunk may be re-executed by speculative or retried
tasks.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def batched_enrich(
    df: DataFrame,
    enrich_fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_schema,
    batch_size: int = 256,
    min_batch_size: int = 1,
    grow_after: int = 4,
) -> DataFrame:
    """Stream ``df`` through ``enrich_fn`` in adaptively-sized chunks.

    batch_size: target (and maximum) rows per call.
    min_batch_size: below this, the failure is re-raised (crashable).
    grow_after: consecutive successes at a reduced size before doubling.
    """
    if batch_size < 1 or min_batch_size < 1 or min_batch_size > batch_size:
        raise ValueError("need 1 <= min_batch_size <= batch_size")

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur = batch_size
        streak = 0
        pending: list[pd.DataFrame] = []  # buffered rows not yet processed

        def take(n: int) -> pd.DataFrame | None:
            nonlocal pending
            have = sum(len(p) for p in pending)
            if have == 0:
                return None
            n = min(n, have)
            out, rest, need = [], [], n
            for p in pending:
                if need <= 0:
                    rest.append(p)
                elif len(p) <= need:
                    out.append(p)
                    need -= len(p)
                else:
                    out.append(p.iloc[:need])
                    rest.append(p.iloc[need:])
                    need = 0
            pending = rest
            return pd.concat(out, ignore_index=True) if len(out) > 1 else out[0]

        def drain(flush: bool) -> Iterator[pd.DataFrame]:
            nonlocal cur, streak, pending
            while True:
                have = sum(len(p) for p in pending)
                if have == 0 or (not flush and have < cur):
                    return
                chunk = take(cur)
                try:
                    yield enrich_fn(chunk)
                    streak += 1
                    if cur < batch_size and streak >= grow_after:
                        cur = min(batch_size, cur * 2)
                        streak = 0
                except Exception:
                    if cur <= min_batch_size:
                        raise
                    # halve and retry: push the chunk back unprocessed
                    cur = max(min_batch_size, cur // 2)
                    streak = 0
                    pending.insert(0, chunk)

        for pdf in it:
            if len(pdf):
                pending.append(pdf)
            yield from drain(flush=False)
        yield from drain(flush=True)

    return df.mapInPandas(op, schema=out_schema)
