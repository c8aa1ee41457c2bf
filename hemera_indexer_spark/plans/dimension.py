"""Refreshable hot-dimension cache — the Spark shape of the reference's
token cache (/root/reference/indexer/controller/scheduler/
job_scheduler.py:98-111: a tokens dict preloaded from PG, optionally held
in Redis, consulted by every decode job and refreshed as new tokens are
discovered).

On Spark the equivalent of "a dict every worker can read" is a persisted
small DataFrame used as the BROADCAST side of joins — the data ships to
every executor once per broadcast, and Catalyst keeps the join a
BroadcastHashJoin (no shuffle of the fact side). What the reference's
Redis layer buys (a refreshable shared cache that outlives one batch) is
modeled by the TTL: ``get()`` serves the persisted snapshot until it is
older than ``ttl_s``, then re-runs the loader and swaps the persisted
plan atomically. Per-key lazy lookups (the dict's other talent) are an
anti-pattern on Spark — enrich whole DataFrames instead.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CachedDimension:
    """A small, slowly-changing dimension table cached with a TTL.

    ``loader(spark) -> DataFrame`` produces the dimension (a LakeTable
    ``current_state()``, a parquet read, an API snapshot ...). The result
    is persisted so repeated enrich calls inside the TTL window reuse the
    materialized rows instead of re-running the loader's scan.

    Sized for BROADCAST: the dimension must fit in executor memory
    (Spark's broadcast-join limit, typically tens of MB to a few GB with
    ``spark.sql.autoBroadcastJoinThreshold`` raised). For bigger
    dimensions use a bucketed join, not this helper.
    """

    def __init__(
        self,
        loader: Callable[[SparkSession], DataFrame],
        ttl_s: float = 300.0,
    ):
        self.loader = loader
        self.ttl_s = ttl_s
        self._df: DataFrame | None = None
        self._loaded_at: float = 0.0
        self.load_count: int = 0  # introspection for tests/metrics

    def get(self, spark: SparkSession) -> DataFrame:
        """The cached dimension; reloads when older than ``ttl_s``."""
        now = time.monotonic()
        if self._df is None or now - self._loaded_at >= self.ttl_s:
            fresh = self.loader(spark).persist()
            fresh.count()  # materialize before the old snapshot vanishes
            old, self._df = self._df, fresh
            self._loaded_at = now
            self.load_count += 1
            if old is not None:
                old.unpersist(blocking=False)
        return self._df

    def invalidate(self) -> None:
        """Force the next ``get`` to reload (a new-token-discovered event;
        the reference appends to its dict in place)."""
        self._loaded_at = float("-inf")

    def release(self) -> None:
        if self._df is not None:
            self._df.unpersist(blocking=False)
            self._df = None
        self._loaded_at = 0.0

    def enrich(
        self,
        df: DataFrame,
        on: str | list[str],
        how: str = "left",
        prefix: str = "",
    ) -> DataFrame:
        """Broadcast-join ``df`` against the dimension (the decode job's
        token lookup, vectorized). ``prefix`` renames the dimension's
        payload columns (``prefix + name``) to avoid collisions."""
        dim = self.get(df.sparkSession)
        keys = [on] if isinstance(on, str) else list(on)
        if prefix:
            for c in dim.columns:
                if c not in keys:
                    dim = dim.withColumnRenamed(c, prefix + c)
        return df.join(F.broadcast(dim), on=keys, how=how)
