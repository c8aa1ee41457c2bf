"""Pluggable job DAG — the engine's extension system.

Analog of the reference's type-hint-wired job scheduler: jobs there declare
``dependency_types`` / ``output_types`` and the scheduler computes the
required job set by BFS from the requested outputs, then runs them in
topologically-sorted generations
(/root/reference/indexer/controller/scheduler/job_scheduler.py:117-150,
275-300; /root/reference/indexer/jobs/base_job.py:296-376 discovers the
wiring from dataclass type hints).

Here a job is a declarative Spark transform: it names the DATASETS it
consumes and the dataset it produces, and its body returns a DataFrame
built from the input DataFrames — so the whole resolved DAG collapses into
one Catalyst plan per terminal dataset unless a job materializes on purpose
(``materialize=`` a writer callback). Source datasets (the lake tables /
change-log views) are supplied at run time.

Scale note: resolution and ordering are pure metadata (driver-side, tiny);
execution cost is whatever the jobs' plans cost — chaining jobs adds no
shuffles by itself because unmaterialized handoffs are just plan
composition.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def job(name: str, inputs: list[str], output: str | None = None) -> Callable:
    """Mark a module-level function as a discoverable DAG job (picked up by
    ``JobGraph.discover`` — the plug-in analog of the reference's job
    auto-discovery)."""

    def deco(fn: Callable) -> Callable:
        fn._dag_spec = {"name": name, "inputs": list(inputs), "output": output}
        return fn

    return deco


class CycleError(ValueError):
    pass


class MissingDatasetError(KeyError):
    pass


@dataclass(frozen=True)
class Job:
    name: str
    inputs: tuple
    output: str
    fn: Callable  # fn(spark, {dataset: DataFrame}) -> DataFrame


@dataclass
class JobGraph:
    jobs: dict = field(default_factory=dict)  # output dataset -> Job

    def register(
        self,
        name: str,
        inputs: list[str],
        output: str | None = None,
    ) -> Callable:
        """Decorator: ``@graph.register("daily_stats", inputs=["state"])``.
        The produced dataset defaults to the job name."""

        def deco(fn: Callable) -> Callable:
            out = output or name
            if out in self.jobs:
                raise ValueError(f"dataset '{out}' already produced by "
                                 f"job '{self.jobs[out].name}'")
            self.jobs[out] = Job(name=name, inputs=tuple(inputs), output=out, fn=fn)
            return fn

        return deco

    def discover(self, module) -> int:
        """Plug-in discovery (the reference's import-scan that finds every
        ExtensionJob subclass, job_scheduler.py discovery + base_job.py
        type-hint wiring): register every function in ``module`` marked by
        the ``@job(...)`` decorator. Returns the number registered."""
        n = 0
        for name in dir(module):
            fn = getattr(module, name)
            spec = getattr(fn, "_dag_spec", None)
            if spec is not None:
                self.register(spec["name"], spec["inputs"], spec["output"])(fn)
                n += 1
        return n

    # ------------------------------------------------------------ resolution
    def required_jobs(self, targets: list[str], sources: set[str]) -> set[str]:
        """BFS from the requested datasets back through producers — the
        reference's get_required_jobs (job_scheduler.py:117-134). Source
        datasets terminate the walk; an unknown dataset is an error."""
        needed: set[str] = set()
        q = deque(targets)
        seen: set[str] = set()
        while q:
            ds = q.popleft()
            if ds in seen or ds in sources:
                continue
            seen.add(ds)
            job = self.jobs.get(ds)
            if job is None:
                raise MissingDatasetError(
                    f"dataset '{ds}' has no producing job and is not a source"
                )
            needed.add(ds)
            q.extend(job.inputs)
        return needed

    def topo_order(self, targets: list[str], sources: set[str]) -> list[Job]:
        """Kahn's algorithm over the required subgraph (the reference's
        generation sort, job_scheduler.py:275-300); raises CycleError if the
        declared dependencies are cyclic."""
        needed = self.required_jobs(targets, sources)
        indeg = {
            ds: sum(1 for i in self.jobs[ds].inputs if i in needed)
            for ds in needed
        }
        ready = deque(sorted(ds for ds, d in indeg.items() if d == 0))
        order: list[Job] = []
        dependents: dict[str, list[str]] = {ds: [] for ds in needed}
        for ds in needed:
            for i in self.jobs[ds].inputs:
                if i in needed:
                    dependents[i].append(ds)
        while ready:
            ds = ready.popleft()
            order.append(self.jobs[ds])
            for dep in sorted(dependents[ds]):
                indeg[dep] -= 1
                if indeg[dep] == 0:
                    ready.append(dep)
        if len(order) != len(needed):
            cyc = sorted(ds for ds, d in indeg.items() if d > 0)
            raise CycleError(f"cyclic job dependencies among {cyc}")
        return order

    # ------------------------------------------------------------- execution
    def run(
        self,
        spark: SparkSession,
        sources: dict[str, DataFrame],
        targets: list[str] | None = None,
    ) -> dict[str, DataFrame]:
        """Resolve + run the jobs needed for ``targets`` (default: every
        registered dataset). Returns {dataset: DataFrame} including sources.
        Jobs receive exactly their declared inputs — an undeclared read is a
        KeyError, which keeps the dependency declarations honest."""
        targets = targets if targets is not None else sorted(self.jobs)
        avail: dict[str, DataFrame] = dict(sources)
        for job in self.topo_order(targets, set(sources)):
            ins = {ds: avail[ds] for ds in job.inputs}
            avail[job.output] = job.fn(spark, ins)
        return avail
