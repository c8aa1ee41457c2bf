#!/usr/bin/env python
"""Machine envelope probe: how does THIS box scale memory bandwidth vs
pure CPU from N to 4N parallel workers?

Two workloads, each run with P concurrent processes (no shared state, no
synchronization inside the timed region):

- ``bw``: repeated numpy memcpy of a 64 MB buffer (128 MB working set per
  worker; at every measured level the AGGREGATE working set — 512 MB at
  P=4 and up — far exceeds any last-level cache, so the loop is
  DRAM-bound): the regime of shuffle sort/spill, UnsafeRow traffic,
  parquet encode, tmpfs writes.
- ``cpu``: iterated xxhash-style integer mixing over a small (L1-resident)
  array — core-bound, touches almost no DRAM.

Prints aggregate throughput per level and the N->4N scaling efficiency of
each regime. The CDC job's per-stage efficiencies can then be placed
between the two machine curves: a stage tracking the bw curve is capped
by the socket, not the engine.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np


def bw_worker(seconds: float, q):
    src = np.random.default_rng(0).integers(0, 255, 64 * 1024 * 1024 // 8, dtype=np.int64)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # pre-fault both buffers before the timed region
    n = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < seconds:
        np.copyto(dst, src)
        src[0] += 1  # defeat any elision
        n += 1
    q.put(n * src.nbytes * 2)  # read + write


def cpu_worker(seconds: float, q):
    x = np.arange(4096, dtype=np.uint64)  # L1-resident
    n = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < seconds:
        for _ in range(64):
            x ^= x >> 33
            x *= np.uint64(0xFF51AFD7ED558CCD)
            x ^= x >> 33
        n += 64 * x.size
    q.put(n)


def run(kind: str, procs: int, seconds: float) -> float:
    q = mp.Queue()
    target = bw_worker if kind == "bw" else cpu_worker
    ps = [mp.Process(target=target, args=(seconds, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / seconds


def main() -> None:
    seconds = float(os.environ.get("PROBE_SECONDS", "6"))
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = 4 * lo
    out = {"lo": lo, "hi": hi, "loadavg_start": os.getloadavg()[0]}
    for kind in ("bw", "cpu"):
        a = run(kind, lo, seconds)
        b = run(kind, hi, seconds)
        out[kind] = {
            f"agg@{lo}": round(a / 1e9, 2),
            f"agg@{hi}": round(b / 1e9, 2),
            "unit": "GB/s" if kind == "bw" else "Gops/s",
            "efficiency": round((b / a) / (hi / lo), 3),
        }
    out["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
