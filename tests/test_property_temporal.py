"""Property tests for the temporal operators: random probe/dim streams
cross-checked against brute-force Python references — the same oracle
discipline the merge property test applies to the LWW law."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hemera_indexer_spark.operators.temporal import asof_join, scd2_intervals

KEYS = ["k0", "k1", "k2"]
BASE = dt.datetime(2024, 1, 1)

probe_st = st.tuples(st.integers(0, 2), st.integers(0, 500))  # (key idx, ts sec)
dim_st = st.tuples(st.integers(0, 2), st.integers(0, 500), st.integers(0, 99))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    probes=st.lists(probe_st, min_size=1, max_size=25),
    dims=st.lists(dim_st, min_size=0, max_size=25),
)
def test_asof_matches_bruteforce(spark, probes, dims):
    probe_rows = [
        (i, KEYS[k], BASE + dt.timedelta(seconds=s))
        for i, (k, s) in enumerate(probes)
    ]
    dim_rows = [
        (j, KEYS[k], BASE + dt.timedelta(seconds=s), float(v))
        for j, (k, s, v) in enumerate(dims)
    ]
    p = spark.createDataFrame(probe_rows, "pid long, k string, ts timestamp")
    d = spark.createDataFrame(
        dim_rows or [(None, None, None, None)],
        "did long, k string, dts timestamp, v double",
    )
    if not dim_rows:
        d = d.where("did is not null")
    out = {
        r["pid"]: r["did"]
        for r in asof_join(
            p, d, key="k", probe_ts="ts", dim_ts="dts",
            dim_cols=["did", "v"], dim_tiebreak="did",
        ).collect()
    }
    # brute force: max (dts, did) among same-key dims with dts <= ts
    for i, (k, s) in enumerate(probes):
        cands = [
            (ds, j) for j, (dk, ds, _) in enumerate(dims)
            if dk == k and ds <= s
        ]
        expected = max(cands)[1] if cands else None
        assert out[i] == expected, (i, k, s, cands)
    assert len(out) == len(probes)  # left semantics: no probe lost


ver_st = st.tuples(st.integers(0, 2), st.integers(0, 4))  # (key idx, attr)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(ver_st, min_size=1, max_size=30))
def test_scd2_matches_bruteforce(spark, events):
    rows = [
        (KEYS[k], i, f"a{val}") for i, (k, val) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "k string, seq long, attr string")
    got = sorted(
        (r["k"], r["valid_from"], r["attr"],
         r["valid_to"], r["is_current"])
        for r in scd2_intervals(df, key="k", version="seq", attr="attr").collect()
    )
    # brute force: per key, ordered by seq, compress runs, lead() the froms
    exp = []
    for key in set(k for k, _, _ in rows):
        seqd = sorted((s, a) for k2, s, a in rows if k2 == key)
        runs = []
        for s, a in seqd:
            if not runs or runs[-1][1] != a:
                runs.append((s, a))
        for i, (s, a) in enumerate(runs):
            nxt = runs[i + 1][0] if i + 1 < len(runs) else None
            exp.append((key, s, a, nxt, nxt is None))
    assert got == sorted(exp)
