"""Incremental OLAP layer: daily partition-overwrite aggregates + the
sequential period fold; period totals must equal a direct global aggregate,
day re-runs must be idempotent, and the fold must resume from checkpoint."""

import pyspark.sql.functions as F

from hemera_indexer_spark.plans.aggr_scheduler import SUM_COLS, AggrScheduler

SF = "/root/testdata/sf0.01"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_daily_plus_period_equals_global(spark, tmp_path):
    ev = _events(spark)
    sched = AggrScheduler(spark, str(tmp_path / "aggr"))
    sched.run_daily(ev)
    period = sched.run_period()

    direct = (
        ev.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
        )
    )
    p = {r["user_id"]: r for r in period.collect()}
    d = {r["user_id"]: r for r in direct.collect()}
    assert set(p) == set(d)
    for uid in d:
        assert p[uid]["n_events"] == d[uid]["n_events"]
        assert p[uid]["n_errors"] == d[uid]["n_errors"]
        assert abs(p[uid]["sum_value"] - d[uid]["sum_value"]) < 1e-6


def test_daily_rerun_idempotent_and_period_resume(spark, tmp_path):
    ev = _events(spark)
    sched = AggrScheduler(spark, str(tmp_path / "aggr"))
    sched.run_daily(ev)

    days = sorted(
        r[0] for r in sched.daily().select(F.col("day").cast("string")).distinct().collect()
    )
    # re-run one day: dynamic partition overwrite leaves totals unchanged
    before = sched.daily().count()
    sched.run_daily(ev, days=[days[0]])
    assert sched.daily().count() == before

    period1 = sched.run_period().collect()
    # resume: nothing new to fold; a fresh scheduler reads the checkpoint
    sched2 = AggrScheduler(spark, str(tmp_path / "aggr"))
    period2 = sched2.run_period().collect()
    assert sorted(map(tuple, period1)) == sorted(map(tuple, period2))
    assert sched2._ckpt_state()["last_day"] == days[-1]
