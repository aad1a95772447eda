"""Native session_window sessions (``relational.session_agg``):
per-user session counts equal the lag+cumsum probe (q29) on real
events, hand-built sessions with exact start/end/n, the documented
boundary divergence, and a one-shuffle plan pin."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.relational import session_agg
from big_data_hadoop_spark.probes import QUERIES
from big_data_hadoop_spark.sources.io import load_table
from tests.conftest import SF_ORACLE


def test_session_agg_agrees_with_lag_cumsum_probe(spark):
    ev = load_table(spark, SF_ORACLE, "events")
    got = {
        r.user_id: r.n
        for r in session_agg(ev, "user_id", "ts", 1800)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        r.user_id: r.n_sessions
        for r in QUERIES["q29_sessionization"](spark, SF_ORACLE).collect()
    }
    assert got == want and len(got) > 50


def test_session_agg_constructed(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        ("a", t0),
        ("a", t0 + timedelta(minutes=10)),
        ("a", t0 + timedelta(minutes=50)),  # 40 min gap > 30 → new
        ("b", t0 + timedelta(hours=2)),
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    got = sorted(
        (r.u, r.session_start, r.session_end, r.n_events)
        for r in session_agg(df, "u", "ts", 1800).collect()
    )
    assert got == [
        ("a", t0, t0 + timedelta(minutes=10), 2),
        ("a", t0 + timedelta(minutes=50), t0 + timedelta(minutes=50), 1),
        ("b", t0 + timedelta(hours=2), t0 + timedelta(hours=2), 1),
    ]
    with pytest.raises(ValueError, match="positive"):
        session_agg(df, "u", "ts", 0)


def test_session_agg_boundary_agreement_pinned(spark):
    """An event EXACTLY gap after its predecessor MERGES in all three
    sessionizers (session_window's end is inclusive; the lag/cumsum
    rule splits only when the gap is EXCEEDED) — pinned so a Spark
    behavior change cannot drift past silently."""
    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", t0), ("a", t0 + timedelta(seconds=1800))],
        "user_id string, ts timestamp",
    )
    assert session_agg(df, "user_id", "ts", 1800).count() == 1
    # one microsecond PAST the gap splits
    df2 = spark.createDataFrame(
        [("a", t0), ("a", t0 + timedelta(seconds=1800, microseconds=1))],
        "user_id string, ts timestamp",
    )
    assert session_agg(df2, "user_id", "ts", 1800).count() == 2
    # the q29 rule ((t - prev) > gap) keeps the boundary event
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    micros = F.unix_micros(F.col("ts"))
    ns = F.when(
        F.lag(micros).over(w).isNull()
        | ((micros - F.lag(micros).over(w)) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    n = (
        df.select("user_id", ns.alias("ns"))
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n"))
        .collect()[0]
        .n
    )
    assert n == 1


def test_session_agg_single_shuffle_plan(spark):
    ev = load_table(spark, SF_ORACLE, "events")
    plan = session_agg(ev, "user_id", "ts", 1800)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan


def test_session_agg_fractional_gap(spark):
    """Fractional gaps resolve at microsecond precision — int() would
    build an invalid '0 seconds' window for 0.5 (review finding)."""
    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", t0), ("a", t0 + timedelta(milliseconds=400)),
         ("a", t0 + timedelta(milliseconds=1200))],
        "u string, ts timestamp",
    )
    assert session_agg(df, "u", "ts", 0.5).count() == 2
    with pytest.raises(ValueError, match="positive"):
        session_agg(df, "u", "ts", 0.0000001)
