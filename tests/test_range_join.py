"""Bucketized unkeyed interval join: output must equal both the naive
Spark band join and a DuckDB range join, and the plan must be a hash
equi-join on the bucket id — never a nested-loop/cartesian scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.relational import bucketized_range_join
from big_data_hadoop_spark.plans.audit import formatted_plan
from big_data_hadoop_spark.sources.io import load_table
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_frames_match


def _sides(spark):
    ev = load_table(spark, SF_ORACLE, "events")
    # testdata ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP (UTC session)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    left = ev.select(
        F.col("event_id").alias("l_event"),
        us.alias("l_us"),
    )
    # intervals: 10 minutes after each signup event
    right = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("r_event"),
            us.alias("lo_us"),
            (us + 600_000_000).alias("hi_us"),
        )
    )
    return left, right


def test_bucketized_equals_naive_and_duckdb(spark, duck):
    left, right = _sides(spark)
    got = (
        bucketized_range_join(
            left, right, "l_us", "lo_us", "hi_us", bucket_width=600_000_000
        )
        .select("l_event", "r_event")
        .orderBy("l_event", "r_event")
        .toPandas()
    )
    naive = (
        left.join(
            right,
            (F.col("l_us") > F.col("lo_us")) & (F.col("l_us") <= F.col("hi_us")),
        )
        .select("l_event", "r_event")
        .orderBy("l_event", "r_event")
        .toPandas()
    )
    assert len(got) > 0
    assert got.equals(naive)
    oracle = """
WITH l AS (SELECT event_id AS l_event, epoch_us(ts::TIMESTAMP) AS l_us
           FROM events),
r AS (SELECT event_id AS r_event, epoch_us(ts::TIMESTAMP) AS lo_us,
             epoch_us(ts::TIMESTAMP) + 600000000 AS hi_us
      FROM events WHERE event_type = 'signup')
SELECT l_event, r_event FROM l JOIN r
  ON l.l_us > r.lo_us AND l.l_us <= r.hi_us
ORDER BY l_event, r_event
"""
    assert_frames_match(got, duck.execute(oracle).fetchdf(), "range_join")


def test_bucketized_is_equi_join_not_nested_loop(spark):
    left, right = _sides(spark)
    plan = formatted_plan(
        bucketized_range_join(
            left, right, "l_us", "lo_us", "hi_us", bucket_width=600_000_000
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan
    # and the naive form IS the nested-loop shape this operator replaces
    naive_plan = formatted_plan(
        left.join(
            right,
            (F.col("l_us") > F.col("lo_us")) & (F.col("l_us") <= F.col("hi_us")),
        )
    )
    assert (
        "BroadcastNestedLoopJoin" in naive_plan
        or "CartesianProduct" in naive_plan
    ), naive_plan


def test_bucketized_range_join_guards(spark):
    import pytest

    df = spark.range(3).select(F.col("id").alias("x"))
    with pytest.raises(ValueError, match="disjoint"):
        bucketized_range_join(df, df, "x", "x", "x", 10)


def test_bucket_width_extremes_stay_exact(spark):
    """Tiny and huge bucket widths change replication, never results."""
    left, right = _sides(spark)
    base = None
    for width in (60_000_000, 3_600_000_000):
        got = sorted(
            (r.l_event, r.r_event)
            for r in bucketized_range_join(
                left, right, "l_us", "lo_us", "hi_us", bucket_width=width
            ).collect()
        )
        if base is None:
            base = got
        assert got == base
