"""Cohort retention (``relational.cohort_retention``): DuckDB oracle on
the sf0.01 events (same date_trunc/datediff semantics), a constructed
matrix with known retention, and the one-wide-shuffle plan shape."""

from __future__ import annotations

from datetime import datetime, timedelta

from big_data_hadoop_spark.operators.relational import cohort_retention
from big_data_hadoop_spark.sources.io import load_table
from tests.conftest import SF_ORACLE


def _oracle(duck, period, days, max_offset):
    return duck.execute(f"""
WITH pu AS (
  SELECT DISTINCT user_id, date_trunc('{period}', ts) AS p FROM events
), c AS (
  SELECT user_id, min(p) AS cohort FROM pu GROUP BY user_id
)
SELECT CAST(c.cohort AS DATE) AS cohort,
       CAST(date_diff('day', CAST(c.cohort AS DATE), CAST(pu.p AS DATE))
            // {days} AS INT) AS "offset",
       COUNT(*) AS n_users
FROM pu JOIN c USING (user_id)
WHERE date_diff('day', CAST(c.cohort AS DATE), CAST(pu.p AS DATE))
      // {days} <= {max_offset}
GROUP BY 1, 2
ORDER BY 1, 2
""").fetchall()


def test_cohort_retention_matches_duckdb(spark, duck):
    ev = load_table(spark, SF_ORACLE, "events")
    for period, days in (("week", 7), ("day", 1)):
        got = [
            (r.cohort, r.offset, r.n_users)
            for r in cohort_retention(ev, period=period, max_offset=6).collect()
        ]
        expect = [
            (c, o, n) for c, o, n in _oracle(duck, period, days, 6)
        ]
        assert got == expect and got, period


def test_cohort_retention_constructed(spark):
    """Two weekly cohorts with known retention: cohort A (w0) has 3
    users, 2 return in w1, 1 in w2; cohort B (w1) has 1 user who never
    returns."""
    w0 = datetime(2024, 1, 1)  # a Monday

    def e(u, weeks, days=0):
        return (u, w0 + timedelta(weeks=weeks, days=days))

    rows = [
        e(1, 0), e(2, 0, 3), e(3, 0),
        e(1, 1), e(2, 1, 2),
        e(1, 2),
        e(9, 1, 4),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort), r.offset): r.n_users
        for r in cohort_retention(ev, period="week").collect()
    }
    assert got == {
        ("2024-01-01", 0): 3,
        ("2024-01-01", 1): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_cohort_retention_one_wide_shuffle(spark):
    """One Exchange for the user groupBy, one for the small
    (cohort × offset) count — and NO join of events against per-user
    first-activity (the textbook double-shuffle formulation)."""
    import re

    from big_data_hadoop_spark.plans.audit import formatted_plan

    ev = load_table(spark, SF_ORACLE, "events")
    plan = formatted_plan(cohort_retention(ev))
    assert "Join" not in plan, plan[:1500]
    # user agg + final count + orderBy range partitioning = 3 exchanges,
    # only ONE of which moves per-event data
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3


def test_cohort_retention_rejects_month(spark):
    import pytest as _pytest

    ev = load_table(spark, SF_ORACLE, "events")
    with _pytest.raises(ValueError, match="period"):
        cohort_retention(ev, period="month")


def test_q87_probe_matches_duckdb(spark, duck):
    from big_data_hadoop_spark.probes import QUERIES

    got = [
        (r.cohort, r.offset, r.n_users)
        for r in QUERIES["q87_cohort_retention"](spark, SF_ORACLE).collect()
    ]
    assert got == _oracle(duck, "week", 7, 6) and got
