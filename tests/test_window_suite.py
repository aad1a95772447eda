"""q77 (analytic-window completion) and q78 (correlated subqueries):
full DuckDB oracles at sf0.01 — the driver's 50 oracle slots are full,
so these registry probes carry their oracle here instead."""

from __future__ import annotations

from big_data_hadoop_spark.probes import (
    q77_window_fn_suite,
    q78_correlated_subqueries,
)
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_frames_match

# DuckDB's percent_rank/cume_dist/ntile follow the same ANSI definitions
# Spark implements; nth_value needs an explicit full frame (DuckDB's
# default frame is RANGE UNBOUNDED PRECEDING..CURRENT ROW).
Q77_ORACLE = """
SELECT c_custkey, c_nationkey, c_acctbal,
       ntile(4) OVER w AS quartile,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cume,
       nth_value(c_custkey, 2) OVER wf AS second_key,
       first_value(c_custkey) OVER wf AS first_key,
       last_value(c_custkey) OVER wf AS last_key
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC),
       wf AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY c_custkey
"""

Q78_ORACLE = """
SELECT c.c_custkey,
       c.c_acctbal,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
         WHERE o.o_custkey = c.c_custkey) AS n_orders,
       c.c_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_name LIKE 'A%') AS in_a_nation
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_totalprice > 100000)
  AND NOT EXISTS (SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderstatus = 'F'
                     AND o.o_totalprice < 1000)
ORDER BY c.c_custkey
"""


def test_q77_matches_duckdb(spark, duck):
    got = q77_window_fn_suite(spark, SF_ORACLE).toPandas()
    want = duck.sql(Q77_ORACLE).df()
    assert len(got) > 100
    assert_frames_match(got, want, "q77_window_fn_suite")


def test_q78_matches_duckdb(spark, duck):
    got = q78_correlated_subqueries(spark, SF_ORACLE).toPandas()
    want = duck.sql(Q78_ORACLE).df()
    assert len(got) > 10
    assert_frames_match(got, want, "q78_correlated_subqueries")


def test_q78_decorrelates_to_joins(spark):
    """Catalyst must de-correlate: EXISTS -> left-semi, NOT EXISTS ->
    left-anti — no per-row subquery re-execution survives in the
    physical plan."""
    plan = q78_correlated_subqueries(
        spark, SF_ORACLE
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


Q82_ORACLE = """
WITH long AS (
  SELECT l_orderkey, 'l_quantity' AS metric, l_quantity::DOUBLE AS value
    FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_extendedprice', l_extendedprice::DOUBLE FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_discount', l_discount::DOUBLE FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_tax', l_tax::DOUBLE FROM lineitem
)
SELECT metric, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total,
       ROUND(AVG(value), 6) AS avg_value
FROM long GROUP BY metric ORDER BY metric
"""


def test_q82_matches_duckdb(spark, duck):
    from big_data_hadoop_spark.probes import q82_unpivot

    got = q82_unpivot(spark, SF_ORACLE).toPandas()
    want = duck.sql(Q82_ORACLE).df()
    assert len(got) == 4
    assert_frames_match(got, want, "q82_unpivot")


Q83_ORACLE = """
WITH a AS (
  SELECT l_orderkey,
         list(l_quantity ORDER BY l_linenumber, l_quantity,
              l_extendedprice, l_tax) AS qty,
         list(l_extendedprice ORDER BY l_linenumber, l_quantity,
              l_extendedprice, l_tax) AS price,
         list(l_tax ORDER BY l_linenumber, l_quantity,
              l_extendedprice, l_tax) AS tax
  FROM lineitem WHERE l_orderkey < 1000 GROUP BY l_orderkey
)
SELECT l_orderkey,
       array_to_string(list_transform(qty, q -> CAST(q * 2 AS BIGINT)), ',')
         AS qty_doubled,
       CAST(len(list_filter(qty, q -> q > 25)) AS INTEGER) AS n_big_lines,
       len(list_filter(tax, t -> t = 0)) > 0 AS has_taxfree,
       ROUND(list_sum(list_transform(list_zip(qty, price),
                                     z -> z[1] * z[2])), 2) AS revenue
FROM a ORDER BY l_orderkey
"""


def test_q83_matches_duckdb(spark, duck):
    from big_data_hadoop_spark.probes import q83_array_hof

    got = q83_array_hof(spark, SF_ORACLE).toPandas()
    want = duck.sql(Q83_ORACLE).df()
    assert len(got) > 50
    assert_frames_match(got, want, "q83_array_hof")
