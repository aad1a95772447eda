"""Time-series resample/densify/fill (``relational.resample_timeseries``):
DuckDB oracle on sf0.01 events (generate_series grid + IGNORE NULLS
windows), a constructed series with hand-computed locf/linear/zero
fills, and the per-key grid-explosion valve."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from big_data_hadoop_spark.operators.relational import resample_timeseries
from big_data_hadoop_spark.sources.io import load_table
from tests.conftest import SF_ORACLE

_ORACLE = """
WITH obs AS (
  SELECT user_id AS k, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS b,
         avg(value) AS v, count(value) AS n_obs
  FROM events GROUP BY 1, 2
), span AS (
  SELECT k, min(b) AS mb, max(b) AS xb FROM obs GROUP BY k
), grid AS (
  SELECT k, unnest(generate_series(mb, xb)) AS b FROM span
), j AS (
  SELECT g.k, g.b, o.v, coalesce(o.n_obs, 0) AS n_obs
  FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.b = o.b
), f AS (
  SELECT k, b, n_obs, v,
    last_value(v IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY b
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY b
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pb,
    first_value(v IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY b
       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY b
       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nb
  FROM j
)
SELECT k, b, n_obs,
  CASE WHEN v IS NOT NULL THEN v
       WHEN pv IS NOT NULL AND nv IS NOT NULL
       THEN pv + (nv - pv) * (b - pb) / (nb - pb)
  END AS value
FROM f ORDER BY k, b
"""


def test_resample_linear_matches_duckdb(spark, duck):
    ev = load_table(spark, SF_ORACLE, "events")
    got = [
        (
            r[0],
            int(r.bucket_ts.timestamp() // 86400),
            r.n_obs,
            None if r.value is None else round(r.value, 6),
        )
        for r in resample_timeseries(
            ev, "user_id", "ts", "value", 86400, agg="avg", fill="linear"
        )
        .orderBy("user_id", "bucket_ts")
        .collect()
    ]
    want = [
        (k, b, n, None if v is None else round(v, 6))
        for k, b, n, v in duck.execute(_ORACLE).fetchall()
    ]
    assert len(got) == len(want) and got
    assert got == want
    # non-vacuous: the grid densified actual gaps
    assert any(n == 0 for _, _, n, _ in got), "no gaps — nothing densified"


def _series(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        # key "a": obs in buckets 0 (two obs → avg 2.0), 3 (8.0); gap 1-2
        ("a", t0, 1.0),
        ("a", t0 + timedelta(hours=1), 3.0),
        ("a", t0 + timedelta(days=3), 8.0),
        # key "b": single bucket — grid is one row, nothing to fill
        ("b", t0 + timedelta(days=5), 4.0),
        # key "c": a NULL-valued observation makes bucket 1 EMPTY
        # (n_obs counts non-null), sitting between real obs
        ("c", t0, 0.0),
        ("c", t0 + timedelta(days=1), None),
        ("c", t0 + timedelta(days=2), 6.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def _run(spark, fill):
    out = {}
    for r in resample_timeseries(
        _series(spark), "k", "ts", "v", 86400, fill=fill
    ).collect():
        b = int(r.bucket_ts.timestamp() // 86400)
        out[(r.k, b - 19723)] = (r.n_obs, r.value)  # 2024-01-01 = day 19723
    return out


def test_resample_constructed_fills(spark):
    base = {
        ("a", 0): (2, 2.0),
        ("a", 3): (1, 8.0),
        ("b", 5): (1, 4.0),
        ("c", 0): (1, 0.0),
        ("c", 2): (1, 6.0),
    }
    got = _run(spark, "null")
    assert got == {
        **base,
        ("a", 1): (0, None),
        ("a", 2): (0, None),
        ("c", 1): (0, None),
    }
    got = _run(spark, "zero")
    assert got[("a", 1)] == (0, 0.0) and got[("c", 1)] == (0, 0.0)
    got = _run(spark, "locf")
    assert got[("a", 1)] == (0, 2.0) and got[("a", 2)] == (0, 2.0)
    assert got[("c", 1)] == (0, 0.0)  # carried-forward 0.0, not zero-fill
    got = _run(spark, "linear")
    assert got[("a", 1)] == (0, 4.0) and got[("a", 2)] == (0, 6.0)
    assert got[("c", 1)] == (0, 3.0)
    for g in (got,):
        assert g[("a", 0)] == (2, 2.0) and g[("a", 3)] == (1, 8.0)


def test_resample_valve_and_validation(spark):
    df = _series(spark)
    with pytest.raises(ValueError, match="max_buckets_per_key"):
        resample_timeseries(
            df, "k", "ts", "v", 60, max_buckets_per_key=10
        ).count()
    with pytest.raises(ValueError, match="agg must be"):
        resample_timeseries(df, "k", "ts", "v", 60, agg="median")
    with pytest.raises(ValueError, match="fill must be"):
        resample_timeseries(df, "k", "ts", "v", 60, fill="spline")
    with pytest.raises(ValueError, match="positive"):
        resample_timeseries(df, "k", "ts", "v", 0)
    with pytest.raises(ValueError, match="key_col"):
        resample_timeseries(
            df.withColumnRenamed("k", "value"), "value", "ts", "v", 60
        )


def test_resample_count_agg_empty_input(spark):
    got = {
        (r.k, r.n_obs): r.value
        for r in resample_timeseries(
            _series(spark).filter("k = 'b'"), "k", "ts", "v", 86400,
            agg="count",
        ).collect()
    }
    assert got == {("b", 1): 1.0}
    empty = _series(spark).filter("1 = 0")
    assert resample_timeseries(empty, "k", "ts", "v", 86400).count() == 0


def test_resample_fractional_step(spark):
    """step_seconds=0.5 buckets at 500 ms — int() truncation would
    produce a ZERO step (divide-by-zero under ANSI; review finding)."""
    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("a", t0, 1.0),
            ("a", t0 + timedelta(milliseconds=500), 2.0),
            ("a", t0 + timedelta(milliseconds=1500), 4.0),
        ],
        "k string, ts timestamp, v double",
    )
    got = {
        int(r.bucket_ts.timestamp() * 1000): (r.n_obs, r.value)
        for r in resample_timeseries(
            df, "k", "ts", "v", 0.5, fill="linear"
        ).collect()
    }
    day0 = int(datetime(2024, 1, 1).timestamp() * 1000)
    assert got == {
        day0: (1, 1.0),
        day0 + 500: (1, 2.0),
        day0 + 1000: (0, 3.0),
        day0 + 1500: (1, 4.0),
    }
    with pytest.raises(ValueError, match="positive"):
        resample_timeseries(df, "k", "ts", "v", 0.0000001)
