"""DuckDB-oracle correctness (t2 gate): every declared probe, engine vs
DuckDB on sf0.01 — the same tier the driver checks."""

from __future__ import annotations

import pytest

from big_data_hadoop_spark.probes import ORACLES, QUERIES
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_frames_match

ORACLE_KEYS = sorted(k for k in QUERIES if k in ORACLES)
ROWS_ONLY_KEYS = sorted(k for k in QUERIES if k not in ORACLES)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_probe_matches_oracle(spark, duck, name):
    spark_pdf = QUERIES[name](spark, SF_ORACLE).toPandas()
    duck_pdf = duck.sql(ORACLES[name]).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_probe_runs(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.columns) > 0
