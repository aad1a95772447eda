"""Full oracle battery at sf0.1 — opt-in (SPARK_GRAFT_FULL_ORACLE=1).

The default suite verifies every probe against DuckDB at sf0.01 (the
driver's scale). Some defects only surface with more data: the round-2
minhash permutation bug (monotone ``a*h+b`` family) passed every sf0.01
check and lost 5 of 249 true pairs at sf0.1. This module re-runs the
whole oracle set at sf0.1; it adds ~5 minutes, so it is skipped unless
explicitly requested:

    SPARK_GRAFT_FULL_ORACLE=1 python -m pytest tests/test_oracle_sf01.py
"""

from __future__ import annotations

import os

import pytest

from big_data_hadoop_spark.probes import ORACLES, QUERIES
from tests.oracle_utils import assert_frames_match

SF_BENCH = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_FULL_ORACLE") != "1",
    reason="sf0.1 oracle battery is opt-in (SPARK_GRAFT_FULL_ORACLE=1)",
)


@pytest.fixture(scope="module")
def duck_sf01():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_BENCH}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_probe_matches_oracle_at_sf01(spark, duck_sf01, name):
    spark_pdf = QUERIES[name](spark, SF_BENCH).toPandas()
    duck_pdf = duck_sf01.sql(ORACLES[name]).df()
    assert_frames_match(spark_pdf, duck_pdf, name)
