from __future__ import annotations

import duckdb
import pytest

from big_data_hadoop_spark.session import get_spark
from big_data_hadoop_spark.sources.io import TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the testdata tables registered as views,
    mirroring the driver's oracle setup (sf0.01)."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_smoke():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def golden_lines(spark):
    """FIXTURES.md §B golden corpus — reference worked examples + edges."""
    rows = [
        (0, "I am in A group of 3 20 year adults with Weight 2.5.5"),
        (1, "i study In 1 luxembourg"),
        (2, "i am 20"),
        (3, "i Am a boy"),
        (4, "i am good"),
        (5, "foo  bar baz"),
        (6, "- _ -- a-b_c"),
        (7, "3. +4 -5 1.25 12 3"),
        (8, "the cat the cat the"),
        (9, "x y z x y z"),
        (10, "solo"),
        (11, "A B C"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")
