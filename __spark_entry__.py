"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``big_data_hadoop_spark.probes`` — one Spark
callable + one DuckDB oracle per declared operator (SURVEY.md §2.8).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_hadoop_spark.probes import ORACLES, QUERIES  # noqa: E402
from big_data_hadoop_spark.session import configure_runtime  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: distance-1 same-category co-occurrence pairs
    (the reference's signature computation) over sf0.001 documents."""
    configure_runtime(spark)
    return QUERIES["q03_pairs_m1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_runtime(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys without an entry get the
    weaker rows-only check (xxhash64-based ops: q51_simhash)."""
    return dict(ORACLES)
