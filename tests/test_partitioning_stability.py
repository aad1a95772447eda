"""Floating-point probes must hash-match the oracle under ANY
partitioning: a different shuffle-partition count or input-split size
changes partial-aggregation order, and a ROUND at a .xx5 boundary would
flip. The driver's session need not match ours — this guards the gap.
"""

from __future__ import annotations

import pytest

from big_data_hadoop_spark.probes import ORACLES, QUERIES
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_frames_match

FLOAT_PROBES = [
    "q08_hash_agg",
    "q16_events_agg",
    "q28_event_windows",
    "q33_cube",
    "q36_moving_avg",
    "q48_sql_text",
    "q49_sliding_windows",
]


@pytest.mark.parametrize("name", FLOAT_PROBES)
def test_float_probe_stable_under_odd_partitioning(spark, duck, name):
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_bytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "262144")
    try:
        spark_pdf = QUERIES[name](spark, SF_ORACLE).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_bytes)
    assert_frames_match(spark_pdf, duck.sql(ORACLES[name]).df(), name)
