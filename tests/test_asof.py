"""Two-table as-of join (VERDICT r2 #2): DuckDB ``ASOF JOIN`` is the
oracle at sf0.01, and the plan must shuffle each input exactly once on
the partition key (the merge-as-of union form — no range-join explosion).

The fixture joins events (the fact stream) to "profile updates" derived
from the same table's signup events — the events-to-slowly-changing-
metadata shape a training-data pipeline hits first.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.relational import asof_join
from big_data_hadoop_spark.plans.audit import formatted_plan
from big_data_hadoop_spark.sources.io import load_table
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_frames_match

_ORACLE_SQL = """
SELECT l.event_id, l.user_id, l.ts, r.tier
FROM events l
ASOF {how} JOIN (
  SELECT user_id, ts, value AS tier FROM events WHERE event_type = 'signup'
) r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
"""


def _spark_side(spark, how: str):
    ev = load_table(spark, SF_ORACLE, "events")
    updates = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("value").alias("tier")
    )
    left = ev.select("event_id", "user_id", "ts")
    return asof_join(
        left, updates, partition_col="user_id", ts_col="ts",
        value_cols=["tier"], how=how,
    ).orderBy("event_id")


@pytest.mark.parametrize("how", ["left", "inner"])
def test_asof_join_matches_duckdb(spark, duck, how):
    got = _spark_side(spark, how).toPandas()
    exp = duck.execute(_ORACLE_SQL.format(how=how.upper())).fetchdf()
    assert got["tier"].notna().any()  # non-vacuous: some rows matched
    if how == "left":
        assert got["tier"].isna().any()  # and some pre-signup rows did not
    assert_frames_match(got, exp, f"asof_{how}")


def test_asof_join_single_shuffle_on_partition_key(spark):
    """The union-with-tag form must plan ONE hash exchange (both union
    branches partitioned together on the partition key) feeding the
    running window — the same shuffle bill as a co-partitioned join."""
    plan = formatted_plan(_spark_side(spark, "left"))
    # orderBy adds a rangepartitioning exchange for display determinism;
    # the as-of core itself must contribute exactly one hash exchange.
    hash_ex = re.findall(r"hashpartitioning\(([^,]+)", plan)
    assert len(hash_ex) == 1, plan
    assert "user_id" in hash_ex[0], plan


def test_asof_join_guards(spark):
    df = spark.range(3).select(
        F.col("id").alias("k"), F.col("id").alias("ts"), F.lit(1).alias("v")
    )
    with pytest.raises(ValueError, match="how"):
        asof_join(df, df, "k", "ts", ["v"], how="full")
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, "k", "ts", ["v"])


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_asof_join_matches_pandas_merge_asof(spark, data):
    """Property: on random keyed event/update streams the engine's
    as-of join equals pandas merge_asof (an independent widely-used
    reference), for both inner and left semantics."""
    import pandas as pd

    n_left = data.draw(st.integers(1, 25), label="n_left")
    n_right = data.draw(st.integers(0, 15), label="n_right")
    keys = st.integers(0, 3)
    tss = st.integers(0, 50)
    left_rows = data.draw(
        st.lists(st.tuples(keys, tss), min_size=n_left, max_size=n_left),
        label="left",
    )
    right_rows = data.draw(
        st.lists(st.tuples(keys, tss), min_size=n_right, max_size=n_right),
        label="right",
    )
    # unique (key, ts) on the right: with duplicates the engine picks the
    # greatest payload while merge_asof picks the last input row — both
    # "arbitrary but deterministic"; exclude that freedom from the test
    right_rows = list({(k, t): None for (k, t) in right_rows})
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        "event_id long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(k, t, k * 1000 + t) for (k, t) in right_rows],
        "k long, ts long, v long",
    )
    how = data.draw(st.sampled_from(["left", "inner"]), label="how")
    got = {
        (r.event_id, r.v)
        for r in asof_join(left, right, "k", "ts", ["v"], how=how).collect()
    }

    lp = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        columns=["event_id", "k", "ts"],
    ).sort_values(["ts", "event_id"], kind="stable")
    rp = (
        pd.DataFrame(
            [(k, t, k * 1000 + t) for (k, t) in right_rows],
            columns=["k", "ts", "v"],
        )
        .astype({"k": "int64", "ts": "int64", "v": "int64"})
        .sort_values(["ts", "k"], kind="stable")
    )
    merged = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward", allow_exact_matches=True
    )
    expect = set()
    for _, row in merged.iterrows():
        if pd.isna(row["v"]):
            if how == "left":
                expect.add((int(row["event_id"]), None))
        else:
            expect.add((int(row["event_id"]), int(row["v"])))
    assert got == expect

@pytest.mark.parametrize("how", ["left", "inner"])
def test_asof_join_null_partition_keys_never_match(spark, how):
    """NULL join keys never match (join/DuckDB ASOF semantics, ADVICE
    r3): a NULL-key left row must NOT inherit the payload of a NULL-key
    right row, even when that right row precedes it in time."""
    left = spark.createDataFrame(
        [(0, None, 10), (1, 5, 10), (2, None, 30)],
        "event_id long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(None, 1, 111), (5, 2, 555)], "k long, ts long, v long"
    )
    out = asof_join(left, right, "k", "ts", ["v"], how=how)
    got = {(r.event_id, r.v) for r in out.collect()}
    if how == "left":
        assert got == {(0, None), (1, 555), (2, None)}
    else:
        assert got == {(1, 555)}
