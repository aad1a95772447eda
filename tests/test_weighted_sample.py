"""Weighted sampling without replacement (Efraimidis-Spirakis): contract,
determinism, race-logic equality vs a Python replay of the same uniforms,
and the k=1 inclusion-probability law across seeds."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_hadoop_spark.pipeline import weighted_sample
from tests.conftest import SF_SMOKE


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text", "n_chars")
    )


def test_contract_sizes_subset_no_replacement(spark):
    docs = _docs(spark)
    n = docs.count()
    got = weighted_sample(docs, 50, "n_chars").collect()
    assert len(got) == 50
    ids = [r.doc_id for r in got]
    assert len(set(ids)) == 50  # without replacement
    all_ids = {r.doc_id for r in docs.collect()}
    assert set(ids) <= all_ids
    # k beyond the corpus: every eligible row
    assert weighted_sample(docs, n + 10, "n_chars").count() == n


def test_null_and_nonpositive_weights_ineligible(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 0.0), (4, -2.0), (5, 1.0)],
        "doc_id long, w double",
    )
    got = {r.doc_id for r in weighted_sample(df, 10, "w").collect()}
    assert got == {1, 5}


def test_deterministic_across_partitionings_and_seeds(spark):
    docs = _docs(spark)
    a = {r.doc_id for r in weighted_sample(docs, 40, "n_chars", seed=7).collect()}
    b = {
        r.doc_id
        for r in weighted_sample(
            docs.repartition(17, "text"), 40, "n_chars", seed=7
        ).collect()
    }
    assert a == b
    c = {r.doc_id for r in weighted_sample(docs, 40, "n_chars", seed=8).collect()}
    assert a != c  # different seed, different draw


def test_equals_python_race_on_same_uniforms(spark):
    docs = _docs(spark)
    den = 2**31
    rows = docs.select(
        "doc_id",
        "n_chars",
        (
            (
                F.pmod(F.xxhash64("doc_id", F.lit(0)), F.lit(den)).cast("double")
                + F.lit(0.5)
            )
            / F.lit(float(den))
        ).alias("u"),
    ).collect()
    expect = sorted(
        ((-math.log(r.u) / r.n_chars, r.doc_id) for r in rows)
    )[:25]
    got = [
        r.doc_id
        for r in weighted_sample(docs, 25, "n_chars")
        .withColumn(
            "_k",
            -F.log(
                (
                    F.pmod(F.xxhash64("doc_id", F.lit(0)), F.lit(den)).cast(
                        "double"
                    )
                    + F.lit(0.5)
                )
                / F.lit(float(den))
            )
            / F.col("n_chars"),
        )
        .orderBy("_k", "doc_id")
        .collect()
    ]
    assert got == [d for _, d in expect]


def test_k1_inclusion_probability_proportional_to_weight(spark):
    """For k=1 the winner's law is exactly w_i / sum(w). Replay the race
    for 400 seeds in ONE job (explode) and check the heavy item's win
    count against a 5-sigma binomial band."""
    import pandas as pd

    items = [(i, 1.0) for i in range(1, 5)] + [(5, 20.0)]
    df = spark.createDataFrame(items, "doc_id long, w double")
    n_seeds = 400
    den = 2**31
    seeded = df.select(
        "doc_id", "w", F.explode(F.sequence(F.lit(0), F.lit(n_seeds - 1))).alias("seed")
    )
    key = -F.log(
        (
            F.pmod(F.xxhash64("doc_id", "seed"), F.lit(den)).cast("double")
            + F.lit(0.5)
        )
        / F.lit(float(den))
    ) / F.col("w")
    winners = (
        seeded.withColumn("_k", key)
        .groupBy("seed")
        .agg(F.min_by("doc_id", F.struct("_k", "doc_id")).alias("winner"))
    )
    counts = (
        winners.groupBy("winner").count().toPandas().set_index("winner")["count"]
    )
    p = 20.0 / 24.0
    mean, sd = n_seeds * p, math.sqrt(n_seeds * p * (1 - p))
    heavy = int(counts.get(5, 0))
    assert abs(heavy - mean) < 5 * sd, (heavy, mean, sd)
    # and the single-seed operator matches this replay's seed-0 winner
    op = weighted_sample(df, 1, "w", seed=0).collect()
    replay0 = winners.filter(F.col("seed") == 0).collect()[0].winner
    assert [r.doc_id for r in op] == [replay0]
    assert isinstance(counts, pd.Series)


def test_grouped_quota(spark):
    docs = _docs(spark).withColumn(
        "grp", (F.col("doc_id") % 3).cast("string")
    )
    got = weighted_sample(docs, 10, "n_chars", group_col="grp")
    sizes = {
        r.grp: r.n
        for r in got.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    avail = {
        r.grp: r.n
        for r in docs.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    for g, n_avail in avail.items():
        assert sizes.get(g, 0) == min(10, n_avail)
    # grouped draw is the per-group restriction of the same race
    for g in avail:
        solo = {
            r.doc_id
            for r in weighted_sample(
                docs.filter(F.col("grp") == g), 10, "n_chars"
            ).collect()
        }
        grouped_g = {
            r.doc_id for r in got.filter(F.col("grp") == g).collect()
        }
        assert solo == grouped_g
