"""Verification for ``pipeline.cap_per_group`` (per-domain caps / exact
per-group quota sampling): Python replication on Spark-supplied xxhash64
keys, determinism across partitionings and seeds, and the
under-cap-pass-through contract.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from big_data_hadoop_spark.pipeline import cap_per_group
from big_data_hadoop_spark.sources.io import load_table

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    # group sizes 5 / 30 / 200: one under, two over a cap of 20
    rows = (
        [(i, "tiny") for i in range(5)]
        + [(100 + i, "mid") for i in range(30)]
        + [(1000 + i, "big") for i in range(200)]
    )
    return spark.createDataFrame(rows, "doc_id long, grp string").cache()


def _expected(spark, df, cap, seed):
    keyed = df.select(
        "doc_id",
        "grp",
        F.pmod(F.xxhash64("doc_id", F.lit(seed)), F.lit(1_000_000_007)).alias(
            "k"
        ),
    ).collect()
    by_grp: dict[str, list] = {}
    for r in keyed:
        by_grp.setdefault(r["grp"], []).append((r["k"], r["doc_id"]))
    out = set()
    for grp, rows in by_grp.items():
        for _, doc_id in sorted(rows)[:cap]:
            out.add(doc_id)
    return out


def test_matches_python_selection(spark, skewed):
    for seed in (0, 7):
        got = {
            r["doc_id"]
            for r in cap_per_group(
                skewed, group_col="grp", cap=20, seed=seed
            ).collect()
        }
        assert got == _expected(spark, skewed, 20, seed)


def test_group_sizes_capped(spark, skewed):
    sizes = {
        r["grp"]: r["n"]
        for r in cap_per_group(skewed, group_col="grp", cap=20)
        .groupBy("grp")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sizes == {"tiny": 5, "mid": 20, "big": 20}


def test_under_cap_groups_pass_through_untouched(spark, skewed):
    tiny = {
        r["doc_id"]
        for r in cap_per_group(skewed, group_col="grp", cap=20)
        .filter("grp = 'tiny'")
        .collect()
    }
    assert tiny == set(range(5))


def test_deterministic_across_partitionings(spark, skewed):
    a = {
        r["doc_id"]
        for r in cap_per_group(skewed, group_col="grp", cap=20).collect()
    }
    b = {
        r["doc_id"]
        for r in cap_per_group(
            skewed.repartition(17), group_col="grp", cap=20
        ).collect()
    }
    assert a == b


def test_seeds_give_different_subsets(spark, skewed):
    a = {
        r["doc_id"]
        for r in cap_per_group(skewed, group_col="grp", cap=20, seed=0)
        .filter("grp = 'big'")
        .collect()
    }
    b = {
        r["doc_id"]
        for r in cap_per_group(skewed, group_col="grp", cap=20, seed=1)
        .filter("grp = 'big'")
        .collect()
    }
    assert a != b


def test_cap_zero_and_negative(spark, skewed):
    assert cap_per_group(skewed, group_col="grp", cap=0).count() == 0
    with pytest.raises(ValueError):
        cap_per_group(skewed, group_col="grp", cap=-1)


def test_real_documents_cap(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = cap_per_group(docs, group_col="source", cap=10)
    sizes = [
        r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    ]
    assert sizes and all(n == 10 for n in sizes)  # every source has 25 docs


def test_null_group_rows_survive_and_cap(spark):
    """Review finding: NULL-group rows vanished through the equi
    semi-joins (NULL == NULL is false). They must route through the
    same under/over split as any named group."""
    from big_data_hadoop_spark.pipeline import cap_per_group

    rows = [(i, None if i < 8 else "web") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_group(df, group_col="source", cap=5).collect()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_src.get(None, [])) == 5     # 8 NULL-group rows capped
    assert len(by_src.get("web", [])) == 4    # under the cap: untouched
