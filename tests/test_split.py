"""Leakage-safe split assignment (``pipeline.split_leakage_safe``):
cluster atomicity (no duplicate cluster straddles two splits),
determinism in (key, seed), proportion sanity, and degradation to plain
hash-splitting without a cluster map.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.dedup import (
    duplicate_clusters,
    minhash_lsh_pairs,
)
from big_data_hadoop_spark.pipeline import split_leakage_safe
from big_data_hadoop_spark.sources.io import load_table

SF = "/root/testdata/sf0.01"
WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text").cache()


@pytest.fixture(scope="module")
def clusters(spark, docs):
    return duplicate_clusters(minhash_lsh_pairs(docs, threshold=0.7)).cache()


def test_cluster_members_share_split(spark, docs, clusters):
    out = split_leakage_safe(docs, WEIGHTS, clusters=clusters)
    assert out.count() == docs.count()  # left join never drops/dups
    straddlers = (
        out.join(
            clusters.select(F.col("member_id").alias("doc_id"), "cluster_id"),
            "doc_id",
        )
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter("n_splits > 1")
    )
    assert straddlers.count() == 0
    # the map is non-trivial at sf0.01 (else this test proves nothing)
    assert clusters.filter("member_id != cluster_id").count() > 0


def test_deterministic_and_seed_sensitive(spark, docs):
    a = {r["doc_id"]: r["split"] for r in split_leakage_safe(docs, WEIGHTS).collect()}
    b = {r["doc_id"]: r["split"] for r in split_leakage_safe(docs, WEIGHTS).collect()}
    assert a == b
    c = {
        r["doc_id"]: r["split"]
        for r in split_leakage_safe(docs, WEIGHTS, seed=1).collect()
    }
    assert any(a[d] != c[d] for d in a)


def test_proportions_and_totals(spark, docs):
    out = split_leakage_safe(docs, WEIGHTS)
    sizes = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert sum(sizes.values()) == n
    assert 0.7 * n < sizes["train"] < 0.9 * n
    for s in ("val", "test"):
        assert 0.03 * n < sizes[s] < 0.2 * n


def test_unclustered_docs_match_plain_hash_split(spark, docs, clusters):
    """Docs outside every cluster must get the exact label plain
    hash-splitting gives them (group key degrades to own id)."""
    plain = split_leakage_safe(docs, WEIGHTS)
    with_cl = split_leakage_safe(docs, WEIGHTS, clusters=clusters)
    clustered_ids = clusters.select(F.col("member_id").alias("doc_id"))
    diff = (
        plain.select("doc_id", F.col("split").alias("s1"))
        .join(with_cl.select("doc_id", F.col("split").alias("s2")), "doc_id")
        .join(clustered_ids, "doc_id", "left_anti")
        .filter("s1 != s2")
    )
    assert diff.count() == 0


def test_single_split_and_validation(spark, docs):
    out = split_leakage_safe(docs, {"all": 1.0})
    assert out.select("split").distinct().collect()[0]["split"] == "all"
    with pytest.raises(ValueError):
        split_leakage_safe(docs, {})
    with pytest.raises(ValueError):
        split_leakage_safe(docs, {"a": -0.1, "b": 1.1})
    with pytest.raises(ValueError):
        split_leakage_safe(docs, {"a": 0.0})


def test_no_internal_columns_leak(spark, docs, clusters):
    out = split_leakage_safe(docs, WEIGHTS, clusters=clusters)
    assert set(out.columns) == {"doc_id", "text", "split"}
