"""Hard-negative mining (q96): the COMPOSITION logic — same-cluster
exclusion and re-rank — replicated in pure Python over the probe's
independently-verified building blocks (cosine_topk has a brute-force
pin in test_rows_only_values; semantic pairs + union-find are
replicated in test_semantic_dedup), plus a constructed corpus where
the transitive-duplicate exclusion is the distinguishing case."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_hadoop_spark.operators import similarity as sim
from big_data_hadoop_spark.operators.dedup import duplicate_clusters
from big_data_hadoop_spark.probes import QUERIES
from big_data_hadoop_spark.sources.io import load_table
from tests.conftest import SF_ORACLE

EMBED_DIM = 64


def test_hard_negatives_matches_python_composition(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    pairs = sim.semantic_neardup_pairs(emb, eps=0.4, n_cells=8, dim=EMBED_DIM)
    cluster_of = {
        r.member_id: r.cluster_id for r in duplicate_clusters(pairs).collect()
    }
    cands = sim.cosine_topk(
        emb, query_ids=list(range(10)), k=10, dim=EMBED_DIM
    ).collect()
    by_q: dict[int, list] = {}
    for r in cands:
        by_q.setdefault(r.query_id, []).append((r.neighbor_id, r.sim))
    want = []
    for q in sorted(by_q):
        qc = cluster_of.get(q)
        kept = [
            (n, s)
            for n, s in by_q[q]
            if qc is None
            or cluster_of.get(n) is None
            or cluster_of.get(n) != qc
        ]
        kept.sort(key=lambda t: (-t[1], t[0]))
        for rank, (n, s) in enumerate(kept[:5], start=1):
            want.append((q, n, round(s, 8), rank))
    got = [
        (r.query_id, r.neighbor_id, r.sim, r.rank)
        for r in QUERIES["q96_hard_negatives"](spark, SF_ORACLE).collect()
    ]
    assert got == want and len(got) >= 40


def test_hard_negatives_transitive_exclusion(spark):
    """A~B and B~C put A and C in one cluster even when cos(A,C) is
    BELOW eps — C must still be excluded from A's negatives, which a
    raw pairwise-threshold cut would keep."""
    a = [1.0] + [0.0] * 3
    b = [math.cos(0.4)] + [math.sin(0.4)] + [0.0] * 2
    c = [math.cos(0.8)] + [math.sin(0.8)] + [0.0] * 2
    far = [0.0, 0.0, 1.0, 0.0]
    rows = [(0, a), (1, b), (2, c), (3, far)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    eps = 0.75  # cos(0.4)≈0.921 ≥ eps, cos(0.8)≈0.697 < eps
    assert math.cos(0.8) < eps < math.cos(0.4)
    pairs = sim.semantic_neardup_pairs(emb, eps=eps, n_cells=1, dim=4)
    got_pairs = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 2) not in got_pairs and (0, 1) in got_pairs and (1, 2) in got_pairs
    clusters = duplicate_clusters(pairs)
    cluster_of = {r.member_id: r.cluster_id for r in clusters.collect()}
    assert cluster_of[0] == cluster_of[2]  # transitive
    cands = sim.cosine_topk(emb, query_ids=[0], k=3, dim=4)
    qc = clusters.select(
        F.col("member_id").alias("query_id"), F.col("cluster_id").alias("_qc")
    )
    nc = clusters.select(
        F.col("member_id").alias("neighbor_id"),
        F.col("cluster_id").alias("_nc"),
    )
    kept = (
        cands.join(qc, "query_id", "left")
        .join(nc, "neighbor_id", "left")
        .filter(
            F.col("_qc").isNull()
            | F.col("_nc").isNull()
            | (F.col("_qc") != F.col("_nc"))
        )
    )
    survivors = {r.neighbor_id for r in kept.collect()}
    # B and C are both same-cluster with A: only the far vector stays
    assert survivors == {3}
