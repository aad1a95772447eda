"""Winnow near-dup pairs (VERDICT r3 #4): the operator must equal a
pure-Python winnow-overlap reference on an engineered corpus, equal an
independent pandas recomputation from the (already MOSS-verified)
fingerprints at sf0.01, and plan as an inverted-index equi-join — never
all-pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.textstats import (
    winnow_fingerprints,
    winnow_neardup_pairs,
)
from big_data_hadoop_spark.plans.audit import formatted_plan
from big_data_hadoop_spark.sources.io import load_table
from tests.conftest import SF_ORACLE

K, W = 5, 4


def _python_winnow(spark, text: str) -> set[int]:
    """Direct MOSS winnowing (Spark supplies only xxhash64, windowing is
    redone in Python) — same reference scheme as test_golden.py."""
    t = text.lower()
    grams = [t[i : i + K] for i in range(len(t) - K + 1)]
    if not grams:
        return set()
    hdf = spark.createDataFrame([(g,) for g in grams], "g string").select(
        F.xxhash64("g").alias("h")
    )
    # one row per gram occurrence, in order
    hashes = [r.h for r in hdf.collect()]
    if len(hashes) < W:
        return set()
    return {min(hashes[i : i + W]) for i in range(len(hashes) - W + 1)}


def _expected_pairs(fp_sets: dict[int, set[int]], threshold: float):
    out = {}
    ids = sorted(fp_sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not fp_sets[a] or not fp_sets[b]:
                continue
            shared = len(fp_sets[a] & fp_sets[b])
            ratio = shared / min(len(fp_sets[a]), len(fp_sets[b]))
            if ratio >= threshold:
                out[(a, b)] = (shared, ratio)
    return out


def test_matches_python_reference_on_engineered_corpus(spark):
    base = "the quick brown fox jumps over the lazy dog while it rains"
    corpus = [
        (0, base),
        (1, base + " heavily outside today"),  # local edit: high overlap
        (2, "completely different words about spark physical planning"),
        (3, base),  # exact duplicate of 0
        (4, "the quick brown fox naps under the warm sun all afternoon"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    fp_sets = {i: _python_winnow(spark, t) for i, t in corpus}
    for thr in (0.3, 0.8):
        expect = _expected_pairs(fp_sets, thr)
        got = {
            (r.id_a, r.id_b): (r.n_shared, r.overlap_ratio)
            for r in winnow_neardup_pairs(df, k=K, w=W, threshold=thr).collect()
        }
        assert got == expect, thr
    # the exact-duplicate pair scores containment 1.0
    assert _expected_pairs(fp_sets, 1.0)[(0, 3)][1] == 1.0


def test_sf001_pairs_equal_pandas_recomputation(spark):
    """Independent value check at oracle scale: recompute pairs in pandas
    from the fingerprint relation itself (whose correctness vs direct
    Python MOSS is pinned in test_golden.py)."""
    docs = load_table(spark, SF_ORACLE, "documents")
    thr = 0.5
    fps = winnow_fingerprints(docs, k=K, w=W).toPandas()
    fp_sets = {
        int(doc): set(grp["fp"]) for doc, grp in fps.groupby("doc_id")
    }
    expect = _expected_pairs(fp_sets, thr)
    got = {
        (r.id_a, r.id_b): (r.n_shared, r.overlap_ratio)
        for r in winnow_neardup_pairs(docs, k=K, w=W, threshold=thr).collect()
    }
    assert set(got) == set(expect)
    for pair, (shared, ratio) in expect.items():
        g_shared, g_ratio = got[pair]
        assert g_shared == shared and abs(g_ratio - ratio) < 1e-12, pair


def test_plan_is_inverted_index_equi_join(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    plan = formatted_plan(winnow_neardup_pairs(docs, k=K, w=W))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_max_doc_freq_only_removes_boilerplate_evidence(spark):
    """The skew valve may drop pairs or lower n_shared, never add or
    raise: output with a cap must be dominated by the exact output."""
    boiler = " copyright acme corp all rights reserved"
    corpus = [
        (i, f"document number {i} body text variant {i * 7} unique" + boiler)
        for i in range(6)
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    exact = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_neardup_pairs(df, k=K, w=W, threshold=0.05).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_neardup_pairs(
            df, k=K, w=W, threshold=0.05, max_doc_freq=3
        ).collect()
    }
    assert set(capped) <= set(exact)
    assert all(capped[p] <= exact[p] for p in capped)
    # the boilerplate shared by all 6 docs was actually filtered somewhere
    assert capped != exact
