"""k-core decomposition (``graph.k_core``): pure-Python peeling oracle
on fixed and randomized graphs, curation shape on the minhash near-dup
graph, and the rounds/edges stats hook."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_hadoop_spark.operators.graph import k_core

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_k_core(edges, k):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < k]:
            for n in adj.pop(v):
                adj[n].discard(v)
            changed = True
    return {v: len(ns) for v, ns in adj.items()}


def _run(spark, edges, k, stats=None):
    df = spark.createDataFrame(
        list(edges) or [(0, 0)], "id_a long, id_b long"
    )
    return {
        r.id: r.degree for r in k_core(df, k, stats=stats).collect()
    }


def test_kcore_fixed_graphs(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tail = [(3, 10), (10, 11)]
    star = [(0, i) for i in range(1, 6)]
    stats: dict = {}
    # K4 with a tail: 3-core is exactly the K4 (tail peels in 2 rounds)
    got = _run(spark, k4 + tail, 3, stats)
    assert got == {v: 3 for v in range(4)}
    assert stats["rounds"] >= 2 and stats["edges"] == 6
    # a star has no 2-core at all
    assert _run(spark, star, 2) == {}
    # k=1 drops only isolated noise (self-loops)
    assert _run(spark, [(5, 5), (1, 2)], 1) == {1: 1, 2: 1}
    import pytest

    with pytest.raises(ValueError):
        _run(spark, k4, 0)


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=0,
        max_size=20,
    ),
    k=st.integers(min_value=1, max_value=4),
)
@_SETTINGS
def test_kcore_matches_python_peeling(spark, edges, k):
    assert _run(spark, edges, k) == _py_k_core(edges, k)


def test_kcore_on_neardup_graph(spark):
    """Boilerplate-farm shape: the replica-duplicate corpus's minhash
    pairs form near-cliques, so a 2-core keeps the farm and drops
    pendant one-off matches."""
    from big_data_hadoop_spark.operators.dedup import minhash_lsh_pairs
    from big_data_hadoop_spark.sources.io import load_table
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", "text"
    )
    pairs = minhash_lsh_pairs(docs, threshold=0.7).localCheckpoint(
        eager=True
    )
    core = k_core(pairs, 2)
    got = {r.id for r in core.collect()}
    # python replication over the same pairs
    want = set(
        _py_k_core(
            [(r.id_a, r.id_b) for r in pairs.collect()], 2
        )
    )
    assert got == want


# ---------------------------------------------------------------------------
# Weighted s-core (weight_col) — round 9: completes the weighted story
# across the graph operators (pagerank -> LPA -> core)
# ---------------------------------------------------------------------------


def _py_s_core(edges_w, s):
    """Peeling oracle on strengths: duplicate (a, b) weights summed
    (both orientations fold), self-loops dropped."""
    w: dict = {}
    for a, b, x in edges_w:
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        w[key] = w.get(key, 0.0) + x
    adj: dict = {}
    for (a, b), x in w.items():
        adj.setdefault(a, {})[b] = x
        adj.setdefault(b, {})[a] = x
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if sum(ns.values()) < s]:
            for n in adj.pop(v):
                adj[n].pop(v, None)
            changed = True
    return {v: sum(ns.values()) for v, ns in adj.items()}


def _run_w(spark, edges_w, s, stats=None):
    df = spark.createDataFrame(
        list(edges_w), "id_a long, id_b long, w double"
    )
    return {
        r.id: r.degree
        for r in k_core(df, s, weight_col="w", stats=stats).collect()
    }


def test_score_weight_separates_what_kcore_cannot(spark):
    """Two triangles with identical topology but different weights:
    unweighted 2-core keeps both; s-core at strength 3 keeps only the
    heavy one — the mass-vs-link-count distinction."""
    heavy = [(0, 1, 2.0), (0, 2, 2.0), (1, 2, 2.0)]
    light = [(10, 11, 0.5), (10, 12, 0.5), (11, 12, 0.5)]
    got = _run_w(spark, heavy + light, 3.0)
    assert got == _py_s_core(heavy + light, 3.0)
    assert set(got) == {0, 1, 2} and got[0] == 4.0
    unw = {
        r.id
        for r in k_core(
            spark.createDataFrame(
                [(a, b) for a, b, _ in heavy + light],
                "id_a long, id_b long",
            ),
            2,
        ).collect()
    }
    assert unw == {0, 1, 2, 10, 11, 12}


def test_score_cascade_and_duplicates_and_selfloops(spark):
    """Peeling cascades on strengths (removing a light vertex drops a
    neighbor below threshold next round); duplicate rows sum; a heavy
    self-loop contributes nothing."""
    edges = [
        (1, 2, 1.0), (1, 2, 1.0),   # strength 2 each via duplicates
        (2, 3, 1.5), (3, 3, 99.0),  # self-loop ignored
    ]
    got = _run_w(spark, edges, 2.0)
    assert got == _py_s_core(edges, 2.0)
    stats: dict = {}
    got = _run_w(spark, edges, 2.5, stats)
    assert got == _py_s_core(edges, 2.5) == {}
    assert stats["edges"] == 0


def test_score_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, 2, 0.0)], "id_a long, id_b long, w double")
    with pytest.raises(ValueError, match="strictly positive"):
        k_core(df, 1.0, weight_col="w")
    ok = spark.createDataFrame([(1, 2, 1.0)], "id_a long, id_b long, w double")
    with pytest.raises(ValueError, match="> 0"):
        k_core(ok, 0.0, weight_col="w")
    # unweighted path still refuses non-integerish k < 1
    with pytest.raises(ValueError, match=">= 1"):
        k_core(ok.select("id_a", "id_b"), 0)


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
            st.sampled_from([0.5, 1.0, 2.0, 3.0]),
        ),
        min_size=1,
        max_size=14,
    ),
    s=st.sampled_from([1.0, 2.0, 3.5]),
)
@_SETTINGS
def test_score_matches_python_oracle(spark, edges, s):
    assert _run_w(spark, edges, s) == _py_s_core(edges, s)
