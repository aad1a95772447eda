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
