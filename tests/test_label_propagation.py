"""Label propagation communities (``graph.label_propagation``):
pure-Python replication of the exact synchronous self-vote/min-tie
update rule on fixed and randomized graphs, the bridge-splitting
behavior that distinguishes communities from components, and the
stats hook."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_hadoop_spark.operators.graph import label_propagation

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_lpa(edges, max_iter=20):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {v: v for v in adj}
    for _ in range(max_iter):
        new = {}
        for v in adj:
            freq: dict[int, int] = {}
            for n in adj[v]:
                freq[lab[n]] = freq.get(lab[n], 0) + 1
            freq[lab[v]] = freq.get(lab[v], 0) + 1  # self-vote
            best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            new[v] = best
        if new == lab:
            break
        lab = new
    return lab


def _run(spark, edges, stats=None):
    df = spark.createDataFrame(
        list(edges) or [(0, 0)], "id_a long, id_b long"
    )
    return {
        r.id: r.community
        for r in label_propagation(df, stats=stats).collect()
    }


def test_lpa_bridge_splits_communities(spark):
    """Two 4-cliques joined by one bridge: ONE connected component but
    TWO communities — the case component resolution cannot separate."""
    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a + 10, b + 10) for a, b in k4a]
    bridge = [(3, 10)]
    stats: dict = {}
    got = _run(spark, k4a + k4b + bridge, stats)
    assert len({got[v] for v in range(4)}) == 1
    assert len({got[v + 10] for v in range(4)}) == 1
    assert got[0] != got[10]
    assert stats["rounds"] >= 1
    # python replication agrees exactly
    assert got == _py_lpa(k4a + k4b + bridge)
    # components would merge them: sanity-check the contrast
    from big_data_hadoop_spark.operators.dedup import duplicate_clusters

    df = spark.createDataFrame(
        k4a + k4b + bridge, "id_a long, id_b long"
    )
    comp = {
        r.cluster_id for r in duplicate_clusters(df).collect()
    }
    assert len(comp) == 1


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=0,
        max_size=18,
    )
)
@_SETTINGS
def test_lpa_matches_python_rule(spark, edges):
    assert _run(spark, edges) == _py_lpa(edges)


def test_lpa_degenerate(spark):
    assert _run(spark, [(7, 7)]) == {}  # self-loops only: no graph
    import pytest

    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError):
        label_propagation(df, max_iter=0)


def test_lpa_empty_graph_rounds_zero(spark):
    """Empty/self-loop-only graphs return rounds=0 with no wasted
    iteration, consistent with pagerank's early return (review
    finding)."""
    stats: dict = {}
    got = _run(spark, [(7, 7)], stats)
    assert got == {} and stats["rounds"] == 0
