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
    # vertex set from RAW pairs: self-loop-only vertices stay as
    # singleton communities (matching pagerank's vertex contract)
    verts: set[int] = set()
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        verts.add(a)
        verts.add(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {v: v for v in verts}
    for _ in range(max_iter):
        new = {}
        for v in verts:
            freq: dict[int, int] = {}
            for n in adj.get(v, ()):
                freq[lab[n]] = freq.get(lab[n], 0) + 1
            freq[lab[v]] = freq.get(lab[v], 0) + 1  # self-vote
            best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            new[v] = best
        if new == lab:
            break
        lab = new
    return lab


def _run(spark, edges, stats=None):
    df = spark.createDataFrame(list(edges), "id_a long, id_b long")
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
    # self-loops only: singleton community, same vertex contract as
    # pagerank (review finding: sym-derived vertex set dropped these)
    assert _run(spark, [(7, 7)]) == {7: 7}
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
    assert got == {7: 7} and stats["rounds"] == 0


def test_lpa_self_loop_vertex_joins_real_graph(spark):
    """A self-loop on a vertex that ALSO has real edges changes
    nothing; a vertex with ONLY self-loops is a singleton alongside
    the real communities."""
    edges = [(0, 1), (1, 0), (1, 1), (9, 9)]
    got = _run(spark, edges)
    assert got == _py_lpa(edges)
    assert set(got) == {0, 1, 9} and got[9] == 9
    assert got[0] == got[1]
