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
            # max count, min label — written type-generically so the
            # same replication covers string-id graphs
            mx = max(freq.values())
            new[v] = min(l for l, c in freq.items() if c == mx)
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


def test_lpa_string_ids_match_python_rule(spark):
    """String vertex ids (every real corpus) run through the
    order-preserving dense relabel and agree with the replication
    computed directly on the strings — including a case where
    lexicographic order differs from numeric ('n10' < 'n2'), so the
    min-label tie-break provably means min ORIGINAL id."""
    k3a = [("n1", "n2"), ("n2", "n3"), ("n1", "n3")]
    k3b = [("n10", "n11"), ("n11", "n12"), ("n10", "n12")]
    edges = k3a + k3b + [("n3", "n10"), ("z", "z")]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    stats: dict = {}
    got = {
        r.id: r.community
        for r in label_propagation(df, stats=stats).collect()
    }
    assert got == _py_lpa(edges)
    assert got["z"] == "z"  # self-loop-only singleton survives relabel
    assert stats["rounds"] >= 1


def test_lpa_string_ids_agree_with_numeric_relabel(spark):
    """A string graph and its zero-padded numeric twin (same order)
    produce identical communities under the obvious renaming."""
    num_edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
    name = lambda v: f"v{v:02d}"  # noqa: E731 — order-preserving
    str_edges = [(name(a), name(b)) for a, b in num_edges]
    got_num = _run(spark, num_edges)
    sdf = spark.createDataFrame(str_edges, "id_a string, id_b string")
    got_str = {
        r.id: r.community for r in label_propagation(sdf).collect()
    }
    assert got_str == {name(v): name(c) for v, c in got_num.items()}


def test_dense_ids_order_preserving_and_dense(spark):
    from big_data_hadoop_spark.operators.graph import _dense_ids

    vals = ["b", "a", "n10", "n2", "zz", "c"]
    df = spark.createDataFrame(
        [(v,) for v in vals], "id string"
    ).repartition(5)
    got = {r.id: r.nid for r in _dense_ids(df).collect()}
    want = {v: i for i, v in enumerate(sorted(vals))}
    assert got == want


def test_lpa_null_ids_dropped(spark):
    """A NULL id is not a vertex: its edge can't equi-join (sym drops
    it), so keeping it in the vertex set would emit a spurious
    (NULL, NULL) community row (review finding). The non-NULL endpoint
    survives as a singleton."""
    df = spark.createDataFrame(
        [(None, 5), (1, 2)], "id_a long, id_b long"
    )
    got = {r.id: r.community for r in label_propagation(df).collect()}
    assert got == {1: 1, 2: 1, 5: 5}
