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


# ---------------------------------------------------------------------------
# Weighted votes (weight_col) — judge task r8
# ---------------------------------------------------------------------------


def _py_wlpa(edges_w, self_weight=1.0, max_iter=20):
    """Weighted replication: duplicate (a, b) rows SUM weights (both
    directions), self-loop weights ignored, self-vote = self_weight,
    adopt the label with max weight sum, ties to minimum label."""
    verts: set = set()
    w: dict = {}
    for a, b, x in edges_w:
        verts.add(a)
        verts.add(b)
        if a == b:
            continue
        w[(a, b)] = w.get((a, b), 0.0) + x
        w[(b, a)] = w.get((b, a), 0.0) + x
    lab = {v: v for v in verts}
    for _ in range(max_iter):
        new = {}
        for v in verts:
            freq: dict = {}
            for (s, d), x in w.items():
                if s == v:
                    freq[lab[d]] = freq.get(lab[d], 0.0) + x
            freq[lab[v]] = freq.get(lab[v], 0.0) + self_weight
            mx = max(freq.values())
            new[v] = min(l for l, c in freq.items() if c == mx)
        if new == lab:
            break
        lab = new
    return lab


def _run_w(spark, edges_w, **kw):
    df = spark.createDataFrame(
        list(edges_w), "id_a long, id_b long, w double"
    )
    return {
        r.id: r.community
        for r in label_propagation(df, weight_col="w", **kw).collect()
    }


def test_wlpa_weight_overrides_vote_count(spark):
    """Vertex 3 has TWO unit-weight neighbors labeled (by round-1
    convergence) into community 0 and ONE heavy neighbor in community
    10's clique: unweighted LPA follows the vote count, weighted LPA
    follows the weight mass — the two must differ on this graph."""
    k3a = [(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0)]
    k3b = [(10, 11, 1.0), (10, 12, 1.0), (11, 12, 1.0)]
    attach = [(0, 3, 1.0), (1, 3, 1.0), (10, 3, 5.0)]
    edges = k3a + k3b + attach
    wl = _run_w(spark, edges)
    assert wl == _py_wlpa(edges)
    ul = {
        r.id: r.community
        for r in label_propagation(
            spark.createDataFrame(
                [(a, b) for a, b, _ in edges], "id_a long, id_b long"
            )
        ).collect()
    }
    assert ul == _py_lpa([(a, b) for a, b, _ in edges])
    assert wl[3] != ul[3]  # the weight actually changed the outcome


def test_wlpa_exact_tie_breaks_to_min_label(spark):
    """Equal weight mass on both sides (exactly representable sums):
    the (cnt, -l) tie-break must pick the MINIMUM label. Pinned on ONE
    synchronous round (the full iteration on this path graph
    oscillates to the budget — LPA's documented heuristic behavior,
    where the replication agreement is the contract)."""
    edges = [(1, 5, 2.0), (3, 5, 2.0)]
    wl = _run_w(spark, edges, max_iter=1)
    assert wl == _py_wlpa(edges, max_iter=1)
    # round 1 at vertex 5: label 1 mass 2.0, label 3 mass 2.0,
    # self-label 5 mass 1.0 — tie resolves to min(1, 3)
    assert wl[5] == 1
    # and the full run still agrees with the replication exactly
    assert _run_w(spark, edges) == _py_wlpa(edges)


def test_wlpa_duplicate_rows_sum_and_selfloop_ignored(spark):
    """Duplicate (a, b) rows sum their weights (pagerank's contract —
    unlike the unweighted path's distinct), and a self-loop's weight
    never outvotes real neighbors (the self-vote replaces it)."""
    edges = [(1, 2, 1.0), (1, 2, 1.0), (1, 2, 1.0), (2, 3, 2.0),
             (3, 3, 100.0)]
    wl = _run_w(spark, edges)
    assert wl == _py_wlpa(edges)
    # the 100.0 self-loop never enters the votes: vertex 3 follows its
    # real neighbor instead of freezing at its own label (one round is
    # enough to see it adopt label 2 — duplicate-summed 1-2 mass 3.0
    # likewise flips vertex 1 despite the single row's 1.0)
    one = _run_w(spark, edges, max_iter=1)
    assert one == _py_wlpa(edges, max_iter=1)
    assert one[3] == 2 and one[1] == 2


def test_wlpa_string_ids_match_python_rule(spark):
    df = spark.createDataFrame(
        [("a", "b", 3.0), ("b", "c", 1.0), ("c", "d", 3.0)],
        "id_a string, id_b string, w double",
    )
    got = {
        r.id: r.community
        for r in label_propagation(df, weight_col="w").collect()
    }
    assert got == _py_wlpa(
        [("a", "b", 3.0), ("b", "c", 1.0), ("c", "d", 3.0)]
    )


def test_wlpa_self_weight_and_validation(spark):
    import pytest

    df_bad = spark.createDataFrame(
        [(1, 2, 0.0)], "id_a long, id_b long, w double"
    )
    with pytest.raises(ValueError, match="strictly positive"):
        label_propagation(df_bad, weight_col="w")
    df_null = spark.createDataFrame(
        [(1, 2, None)], "id_a long, id_b long, w double"
    )
    with pytest.raises(ValueError, match="strictly positive"):
        label_propagation(df_null, weight_col="w")
    df_ok = spark.createDataFrame(
        [(1, 2, 1.0)], "id_a long, id_b long, w double"
    )
    with pytest.raises(ValueError, match="self_weight"):
        label_propagation(df_ok, weight_col="w", self_weight=0.0)
    # a heavy self_weight freezes every vertex at its own label
    frozen = _run_w(spark, [(1, 2, 1.0), (2, 3, 1.0)], self_weight=10.0)
    assert frozen == {1: 1, 2: 2, 3: 3}


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
            st.sampled_from([1.0, 2.0, 3.0, 0.5]),
        ),
        min_size=1,
        max_size=14,
    )
)
@_SETTINGS
def test_wlpa_matches_python_rule(spark, edges):
    assert _run_w(spark, edges) == _py_wlpa(edges)
