"""BFS shortest distances (``graph.bfs_distances``): pure-Python BFS
replication on fixed and randomized graphs (directed and undirected,
multi-seed), frontier-drain round counts, seed validation, and the
depth budget."""

from __future__ import annotations

from collections import deque

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_hadoop_spark.operators.graph import bfs_distances

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_bfs(edges, seeds, directed=False, max_depth=20):
    adj: dict = {}
    verts = set()
    for a, b in edges:
        verts.add(a)
        verts.add(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        v = q.popleft()
        if dist[v] >= max_depth:
            continue
        for n in adj.get(v, ()):
            if n not in dist:
                dist[n] = dist[v] + 1
                q.append(n)
    return dist


def _run(spark, edges, seeds, **kw):
    df = spark.createDataFrame(list(edges), "id_a long, id_b long")
    return {
        r.id: r.distance
        for r in bfs_distances(df, seeds, **kw).collect()
    }


def test_bfs_chain_and_fork(spark):
    edges = [(1, 2), (2, 3), (3, 4), (2, 5), (8, 9)]  # 8-9 unreachable
    stats: dict = {}
    got = _run(spark, edges, [1], stats=stats)
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 2}
    assert got == _py_bfs(edges, [1])
    assert stats == {"rounds": 3, "reached": 5}


def test_bfs_directed_and_multiseed(spark):
    edges = [(1, 2), (2, 3), (4, 3), (3, 1)]
    got = _run(spark, edges, [1], directed=True)
    assert got == _py_bfs(edges, [1], directed=True)
    assert 4 not in got  # no path 1→4 in directed mode
    multi = _run(spark, edges, [1, 4], directed=True)
    assert multi == _py_bfs(edges, [1, 4], directed=True)
    assert multi[4] == 0 and multi[3] == 1  # nearest seed wins


def test_bfs_depth_budget_and_validation(spark):
    edges = [(1, 2), (2, 3), (3, 4)]
    got = _run(spark, edges, [1], max_depth=2)
    assert got == {1: 0, 2: 1, 3: 2}  # 4 beyond the budget
    df_edges = [(1, 2)]
    import pyspark

    df = spark.createDataFrame(df_edges, "id_a long, id_b long")
    with pytest.raises(ValueError, match="seed"):
        bfs_distances(df, [])
    with pytest.raises(ValueError, match="not graph nodes"):
        bfs_distances(df, [1, 99])
    with pytest.raises(ValueError, match="max_depth"):
        bfs_distances(df, [1], max_depth=-1)
    # self-loop-only vertex is a valid seed at distance 0
    loop = spark.createDataFrame([(7, 7)], "id_a long, id_b long")
    got = {r.id: r.distance for r in bfs_distances(loop, [7]).collect()}
    assert got == {7: 0}


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ),
        min_size=1,
        max_size=14,
    ),
    directed=st.booleans(),
)
@_SETTINGS
def test_bfs_matches_python(spark, edges, directed):
    seed = min(min(a, b) for a, b in edges)
    got = _run(spark, edges, [seed], directed=directed)
    assert got == _py_bfs(edges, [seed], directed=directed)


def test_bfs_string_ids(spark):
    edges = [("a", "b"), ("b", "c")]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {r.id: r.distance for r in bfs_distances(df, ["a"]).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_bfs_null_endpoints_dropped_and_null_seed_refused(spark):
    """A (NULL, x) pair loses its edge in the src != dst filter while
    NULL would still enter the vertex set — both endpoints are dropped
    explicitly, matching the LPA/copurchase NULL contract (advice
    finding r8); NULL seeds refuse loudly (a NULL id never equi-joins,
    so its frontier would be silently empty)."""
    df = spark.createDataFrame(
        [(1, 2), (None, 3), (2, None), (2, 3)], "id_a long, id_b long"
    )
    stats: dict = {}
    got = {
        r.id: r.distance
        for r in bfs_distances(df, [1], stats=stats).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2}
    assert stats["reached"] == 3 and stats["rounds"] == 2
    with pytest.raises(ValueError, match="NULL"):
        bfs_distances(df, [1, None])


def test_bfs_half_null_only_seed_returns_distance_zero(spark):
    """A seed whose only pairs are half-NULL is still a graph vertex
    (the LPA contract — round-9 review: the first fix dropped the
    whole row and the seed tripped the not-a-node refusal); it
    returns at distance 0 with no frontier to expand."""
    df = spark.createDataFrame(
        [(5, None), (1, 2)], "id_a long, id_b long"
    )
    stats: dict = {}
    got = {
        r.id: r.distance
        for r in bfs_distances(df, [5], stats=stats).collect()
    }
    assert got == {5: 0}
    assert stats == {"rounds": 0, "reached": 1}
