"""Property-based invariants for the round's new operators: triangle
counting vs a brute-force Python enumeration on random small graphs,
and resample grid/fill invariants on random irregular series. One
shared SparkSession, bounded example counts (each example runs Spark
jobs)."""

from __future__ import annotations

from datetime import datetime, timedelta
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_hadoop_spark.operators.graph import triangle_count
from big_data_hadoop_spark.operators.relational import resample_timeseries

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=0,
    max_size=25,
)


def _brute_triangles(edges):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    for trio in combinations(sorted(adj), 3):
        a, b, c = trio
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in trio:
                tri[v] += 1
    return {
        v: (len(adj[v]), tri[v],
            2.0 * tri[v] / (len(adj[v]) * (len(adj[v]) - 1))
            if len(adj[v]) >= 2 else 0.0)
        for v in adj
    }


@given(edges=edges_strategy)
@_SETTINGS
def test_triangles_match_bruteforce(spark, edges):
    df = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "id_a long, id_b long"
    )
    got = {
        r.id: (r.degree, r.triangles, round(r.coeff, 9))
        for r in triangle_count(df).collect()
    }
    want = {
        v: (d, t, round(c, 9))
        for v, (d, t, c) in _brute_triangles(edges).items()
    }
    assert got == want


series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=500),  # minutes offset
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
    ),
    min_size=1,
    max_size=25,
)


@given(rows=series_strategy, fill=st.sampled_from(["null", "zero", "locf", "linear"]))
@_SETTINGS
def test_resample_invariants(spark, rows, fill):
    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (f"k{k}", t0 + timedelta(minutes=m),
             None if v is None else float(v))
            for k, m, v in rows
        ],
        "k string, ts timestamp, v double",
    )
    out = resample_timeseries(df, "k", "ts", "v", 600, fill=fill).collect()
    # n_obs conservation: every input row lands in exactly one bucket
    assert sum(r.n_obs for r in out) == sum(1 for _, _, v in rows if v is not None)
    by_key: dict[str, list] = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    seen_keys = {f"k{k}" for k, _, _ in rows}
    assert set(by_key) == seen_keys
    for k, rs in by_key.items():
        bs = sorted(int(r.bucket_ts.timestamp()) // 600 for r in rs)
        # grid is contiguous over the key's span
        assert bs == list(range(bs[0], bs[-1] + 1))
        # zero-fill never leaves NULLs; null-fill leaves gaps NULL
        if fill == "zero":
            assert all(r.value is not None for r in rs)
        if fill == "null":
            assert all((r.value is None) == (r.n_obs == 0 or all(
                v is None for kk, m, v in rows
                if f"k{kk}" == k and (int((t0 + timedelta(minutes=m)).timestamp()) // 600)
                == int(r.bucket_ts.timestamp()) // 600
            )) for r in rs)
        # locf: a gap bucket equals the latest preceding non-null value
        if fill == "locf":
            prev = None
            for r in sorted(rs, key=lambda r: r.bucket_ts):
                if r.n_obs > 0:
                    obs_vals = [
                        v for kk, m, v in rows
                        if f"k{kk}" == k and v is not None
                        and int((t0 + timedelta(minutes=m)).timestamp()) // 600
                        == int(r.bucket_ts.timestamp()) // 600
                    ]
                    if obs_vals:
                        prev = r.value
                        continue
                assert r.value == prev
