"""Co-purchase projection (``graph.copurchase_edges``): exact edges +
weights vs a pure-Python replication, duplicate-line collapse, NULL
handling, the ``max_basket`` valve (loud refusal naming offenders /
deterministic bounded sampling), and q94 equivalence with the old
inline self-join (the probe this operator was promoted from)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.graph import copurchase_edges


def _py_edges(rows):
    baskets: dict = {}
    for b, i in rows:
        if b is None or i is None:
            continue
        baskets.setdefault(b, set()).add(i)
    out: dict = {}
    for items in baskets.values():
        for a, c in itertools.combinations(sorted(items), 2):
            out[(a, c)] = out.get((a, c), 0) + 1
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "basket long, item long")
    got = copurchase_edges(df, "basket", "item", **kw)
    return {(r.id_a, r.id_b): r.n_baskets for r in got.collect()}


def test_edges_and_weights_match_python(spark):
    rows = [
        (1, 10), (1, 11), (1, 12),
        (2, 10), (2, 11),
        (3, 12), (3, 10),
        (4, 99),           # singleton basket: no edges
    ]
    assert _run(spark, rows) == _py_edges(rows)
    # weight check explicitly: (10,11) shared by baskets 1 and 2
    assert _run(spark, rows)[(10, 11)] == 2


def test_duplicate_lines_collapse(spark):
    """A repeated (basket, item) row is one membership, not two —
    weights must not double-count an order line that appears twice."""
    rows = [(1, 10), (1, 10), (1, 11), (2, 10), (2, 11)]
    got = _run(spark, rows)
    assert got == {(10, 11): 2}


def test_nulls_dropped(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (None, 12), (1, None)],
        "basket long, item long",
    )
    got = {
        (r.id_a, r.id_b): r.n_baskets
        for r in copurchase_edges(df, "basket", "item").collect()
    }
    assert got == {(10, 11): 1}


def test_hot_basket_refuses_loudly(spark):
    rows = [(1, i) for i in range(12)] + [(2, 1), (2, 2)]
    with pytest.raises(ValueError) as ei:
        _run(spark, rows, max_basket=8)
    msg = str(ei.value)
    assert "max_basket=8" in msg and "12" in msg and "sample" in msg


def test_hot_basket_sample_is_bounded_and_deterministic(spark):
    """Sample mode: the hot basket contributes at most
    max_basket*(max_basket-1)/2 pairs, cold baskets stay EXACT, and
    two runs agree row-for-row (xxhash64 order, layout-independent)."""
    hot = [(1, i) for i in range(40)]
    cold = [(2, 100), (2, 101), (3, 100), (3, 101), (3, 102)]
    stats: dict = {}
    df = (
        spark.createDataFrame(hot + cold, "basket long, item long")
        .repartition(7)
    )
    got = {
        (r.id_a, r.id_b): r.n_baskets
        for r in copurchase_edges(
            df, "basket", "item", max_basket=8, on_hot="sample", stats=stats
        ).collect()
    }
    assert stats == {
        "baskets": 3,
        "max_basket_size": 40,
        "hot_baskets": 1,
        "sampled": True,
    }
    hot_pairs = {k for k in got if k[0] < 100}
    assert len(hot_pairs) == 8 * 7 // 2  # exactly C(max_basket, 2)
    # cold baskets exact
    assert got[(100, 101)] == 2 and got[(100, 102)] == 1
    again = {
        (r.id_a, r.id_b): r.n_baskets
        for r in copurchase_edges(
            df.repartition(3), "basket", "item", max_basket=8, on_hot="sample"
        ).collect()
    }
    assert got == again


def test_stats_and_validation(spark):
    stats: dict = {}
    got = _run(spark, [(1, 10), (1, 11)], stats=stats)
    assert got == {(10, 11): 1}
    assert stats == {
        "baskets": 1,
        "max_basket_size": 2,
        "hot_baskets": 0,
        "sampled": False,
    }
    df = spark.createDataFrame([(1, 10)], "basket long, item long")
    with pytest.raises(ValueError):
        copurchase_edges(df, "basket", "item", max_basket=1)
    with pytest.raises(ValueError):
        copurchase_edges(df, "basket", "item", on_hot="drop")


def test_string_items_and_empty(spark):
    df = spark.createDataFrame(
        [("o1", "b"), ("o1", "a"), ("o2", "a"), ("o2", "b")],
        "basket string, item string",
    )
    got = {
        (r.id_a, r.id_b): r.n_baskets
        for r in copurchase_edges(df, "basket", "item").collect()
    }
    assert got == {("a", "b"): 2}
    empty = spark.createDataFrame([], "basket long, item long")
    assert copurchase_edges(empty, "basket", "item").count() == 0


def test_q94_equals_old_inline_projection(spark):
    """The probe through copurchase_edges returns EXACTLY what the old
    inline self-join construction produced (canonicalization in
    triangle_count made the two edge frames equivalent)."""
    from big_data_hadoop_spark.operators.graph import triangle_count
    from big_data_hadoop_spark.probes import load_table, q94_triangle_copurchase

    sf_dir = "/root/testdata/sf0.001"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    x = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    y = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    old_edges = (
        x.join(y, "l_orderkey")
        .filter(F.col("pa") != F.col("pb"))
        .select(F.col("pa").alias("id_a"), F.col("pb").alias("id_b"))
    )
    old = (
        triangle_count(old_edges)
        .select(
            "id", "degree", "triangles", F.round("coeff", 8).alias("coeff")
        )
        .orderBy("id")
        .collect()
    )
    new = q94_triangle_copurchase(spark, sf_dir).collect()
    assert old == new


def test_r00_probe_matches_duckdb_oracle(spark, duck):
    """The events-stream affinity probe (r00) against an independent
    DuckDB self-join oracle at sf0.01 — the full-oracle check the
    registry position past the driver's 50-entry cap can't get."""
    from big_data_hadoop_spark.probes import r00_copurchase_affinity

    got = [
        (r.id_a, r.id_b, r.n_baskets)
        for r in r00_copurchase_affinity(
            spark, "/root/testdata/sf0.01"
        ).collect()
    ]
    want = duck.sql(
        """
        WITH m AS (SELECT DISTINCT user_id, event_type FROM events
                   WHERE user_id IS NOT NULL AND event_type IS NOT NULL)
        SELECT a.event_type AS id_a, b.event_type AS id_b,
               COUNT(*) AS n_baskets
        FROM m a JOIN m b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    assert got == [(a, b, int(n)) for a, b, n in want]


def test_copurchase_feeds_weighted_pagerank(spark):
    """Composition contract: copurchase_edges output plugs directly
    into pagerank(weight_col="n_baskets") — the strongly co-bought
    item outranks the weakly linked one, ranks sum to 1."""
    from big_data_hadoop_spark.operators.graph import pagerank

    rows = (
        [(b, 10) for b in range(4)]
        + [(b, 11) for b in range(3)]  # 10-11 share 3 baskets
        + [(3, 12)]                    # 10-12 share 1 basket
    )
    df = spark.createDataFrame(rows, "basket long, item long")
    edges = copurchase_edges(df, "basket", "item")
    ranks = {
        r.id: r.rank
        for r in pagerank(edges, weight_col="n_baskets").collect()
    }
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    assert ranks[10] > ranks[12] and ranks[11] > ranks[12]


def test_r01_matches_python_composition(spark, duck):
    """r01 replicated end-to-end in pure Python: weighted power
    iteration (same damping/tol/undirected symmetrization as the
    operator) over the DuckDB-verified affinity edges."""
    from big_data_hadoop_spark.probes import r01_affinity_pagerank

    edges = duck.sql(
        """
        WITH m AS (SELECT DISTINCT user_id, event_type FROM events
                   WHERE user_id IS NOT NULL AND event_type IS NOT NULL)
        SELECT a.event_type, b.event_type, COUNT(*)
        FROM m a JOIN m b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
        """
    ).fetchall()
    # undirected weighted pagerank, python replication
    w: dict = {}
    for a, b, n in edges:
        w[(a, b)] = w.get((a, b), 0.0) + float(n)
        w[(b, a)] = w.get((b, a), 0.0) + float(n)
    nodes = sorted({x for e in w for x in e})
    out = {v: sum(n for (s, _), n in w.items() if s == v) for v in nodes}
    r = {v: 1.0 / len(nodes) for v in nodes}
    for _ in range(40):
        new = {}
        for v in nodes:
            inflow = sum(
                r[s] * wt / out[s] for (s, d), wt in w.items() if d == v
            )
            new[v] = 0.15 / len(nodes) + 0.85 * inflow
        delta = sum(abs(new[v] - r[v]) for v in nodes)
        r = new
        if delta < 1e-6:
            break
    got = {
        row.id: row.rank
        for row in r01_affinity_pagerank(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert set(got) == set(r)
    for v in r:
        assert got[v] == pytest.approx(round(r[v], 8), abs=1e-6), v


def test_r02_matches_python_composition(spark, duck):
    """r02 replicated end-to-end in pure Python: the exact weighted
    synchronous LPA rule (duplicate weights summed both directions,
    self-vote 1.0, max weight mass, ties to min label) over the
    DuckDB-verified affinity edges — integer weights, so the vote
    sums are exact."""
    from big_data_hadoop_spark.probes import r02_affinity_communities

    edges = duck.sql(
        """
        WITH m AS (SELECT DISTINCT user_id, event_type FROM events
                   WHERE user_id IS NOT NULL AND event_type IS NOT NULL)
        SELECT a.event_type, b.event_type, COUNT(*)
        FROM m a JOIN m b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
        """
    ).fetchall()
    w: dict = {}
    verts: set = set()
    for a, b, n in edges:
        verts.update((a, b))
        w[(a, b)] = w.get((a, b), 0.0) + float(n)
        w[(b, a)] = w.get((b, a), 0.0) + float(n)
    lab = {v: v for v in verts}
    for _ in range(20):
        new = {}
        for v in verts:
            freq: dict = {}
            for (s, d), x in w.items():
                if s == v:
                    freq[lab[d]] = freq.get(lab[d], 0.0) + x
            freq[lab[v]] = freq.get(lab[v], 0.0) + 1.0
            mx = max(freq.values())
            new[v] = min(l for l, c in freq.items() if c == mx)
        if new == lab:
            break
        lab = new
    got = {
        r.id: r.community
        for r in r02_affinity_communities(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert got == lab
