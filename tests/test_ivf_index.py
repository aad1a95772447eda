"""IVF index build/reuse API (VERDICT r3 #2): one ``ivf_build`` fit, many
``ivf_search`` calls — results identical to the one-shot ``ivf_topk`` with
ZERO refits, asserted via the module fit counter. The bucketed-table
persistence path round-trips the assignment through storage."""

from __future__ import annotations

import pytest

from big_data_hadoop_spark.operators import similarity as sim


@pytest.fixture()
def corpus(spark):
    # Deterministic clustered-ish vectors: 3 obvious groups in dim 6.
    rows = []
    for i in range(45):
        g = i % 3
        base = [0.0] * 6
        base[g * 2] = 10.0
        base[g * 2 + 1] = 5.0
        vec = [v + ((i * 7 + j * 3) % 5) * 0.1 for j, v in enumerate(base)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_build_once_search_many_matches_one_shot(corpus):
    qids = [0, 1, 2, 40]
    expected = {
        (r.query_id, r.neighbor_id, round(r.sim, 12))
        for r in sim.ivf_topk(corpus, qids, k=4, n_cells=6, n_probe=3).collect()
    }

    fits_before = sim.IVF_FIT_COUNT
    index = sim.ivf_build(corpus, n_cells=6)
    assert sim.IVF_FIT_COUNT == fits_before + 1

    for _ in range(2):  # search twice: the index is reused, never refit
        got = {
            (r.query_id, r.neighbor_id, round(r.sim, 12))
            for r in sim.ivf_search(index, qids, k=4, n_probe=3).collect()
        }
        assert got == expected
    assert sim.IVF_FIT_COUNT == fits_before + 1  # still exactly one fit


def test_build_persists_bucketed_assignment(corpus, spark):
    table = "ivf_assign_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        index = sim.ivf_build(corpus, n_cells=6, table=table, buckets=4)
        # the assignment now comes from bucketed storage, not recompute
        assert index.assigned.sparkSession.catalog.tableExists(table)
        stored = spark.table(table)
        assert set(stored.columns) == {"vec_id", "cell", "emb_d", "nrm"}
        assert stored.count() == 45

        got = {
            (r.query_id, r.neighbor_id, round(r.sim, 12))
            for r in sim.ivf_search(index, [0, 1], k=3, n_probe=6).collect()
        }
        exp = {
            (r.query_id, r.neighbor_id, round(r.sim, 12))
            for r in sim.ivf_topk(
                corpus, [0, 1], k=3, n_cells=6, n_probe=6
            ).collect()
        }
        assert got == exp
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_empty_corpus_build_search(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    index = sim.ivf_build(empty)
    out = sim.ivf_search(index, [1, 2])
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "sim",
    ]


def test_small_train_cap_takes_counted_path(corpus):
    # ADVICE r4: with a small cap (100) the 4x-headroom argument alone
    # is not enough — the build must fall through to the LIMIT-count so
    # KMeans k can never exceed the actual sample size.
    index = sim.ivf_build(corpus, n_cells=6, train_cap=100, n_rows=1000)
    assert 1 <= len(index.centroids) <= 6


def test_search_vectors_external_queries(spark, corpus):
    """ivf_search_vectors must serve EXTERNAL vectors: full probe equals
    a numpy brute-force top-k over the corpus (no self-exclusion), and a
    partial probe returns k well-formed, descending results per query."""
    import numpy as np

    index = sim.ivf_build(corpus, n_cells=6)
    qrows = [
        (100, [10.0, 5.0, 0.3, 0.1, 0.0, 0.2]),   # near group 0
        (101, [0.1, 0.0, 10.2, 4.9, 0.0, 0.1]),   # near group 1
        (102, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),    # equidistant-ish
    ]
    queries = spark.createDataFrame(
        qrows, "query_id long, embedding array<double>"
    )
    got = sim.ivf_search_vectors(index, queries, k=3, n_probe=6).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.neighbor_id, r.sim))

    corpus_rows = corpus.collect()
    for qid, qv in qrows:
        qv = np.array(qv)
        sims = sorted(
            (
                (
                    float(
                        np.dot(qv, np.array(r.embedding))
                        / (np.linalg.norm(qv) * np.linalg.norm(r.embedding))
                    ),
                    r.vec_id,
                )
                for r in corpus_rows
            ),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        expect = [(vid, round(s, 9)) for s, vid in sims]
        assert [
            (nid, round(s, 9)) for nid, s in by_q[qid]
        ] == expect, qid

    partial = sim.ivf_search_vectors(index, queries, k=3, n_probe=2).collect()
    per_q = {}
    for r in partial:
        per_q.setdefault(r.query_id, []).append(r.sim)
    for qid, sims in per_q.items():
        assert 1 <= len(sims) <= 3
        assert sims == sorted(sims, reverse=True)


def test_cosine_topk_vectors_is_exact_reference_for_ivf(spark, corpus):
    """cosine_topk_vectors (brute force, external queries) must equal
    ivf_search_vectors at full probe — the same exact-verifier contract
    corpus-id search has with cosine_topk."""
    queries = spark.createDataFrame(
        [(200, [9.8, 5.2, 0.0, 0.4, 0.1, 0.0]), (201, [0.2, 0.1, 0.0, 0.3, 10.1, 5.0])],
        "query_id long, embedding array<double>",
    )
    brute = {
        (r.query_id, r.neighbor_id, round(r.sim, 9))
        for r in sim.cosine_topk_vectors(corpus, queries, k=4).collect()
    }
    index = sim.ivf_build(corpus, n_cells=6)
    full_probe = {
        (r.query_id, r.neighbor_id, round(r.sim, 9))
        for r in sim.ivf_search_vectors(index, queries, k=4, n_probe=6).collect()
    }
    assert brute == full_probe and len(brute) == 8


def test_save_load_roundtrip_serves_identically(spark, corpus):
    """ivf_save -> ivf_load in a 'different job' must serve exactly the
    in-memory index's results with zero refits."""
    index = sim.ivf_build(corpus, n_cells=6)
    queries = spark.createDataFrame(
        [(300, [10.2, 4.8, 0.1, 0.0, 0.3, 0.0])],
        "query_id long, embedding array<double>",
    )
    want = {
        (r.query_id, r.neighbor_id, round(r.sim, 12))
        for r in sim.ivf_search_vectors(index, queries, k=4, n_probe=3).collect()
    }
    fits_before = sim.IVF_FIT_COUNT
    sim.ivf_save(index, "ivf_rt", buckets=4)
    loaded = sim.ivf_load(spark, "ivf_rt")
    got = {
        (r.query_id, r.neighbor_id, round(r.sim, 12))
        for r in sim.ivf_search_vectors(loaded, queries, k=4, n_probe=3).collect()
    }
    assert got == want and got
    assert loaded.centroids == index.centroids
    assert loaded.id_col == index.id_col
    assert sim.IVF_FIT_COUNT == fits_before  # no refit anywhere
    spark.sql("DROP TABLE IF EXISTS ivf_rt")
    spark.sql("DROP TABLE IF EXISTS ivf_rt_meta")


def test_topk_recall_audit_books(spark, corpus):
    """The retrieval-tier recall audit (q92/r11 discipline): exact ==
    approx gives recall 1.0 on every book; a starved probe budget
    (n_probe=1) measures BELOW 1.0 with misses concentrated on
    cross-cell queries; full probe restores 1.0 (ivf degrades to
    exact). Books verified against a hand count."""
    qids = [0, 1, 2, 40]
    exact = sim.cosine_topk(corpus, qids, k=4)
    # self-audit: identical frames -> perfect recall, one row per query
    per_q, s = sim.topk_recall_audit(exact, exact)
    assert s["queries"] == 4
    assert s["macro_recall"] == s["micro_recall"] == s["min_recall"] == 1.0
    assert all(r.recall == 1.0 and r.hit == r.exact_k for r in per_q.collect())
    index = sim.ivf_build(corpus, n_cells=6)
    # full probe degrades to exact: measured recall must be 1.0
    _pq, full = sim.topk_recall_audit(
        exact, sim.ivf_search(index, qids, k=4, n_probe=6)
    )
    assert full["macro_recall"] == 1.0 and full["min_recall"] == 1.0
    # starved probe budget: recall is a measured number in [0, 1], and
    # the books must agree with a pure-Python recount of the two frames
    approx = sim.ivf_search(index, qids, k=4, n_probe=1)
    per_q2, s2 = sim.topk_recall_audit(exact, approx)
    want_e = {}
    for r in exact.collect():
        want_e.setdefault(r.query_id, set()).add(r.neighbor_id)
    got_a = {}
    for r in approx.collect():
        got_a.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = {q: len(want_e[q] & got_a.get(q, set())) for q in want_e}
    assert s2["queries"] == len(want_e)
    assert s2["micro_recall"] == pytest.approx(
        sum(hits.values()) / sum(len(v) for v in want_e.values())
    )
    assert s2["macro_recall"] == pytest.approx(
        sum(hits[q] / len(want_e[q]) for q in want_e) / len(want_e)
    )
    assert s2["min_recall"] == pytest.approx(
        min(hits[q] / len(want_e[q]) for q in want_e)
    )
    for r in per_q2.collect():
        assert r.hit == hits[r.query_id] and r.exact_k == len(
            want_e[r.query_id]
        )
    # an empty approximate result is measured as recall 0, not an error
    _pq3, s3 = sim.topk_recall_audit(exact, approx.limit(0))
    assert s3["macro_recall"] == 0.0 and s3["micro_recall"] == 0.0


def test_lsh_multi_table_backcompat_and_monotone_recall(spark, corpus):
    """The round-12 LSH recall lever (multi-table OR-construction):
    ``n_tables=1`` must be ROW-identical to the historical single-table
    call (table 0's planes are the single-table plane set), the output
    must stay duplicate-free (a pair found by several tables ranks
    once) with at most k rows per query, and recall@k against the
    exact cosine top-k must be monotone non-decreasing in ``n_tables``
    (candidate sets are nested — each extra table only ADDS pairs)."""
    qids = [0, 1, 2, 40]
    k = 5
    exact = sim.cosine_topk(corpus, query_ids=qids, k=k, dim=6)
    legacy = {
        (r.query_id, r.neighbor_id, round(r.sim, 12))
        for r in sim.lsh_bucketed_topk(
            corpus, query_ids=qids, k=k, dim=6, num_planes=6
        ).collect()
    }
    single = {
        (r.query_id, r.neighbor_id, round(r.sim, 12))
        for r in sim.lsh_bucketed_topk(
            corpus, query_ids=qids, k=k, dim=6, num_planes=6, n_tables=1
        ).collect()
    }
    assert single == legacy
    prev = -1.0
    for n_tables in (1, 2, 4):
        got = sim.lsh_bucketed_topk(
            corpus, query_ids=qids, k=k, dim=6, num_planes=6,
            n_tables=n_tables,
        ).collect()
        pairs = [(r.query_id, r.neighbor_id) for r in got]
        assert len(pairs) == len(set(pairs))  # dup-free
        per_q: dict = {}
        for q, nbr in pairs:
            per_q.setdefault(q, []).append(nbr)
        assert all(len(v) <= k for v in per_q.values())
        _m, s = sim.topk_recall_audit(exact, spark.createDataFrame(
            [(r.query_id, r.neighbor_id, r.sim) for r in got],
            "query_id long, neighbor_id long, sim double",
        ))
        assert s["macro_recall"] >= prev - 1e-12, (n_tables, s, prev)
        prev = s["macro_recall"]
    with pytest.raises(ValueError):
        sim.lsh_bucketed_topk(
            corpus, query_ids=qids, k=k, dim=6, num_planes=6, n_tables=0
        )
