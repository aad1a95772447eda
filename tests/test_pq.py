"""Value oracle for ``operators.pq`` (product quantization): encode and
ADC search are recomputed in numpy FROM THE COLLECTED CODEBOOK (the
KMeans fit itself is pyspark.ml's — what's under test is the engine's
declarative encode/argmin/LUT/sum plumbing), plus recall and
degenerate-shape invariants.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from big_data_hadoop_spark.operators import pq as pqm
from big_data_hadoop_spark.operators.pq import (
    PQCodebook,
    pq_encode,
    pq_load,
    pq_save,
    pq_search,
    pq_train,
)
from big_data_hadoop_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"
DIM = 64
M = 8
K = 16


@pytest.fixture(scope="module")
def corpus(spark):
    return load_table(spark, SF, "embeddings").select("vec_id", "embedding").cache()


@pytest.fixture(scope="module")
def cb(spark, corpus):
    return pq_train(corpus, dim=DIM, m=M, k=K, seed=7)


def _np_codebook(cb: PQCodebook) -> np.ndarray:
    """(m, k_actual, dsub) array from the codebook frame."""
    rows = cb.entries.collect()
    k_actual = max(r["code"] for r in rows) + 1
    out = np.zeros((cb.m, k_actual, cb.dsub))
    for r in rows:
        out[r["j"], r["code"]] = r["centroid"]
    return out


def _np_encode(vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    n, m, dsub = len(vecs), books.shape[0], books.shape[2]
    codes = np.zeros((n, m), dtype=int)
    for j in range(m):
        sub = vecs[:, j * dsub : (j + 1) * dsub]
        d = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d.argmin(axis=1)  # lowest code on ties, like min(struct)
    return codes


def test_encode_matches_numpy(spark, corpus, cb):
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in corpus.collect()}
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(corpus, cb).collect()
    }
    books = _np_codebook(cb)
    ids = sorted(vecs)
    want = _np_encode(np.stack([vecs[i] for i in ids]), books)
    assert set(got) == set(ids)
    for row, i in zip(want, ids):
        assert got[i] == list(row), i


def test_adc_distances_match_numpy(spark, corpus, cb):
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in corpus.collect()}
    queries = corpus.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    codes = pq_encode(corpus, cb)
    got = pq_search(codes, cb, queries, topk=10).collect()
    books = _np_codebook(cb)
    ids = sorted(vecs)
    allcodes = _np_encode(np.stack([vecs[i] for i in ids]), books)
    code_of = dict(zip(ids, allcodes))
    for r in got:
        q = vecs[r["query_id"]]
        want = 0.0
        for j, c in enumerate(code_of[r["vec_id"]]):
            sub = q[j * cb.dsub : (j + 1) * cb.dsub]
            want += ((sub - books[j][c]) ** 2).sum()
        assert r["adc_dist"] == pytest.approx(want, rel=1e-9)
    # per query: exactly topk rows, ranks 1..topk, sorted by distance
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, 11))
        dists = [r["adc_dist"] for r in rows]
        assert dists == sorted(dists)


def test_self_is_near_top(spark, corpus, cb):
    """ADC recall sanity: a query drawn from the corpus must rank its own
    code among the closest few (its quantized self has the minimal
    reachable ADC distance up to code collisions)."""
    queries = corpus.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    codes = pq_encode(corpus, cb)
    got = pq_search(codes, cb, queries, topk=5).collect()
    tops = {}
    for r in got:
        tops.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(1 for q, ids in tops.items() if q in ids)
    assert hits >= 4  # allow one collision-induced miss


def test_save_load_roundtrip(spark, corpus, cb, tmp_path):
    path = str(tmp_path / "pq_codebook")
    pq_save(cb, path)
    cb2 = pq_load(spark, path)
    assert (cb2.dim, cb2.m, cb2.k) == (cb.dim, cb.m, cb.k)
    a = pq_encode(corpus, cb).orderBy("vec_id").collect()
    b = pq_encode(corpus, cb2).orderBy("vec_id").collect()
    assert [list(r["codes"]) for r in a] == [list(r["codes"]) for r in b]


def test_train_validation_and_fit_count(spark, corpus):
    with pytest.raises(ValueError):
        pq_train(corpus, dim=DIM, m=7)  # 7 does not divide 64
    with pytest.raises(ValueError):
        pq_train(corpus, dim=DIM, m=8, k=0)
    before = pqm.PQ_FIT_COUNT
    cb = pq_train(corpus, dim=DIM, m=4, k=4, seed=1)
    assert pqm.PQ_FIT_COUNT == before + 4  # one fit per subspace, never more
    # encode+search reuse the codebook with ZERO additional fits
    queries = corpus.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    pq_search(pq_encode(corpus, cb), cb, queries, topk=3).collect()
    assert pqm.PQ_FIT_COUNT == before + 4


def test_tiny_corpus(spark):
    one = spark.createDataFrame(
        [(1, [float(i) for i in range(DIM)])], "vec_id long, embedding array<double>"
    )
    cb = pq_train(one, dim=DIM, m=4, k=8)
    codes = pq_encode(one, cb).collect()
    assert len(codes) == 1 and list(codes[0]["codes"]) == [0, 0, 0, 0]


def test_ivfpq_full_probe_equals_pq_search(spark, corpus):
    from big_data_hadoop_spark.operators.pq import (
        ivfpq_build,
        ivfpq_search,
        pq_search,
    )

    idx = ivfpq_build(corpus, dim=DIM, n_cells=8, m=M, k=K, seed=7)
    queries = corpus.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["adc_dist"])
        for r in ivfpq_search(idx, queries, topk=8, n_probe=8).collect()
    }
    flat = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["adc_dist"])
        for r in pq_search(
            idx.codes.select("vec_id", "codes"), idx.cb, queries, topk=8
        ).collect()
    }
    assert set(full) == set(flat)
    for key, (vid, d) in flat.items():
        assert full[key][0] == vid, key
        assert full[key][1] == pytest.approx(d, rel=1e-12)


def test_ivfpq_pruning_recall(spark, corpus):
    from big_data_hadoop_spark.operators.pq import ivfpq_build, ivfpq_search

    idx = ivfpq_build(corpus, dim=DIM, n_cells=8, m=M, k=K, seed=7)
    queries = corpus.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pruned = ivfpq_search(idx, queries, topk=5, n_probe=3)
    rows = pruned.collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert len(by_q) == 5
    # pruned search still finds the query's own cell (self in top-5
    # for most queries — its own cell is always probed first)
    hits = sum(1 for qid, ids in by_q.items() if qid in ids)
    assert hits >= 4
    # pruning touches strictly fewer candidates than the full scan:
    # scored rows per query bounded by probed-cell population
    n_probed_docs = (
        idx.codes.join(
            ivfpq_search(idx, queries, topk=10**9, n_probe=3)
            .select("query_id", "vec_id"),
            "vec_id",
            "left_semi",
        ).count()
    )
    assert n_probed_docs < corpus.count()


def test_recall_curve_l2_twin_matches_numpy(spark, corpus):
    """The recall-curve tool's exact squared-L2 top-k twin
    (``tools/recall_curves.py::_l2_topk`` — the truth side of the
    PQ/IVF-PQ measured-recall table in BASELINE.md) must equal a numpy
    brute force: same metric, same (dist asc, id asc) tie-break as
    ``pq_search``, self included."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "recall_curves",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "recall_curves.py",
        ),
    )
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)

    rows = corpus.collect()
    ids = np.array([r.vec_id for r in rows])
    vecs = np.array([r.embedding for r in rows], dtype=float)
    qids = sorted(ids[:8].tolist())
    queries = corpus.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    k = 5
    got: dict[int, list[int]] = {}
    for r in rc._l2_topk(corpus, queries, k).collect():
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    for q in qids:
        qv = vecs[ids == q][0]
        d2 = ((vecs - qv) ** 2).sum(axis=1)
        # (d2 asc, id asc): sort a structured key like the engine does
        want = sorted(zip(d2, ids))[:k]
        assert sorted(got[q]) == sorted(int(i) for _, i in want), q


def _np_l2_topk_sets(vecs: dict, qids, k):
    """Exact squared-L2 top-k id LISTS per query (self included,
    (dist asc, id asc) — the ``pq_search``/``pq_refine`` rule)."""
    ids = sorted(vecs)
    arr = np.array(ids)
    V = np.stack([vecs[i] for i in ids])
    out = {}
    for q in qids:
        d2 = ((V - vecs[q]) ** 2).sum(axis=1)
        order = np.lexsort((arr, d2))
        out[q] = [int(arr[i]) for i in order[:k]]
    return out


def test_refine_full_shortlist_equals_exact_bruteforce(spark, corpus, cb):
    """``pq_refine`` over a shortlist covering the WHOLE corpus is the
    exact brute-force squared-L2 top-k — ids, ORDER, and distances
    (numpy-pinned): the lever's endpoint guarantee, the analog of
    IVF's n_probe = n_cells and the embedding store's check_cells =
    n_cells rows."""
    from big_data_hadoop_spark.operators.pq import pq_refine

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in corpus.collect()
    }
    n = len(vecs)
    queries = corpus.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qids = [r["query_id"] for r in queries.select("query_id").collect()]
    shortlist = pq_search(pq_encode(corpus, cb), cb, queries, topk=n)
    got = pq_refine(shortlist, corpus, queries, topk=5).collect()
    assert {f.name for f in pq_refine(
        shortlist, corpus, queries, topk=5
    ).schema} == {"query_id", "vec_id", "dist", "rank"}
    want = _np_l2_topk_sets(vecs, qids, 5)
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(qids)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        assert [r["vec_id"] for r in rows] == want[q], q
        for r in rows:
            true_d = float(((vecs[q] - vecs[r["vec_id"]]) ** 2).sum())
            assert r["dist"] == pytest.approx(true_d, rel=1e-9)


def test_refine_recall_monotone_beats_adc(spark, corpus, cb):
    """The re-rank guarantee the round-12 BASELINE table cites: at the
    same shortlist the refined recall@k is >= plain ADC's (the exact
    metric re-orders a superset of the ADC top-k), recall is monotone
    in shortlist size, and the full-corpus shortlist reaches 1.0."""
    from big_data_hadoop_spark.operators.pq import pq_refine

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in corpus.collect()
    }
    n = len(vecs)
    k = 10
    queries = corpus.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qids = [r["query_id"] for r in queries.select("query_id").collect()]
    truth = {q: set(ids) for q, ids in _np_l2_topk_sets(vecs, qids, k).items()}
    codes = pq_encode(corpus, cb)

    def recall_of(result_rows):
        by_q: dict = {}
        for r in result_rows:
            by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(
            len(by_q.get(q, set()) & truth[q]) / k for q in qids
        ) / len(qids)

    adc = recall_of(pq_search(codes, cb, queries, topk=k).collect())
    prev = -1.0
    for s in (k, 3 * k, n):
        shortlist = pq_search(codes, cb, queries, topk=s)
        ref = recall_of(
            pq_refine(shortlist, corpus, queries, topk=k).collect()
        )
        assert ref >= adc - 1e-12, (s, ref, adc)
        assert ref >= prev - 1e-12, (s, ref, prev)
        prev = ref
    assert prev == pytest.approx(1.0)  # full-corpus shortlist is exact


def test_ivfpq_residual_matches_numpy(spark, corpus):
    """Residual IVF-PQ (full IVFADC — codes quantize ``x − c_cell``):
    the engine's declarative residual encode and the per-(query,
    probed-cell) LUT sum are replicated exactly in numpy from the
    collected centroids + codebook; raw mode stays the default
    (``residual`` False) and its tests above are untouched."""
    from big_data_hadoop_spark.operators.pq import ivfpq_build, ivfpq_search

    idx = ivfpq_build(
        corpus, dim=DIM, n_cells=4, m=4, k=8, seed=7, residual=True
    )
    assert idx.residual is True

    rows = corpus.collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=float)
    C = np.array(idx.centroids)
    cell_of = ((V[:, None, :] - C[None, :, :]) ** 2).sum(2).argmin(1)
    B = _np_codebook(idx.cb)
    R = V - C[cell_of]
    want_codes = _np_encode(R, B)
    got_codes = {r["vec_id"]: list(r["codes"]) for r in idx.codes.collect()}
    got_cells = {r["vec_id"]: r["cell"] for r in idx.codes.collect()}
    for i, vid in enumerate(ids):
        assert got_codes[vid] == list(want_codes[i]), vid
        assert got_cells[vid] == cell_of[i], vid

    queries = corpus.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qvec = {
        r["query_id"]: np.array(r["embedding"], dtype=float)
        for r in queries.collect()
    }
    id2i = {v: i for i, v in enumerate(ids)}
    dsub = idx.cb.dsub
    got = ivfpq_search(idx, queries, topk=5, n_probe=4).collect()
    by_q: dict = {}
    for r in got:
        i = id2i[r["vec_id"]]
        qr = qvec[r["query_id"]] - C[cell_of[i]]
        want = sum(
            ((qr[j * dsub : (j + 1) * dsub] - B[j][want_codes[i, j]]) ** 2).sum()
            for j in range(idx.cb.m)
        )
        assert r["adc_dist"] == pytest.approx(want, rel=1e-9)
        by_q.setdefault(r["query_id"], []).append(r)
    # full probe covers the corpus: exactly topk rows per query,
    # contiguous ranks, distances sorted
    for q, rws in by_q.items():
        rws.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rws] == list(range(1, 6))
        dd = [r["adc_dist"] for r in rws]
        assert dd == sorted(dd)
    # a query from the corpus finds its own (exactly-encodable-up-to-
    # quantization) self near the top in residual space too
    tops = {q: {r["vec_id"] for r in rws} for q, rws in by_q.items()}
    assert sum(1 for q, s in tops.items() if q in s) >= 2


def test_ivfpq_save_load_roundtrip_both_modes(spark, corpus, tmp_path):
    """``ivfpq_save``/``ivfpq_load`` persist the FULL index — codes,
    codebook, coarse centroids, and the ``residual`` domain — and a
    reload serves row-identically in BOTH modes. ``pq_save`` alone
    cannot: it stores neither centroids nor the flag, and a reload
    that defaulted residual=False would score residual codes with a
    raw LUT (silently wrong — the round-12 review finding this API
    closes)."""
    from big_data_hadoop_spark.operators.pq import (
        ivfpq_build,
        ivfpq_load,
        ivfpq_save,
        ivfpq_search,
    )

    queries = corpus.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for mode in (False, True):
        idx = ivfpq_build(
            corpus, dim=DIM, n_cells=4, m=4, k=8, seed=7, residual=mode
        )
        path = str(tmp_path / f"ivfpq_{mode}")
        ivfpq_save(idx, path)
        idx2 = ivfpq_load(spark, path)
        assert idx2.residual is mode
        assert idx2.centroids == idx.centroids
        a = {
            (r["query_id"], r["rank"]): (r["vec_id"], round(r["adc_dist"], 9))
            for r in ivfpq_search(idx, queries, topk=5, n_probe=2).collect()
        }
        b = {
            (r["query_id"], r["rank"]): (r["vec_id"], round(r["adc_dist"], 9))
            for r in ivfpq_search(idx2, queries, topk=5, n_probe=2).collect()
        }
        assert a == b, mode
