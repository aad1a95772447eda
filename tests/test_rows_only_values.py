"""Independent VALUE verification for the rows-only probes (VERDICT r1 #8).

q51-q59 (q51_simhash, q52_lsh_ann, q53_ivf_ann, q54_simhash_neardup,
q55_winnow_fingerprints, q56_ewm) have no ANSI-SQL oracle (xxhash64 /
seeded plane literals / iterative KMeans / recurrences), so the external
driver only row-counts them. These tests re-derive the expected VALUES
with pure Python/pandas references so "ran" becomes "right":

- simhash (q51): bit votes recomputed in Python from per-token xxhash64
  (Spark supplies only the hash primitive — the vote/assembly logic,
  the part that could silently be wrong, is recomputed independently).
  Complements ``test_golden.test_simhash_neardup_matches_bruteforce``,
  which checks the q54 banding against brute-force Hamming but trusts
  the fingerprints themselves.
- LSH ANN (q52): the sin-seeded planes are deterministic, so the WHOLE
  expected result — buckets, candidate sets, cosine re-rank, top-k —
  is recomputed in Python and compared pair-for-pair.
- IVF ANN (q53): with ``n_probe == n_cells`` the search degrades to
  exact by construction — it must equal the brute-force top-k; at the
  registered ``n_probe=4`` setting, recall against exact has a floor.
(q55 winnowing and q56 EWM references live in test_golden.py; q57 winnow
near-dup pairs in test_winnow_pairs.py; q58 cluster resolution in
test_clusters.py; q59 pack stats in test_pipeline.py.)
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.dedup import simhash
from big_data_hadoop_spark.operators import similarity as sim
from big_data_hadoop_spark.sources.io import load_table
from tests.conftest import SF_ORACLE, SF_SMOKE

EMBED_DIM = 64


def _py_simhash(token_hashes: list[int], bits: int = 64) -> int:
    votes = [0] * bits
    for h in token_hashes:
        for b in range(bits):
            votes[b] += 1 if (h >> b) & 1 else -1
    fp = sum(1 << b for b in range(bits) if votes[b] > 0)
    return fp - (1 << 64) if fp >= 1 << 63 else fp


def test_simhash_matches_python_reference(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20).cache()
    # Spark supplies the primitive (xxhash64 per distinct token)...
    tok_hash = {
        r.t: r.h
        for r in docs.select(
            F.explode(F.split(F.lower("text"), " ", -1)).alias("t")
        )
        .filter(F.col("t") != "")
        .distinct()
        .select("t", F.xxhash64("t").alias("h"))
        .collect()
    }
    # ...and the vote/bit-assembly logic is recomputed in pure Python.
    expect = {}
    for r in docs.select("doc_id", "text").collect():
        toks = [t for t in r.text.lower().split(" ") if t != ""]
        expect[r.doc_id] = _py_simhash([tok_hash[t] for t in toks])
    got = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert got == expect


def _embeddings(spark) -> dict[int, list[float]]:
    emb = load_table(spark, SF_SMOKE, "embeddings")
    return {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}


def _cosine(a: list[float], b: list[float]) -> float:
    # sequential folds, matching the engine's F.aggregate evaluation order
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _exact_topk(
    vecs: dict[int, list[float]], query_ids: list[int], k: int
) -> dict[int, set[int]]:
    out = {}
    for q in query_ids:
        scored = sorted(
            ((-_cosine(vecs[q], vecs[i]), i) for i in vecs if i != q)
        )[:k]
        out[q] = {i for _, i in scored}
    return out


def test_lsh_ann_matches_python_reference(spark):
    """q52 end-to-end: buckets from the seeded planes, bucket-restricted
    candidates, cosine re-rank, top-5 — all recomputed in Python."""
    vecs = _embeddings(spark)
    queries, k, num_planes, seed = list(range(10)), 5, 8, 42
    planes = [
        [math.sin(seed + p * 1009 + i * 9176) for i in range(EMBED_DIM)]
        for p in range(num_planes)
    ]

    def bucket(v: list[float]) -> int:
        sig = 0
        for p, plane in enumerate(planes):
            d = 0.0
            for x, c in zip(v, plane):
                d += x * c
            if d >= 0:
                sig |= 1 << p
        return sig

    buckets = {i: bucket(v) for i, v in vecs.items()}
    expect = set()
    for q in queries:
        cands = [
            (-_cosine(vecs[q], vecs[i]), i)
            for i in vecs
            if i != q and buckets[i] == buckets[q]
        ]
        expect |= {(q, i) for _, i in sorted(cands)[:k]}

    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = {
        (r.query_id, r.neighbor_id)
        for r in sim.lsh_bucketed_topk(
            emb, query_ids=queries, k=k, dim=EMBED_DIM, num_planes=num_planes
        ).collect()
    }
    assert got == expect


def test_ivf_with_full_probe_is_exact(spark):
    """n_probe == n_cells searches every cell — the result must equal the
    brute-force top-k regardless of where KMeans put the centroids."""
    vecs = _embeddings(spark)
    queries, k = list(range(10)), 5
    exact = _exact_topk(vecs, queries, k)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = {}
    for r in sim.ivf_topk(
        emb, query_ids=queries, k=k, n_cells=8, n_probe=8
    ).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert got == exact


def test_ivf_registered_setting_recall_floor(spark):
    """The q53 configuration (16 cells, 4 probes) must keep recall vs the
    exact top-k above a floor (0.64 observed at this SF; floor 0.4)."""
    vecs = _embeddings(spark)
    queries, k = list(range(10)), 5
    exact = _exact_topk(vecs, queries, k)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    approx: dict[int, set[int]] = {}
    for r in sim.ivf_topk(
        emb, query_ids=queries, k=k, n_cells=16, n_probe=4
    ).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.4, (hits, total)


def test_embedding_corpus_well_formed(spark):
    """ADVICE r2: _flat's coalesce(element_at(...), 0.0) zero-fills
    malformed vectors silently — so malformed vectors must fail LOUDLY
    here instead. Every embedding must be exactly EMBED_DIM doubles with
    no null elements, at both test scales."""
    for sf in (SF_SMOKE, SF_ORACLE):
        emb = load_table(spark, sf, "embeddings")
        bad = emb.filter(
            (F.size("embedding") != EMBED_DIM)
            | F.exists("embedding", lambda x: x.isNull())
        ).count()
        assert bad == 0, f"{bad} malformed embeddings at {sf}"
