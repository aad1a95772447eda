"""Cross-run MinHash near-dup dedup (``dedup.minhash_matches_against`` /
``minhash_dedup_against``): the band/candidate/estimate logic is
recomputed in pure Python from the COLLECTED signatures (the signature
primitive itself is pinned by the q19 oracle), so match decisions must
agree pair-for-pair; plus drop/keep invariants on planted duplicates.

The only divergence surface between engine and replication is band-key
hashing: the engine buckets on ``xxhash64(slice(sig))``, the replication
on the raw slot tuple — identical candidate sets unless xxhash64
collides (negligible, and a collision could only ADD a candidate, never
lose one).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.dedup import (
    minhash_dedup_against,
    minhash_matches_against,
    minhash_signatures,
)
from big_data_hadoop_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"
NUM_PERM = 128
BANDS = 32
R = NUM_PERM // BANDS


@pytest.fixture(scope="module")
def corpus(spark):
    """History = even doc_ids; batch = odd doc_ids plus 10 replanted
    history docs (exact cross-run duplicates) re-keyed to fresh ids."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    prior = docs.filter("doc_id % 2 = 0")
    replant = (
        prior.orderBy("doc_id")
        .limit(10)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    batch = docs.filter("doc_id % 2 = 1").unionByName(replant)
    return prior.cache(), batch.cache()


def _py_matches(new_sigs, prior_sigs, threshold):
    """Replicate band-candidate generation + slot-agreement estimate."""
    def bandkeys(sig):
        return [
            (b, tuple(sig[b * R : (b + 1) * R])) for b in range(BANDS)
        ]

    buckets: dict = {}
    for pid, sig in prior_sigs.items():
        for key in bandkeys(sig):
            buckets.setdefault(key, []).append(pid)
    out = set()
    for nid, sig in new_sigs.items():
        cands = {p for key in bandkeys(sig) for p in buckets.get(key, [])}
        for pid in cands:
            psig = prior_sigs[pid]
            est = sum(a == b for a, b in zip(sig, psig)) / NUM_PERM
            if est >= threshold:
                out.add((nid, pid))
    return out


@pytest.mark.parametrize("threshold", [0.5, 0.9])
def test_matches_equal_python_replication(spark, corpus, threshold):
    prior, batch = corpus
    prior_sigs = minhash_signatures(prior, num_perm=NUM_PERM)
    new_sigs = minhash_signatures(batch, num_perm=NUM_PERM)
    got = {
        (r["doc_id"], r["prior_id"])
        for r in minhash_matches_against(
            new_sigs, prior_sigs, num_perm=NUM_PERM, bands=BANDS,
            threshold=threshold,
        ).collect()
    }
    p_sigs = {r["doc_id"]: list(r["sig"]) for r in prior_sigs.collect()}
    n_sigs = {r["doc_id"]: list(r["sig"]) for r in new_sigs.collect()}
    assert got == _py_matches(n_sigs, p_sigs, threshold)
    assert got, "planted duplicates must produce matches"


def test_replanted_docs_dropped_fresh_docs_kept(spark, corpus):
    prior, batch = corpus
    prior_sigs = minhash_signatures(prior, num_perm=NUM_PERM)
    out = minhash_dedup_against(
        batch, prior_sigs, threshold=0.9, within_batch=False
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    # every replanted doc (id >= 1e6) is an exact copy of history:
    # signature estimate 1.0 -> always dropped
    assert not {d for d in kept if d >= 1_000_000}
    # odd docs are synthetic-distinct from the even history at 0.9
    n_odd_in = batch.filter("doc_id < 1000000").count()
    n_odd_kept = len([d for d in kept if d < 1_000_000])
    assert n_odd_kept > 0.5 * n_odd_in


def test_within_batch_clusters_also_resolved(spark, corpus):
    prior, batch = corpus
    # plant an intra-batch near-dup pair: two fresh ids, same text
    dup = batch.filter("doc_id % 2 = 1").orderBy("doc_id").limit(1)
    twice = dup.select(F.lit(2_000_000).alias("doc_id"), "text").unionByName(
        dup.select(F.lit(2_000_001).alias("doc_id"), "text")
    )
    prior_sigs = minhash_signatures(prior, num_perm=NUM_PERM)
    out = minhash_dedup_against(
        batch.unionByName(twice), prior_sigs, threshold=0.9
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    # the original odd doc survives history (distinct) but its two batch
    # copies resolve to ONE canonical member of the {orig, 2M, 2M+1}
    # cluster (keep-min => the original id)
    orig = dup.collect()[0]["doc_id"]
    assert orig in kept
    assert 2_000_000 not in kept and 2_000_001 not in kept


def test_bands_must_divide(spark, corpus):
    prior, batch = corpus
    sigs = minhash_signatures(prior, num_perm=NUM_PERM)
    with pytest.raises(ValueError):
        minhash_matches_against(sigs, sigs, num_perm=128, bands=33)


# ----------------------------------------------------------- recall audit


def test_lsh_recall_audit_full_banding_has_full_recall(spark):
    """With the production banding (128/32) the audit's sample recall
    on the corpus must be 1.0 — LSH output ⊆ truth, missed == 0 — and
    the summary's bookkeeping must be internally consistent."""
    from big_data_hadoop_spark.operators.dedup import lsh_recall_audit
    from big_data_hadoop_spark.sources.io import load_table
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    missed, s = lsh_recall_audit(
        docs, threshold=0.7, sample_docs=400, seed=1
    )
    assert s["sample_docs"] == 400
    assert s["lsh_pairs"] + s["missed_pairs"] == s["truth_pairs"]
    assert s["truth_pairs"] > 0, "sample found no near-dup pairs"
    assert s["recall"] == 1.0 and missed.count() == 0
    assert s["missed_max_jac"] is None
    assert 0.99 < s["theoretical_recall"] <= 1.0


def test_lsh_recall_audit_weak_banding_measures_misses(spark):
    """A deliberately WEAK banding (4 bands of 32 rows: s^r at s=0.7
    is ~1e-5) must measurably miss borderline pairs — the audit's
    reason to exist — and every miss must be a true pair above the
    threshold that the LSH tier did not emit."""
    from big_data_hadoop_spark.operators.dedup import lsh_recall_audit
    from big_data_hadoop_spark.sources.io import load_table
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    missed, s = lsh_recall_audit(
        docs, threshold=0.7, num_perm=128, bands=4,
        sample_docs=400, seed=1,
    )
    assert s["theoretical_recall"] < 0.01
    assert s["missed_pairs"] == missed.count()
    assert s["lsh_pairs"] + s["missed_pairs"] == s["truth_pairs"]
    if s["missed_pairs"]:
        assert s["missed_max_jac"] >= 0.7
        assert s["recall"] < 1.0


def test_lsh_recall_audit_rejects_tiny_sample(spark):
    import pytest

    from big_data_hadoop_spark.operators.dedup import lsh_recall_audit

    with pytest.raises(ValueError, match="sample_docs"):
        lsh_recall_audit(spark.range(5).toDF("doc_id"), sample_docs=1)


# ------------------------------------------------- incremental SimHash


def test_simhash_dedup_against_matches_bruteforce(spark):
    """The incremental SimHash tier equals a brute-force Hamming
    filter over the same fingerprints: history hits drop, unrelated
    docs survive, within-batch twins resolve to one representative."""
    from big_data_hadoop_spark.operators.dedup import (
        simhash,
        simhash_dedup_against,
        simhash_matches_against,
    )
    from big_data_hadoop_spark.sources.io import load_table
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").limit(120).cache()
    history_docs = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 != 0)
    stored = simhash(history_docs).select("simhash")

    out = simhash_dedup_against(batch, stored, max_hamming=3)
    got_ids = sorted(r.doc_id for r in out.select("doc_id").collect())

    # brute-force replication over collected fingerprints
    fp_all = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    hist = [fp_all[i] for i in fp_all if i % 3 == 0]
    batch_fp = {i: h for i, h in fp_all.items() if i % 3 != 0}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    fresh = {
        i: h
        for i, h in batch_fp.items()
        if all(ham(h, s) > 3 for s in hist)
    }
    # within-batch: greedy union-find on <=3-bit pairs, min-id keeps
    parent = {i: i for i in fresh}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(fresh)
    for ix, i in enumerate(ids):
        for j in ids[ix + 1 :]:
            if ham(fresh[i], fresh[j]) <= 3:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    want = sorted(i for i in fresh if find(i) == i)
    assert got_ids == want and got_ids

    # matches_against alone: exactly the batch ids with a history twin
    hits = sorted(
        r.doc_id
        for r in simhash_matches_against(
            simhash(batch), stored, max_hamming=3
        ).collect()
    )
    want_hits = sorted(
        i for i, h in batch_fp.items() if any(ham(h, s) <= 3 for s in hist)
    )
    assert hits == want_hits
    assert set(got_ids).isdisjoint(hits)


def test_simhash_dedup_against_rejects_wide_radius(spark):
    import pytest

    from big_data_hadoop_spark.operators.dedup import simhash_matches_against

    fps = spark.createDataFrame([(1, 0)], "doc_id long, simhash long")
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_matches_against(fps, fps.select("simhash"), max_hamming=4)
