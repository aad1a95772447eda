"""Full oracle battery at sf0.1 — opt-in (SPARK_GRAFT_FULL_ORACLE=1).

The default suite verifies every probe against DuckDB at sf0.01 (the
driver's scale). Some defects only surface with more data: the round-2
minhash permutation bug (monotone ``a*h+b`` family) passed every sf0.01
check and lost 5 of 249 true pairs at sf0.1. This module re-runs the
whole oracle set at sf0.1; it adds ~5 minutes, so it is skipped unless
explicitly requested:

    SPARK_GRAFT_FULL_ORACLE=1 python -m pytest tests/test_oracle_sf01.py
"""

from __future__ import annotations

import os

import pytest

from big_data_hadoop_spark.probes import ORACLES, QUERIES
from tests.oracle_utils import assert_frames_match

SF_BENCH = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_FULL_ORACLE") != "1",
    reason="sf0.1 oracle battery is opt-in (SPARK_GRAFT_FULL_ORACLE=1)",
)


@pytest.fixture(scope="module")
def duck_sf01():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_BENCH}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_probe_matches_oracle_at_sf01(spark, duck_sf01, name):
    spark_pdf = QUERIES[name](spark, SF_BENCH).toPandas()
    duck_pdf = duck_sf01.sql(ORACLES[name]).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


def test_pipeline_ops_at_sf01(spark, duck_sf01):
    """Round-3 non-probe operators at bench scale: curation funnel vs
    its DuckDB re-implementation, chunking vs the LATERAL oracle, and
    the token-budget sampler's Python greedy-walk equality."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.pipeline import (
        chunk_documents,
        curate_training_data,
        sample_to_token_budget,
    )
    from big_data_hadoop_spark.sources.io import load_table
    from tests.test_pipeline import _ORACLE, MIN_ALPHA, MIN_TOKENS

    docs = load_table(spark, SF_BENCH, "documents")
    got = (
        curate_training_data(
            docs, min_tokens=MIN_TOKENS, min_alpha_ratio=MIN_ALPHA
        )
        .select("doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    exp = duck_sf01.sql(_ORACLE).df()
    assert len(got) > 0
    assert_frames_match(got, exp, "curation_sf01")

    n_docs = docs.count()
    assert chunk_documents(docs, 64, overlap=8).count() > n_docs

    budget = 200_000
    rows = docs.select(
        "doc_id",
        F.xxhash64("doc_id").alias("h"),
        F.size(F.split(F.lower("text"), " ", -1)).cast("long").alias("n"),
    ).collect()
    order = sorted(rows, key=lambda r: (r.h % 64, r.h, r.doc_id))
    expect_ids, running = set(), 0
    for r in order:
        if running < budget:
            expect_ids.add(r.doc_id)
        running += r.n
    got_ids = {
        r.doc_id for r in sample_to_token_budget(docs, budget).collect()
    }
    assert got_ids == expect_ids


def test_round5_ops_at_sf01(spark):
    """Round-5 operators at bench scale: winnow near-dup pairs vs a
    pandas recomputation from the fingerprint relation, pack
    materialization vs the sequential greedy fill, and cluster
    resolution vs union-find over the same pair relation."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.dedup import (
        duplicate_clusters,
        minhash_lsh_pairs,
    )
    from big_data_hadoop_spark.operators.textstats import (
        winnow_fingerprints,
        winnow_neardup_pairs,
    )
    from big_data_hadoop_spark.pipeline import materialize_packs
    from big_data_hadoop_spark.sources.io import load_table
    from tests.test_clusters import _union_find

    docs = load_table(spark, SF_BENCH, "documents")

    # winnow pairs (probe setting k=12, w=8) — Python inverted index,
    # not the O(n^2) doc loop (too slow at 5k docs)
    fps = winnow_fingerprints(docs, k=12, w=8).toPandas()
    fp_sets = {int(d): set(g["fp"]) for d, g in fps.groupby("doc_id")}
    postings: dict[int, list[int]] = {}
    for d, s in fp_sets.items():
        for fp in s:
            postings.setdefault(fp, []).append(d)
    shared: dict[tuple[int, int], int] = {}
    for ids_with_fp in postings.values():
        ids_with_fp.sort()
        for i, a in enumerate(ids_with_fp):
            for b in ids_with_fp[i + 1 :]:
                shared[(a, b)] = shared.get((a, b), 0) + 1
    expect = {
        p: sh
        for p, sh in shared.items()
        if sh / min(len(fp_sets[p[0]]), len(fp_sets[p[1]])) >= 0.5
    }
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_neardup_pairs(docs, k=12, w=8, threshold=0.5).collect()
    }
    assert got == expect

    # pack materialization: greedy-fill totals and reconstruction bounds
    ctx = 2048
    packs = materialize_packs(docs, ctx).collect()
    assert packs and all(p.token_count <= ctx for p in packs)
    n_docs = docs.count()
    assert sum(p.n_docs for p in packs) == n_docs
    for p in packs:
        assert len(p.payload.split(" ")) == p.token_count or p.token_count == 0

    # clusters vs union-find
    pairs_df = minhash_lsh_pairs(docs, threshold=0.7)
    pairs = [(r.id_a, r.id_b) for r in pairs_df.collect()]
    got_cl = {
        r.member_id: r.cluster_id
        for r in duplicate_clusters(pairs_df).collect()
    }
    assert got_cl == _union_find(pairs)


def test_round6_ops_at_sf01(spark, duck_sf01):
    """This round's operators at bench scale: LM scoring vs the Python
    replication, corpus profile vs DuckDB, cluster-atomic splits,
    cross-run minhash dedup's replant invariant, PQ encode equality,
    BM25 vs the Python index, and the BPE roundtrip."""
    import numpy as np
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.bm25 import bm25_index, bm25_topk
    from big_data_hadoop_spark.operators.bpe import EOW, bpe_encode, bpe_train
    from big_data_hadoop_spark.operators.dedup import (
        duplicate_clusters,
        minhash_dedup_against,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from big_data_hadoop_spark.operators.ngram_lm import (
        ngram_lm_score,
        ngram_lm_train,
    )
    from big_data_hadoop_spark.operators.pq import pq_encode, pq_train
    from big_data_hadoop_spark.pipeline import corpus_profile, split_leakage_safe
    from big_data_hadoop_spark.sources.io import load_table
    from tests.test_ngram_lm import _py_score, _py_train
    from tests.test_pq import _np_codebook, _np_encode
    from tests.test_profile import ORACLE as PROFILE_ORACLE

    docs = load_table(spark, SF_BENCH, "documents").select("doc_id", "text").cache()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}

    # bigram LM
    lm = ngram_lm_train(docs.filter("doc_id % 2 = 0"))
    c1, c2, n, v = _py_train([t for d, t in texts.items() if d % 2 == 0])
    got_lm = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in ngram_lm_score(docs, lm).collect()
    }
    for d, t in texts.items():
        nb, avg, _ = _py_score(t, c1, c2, n, v)
        assert got_lm[d][0] == nb
        if avg is not None:
            assert abs(got_lm[d][1] - avg) < 1e-9 * max(abs(avg), 1)

    # corpus profile vs DuckDB at sf0.1
    full = load_table(spark, SF_BENCH, "documents")
    assert_frames_match(
        corpus_profile(full).orderBy("lang", "source").toPandas(),
        duck_sf01.sql(PROFILE_ORACLE).df(),
        "corpus_profile_sf01",
    )

    # leakage-safe split atomicity over real minhash clusters
    clusters = duplicate_clusters(minhash_lsh_pairs(docs, threshold=0.7))
    out = split_leakage_safe(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, clusters=clusters
    )
    straddle = (
        out.join(
            clusters.select(F.col("member_id").alias("doc_id"), "cluster_id"),
            "doc_id",
        )
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter("ns > 1")
        .count()
    )
    assert straddle == 0 and out.count() == docs.count()

    # cross-run minhash dedup: replanted docs always dropped
    prior = docs.filter("doc_id % 3 = 0")
    batch = docs.filter("doc_id % 3 != 0").unionByName(
        prior.orderBy("doc_id").limit(50)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    kept = {
        r["doc_id"]
        for r in minhash_dedup_against(
            batch, minhash_signatures(prior), threshold=0.9, within_batch=False
        ).select("doc_id").collect()
    }
    assert not {d for d in kept if d >= 1_000_000}

    # PQ encode equality at scale
    emb = load_table(spark, SF_BENCH, "embeddings").select("vec_id", "embedding").cache()
    cb = pq_train(emb, dim=64, m=8, k=16, seed=7)
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in emb.collect()}
    ids = sorted(vecs)
    books = _np_codebook(cb)
    want_codes = _np_encode(np.stack([vecs[i] for i in ids]), books)
    got_codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    for row, i in zip(want_codes, ids):
        assert got_codes[i] == list(row)

    # BM25: exact top-10 equality vs the Python index (self-retrieval
    # is NOT a usable signal at sf0.1 — the synthetic corpus is
    # boilerplate-heavy enough that near-duplicate cousins legitimately
    # outrank the verbatim document)
    from tests.test_bm25 import _py_bm25

    queries = docs.orderBy("doc_id").limit(10).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    got_bm: dict = {}
    for r in bm25_topk(bm25_index(docs), queries, topk=10).collect():
        got_bm.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    want_bm = _py_bm25(
        texts, {d: texts[d] for d in sorted(texts)[:10]}, topk=10
    )
    for q, ranked in want_bm.items():
        rows = [d for _, d in sorted(got_bm[q])]
        assert rows == [d for d, _ in ranked], q

    # BPE roundtrip at scale
    model = bpe_train(docs, n_merges=100)
    enc = bpe_encode(docs, model).collect()
    for r in enc:
        toks = [t for t in texts[r["doc_id"]].lower().split(" ") if t]
        assert "".join(r["pieces"]).replace(EOW, " ").split() == toks or not toks


def test_round7_ops_at_sf01(spark, duck_sf01):
    """This round's operators at bench scale: weighted-sample race
    equality vs a Python replay, group-quantile gate vs quantile_disc,
    CMS guarantee over the full vocabulary, agg-state merge == one-shot,
    corpus diff vs a SQL full-outer recomputation."""
    import math

    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.sketches import (
        agg_state,
        agg_state_finalize,
        agg_state_merge,
        cms_build,
        cms_estimate,
    )
    from big_data_hadoop_spark.operators.tokenize import tokens
    from big_data_hadoop_spark.pipeline import (
        corpus_diff,
        filter_by_group_quantile,
        weighted_sample,
    )

    docs = spark.read.parquet(f"{SF_BENCH}/documents.parquet")

    # weighted sample == Python replay of the race on the same uniforms
    den = 2**31
    rows = docs.select(
        "doc_id",
        "n_chars",
        (
            (
                F.pmod(F.xxhash64("doc_id", F.lit(0)), F.lit(den)).cast(
                    "double"
                )
                + F.lit(0.5)
            )
            / F.lit(float(den))
        ).alias("u"),
    ).collect()
    expect = {
        d
        for _, d in sorted(
            ((-math.log(r.u) / r.n_chars, r.doc_id) for r in rows)
        )[:500]
    }
    got = {
        r.doc_id for r in weighted_sample(docs, 500, "n_chars").collect()
    }
    assert got == expect

    # group-quantile gate vs DuckDB
    got_q = {
        r.doc_id
        for r in filter_by_group_quantile(
            docs, "n_chars", 0.3, group_col="source"
        ).collect()
    }
    want_q = {
        r[0]
        for r in duck_sf01.sql(
            """
        WITH c AS (SELECT source, quantile_disc(n_chars, 0.3) AS cut
                   FROM documents GROUP BY source)
        SELECT d.doc_id FROM documents d JOIN c USING (source)
        WHERE d.n_chars <= c.cut
        """
        ).fetchall()
    }
    assert got_q == want_q and got_q

    # CMS never undercounts at full-vocabulary scale
    toks = tokens(
        docs.select("doc_id", "text"), lowercase=True, keep_cols=()
    ).select("token")
    exact = toks.groupBy("token").agg(F.count("*").alias("true_cnt"))
    est = cms_estimate(cms_build(toks, "token"), exact, "token").collect()
    assert est and all(r.est_cnt >= r.true_cnt for r in est)

    # agg-state merge == one-shot at scale
    one = {
        r.source: r
        for r in agg_state_finalize(
            agg_state(docs, ["source"], "n_chars", distinct_col="lang")
        ).collect()
    }
    merged = {
        r.source: r
        for r in agg_state_finalize(
            agg_state_merge(
                agg_state(
                    docs.filter(F.col("doc_id") % 2 == 0),
                    ["source"], "n_chars", distinct_col="lang",
                ).unionByName(
                    agg_state(
                        docs.filter(F.col("doc_id") % 2 == 1),
                        ["source"], "n_chars", distinct_col="lang",
                    )
                ),
                ["source"],
            )
        ).collect()
    }
    assert one.keys() == merged.keys()
    for k in one:
        assert one[k].n_rows == merged[k].n_rows
        assert one[k].n_distinct_approx == merged[k].n_distinct_approx
        assert abs(one[k].var_samp - merged[k].var_samp) < 1e-3

    # corpus diff vs SQL
    new = docs.select("doc_id", "text").filter(F.col("doc_id") % 11 != 0)
    got_d = {
        r.doc_id: r.status
        for r in corpus_diff(docs.select("doc_id", "text"), new).collect()
    }
    want_d = {
        r[0]: r[1]
        for r in duck_sf01.sql(
            """
        WITH o AS (SELECT doc_id FROM documents),
             n AS (SELECT doc_id FROM documents WHERE doc_id % 11 != 0)
        SELECT o.doc_id,
               CASE WHEN n.doc_id IS NULL THEN 'removed'
                    ELSE 'unchanged' END AS status
        FROM o LEFT JOIN n ON o.doc_id = n.doc_id
        """
        ).fetchall()
    }
    assert got_d == want_d
