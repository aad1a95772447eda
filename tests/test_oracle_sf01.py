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
