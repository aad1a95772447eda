"""Empty- and degenerate-input hardening: every major operator must
return an empty (or tiny-but-correct) result on a 0-row frame, never
throw. At pipeline scale an empty partition/source is routine (a filter
that matched nothing, a new date partition), and IVF's KMeans fit was
observed to abort on both the empty and the fewer-rows-than-cells
cases before the clamp."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label string"
    )


def test_text_operators_empty(spark, empty_docs):
    from big_data_hadoop_spark.operators import dedup, textstats
    from big_data_hadoop_spark.operators.counts import token_counts
    from big_data_hadoop_spark.pipeline import (
        chunk_documents,
        curate_training_data,
        redact_pii,
        sample_to_token_budget,
    )

    assert token_counts(empty_docs).count() == 0
    assert dedup.exact_dedup(empty_docs).count() == 0
    assert dedup.minhash_lsh_pairs(empty_docs).count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs).count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs, method="prefix").count() == 0
    assert dedup.simhash_neardup_pairs(empty_docs).count() == 0
    assert textstats.winnow_fingerprints(empty_docs).count() == 0
    assert curate_training_data(empty_docs).count() == 0
    assert sample_to_token_budget(empty_docs, 100).count() == 0
    assert chunk_documents(empty_docs, 10).count() == 0
    assert redact_pii(empty_docs).count() == 0


def test_similarity_operators_empty(spark, empty_emb):
    from big_data_hadoop_spark.operators import similarity as sim

    assert sim.cosine_neardup_pairs(empty_emb, dim=64).count() == 0
    assert sim.cosine_topk(empty_emb, [1, 2], dim=64).count() == 0
    assert sim.lsh_bucketed_topk(empty_emb, [1, 2], dim=64).count() == 0
    out = sim.ivf_topk(empty_emb, [1, 2])
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "sim",
    ]


def test_ivf_fewer_rows_than_cells(spark):
    """k must clamp to the corpus size: 3 vectors, 16 requested cells."""
    from big_data_hadoop_spark.operators import similarity as sim

    tiny = spark.createDataFrame(
        [(i, [float(i + 1)] * 8 + [0.0] * 0, "x") for i in range(3)],
        "vec_id long, embedding array<double>, label string",
    )
    rows = sim.ivf_topk(tiny, [0], k=5, n_cells=16, n_probe=16).collect()
    # full probe of every (clamped) cell == exact: both other vectors found
    assert {r.neighbor_id for r in rows} == {1, 2}
    # the n_rows fast path clamps identically
    rows2 = sim.ivf_topk(
        tiny, [0], k=5, n_cells=16, n_probe=16, n_rows=3
    ).collect()
    assert {r.neighbor_id for r in rows2} == {1, 2}

def test_ivf_n_cells_near_train_cap_sampled_path(spark):
    """ADVICE r3: with n_rows > train_cap the hash-modulus sample keeps a
    BINOMIAL (~n/modulus) number of rows; when n_cells is near train_cap
    the arithmetic 'available = n_cells' guess can exceed the actual
    sample and abort KMeans. The guard must fall back to a LIMIT-count
    and clamp k. Here: 60 rows, cap 50 -> modulus 2 keeps ~30 rows, yet
    n_cells=40 is requested; the fit must clamp, not abort."""
    from big_data_hadoop_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(i, [float((i * 13) % 7 + 1), float(i % 5)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    rows = sim.ivf_topk(
        df, [0], k=3, n_cells=40, n_probe=40,
        train_cap=50, n_rows=60,
    ).collect()
    assert 0 < len(rows) <= 3


def test_round5_operators_empty(spark, empty_docs, empty_emb):
    from big_data_hadoop_spark.operators import similarity as sim
    from big_data_hadoop_spark.operators.dedup import (
        dedup_by_clusters,
        duplicate_clusters,
    )
    from big_data_hadoop_spark.operators.multimodal import (
        extract_audio_features,
    )
    from big_data_hadoop_spark.operators.textstats import winnow_neardup_pairs
    from big_data_hadoop_spark.pipeline import materialize_packs

    assert winnow_neardup_pairs(empty_docs).count() == 0
    assert materialize_packs(empty_docs, 128).count() == 0

    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert duplicate_clusters(empty_pairs).count() == 0
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    # empty pair graph: the dedup action keeps everything
    assert dedup_by_clusters(docs, empty_pairs).count() == 2

    empty_media = spark.createDataFrame(
        [], "media_id long, media_type string, payload binary"
    )
    assert extract_audio_features(empty_media).count() == 0

    empty_queries = spark.createDataFrame(
        [], "query_id long, embedding array<double>"
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], "x")], "vec_id long, embedding array<double>, label string"
    )
    assert sim.cosine_topk_vectors(emb, empty_queries).count() == 0
    idx = sim.ivf_build(emb, n_cells=2)
    assert sim.ivf_search_vectors(idx, empty_queries).count() == 0
    # empty CORPUS with external queries: empty result, stable schema
    eidx = sim.ivf_build(empty_emb)
    q1 = spark.createDataFrame(
        [(9, [0.1, 0.2])], "query_id long, embedding array<double>"
    )
    out = sim.ivf_search_vectors(eidx, q1)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "sim",
    ]


def test_round6_operators_empty(spark, empty_docs, empty_emb):
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.bm25 import bm25_index, bm25_topk
    from big_data_hadoop_spark.operators.bpe import BPEModel, bpe_encode, bpe_train
    from big_data_hadoop_spark.operators.dedup import (
        minhash_dedup_against,
        minhash_signatures,
    )
    from big_data_hadoop_spark.operators.ngram_lm import (
        ngram_lm_score,
        ngram_lm_train,
        ppl_filter,
    )
    from big_data_hadoop_spark.operators.texthygiene import (
        compression_signals,
        normalize_text,
    )
    from big_data_hadoop_spark.pipeline import corpus_profile, split_leakage_safe

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )

    # LM trained on an EMPTY reference: every probability falls to the
    # add-one floor (vocab 0, n 0 -> p_uni = 1); scoring must not throw
    lm0 = ngram_lm_train(empty_docs)
    scored = ngram_lm_score(docs, lm0).collect()
    assert {r["doc_id"] for r in scored} == {1, 2}
    # the floor is REAL, not NULL: p_uni = 1 -> nll = -ln(1-lam), finite
    import math

    for r in scored:
        assert r["ppl"] == pytest.approx(math.exp(-math.log(0.2)), rel=1e-9)
    # empty SCORED corpus: filter yields empty, cutoff agg has no rows
    assert ppl_filter(empty_docs, ngram_lm_train(docs)).count() == 0

    # BM25 over an empty corpus / empty query set
    idx0 = bm25_index(empty_docs)
    q = docs.select(F.col("doc_id").alias("query_id"), "text")
    assert bm25_topk(idx0, q).count() == 0
    idx = bm25_index(docs)
    empty_q = spark.createDataFrame([], "query_id long, text string")
    assert bm25_topk(idx, empty_q).count() == 0

    # BPE: empty merge table encodes every word to its characters
    enc = {
        r["doc_id"]: list(r["pieces"])
        for r in bpe_encode(docs, BPEModel(merges=())).collect()
    }
    assert enc[1] == ["a", "</w>", "b", "</w>", "c", "</w>"]
    # training on an empty corpus yields no merges and still encodes
    m0 = bpe_train(docs.limit(0).unionByName(empty_docs), n_merges=5)
    assert m0.merges == ()

    # hygiene / profile / split on empty frames
    assert normalize_text(empty_docs).count() == 0
    assert compression_signals(empty_docs).count() == 0
    # grouped profile: empty in, empty out; GLOBAL profile keeps SQL's
    # one-row aggregate semantics (n_docs=0, ratios NULL)
    assert corpus_profile(
        empty_docs.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("s")
        )
    ).count() == 0
    (gl,) = corpus_profile(empty_docs, group_cols=()).collect()
    assert gl["n_docs"] == 0 and gl["dup_frac"] is None
    assert split_leakage_safe(empty_docs, {"train": 1.0}).count() == 0

    # incremental minhash with an EMPTY history: nothing dropped vs
    # history; within-batch dedup still runs
    empty_sigs = minhash_signatures(empty_docs)
    out = minhash_dedup_against(docs, empty_sigs, threshold=0.9)
    assert out.count() == 2


def test_round7_operators_empty(spark, empty_docs):
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.multimodal import (
        extract_audio_spectrum,
    )
    from big_data_hadoop_spark.operators.sketches import (
        agg_state,
        agg_state_finalize,
        agg_state_merge,
        cms_build,
        cms_estimate,
        cms_merge,
    )
    from big_data_hadoop_spark.pipeline import weighted_sample

    # weighted sample: empty in -> empty out; k=0 -> empty
    wdocs = empty_docs.withColumn("w", F.lit(1.0))
    assert weighted_sample(wdocs, 5, "w").count() == 0
    docs = spark.createDataFrame(
        [(1, "a", 2.0)], "doc_id long, text string, w double"
    )
    assert weighted_sample(docs, 0, "w").count() == 0
    assert weighted_sample(docs, 0, "w", group_col="text").count() == 0

    # agg state over nothing: no groups; finalize of empty state is empty
    st0 = agg_state(wdocs, ["text"], "w")
    assert agg_state_finalize(st0).count() == 0
    assert agg_state_finalize(agg_state_merge(st0, ["text"])).count() == 0

    # CMS of an empty corpus: empty state; estimates fall to 0
    s0 = cms_build(empty_docs, "text")
    assert s0.count() == 0 and cms_merge(s0).count() == 0
    probe = spark.createDataFrame([("x",)], "text string")
    est = cms_estimate(s0, probe, "text").collect()
    assert [r.est_cnt for r in est] == [0]

    # audio spectrum over an empty media frame
    empty_media = spark.createDataFrame(
        [], "media_id long, payload binary"
    )
    assert extract_audio_spectrum(empty_media).count() == 0


def test_streaming_interval_join_empty_side(spark, tmp_path):
    """An empty right stream must not break the drained inner join —
    zero matches, schema intact."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.streaming import streaming_interval_join

    l_schema = "user_id long, l_ts timestamp, view_id long"
    r_schema = "user_id long, r_ts timestamp, click_id long"
    lsrc, rsrc = str(tmp_path / "el"), str(tmp_path / "er")
    spark.createDataFrame(
        [(1, __import__("datetime").datetime(2024, 1, 1), 1)], l_schema
    ).write.parquet(lsrc)
    spark.createDataFrame([], r_schema).write.parquet(rsrc)
    ls = spark.readStream.schema(l_schema).parquet(lsrc)
    rs = spark.readStream.schema(r_schema).parquet(rsrc)
    j = streaming_interval_join(ls, rs, watermark="1 hour")
    q = (
        j.writeStream.format("memory")
        .queryName("ssj_empty")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT * FROM ssj_empty").count() == 0
