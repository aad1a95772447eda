"""Streaming perplexity scoring (``streaming_ppl_score``): the drained
stream must reproduce the batch ``ngram_lm_score`` result exactly on
the documents that have bigram events (the documented divergence: a
stream cannot emit rows for event-less documents)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.ngram_lm import ngram_lm_score, ngram_lm_train
from big_data_hadoop_spark.sources.io import load_table
from big_data_hadoop_spark.streaming import streaming_ppl_score
from tests.conftest import SF_SMOKE


def test_streaming_ppl_equals_batch_when_drained(spark, tmp_path):
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .withColumn(
            "ts",
            F.timestamp_micros(
                (F.col("doc_id") + F.lit(1_700_000_000)) * 1_000_000
            ),
        )
    )
    lm = ngram_lm_train(docs.filter("doc_id % 2 = 0"))
    src = str(tmp_path / "ppl_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(src)
    q = (
        streaming_ppl_score(stream, lm)
        .writeStream.format("memory")
        .queryName("ppl_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_ppl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"])
        for r in spark.sql("SELECT * FROM ppl_stream").collect()
    }
    batch = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"])
        for r in ngram_lm_score(docs, lm).collect()
        if r["n_bigrams"] > 0
    }
    assert set(got) == set(batch)
    assert len(got) > 0
    for d, (nb, nll, ppl) in batch.items():
        g_nb, g_nll, g_ppl = got[d]
        assert g_nb == nb, d
        assert g_nll == pytest.approx(nll, rel=1e-9), d
        assert g_ppl == pytest.approx(ppl, rel=1e-9), d
