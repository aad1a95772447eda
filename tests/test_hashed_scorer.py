"""Value oracle for ``textstats.hashed_linear_scores`` (fastText-style
hashed linear scorer): Spark supplies only the xxhash64 primitive (same
pattern as the q51 simhash value test); bucketing, mean, and sigmoid are
recomputed in pure Python with the identical left-fold order, so scores
must agree to the last few ulps.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.textstats import hashed_linear_scores
from big_data_hadoop_spark.sources.io import load_table

SF_SMOKE = "/root/testdata/sf0.001"

DIM = 1024
WEIGHTS = [((i * 2654435761) % 1000) / 1000 - 0.5 for i in range(DIM)]
BIAS = 0.1


def _tok_hashes(spark, docs):
    return {
        r.t: r.h
        for r in docs.select(
            F.explode(F.split(F.lower("text"), " ", -1)).alias("t")
        )
        .filter(F.col("t") != "")
        .distinct()
        .select("t", F.xxhash64("t").alias("h"))
        .collect()
    }


def _py_score(text: str, tok_hash: dict[str, int]) -> float:
    toks = [t for t in text.lower().split(" ") if t != ""]
    acc = 0.0
    for t in toks:
        acc = acc + WEIGHTS[tok_hash[t] % DIM]
    mean = acc / max(len(toks), 1)
    return 1.0 / (1.0 + math.exp(-(mean + BIAS)))


def test_scores_match_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").cache()
    tok_hash = _tok_hashes(spark, docs)
    got = {
        r["doc_id"]: r["score"]
        for r in hashed_linear_scores(docs, WEIGHTS, bias=BIAS).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        assert got[doc_id] == pytest.approx(
            _py_score(text, tok_hash), abs=1e-14
        ), doc_id


def test_empty_doc_scores_sigmoid_bias(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "word")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in hashed_linear_scores(df, WEIGHTS, bias=BIAS).collect()
    }
    expect_empty = 1.0 / (1.0 + math.exp(-BIAS))
    assert got[1] == pytest.approx(expect_empty, abs=1e-15)
    assert got[2] == pytest.approx(expect_empty, abs=1e-15)
    assert 0.0 < got[3] < 1.0


def test_scores_bounded_and_empty_weights_rejected(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    rows = hashed_linear_scores(docs, WEIGHTS, bias=BIAS).collect()
    assert all(0.0 < r["score"] < 1.0 for r in rows)
    with pytest.raises(ValueError):
        hashed_linear_scores(docs, [])


def test_plan_has_no_shuffle(spark):
    """One-scan contract: scoring must not plan any exchange (the
    weights arrive by broadcast, the fold is per-row)."""
    from big_data_hadoop_spark.plans.audit import formatted_plan

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    plan = formatted_plan(hashed_linear_scores(docs, WEIGHTS, bias=BIAS))
    # the ONLY exchange is the broadcast carrying the weight vector
    for shuffle_marker in ("hashpartitioning", "rangepartitioning", "SinglePartition"):
        assert shuffle_marker not in plan, plan
    assert "BroadcastExchange" in plan
