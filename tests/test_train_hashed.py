"""Trained quality classifier (``textstats.train_hashed_linear``):
distributed full-batch logistic GD over hashed mean-TF features must
match a pure-numpy replication of the IDENTICAL algorithm (same
featurization — Spark supplies only the xxhash64 primitive, same
epochs/lr), separate a synthetic labeled corpus, and round-trip through
save/load. Scoring stays the existing UDF-free ``hashed_linear_scores``
path.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.textstats import (
    hashed_linear_load,
    hashed_linear_save,
    hashed_linear_scores,
    train_hashed_linear,
)

DIM = 256
EPOCHS = 25
LR = 2.0

GOOD_WORDS = ["clear", "concise", "sourced", "verified", "coherent"]
BAD_WORDS = ["spam", "clickbait", "gibberish", "scraped", "boiler"]
NEUTRAL = ["the", "and", "report", "data", "note"]


def _corpus():
    """Deterministic synthetic labeled set: good docs draw mostly good
    words, bad docs mostly bad; both share neutral filler."""
    rows = []
    for i in range(120):
        good = i % 2 == 0
        pool = GOOD_WORDS if good else BAD_WORDS
        toks = [
            pool[(i * 7 + j) % len(pool)] if j % 3 != 2
            else NEUTRAL[(i + j) % len(NEUTRAL)]
            for j in range(12)
        ]
        rows.append((i, " ".join(toks), 1 if good else 0))
    return rows


def _tok_buckets(spark, texts):
    toks = sorted({t for _, txt, _ in texts for t in txt.split(" ") if t})
    tdf = spark.createDataFrame([(t,) for t in toks], "t string")
    return {
        r.t: r.h % DIM
        for r in tdf.select("t", F.xxhash64("t").alias("h")).collect()
    }


def _numpy_train(rows, bucket_of):
    """Bit-level replication of the trainer's math in numpy: mean-TF
    features, full-batch logistic gradient, same epochs/lr."""
    n = len(rows)
    X = np.zeros((n, DIM))
    y = np.zeros(n)
    for i, (_, txt, lab) in enumerate(rows):
        toks = [t for t in txt.lower().split(" ") if t]
        for t in toks:
            X[i, bucket_of[t]] += 1.0 / max(len(toks), 1)
        y[i] = lab
    w = np.zeros(DIM)
    b = 0.0
    for _ in range(EPOCHS):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        e = p - y
        w = w - LR * (X.T @ e) / n
        b = b - LR * e.sum() / n
    return w, b


def test_trained_model_matches_numpy_replication(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    model = train_hashed_linear(
        df, label_col="label", dim=DIM, epochs=EPOCHS, lr=LR
    )
    w_np, b_np = _numpy_train(rows, _tok_buckets(spark, rows))
    assert model.bias == pytest.approx(b_np, abs=1e-9)
    got = np.array(model.weights)
    assert np.allclose(got, w_np, atol=1e-9), (
        np.abs(got - w_np).max()
    )


def test_trained_model_separates_and_scores_udf_free(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    model = train_hashed_linear(
        df, label_col="label", dim=DIM, epochs=EPOCHS, lr=LR
    )
    scored = hashed_linear_scores(df, model.weights, bias=model.bias)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    labels = {i: lab for i, _, lab in rows}
    correct = sum(
        1
        for r in scored.collect()
        if (r.score >= 0.5) == (labels[r.doc_id] == 1)
    )
    assert correct >= 0.95 * len(rows), correct


def test_model_save_load_roundtrip(spark, tmp_path):
    rows = _corpus()[:40]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    model = train_hashed_linear(
        df, label_col="label", dim=64, epochs=5, lr=1.0
    )
    path = str(tmp_path / "qmodel")
    hashed_linear_save(model, path)
    back = hashed_linear_load(spark, path)
    assert back.bias == model.bias
    assert back.weights == pytest.approx(model.weights, abs=0)
    a = hashed_linear_scores(df, model.weights, bias=model.bias).collect()
    b = hashed_linear_scores(df, back.weights, bias=back.bias).collect()
    assert sorted((r.doc_id, r.score) for r in a) == sorted(
        (r.doc_id, r.score) for r in b
    )


def test_trainer_rejects_degenerate_inputs(spark):
    df = spark.createDataFrame([(1, "x", 1)], "doc_id long, text string, label int")
    with pytest.raises(ValueError):
        train_hashed_linear(df, dim=0)
    with pytest.raises(ValueError):
        train_hashed_linear(df, epochs=0)
    with pytest.raises(ValueError, match="2\\*\\*22 training budget"):
        # past-budget dim refuses BEFORE touching the data — the
        # gradient collect would be dim+1 driver rows per epoch
        train_hashed_linear(df, dim=1 << 24)
    empty = df.filter("doc_id < 0")
    with pytest.raises(ValueError, match="empty"):
        train_hashed_linear(empty)


def test_l2_shrinks_weights(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    plain = train_hashed_linear(df, dim=DIM, epochs=10, lr=LR)
    ridge = train_hashed_linear(df, dim=DIM, epochs=10, lr=LR, l2=0.05)
    assert float(np.abs(ridge.weights).sum()) < float(
        np.abs(plain.weights).sum()
    )


def test_q84_probe_learns_the_signal(spark):
    """The q84 registry probe trains on a deterministic learnable label
    (balanced doc_id-parity classes, each marked by a qgood/qbad
    marker token over shared filler) — the returned scores must
    separate the two classes on the training corpus itself (in-sample,
    so high accuracy is the correctness bar, not a generalization
    claim)."""
    from big_data_hadoop_spark.probes import QUERIES
    from tests.conftest import SF_ORACLE

    rows = QUERIES["q84_trained_quality"](spark, SF_ORACLE).collect()
    assert rows
    correct = sum(1 for r in rows if (r.score >= 0.5) == (r.label == 1))
    assert correct >= 0.9 * len(rows), (correct, len(rows))
