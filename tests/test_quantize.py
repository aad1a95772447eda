"""int8 embedding quantization (``similarity.quantize_embeddings``):
numpy replication of the quantize/dequantize round-trip, per-component
error bound, cosine preservation on the real embeddings, and the
zero-vector edge."""

from __future__ import annotations

import numpy as np

from big_data_hadoop_spark.operators.similarity import (
    dequantize_embeddings,
    quantize_embeddings,
)
from big_data_hadoop_spark.sources.io import load_table
from tests.conftest import SF_ORACLE


def test_quantize_matches_numpy_and_preserves_cosine(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings").limit(200)
    orig = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    got = {
        r.vec_id: (r.scale, np.array(r.qvec, dtype=np.int64))
        for r in quantize_embeddings(emb).collect()
    }
    deq = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in dequantize_embeddings(quantize_embeddings(emb)).collect()
    }
    assert got.keys() == orig.keys()
    for vid, v in orig.items():
        scale, q = got[vid]
        want_scale = np.abs(v).max() / 127.0
        assert scale == np.float64(want_scale) or abs(
            scale - want_scale
        ) < 1e-15
        want_q = np.clip(
            np.round(v / scale) if scale > 0 else np.zeros_like(v),
            -127,
            127,
        ).astype(np.int64)
        # Spark's round() is HALF_UP on .5 ties; numpy rounds half to
        # even — allow the tie components to differ by exactly 1
        diff = np.abs(q - want_q)
        assert diff.max() <= 1 and (diff > 0).mean() < 0.05, vid
        assert np.abs(q).max() <= 127
        # reconstruction error bound: scale/2 per component (+1 tie)
        assert np.abs(deq[vid] - v).max() <= scale * 1.51
        # cosine preservation
        d = deq[vid]
        cos = d @ v / (np.linalg.norm(d) * np.linalg.norm(v))
        assert cos > 0.999, (vid, cos)


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    q = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert q[1].scale == 0.0 and list(q[1].qvec) == [0, 0, 0]
    assert q[2].qvec[1] == -127
    d = {
        r.vec_id: list(r.embedding)
        for r in dequantize_embeddings(quantize_embeddings(df)).collect()
    }
    assert d[1] == [0.0, 0.0, 0.0]
    assert abs(d[2][1] + 2.0) < 2.0 / 127


def test_quantize_nan_vector_visibly_corrupt(spark):
    """A NaN component must NOT saturate the vector to +127s (Spark
    treats NaN as the largest double): scale publishes as NaN with an
    all-zero qvec, and dequantize round-trips to NaN (review
    finding)."""
    import math

    df = spark.createDataFrame(
        [(1, [1.0, float("nan"), -2.0])],
        "vec_id long, embedding array<double>",
    )
    r = quantize_embeddings(df).collect()[0]
    assert math.isnan(r.scale) and list(r.qvec) == [0, 0, 0]
    d = dequantize_embeddings(quantize_embeddings(df)).collect()[0]
    assert all(math.isnan(x) for x in d.embedding)
