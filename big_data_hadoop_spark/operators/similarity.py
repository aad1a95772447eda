"""Embedding similarity search over ``embeddings(vec_id, embedding, label)``.

Cosine arithmetic is done entirely with array higher-order functions in
DOUBLE precision with a fixed left-fold order (``0.0 + t1 + t2 + ...``), so
results are bit-identical to any engine evaluating the same left-associated
expression — the DuckDB oracle needs no rounding tolerance.

Scale design:
- ``cosine_topk`` broadcasts the (small) query set against the full corpus:
  a broadcast nested-loop join followed by a per-query top-k window — the
  corpus is scanned once, never shuffled.
- ``cosine_neardup_pairs`` is the brute-force all-pairs baseline (the
  verification primitive).
- ``lsh_bucketed_topk`` is the 100 TB path: random-hyperplane signatures
  bucket the corpus so candidates meet on an equi-join of short signature
  keys instead of a cross join; exact cosine re-ranks within buckets.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product: ``((0.0 + a1*b1) + a2*b2) + ...``"""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def with_norm(
    df: DataFrame, vec_col: str = "embedding", out: str = "nrm"
) -> DataFrame:
    emb = _as_double(F.col(vec_col))
    return df.withColumn("emb_d", emb).withColumn(out, norm(F.col("emb_d")))


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs ``(vec_a, vec_b, sim)`` with ``vec_a < vec_b`` and cosine
    ``sim >= threshold``. Brute force — the exact baseline/verifier."""
    e = with_norm(
        df.select(F.col(id_col), F.col(vec_col)), vec_col=vec_col
    ).select(F.col(id_col), "emb_d", "nrm")
    a, b = e.alias("a"), e.alias("b")
    sim = dot(F.col("a.emb_d"), F.col("b.emb_d")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query id: ``(query_id, neighbor_id,
    sim)``, deterministic (tie-break on neighbor id).

    The query side is filtered then broadcast; the corpus side streams
    through a single scan. The per-query top-k is a rank window partitioned
    by query — k rows per query survive.
    """
    e = with_norm(df.select(F.col(id_col), F.col(vec_col)), vec_col=vec_col).select(
        F.col(id_col), "emb_d", "nrm"
    )
    q = e.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("emb_d").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    sim = dot(F.col("q_emb"), F.col("emb_d")) / (F.col("q_nrm") * F.col("nrm"))
    scored = (
        e.join(F.broadcast(q), F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            sim.alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    num_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature (one int, ``num_planes`` bits).

    Hyperplane coefficients are a deterministic pseudo-random stream
    (sin-based, seeded) materialized as plan literals — every executor sees
    identical planes without any broadcast variable.
    """
    planes = []
    for p in range(num_planes):
        coeffs = [
            math.sin(seed + p * 1009 + i * 9176) for i in range(dim)
        ]
        planes.append(F.array(*[F.lit(c) for c in coeffs]))
    emb = _as_double(F.col(vec_col))
    bits = [
        F.when(dot(emb, plane) >= 0, F.shiftleft(F.lit(1), p)).otherwise(0)
        for p, plane in enumerate(planes)
    ]
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return df.select(F.col(id_col), F.col(vec_col), sig.alias("bucket"))


def lsh_bucketed_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int = 64,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's hyperplane
    bucket (equi-join on ``bucket``), exact cosine re-rank within.

    The 100 TB shape: corpus shuffled once by short bucket key; no cross
    join. Recall is tunable via ``num_planes`` (fewer planes → bigger
    buckets → higher recall, more compute).
    """
    sigs = hyperplane_signatures(
        df, dim=dim, num_planes=num_planes, id_col=id_col, vec_col=vec_col
    )
    e = with_norm(sigs, vec_col=vec_col).select(F.col(id_col), "bucket", "emb_d", "nrm")
    q = e.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("bucket").alias("q_bucket"),
        F.col("emb_d").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    sim = dot(F.col("q_emb"), F.col("emb_d")) / (F.col("q_nrm") * F.col("nrm"))
    scored = e.join(
        F.broadcast(q),
        (F.col("q_bucket") == F.col("bucket"))
        & (F.col("query_id") != F.col(id_col)),
    ).select("query_id", F.col(id_col).alias("neighbor_id"), sim.alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )
