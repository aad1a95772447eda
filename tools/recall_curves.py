"""Measure retrieval-ANN recall@k curves at the REGISTERED probe
settings — the round-12 completion of the measured-recall table
(round 11 recorded the IVF curve; this script adds the hyperplane-LSH
(q52) and PQ / IVF-PQ (q69) tiers, and can re-run IVF so all curves
come from one reproducible place) — plus the two round-12 recall
LEVERS the first measurement motivated: the LSH multi-table
OR-construction (``n_tables`` at the registered 8 planes) and the
exact re-rank of the PQ / IVF-PQ ADC shortlist (``pq_refine``,
IVFADC+R — the response to the measured quantization ceiling).

Method: ``operators.similarity.topk_recall_audit`` — the same queries
through the exact brute-force twin and the ANN path, per-query SET
recall@k (strict: identical deterministic tie-breaks both sides, a
tie-boundary substitution counts as a miss). Queries are a fixed
xxhash64-ordered sample of corpus ids (seed 0 — the audit verbs'
sampling idiom: deterministic, layout-independent, same cost at every
corpus size). Exact twins match each tier's OWN metric: cosine top-k
for LSH/IVF (both self-excluding), squared-L2 top-k for PQ/IVF-PQ
(self included — ``pq_search`` scores external query vectors against
the whole code table, q69 feeds it corpus rows).

Index parameters are the registered probe values (dim=64; LSH
num_planes=8 at q52, swept 4/8/12/16; PQ m=4, k=16, seed=7,
max_iter=4 at q69, m swept 2/4/8; IVF-PQ adds n_cells=16/seed=42
coarse cells, n_probe swept). Prints one JSON line per measured
point; paste the table into BASELINE.md.

Usage::

    python tools/recall_curves.py [sf_dir]   # default /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from big_data_hadoop_spark.operators import similarity as sim  # noqa: E402
from big_data_hadoop_spark.operators.pq import (  # noqa: E402
    ivfpq_build,
    ivfpq_search,
    pq_encode,
    pq_refine,
    pq_search,
    pq_train,
)
from big_data_hadoop_spark.session import configure_runtime  # noqa: E402

DIM = 64
K = 10
N_QUERIES = 32


def _l2_topk(emb, queries, k):
    """Exact squared-L2 top-k of external query vectors against the
    corpus — PQ's brute-force twin (same metric ADC approximates, same
    (dist asc, id asc) tie-break as ``pq_search``, self included)."""
    e = sim._flat(emb, "vec_id", "embedding", DIM, "_a")
    q = sim._flat(queries, "query_id", "embedding", DIM, "_b").select(
        "query_id", *[f"_b{i}" for i in range(1, DIM + 1)]
    )
    d2 = F.lit(0.0)
    for i in range(1, DIM + 1):
        t = F.col(f"_b{i}") - F.col(f"_a{i}")
        d2 = d2 + t * t
    w = Window.partitionBy("query_id").orderBy(
        F.asc("d2"), F.asc("neighbor_id")
    )
    return (
        e.join(F.broadcast(q))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    configure_runtime(spark)
    emb = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    qids = [
        r.vec_id
        for r in emb.select("vec_id")
        .orderBy(F.xxhash64(F.col("vec_id"), F.lit(0)))
        .limit(N_QUERIES)
        .collect()
    ]
    qvecs = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).localCheckpoint(eager=True)

    def emit(tier, knob, value, summary):
        print(
            json.dumps(
                {
                    "tier": tier,
                    knob: value,
                    "k": K,
                    "queries": summary["queries"],
                    "macro_recall": round(summary["macro_recall"], 3),
                    "micro_recall": round(summary["micro_recall"], 3),
                    "min_recall": round(summary["min_recall"], 3),
                },
                sort_keys=True,
            )
        )

    # ---- hyperplane LSH (q52 tier; cosine metric, self-excluding) ----
    exact_cos = sim.cosine_topk(
        emb, query_ids=qids, k=K, dim=DIM
    ).localCheckpoint(eager=True)
    for planes in (4, 8, 12, 16):
        approx = sim.lsh_bucketed_topk(
            emb, query_ids=qids, k=K, dim=DIM, num_planes=planes
        )
        _pq, s = sim.topk_recall_audit(exact_cos, approx)
        emit("lsh", "num_planes", planes, s)

    # ---- LSH multi-table lever (round 12): n_tables at the
    # registered 8 planes — the OR-construction's measured gain ----
    for n_tables in (1, 2, 4, 8):
        approx = sim.lsh_bucketed_topk(
            emb, query_ids=qids, k=K, dim=DIM, num_planes=8,
            n_tables=n_tables,
        )
        _pq, s = sim.topk_recall_audit(exact_cos, approx)
        emit("lsh_multitable", "n_tables", n_tables, s)

    # ---- PQ ADC (q69 tier; squared-L2 metric, self included) ----
    exact_l2 = _l2_topk(emb, qvecs, K).localCheckpoint(eager=True)
    cb4 = codes4 = None
    for m in (2, 4, 8):
        cb = pq_train(emb, dim=DIM, m=m, k=16, seed=7, max_iter=4)
        codes = pq_encode(emb, cb)
        approx = pq_search(codes, cb, qvecs, topk=K).withColumnRenamed(
            "vec_id", "neighbor_id"
        )
        _pq, s = sim.topk_recall_audit(exact_l2, approx)
        emit("pq_adc", "m_subspaces", m, s)
        if m == 4:
            cb4, codes4 = cb, codes.localCheckpoint(eager=True)

    # ---- PQ + exact re-rank lever (round 12): shortlist sweep at
    # the registered m=4 — IVFADC+R's measured gain ----
    for mult in (1, 2, 5, 10):
        short = pq_search(codes4, cb4, qvecs, topk=K * mult)
        approx = pq_refine(short, emb, qvecs, topk=K).withColumnRenamed(
            "vec_id", "neighbor_id"
        )
        _pq, s = sim.topk_recall_audit(exact_l2, approx)
        emit("pq_refine", "shortlist", K * mult, s)

    # ---- IVF-PQ (coarse pruning over the q69 codes) ----
    idx = ivfpq_build(
        emb, dim=DIM, n_cells=16, m=4, k=16, seed=42
    )
    for n_probe in (1, 2, 4, 8, 16):
        approx = ivfpq_search(
            idx, qvecs, topk=K, n_probe=n_probe
        ).withColumnRenamed("vec_id", "neighbor_id")
        _pq, s = sim.topk_recall_audit(exact_l2, approx)
        emit("ivfpq", "n_probe", n_probe, s)

    # ---- IVF-PQ + exact re-rank (round 12): shortlist sweep at the
    # registered n_probe=4 ----
    for mult in (1, 2, 5, 10):
        short = ivfpq_search(idx, qvecs, topk=K * mult, n_probe=4)
        approx = pq_refine(short, emb, qvecs, topk=K).withColumnRenamed(
            "vec_id", "neighbor_id"
        )
        _pq, s = sim.topk_recall_audit(exact_l2, approx)
        emit("ivfpq_refine", "shortlist", K * mult, s)

    # ---- residual IVF-PQ (round 12: full IVFADC — codes quantize
    # x − c_cell; same code size, per-(query, cell) LUT) ----
    idx_res = ivfpq_build(
        emb, dim=DIM, n_cells=16, m=4, k=16, seed=42, residual=True
    )
    for n_probe in (1, 2, 4, 8, 16):
        approx = ivfpq_search(
            idx_res, qvecs, topk=K, n_probe=n_probe
        ).withColumnRenamed("vec_id", "neighbor_id")
        _pq, s = sim.topk_recall_audit(exact_l2, approx)
        emit("ivfpq_residual", "n_probe", n_probe, s)

    # ---- IVF (the r11 curve, re-runnable from the same place) ----
    for n_probe in (1, 2, 4, 8, 16):
        approx = sim.ivf_topk(
            emb, query_ids=qids, k=K, n_cells=16, n_probe=n_probe
        )
        _pq, s = sim.topk_recall_audit(exact_cos, approx)
        emit("ivf", "n_probe", n_probe, s)


if __name__ == "__main__":
    main()
