#!/usr/bin/env python
"""Generate an sf1-scale replica of the driver testdata's ``documents``
and ``embeddings`` tables (the only tables the heavy-tail probes read)
by REPLICA EXPANSION of sf0.1 — for the cross-scale exhibit in
BASELINE.md, where the sandbox only ships sf ≤ 0.1.

Design goal: 10× the DATA with the same per-row workload structure, so
measured cost growth isolates data-proportional work. Naive
duplication would be wrong for dedup probes — every replica pair
becomes a near-duplicate and pair counts grow quadratically, a
workload no real 10× corpus has. Instead each replica gets:

- **documents**: every token prefixed with ``r<k>`` (replica index).
  Vocabularies are DISJOINT across replicas, so cross-replica
  shingle/minhash/winnow matches are zero and total near-dup pairs
  scale exactly linearly (10× corpus → 10× duplicate structure);
  within-replica text statistics (token counts, n-gram repetition,
  line structure) are unchanged.
- **embeddings**: a per-replica signed permutation of the dimensions
  (orthogonal transform — seeded numpy). Norms and WITHIN-replica
  cosines are preserved bit-for-bit in structure, cross-replica
  similarities are decorrelated — again linear growth in semantic-dup
  pairs.

Ids shift by ``k * <table row count>`` so replicas never collide.

Usage: ``python tools/scale_testdata.py [factor] [out_dir]`` (defaults
10 and ``.scaled/sf1``). Runs in plain pyarrow/numpy — no Spark.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")


def scale_documents(out_dir: str, factor: int) -> None:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    n = t.num_rows
    doc_id = t.column("doc_id").to_numpy()
    text = t.column("text").to_pylist()
    lang = t.column("lang")
    source = t.column("source")
    parts = []
    for k in range(factor):
        if k == 0:
            new_text = text
        else:
            pre = f"r{k}"
            # prefix every token (single-space contract); empties kept
            new_text = [
                " ".join(pre + w if w else w for w in s.split(" "))
                for s in text
            ]
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(doc_id + k * n, type=pa.int64()),
                    "text": pa.array(new_text, type=pa.string()),
                    "lang": lang,
                    "source": source,
                    "n_chars": pa.array(
                        [len(s) for s in new_text], type=pa.int64()
                    ),
                }
            )
        )
    out = pa.concat_tables(parts)
    pq.write_table(out, os.path.join(out_dir, "documents.parquet"))
    print(f"documents: {n} -> {out.num_rows} rows")


def scale_embeddings(out_dir: str, factor: int) -> None:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    n = t.num_rows
    vec_id = t.column("vec_id").to_numpy()
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    label = t.column("label")
    dim = emb.shape[1]
    rng = np.random.default_rng(20260814)
    parts = []
    for k in range(factor):
        if k == 0:
            e = emb
        else:
            perm = rng.permutation(dim)
            signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
            e = emb[:, perm] * signs  # signed permutation: orthogonal
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(vec_id + k * n, type=pa.int64()),
                    "embedding": pa.array(
                        [row.tolist() for row in e],
                        type=pa.list_(pa.float32()),
                    ),
                    "label": label,
                }
            )
        )
    out = pa.concat_tables(parts)
    pq.write_table(out, os.path.join(out_dir, "embeddings.parquet"))
    print(f"embeddings: {n} -> {out.num_rows} rows")


def scale_lineitem(out_dir: str, factor: int) -> None:
    """Replica-expand lineitem for the graph probes (q94 triangles):
    per-replica DISJOINT key offsets on both l_orderkey and l_partkey,
    so the co-purchase graph becomes ``factor`` isomorphic disjoint
    components — triangle counts and degree distributions scale
    EXACTLY linearly by construction (the same provably-linear-
    workload property the documents expansion has for dedup pairs)."""
    t = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    n = t.num_rows
    okey = t.column("l_orderkey").to_numpy()
    pkey = t.column("l_partkey").to_numpy()
    off_o = int(okey.max()) + 1
    off_p = int(pkey.max()) + 1
    others = {
        c: t.column(c)
        for c in t.column_names
        if c not in ("l_orderkey", "l_partkey")
    }
    parts = []
    for k in range(factor):
        parts.append(
            pa.table(
                {
                    "l_orderkey": pa.array(
                        okey + k * off_o, type=pa.int64()
                    ),
                    "l_partkey": pa.array(
                        pkey + k * off_p, type=pa.int64()
                    ),
                    **others,
                }
            )
        )
    out = pa.concat_tables(parts)
    pq.write_table(out, os.path.join(out_dir, "lineitem.parquet"))
    print(f"lineitem: {n} -> {out.num_rows} rows")


def scale_events(out_dir: str, factor: int) -> None:
    """Replica-expand events for the time-series probes (q95
    resample): per-replica disjoint user_id offsets, timestamps
    unchanged — 10× the keys with identical per-key series shape, so
    grid rows and fill work scale exactly linearly."""
    t = pq.read_table(os.path.join(SRC, "events.parquet"))
    n = t.num_rows
    uid = t.column("user_id").to_numpy()
    eid = t.column("event_id").to_numpy()
    off_u = int(uid.max()) + 1
    off_e = int(eid.max()) + 1
    others = {
        c: t.column(c)
        for c in t.column_names
        if c not in ("user_id", "event_id")
    }
    parts = []
    for k in range(factor):
        parts.append(
            pa.table(
                {
                    "event_id": pa.array(eid + k * off_e, type=pa.int64()),
                    "user_id": pa.array(uid + k * off_u, type=pa.int64()),
                    **others,
                }
            )
        )
    out = pa.concat_tables(parts)
    pq.write_table(out, os.path.join(out_dir, "events.parquet"))
    print(f"events: {n} -> {out.num_rows} rows")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else ".scaled/sf1"
    os.makedirs(out_dir, exist_ok=True)
    scale_documents(out_dir, factor)
    scale_embeddings(out_dir, factor)
    scale_lineitem(out_dir, factor)
    scale_events(out_dir, factor)


if __name__ == "__main__":
    main()
