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


def _replica_expand_keys(
    table: str, key_cols: list[str], out_dir: str, factor: int
) -> None:
    """Replica-expand ``table`` with per-replica DISJOINT offsets on
    ``key_cols`` (offset = max+1 per key column), all other columns
    verbatim and COLUMN ORDER preserved. Disjoint keys make each
    replica its own component/key-space, so downstream workloads
    (graphs, per-key grids) scale exactly linearly by construction —
    the same provably-linear-workload property the documents
    expansion has for dedup pairs."""
    t = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
    n = t.num_rows
    keys = {c: t.column(c).to_numpy() for c in key_cols}
    offs = {c: int(v.max()) + 1 for c, v in keys.items()}
    parts = []
    for k in range(factor):
        cols = {
            c: (
                pa.array(keys[c] + k * offs[c], type=pa.int64())
                if c in keys
                else t.column(c)
            )
            for c in t.column_names
        }
        parts.append(pa.table(cols))
    out = pa.concat_tables(parts)
    pq.write_table(out, os.path.join(out_dir, f"{table}.parquet"))
    print(f"{table}: {n} -> {out.num_rows} rows")


def scale_lineitem(out_dir: str, factor: int) -> None:
    """Graph probes (q94 triangles): offsetting BOTH l_orderkey and
    l_partkey makes the co-purchase graph ``factor`` isomorphic
    disjoint components — triangle counts and degree distributions
    scale exactly linearly."""
    _replica_expand_keys(
        "lineitem", ["l_orderkey", "l_partkey"], out_dir, factor
    )


def scale_events(out_dir: str, factor: int) -> None:
    """Time-series probes (q95 resample): disjoint user_id offsets
    with timestamps unchanged — ``factor``× the keys with identical
    per-key series shape, grid rows exactly linear."""
    _replica_expand_keys("events", ["event_id", "user_id"], out_dir, factor)


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
