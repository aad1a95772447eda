"""Persisted, incrementally-maintained embedding store — managed
incremental SEMANTIC dedup (the round-10 completion of the incremental
tier symmetry: exact digests q64, MinHash signatures q68, SimHash
fingerprints q93, video frame hashes r09, and — here — embeddings).

THE PROBLEM THIS SOLVES: ``semantic_dedup`` (SemDeDup, Abbas et al.
2023 — public literature) dedups ONE corpus; a production ingest
pipeline needs "is this batch semantically novel vs everything already
accepted", which requires a maintained history of accepted embeddings
AND a pinned partitioning of the embedding space — re-fitting the
coarse quantizer per batch would silently move cell boundaries and
change what "duplicate" means mid-history. This store pins both under
the engine's shared immutable-batch protocol
(``sources/batch_store.py`` — one implementation, four stores):

* the IVF centroids are fitted ONCE at build (bounded sample, seeded)
  and pinned in ``meta.json``; every later batch is assigned to cells
  by the same driver-side centroids — no refit, ever;
* matching is the SemDeDup within-cell rule at the meta-pinned
  ``eps``: a batch row is a duplicate of a stored row iff they share
  a cell AND cosine >= eps (cross-cell near-dups are missed BY
  CONSTRUCTION — the paper's documented approximation, what bounds
  the quadratic);
* greedy keep-first by arrival: history rejects first, then the batch
  near-dedups within itself (within-cell pairs → connected
  components → min id), and accepted rows append as an immutable
  batch.

CELL ASSIGNMENT RULE (self-consistent, replicated in the tests):
nearest pinned centroid by squared L2, first minimum on ties. The
BUILD corpus is assigned by this same rule — not by the KMeans
model's own transform — so the stored history and every future batch
live under one rule that is a pure function of (embedding, meta).

ZERO-NORM embeddings have no cosine direction: they are DROPPED with
a count in the returned stats, never stored (the fingerprint store's
NULL-fp contract, one tier up).

100 TB shape: history is one embedding row per accepted doc (the
store's state is the accepted corpus itself — what SemDeDup needs,
nothing more); per refresh one narrow assignment pass over the batch
(k x dim multiply-adds per row, no shuffle), one within-cell equi-join
against history (flat scalar-column scoring — the measured ~10x fast
path from ``similarity._flat``), one within-batch cell join, one
immutable directory append. Hot cells are the skew lever: raise
``n_cells`` at build.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.dedup import dedup_by_clusters
from big_data_hadoop_spark.operators.similarity import (
    _as_double,
    _flat,
    _flat_dot,
    ivf_build,
)
from big_data_hadoop_spark.sources import batch_store
from big_data_hadoop_spark.sources.io import _VERB_LOCK_OPTS, table_write_lock

_HINT = "embedding_store_build"
_KINDS = ("emb",)


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``cell int``: index of the nearest pinned centroid by
    squared L2, FIRST minimum on ties (deterministic — a pure function
    of the embedding and the centroid list). One narrow pass, k x dim
    multiply-adds per row via array HOFs — this runs once per INPUT
    row; the per-PAIR hot path downstream uses the flat-column
    scoring."""
    if not centroids:
        return df.withColumn("cell", F.lit(0).cast("int"))
    cents = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in c])
            for c in centroids
        ]
    )
    emb = _as_double(F.col(vec_col))
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(emb, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return df.withColumn(
        "cell",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
    )


def _matches(
    new_assigned: DataFrame,
    stored: DataFrame,
    eps: float,
    dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Batch ids with a same-cell stored neighbor at cosine >= eps →
    one id column, distinct. Both inputs carry ``cell``; neither holds
    zero-norm rows (the store's accept fold drops them). Flat-column
    scoring below the cell equi-join — the multiplied-form threshold
    avoids a division per candidate pair."""
    na = _flat(new_assigned, id_col, vec_col, dim, "_a", extra=("cell",))
    sb = (
        _flat(
            stored.select(
                F.col(id_col).alias("_sid"), "cell", F.col(vec_col)
            ),
            "_sid",
            vec_col,
            dim,
            "_b",
            extra=("cell",),
        )
        .withColumnRenamed("cell", "cell_b")
        .withColumnRenamed("nrm", "nrm_b")
    )
    dotc = _flat_dot("_a", "_b", dim)
    return (
        na.join(
            sb,
            (F.col("cell") == F.col("cell_b"))
            & (dotc >= F.lit(float(eps)) * F.col("nrm") * F.col("nrm_b")),
        )
        .select(F.col(id_col))
        .distinct()
    )


def _within_pairs(
    assigned: DataFrame, eps: float, dim: int, id_col: str, vec_col: str
) -> DataFrame:
    """Within-cell near-dup pairs ``(id_a, id_b)`` with ``id_a <
    id_b`` over one assigned frame — the ``semantic_neardup_pairs``
    dim path, specialized to a pre-assigned, zero-norm-free input (no
    refit, no norm guard)."""
    fa = _flat(
        assigned, id_col, vec_col, dim, "_a", extra=("cell",)
    ).withColumnRenamed(id_col, "id_a")
    fb = (
        _flat(assigned, id_col, vec_col, dim, "_b", extra=("cell",))
        .withColumnRenamed(id_col, "id_b")
        .withColumnRenamed("cell", "cell_b")
        .withColumnRenamed("nrm", "nrm_b")
    )
    dotc = _flat_dot("_a", "_b", dim)
    return fa.join(
        fb,
        (F.col("cell") == F.col("cell_b"))
        & (F.col("id_a") < F.col("id_b"))
        & (dotc >= F.lit(float(eps)) * F.col("nrm") * F.col("nrm_b")),
    ).select("id_a", "id_b")


def _refuse_null_ids(df: DataFrame, id_col: str) -> None:
    if df.filter(F.col(id_col).isNull()).limit(1).count():
        raise ValueError(
            "NULL ids in the embedding batch — a NULL id neither "
            "equi-joins nor orders, so its dedup outcome would be "
            "silent; assign real ids first"
        )


def _refuse_duplicate_ids(df: DataFrame, id_col: str) -> None:
    dup = (
        df.filter(F.col(id_col).isNotNull())
        .groupBy(F.col(id_col))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            f"duplicate {id_col} values within the batch — the greedy "
            "keep-first outcome for an id seen twice is undefined; "
            "dropDuplicates the batch first, or pass "
            "validate_ids=False if uniqueness is guaranteed upstream"
        )


def _accept(
    df: DataFrame,
    prior: DataFrame | None,
    meta: dict,
    stats: dict,
) -> DataFrame:
    """The dedup fold: drop zero-norm rows (counted), reject same-cell
    history matches at eps (counted), within-batch cluster dedup
    (counted) → accepted ``(id, cell, embedding)`` rows, eagerly
    checkpointed."""
    eps, dim, id_col, vec_col = (
        meta["eps"], meta["dim"], meta["id_col"], meta["vec_col"]
    )
    norm_in = df.select(F.col(id_col), F.col(vec_col))
    n_in = norm_in.count()
    # wrong-width vectors refuse LOUDLY: assignment zip_with pads the
    # short side with NULLs, which would give the row a NULL cell — it
    # then joins nothing, is never rejected, and gets STORED corrupted
    # (round-10 self-review). NULL embeddings stay the disclosed drop
    # below (no norm, no direction — the NULL-fp contract).
    bad = (
        norm_in.filter(
            F.col(vec_col).isNotNull()
            & (F.size(F.col(vec_col)) != F.lit(int(dim)))
        )
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError(
            f"embedding batch contains vectors whose width differs "
            f"from the store's pinned dim={dim} — a wrong-width vector "
            "cannot be assigned to a cell and would be stored "
            "corrupted; fix the embedder or rebuild at the new width"
        )
    usable = norm_in.filter(
        F.exists(_as_double(F.col(vec_col)), lambda x: x != F.lit(0.0))
    )
    # ONE execution of the caller's upstream: assignment + every
    # downstream join reads this narrow checkpoint
    assigned = assign_cells(
        usable, meta["centroids"], vec_col=vec_col
    ).localCheckpoint(eager=True)
    n_usable = assigned.count()
    stats["zero_norm"] = n_in - n_usable
    if prior is not None:
        hits = _matches(
            assigned, prior, eps, dim, id_col, vec_col
        ).localCheckpoint(eager=True)
        fresh = assigned.join(hits, id_col, "left_anti").localCheckpoint(
            eager=True
        )
        n_fresh = fresh.count()
        stats["rejected_history"] = n_usable - n_fresh
    else:
        fresh = assigned
        n_fresh = n_usable
        stats["rejected_history"] = 0
    pairs = _within_pairs(fresh, eps, dim, id_col, vec_col)
    accepted = dedup_by_clusters(fresh, pairs, id_col=id_col).localCheckpoint(
        eager=True
    )
    stats["rejected_within_batch"] = n_fresh - accepted.count()
    return accepted.select(F.col(id_col), "cell", F.col(vec_col))


def embedding_store_build(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    eps: float = 0.95,
    n_cells: int = 16,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_cap: int = 100_000,
    validate_ids: bool = True,
) -> dict:
    """One-shot creation at ``path`` from an embedding frame
    (``(id_col, vec_col array<float/double>)``) → stats ``{"batch": 0,
    "accepted": n, "zero_norm": z, "rejected_within_batch": m,
    "rejected_history": 0}``. Fits the IVF coarse quantizer once
    (bounded seeded sample — the ``ivf_build`` machinery) and PINS the
    centroids in meta; refuses if a store already exists. ``dim`` is
    required (the flat-column scoring is the only shape that survives
    scale; embeddings are fixed-dim by contract)."""
    if dim is None or dim < 1:
        raise ValueError("dim is required (fixed embedding width >= 1)")
    if not -1.0 <= eps <= 1.0:
        raise ValueError("eps is a cosine threshold in [-1, 1]")
    if os.path.exists(batch_store.meta_path(path)):
        raise ValueError(
            f"an embedding store already exists at {path} — append "
            "batches with embedding_store_refresh, or choose a new path"
        )
    if validate_ids:
        _refuse_duplicate_ids(df, id_col)
    os.makedirs(path, exist_ok=True)
    with table_write_lock(path, **_VERB_LOCK_OPTS) as lock:
        if os.path.exists(batch_store.meta_path(path)):
            raise ValueError(
                f"an embedding store already exists at {path} "
                "(created while waiting for the writer claim)"
            )
        _refuse_null_ids(df, id_col)
        idx = ivf_build(
            df, n_cells=n_cells, id_col=id_col, vec_col=vec_col,
            seed=seed, train_cap=train_cap,
        )
        meta = {
            "version": 1,
            "eps": float(eps),
            "n_cells": int(n_cells),
            "dim": int(dim),
            "id_col": id_col,
            "vec_col": vec_col,
            "seed": int(seed),
            "centroids": idx.centroids,
            "batches": [0],
        }
        stats: dict = {}
        accepted = _accept(df, None, meta, stats)
        out = batch_store.batch_dirs(path, "emb", [0])[0]
        accepted.write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        batch_store.write_meta(path, meta, lock)
    return {"batch": 0, "accepted": n, **stats}


def embedding_store_refresh(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    drop_known: bool = False,
    validate_ids: bool = True,
) -> dict:
    """Append one embedding batch: assign to the PINNED centroids,
    reject same-cell history matches at the pinned eps, near-dedup the
    survivors within the batch, commit the accepted rows as a new
    immutable directory → stats. Every parameter comes from meta — the
    stream cannot silently redefine "duplicate" (or move a cell
    boundary) mid-history.

    Batch ids must be NEW: a re-ingested id refuses loudly by default;
    ``drop_known=True`` drops already-ACCEPTED ids INSIDE the writer
    claim (the replay-safe streaming mode; a row rejected earlier is
    judged again by the same history and rejected again — idempotent).
    An empty or fully-rejected batch commits no slot (``batch:
    None``).

    Input frames backed by EXPENSIVE upstreams (media decode, model
    scoring) should be eagerly localCheckpointed by the caller: the
    validation probes (isEmpty / known-id check) and the accept fold
    each reference the frame before its internal checkpoint, so an
    un-materialized decode lineage executes more than once (the CLI
    tier builders do this; round-9/10 convention)."""
    meta = batch_store.read_meta(path, _HINT)  # fail fast pre-lock
    id_col = meta["id_col"]
    if validate_ids:
        _refuse_duplicate_ids(df, id_col)
    with table_write_lock(path, **_VERB_LOCK_OPTS) as lock:
        meta = batch_store.read_meta(path, _HINT)  # re-read under claim
        id_col = meta["id_col"]
        batches = list(meta["batches"])
        if df.isEmpty():
            return {"batch": None, "accepted": 0}
        _refuse_null_ids(df, id_col)
        prior = spark.read.parquet(
            *batch_store.batch_dirs(path, "emb", batches)
        )
        if drop_known:
            df = df.join(
                prior.select(F.col(id_col)), id_col, "left_anti"
            ).localCheckpoint(eager=True)
            if df.isEmpty():
                return {"batch": None, "accepted": 0}
        else:
            clash = (
                df.select(F.col(id_col))
                .join(prior.select(F.col(id_col)), id_col, "semi")
                .limit(1)
                .count()
            )
            if clash:
                raise ValueError(
                    "refresh batch contains ids already accepted into "
                    f"the store at {path} — re-ingesting an id would "
                    "re-litigate its dedup fate; pass drop_known=True "
                    "to skip known ids (the streaming/replay mode)"
                )
        stats: dict = {}
        accepted = _accept(df, prior, meta, stats)
        if accepted.isEmpty():
            return {"batch": None, "accepted": 0, **stats}
        batch = max(batches) + 1
        out = batch_store.batch_dirs(path, "emb", [batch])[0]
        accepted.write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        meta["batches"] = batches + [batch]
        batch_store.write_meta(path, meta, lock)
    return {"batch": batch, "accepted": n, **stats}


def embedding_store_load(spark: SparkSession, path: str) -> DataFrame:
    """The accepted embedding table → ``(id_col, cell, vec_col)`` as
    built: the semantically-deduped corpus itself (plus each row's
    pinned cell), and the history every future batch is judged
    against. Reads only committed immutable directories."""
    meta = batch_store.read_meta(path, _HINT)
    return spark.read.parquet(
        *batch_store.batch_dirs(path, "emb", meta["batches"])
    )


def embedding_store_matches(
    spark: SparkSession, df: DataFrame, path: str
) -> DataFrame:
    """Read-only probe: ids of ``df`` that WOULD be rejected against
    the store right now (same-cell cosine >= the pinned eps) — the
    decontamination / novelty-check read path, no writer claim, no
    mutation. Zero-norm rows never match (no cosine direction)."""
    meta = batch_store.read_meta(path, _HINT)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    base = df.select(F.col(id_col), F.col(vec_col))
    # same wrong-width refusal as the accept fold: a malformed probe
    # row silently reading as "novel" would invite ingesting it next
    bad = (
        base.filter(
            F.col(vec_col).isNotNull()
            & (F.size(F.col(vec_col)) != F.lit(int(meta["dim"])))
        )
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError(
            f"probe batch contains vectors whose width differs from "
            f"the store's pinned dim={meta['dim']} — fix the embedder"
        )
    usable = base.filter(
        F.exists(_as_double(F.col(vec_col)), lambda x: x != F.lit(0.0))
    )
    assigned = assign_cells(usable, meta["centroids"], vec_col=vec_col)
    return _matches(
        assigned,
        embedding_store_load(spark, path),
        meta["eps"],
        meta["dim"],
        id_col,
        vec_col,
    )


def embedding_store_compact(spark: SparkSession, path: str) -> dict:
    """Fold all committed batch directories into one slot →
    ``{"batches_before": k, "embeddings": n}`` (shared protocol)."""
    st = batch_store.compact(spark, path, _KINDS, _HINT)
    return {
        "batches_before": st["batches_before"],
        "embeddings": st["rows"]["emb"],
    }


def embedding_store_vacuum(
    path: str, grace_seconds: float = 86400.0
) -> dict:
    """Sweep unreferenced batch directories after the grace window →
    ``{"removed": n, "kept": m}`` (shared protocol)."""
    return batch_store.vacuum(
        path, _KINDS, _HINT, grace_seconds=grace_seconds
    )
