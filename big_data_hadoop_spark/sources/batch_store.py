"""Shared immutable-batch store protocol (the storage skeleton under
``operators.neardup_graph`` and ``operators.fingerprint_store``).

Layout under ``path/``::

    meta.json            params + the COMMITTED batch list (the manifest)
    <kind>/b00000/ ...   one parquet directory per committed batch,
                         per table kind (the graph store has two kinds,
                         ``sig`` and ``edge``; the fingerprint store one,
                         ``fp``)

Batch directories are IMMUTABLE once committed; ``meta.json`` is the
single commit point, replaced atomically (write-tmp + fsync +
``os.replace``) and only while the caller still holds the writer claim
(``lock.verify()`` immediately before the replace — the same
refuse-to-publish contract as ``_swap_in``). A reader therefore never
sees a swap window: it lists committed batches from the meta generation
it read and touches only immutable directories. A refresh killed
mid-write leaves an orphaned UNCOMMITTED directory that the retry
simply overwrites (batch numbers come from the committed list, so the
retry reuses the same slot); nothing referenced by any committed meta
generation is ever rewritten. Writers serialize under
:func:`~big_data_hadoop_spark.sources.io.table_write_lock`.

Compaction folds every committed batch into one fresh slot and commits
a single-slot manifest; vacuum sweeps unreferenced directories after a
grace window measured from directory mtime (compaction re-stamps the
superseded slots so a years-old directory doesn't age out the instant
it becomes an orphan — deleting it under a reader that loaded the
pre-compact meta seconds earlier). Factored out of
``operators/neardup_graph.py`` in round 9 so the second store could
not diverge from the first (the ``_sig_est`` sharing precedent)."""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import time

from big_data_hadoop_spark.sources.io import _VERB_LOCK_OPTS, table_write_lock

META = "meta.json"


@contextlib.contextmanager
def sweep_uncommitted(path: str, created: bool):
    """Wrap a build's staging so a REFUSED build leaves the filesystem
    as it found it: if this call created the directory and nothing was
    ever committed (no meta), sweep the litter (an uncommitted data
    dir). A concurrent builder that won the race has meta on disk and
    is never touched.

    MUST run INSIDE the ``table_write_lock`` block (the claim is a
    SIBLING ``<path>.lock`` directory, so the sweep never deletes the
    held claim itself): sweeping after the lock released could rmtree
    a lock-losing contender's in-flight staging — the contender
    acquires the claim the instant the failed builder releases it, and
    can be mid-write (batch parquet down, meta not yet committed) when
    a post-release except-block fires (round-11 advice). While the
    claim is held, no contender can be staging, so the sweep decision
    (``created`` + no committed meta) is race-free. A build that fails
    to ACQUIRE the claim deliberately sweeps nothing: the holder it
    timed out against may be mid-build under the directory."""
    try:
        yield
    except BaseException:
        if created and not os.path.exists(meta_path(path)):
            shutil.rmtree(path, ignore_errors=True)
        raise


def meta_path(path: str) -> str:
    return os.path.join(path, META)


def read_meta(path: str, hint: str) -> dict:
    """Load the committed manifest; ``hint`` names the builder verb in
    the missing-store refusal (loud, not a silent empty store)."""
    mp = meta_path(path)
    try:
        with open(mp) as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"no store at {path}: {mp} is missing — create one with "
            f"{hint} first"
        ) from None


def write_meta(path: str, meta: dict, lock) -> None:
    """Atomic commit point: meta lands fully or not at all
    (``os.replace``), and only while we still hold the writer claim."""
    tmp = meta_path(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    lock.verify()
    os.replace(tmp, meta_path(path))


def batch_dirs(path: str, kind: str, batches) -> list[str]:
    return [os.path.join(path, kind, f"b{b:05d}") for b in batches]


def compact(
    spark,
    path: str,
    kinds: tuple[str, ...],
    hint: str,
    cluster_by: str | None = None,
) -> dict:
    """Fold all committed batch directories into ONE slot per kind →
    ``{"batches_before": k, "rows": {kind: n, ...}}``. Crash safety is
    the refresh protocol's: the consolidated directories land in a NEW
    slot (max + 1) while every old directory stays committed until the
    atomic meta replace. After the commit the old directories are
    orphans for :func:`vacuum` (two-phase: commit first, delete later,
    grace-windowed). ``cluster_by`` re-sorts the consolidated slot's
    partitions on that column (sortWithinPartitions — deliberately no
    repartition; row-group min/max skipping only needs WITHIN-file
    ordering) so a store whose read paths rely on row-group skipping
    keeps its clustering through compaction (the embedding store's
    cell pruning)."""
    with table_write_lock(path, **_VERB_LOCK_OPTS) as lock:
        meta = read_meta(path, hint)
        batches = list(meta["batches"])
        slot = max(batches) + 1
        rows: dict[str, int] = {}
        for kind in kinds:
            df = spark.read.parquet(*batch_dirs(path, kind, batches))
            out = batch_dirs(path, kind, [slot])[0]
            if cluster_by is not None and cluster_by in df.columns:
                df = df.sortWithinPartitions(cluster_by)
            df.write.mode("overwrite").parquet(out)
            rows[kind] = spark.read.parquet(out).count()
        meta["batches"] = [slot]
        write_meta(path, meta, lock)
        # stamp ORPHANING time onto the superseded slots (see module
        # docstring). Best-effort: a failure only makes vacuum sweep
        # that slot early relative to the grace window, never corrupts.
        now = time.time()
        for kind in kinds:
            for d in batch_dirs(path, kind, batches):
                try:
                    os.utime(d, (now, now))
                except OSError:
                    pass
    return {"batches_before": len(batches), "rows": rows}


def vacuum(
    path: str, kinds: tuple[str, ...], hint: str,
    grace_seconds: float = 86400.0,
) -> dict:
    """Delete batch directories no committed meta references — once
    older than ``grace_seconds`` → ``{"removed": n, "kept": m}``.
    Within the window orphans count as ``kept``, never removed. Runs
    under the writer claim so a concurrent refresh cannot commit a new
    slot while the sweep decides what is orphaned."""
    with table_write_lock(path, **_VERB_LOCK_OPTS):
        meta = read_meta(path, hint)
        live = {f"b{b:05d}" for b in meta["batches"]}
        removed = kept = 0
        now = time.time()
        for kind in kinds:
            base = os.path.join(path, kind)
            if not os.path.isdir(base):
                continue
            for d in sorted(os.listdir(base)):
                full = os.path.join(base, d)
                if d in live or not os.path.isdir(full):
                    continue
                if now - os.path.getmtime(full) >= grace_seconds:
                    shutil.rmtree(full)
                    removed += 1
                else:
                    kept += 1
    return {"removed": removed, "kept": kept}
