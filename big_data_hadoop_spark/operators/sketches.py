"""Sketch-based approximate aggregates — the 100 TB path beside the
exact probes (q34 grouped COUNT(DISTINCT), q37 exact percentiles).

Exact distinct-counting shuffles every distinct value; exact
percentiles sort. The sketches below are one-pass, mergeable,
fixed-size state (HyperLogLog++ registers, Greenwald-Khanna quantile
summaries) — partials combine map-side like any algebraic aggregate, so
the shuffle carries kilobytes per group regardless of input size. The
pairing mirrors the dedup/similarity design: an exact verifier exists
for every approximate operator, and tests bound the sketch error
against the exact answer on real data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.tokenize import tokens


def approx_distinct_tokens(
    df: DataFrame, rsd: float = 0.05, text_col: str = "text"
) -> DataFrame:
    """``(category, n_distinct_approx)`` via HyperLogLog++
    (``approx_count_distinct``). ``rsd`` is the target relative standard
    deviation; state is ~1.04/rsd² registers per group, independent of
    corpus size. Exact twin: ``countDistinct`` over the same tokens
    (the error-bound test runs both)."""
    t = tokens(df, text_col=text_col, lowercase=True, keep_cols=())
    return t.groupBy("category").agg(
        F.approx_count_distinct("token", rsd).alias("n_distinct_approx")
    )


def exact_distinct_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The exact verifier for ``approx_distinct_tokens``."""
    t = tokens(df, text_col=text_col, lowercase=True, keep_cols=())
    return t.groupBy("category").agg(
        F.countDistinct("token").alias("n_distinct")
    )


def approx_percentiles(
    df: DataFrame,
    value_col: str,
    probabilities: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """One-row frame of Greenwald-Khanna approximate percentiles of
    ``value_col``. ``accuracy`` bounds the rank error at
    ``n / accuracy``; the summary size is O(accuracy·log n), mergeable
    across partitions — no sort, no shuffle of values."""
    # Half-up labeling, not round(): banker's rounding maps 0.125 to
    # 'p12', and int() alone truncates 0.29*100 = 28.999… to p28
    # (ADVICE r3/r4). Nearby probabilities can still collide on a label
    # (0.290 vs 0.294) — that would silently yield ambiguous duplicate
    # column names, so refuse instead.
    labels = [f"p{int(p * 100 + 0.5):02d}" for p in probabilities]
    if len(set(labels)) != len(labels):
        raise ValueError(
            f"percentile labels collide: {labels}; space the "
            "probabilities at least 0.01 apart"
        )
    cols = [
        F.percentile_approx(value_col, p, accuracy).alias(lab)
        for p, lab in zip(probabilities, labels)
    ]
    return df.agg(*cols)


def heavy_hitter_tokens(
    df: DataFrame, min_share: float = 0.01, text_col: str = "text"
) -> DataFrame:
    """Tokens whose frequency share is at least ``min_share``, found by
    a single exact pass (count + total + filter). Deliberately NOT a
    sketch: token counting already partial-aggregates map-side, so the
    shuffle carries one row per DISTINCT token — the sketch would save
    nothing until the distinct-token count itself is huge, at which
    point ``DataFrame.stat.freqItems`` (lossy counting) is the drop-in.
    Output: ``(category, token, cnt, share)`` sorted by share desc."""
    t = tokens(df, text_col=text_col, lowercase=True, keep_cols=())
    counts = t.groupBy("category", "token").agg(F.count("*").alias("cnt"))
    totals = t.groupBy("category").agg(F.count("*").alias("total"))
    return (
        counts.join(F.broadcast(totals), "category")
        .withColumn("share", F.col("cnt") / F.col("total"))
        .filter(F.col("share") >= min_share)
        .select("category", "token", "cnt", "share")
        .orderBy(F.desc("share"), "category", "token")
    )


def hll_sketches(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str] = (),
    lg_k: int = 12,
) -> DataFrame:
    """Per-group Apache DataSketches HLL sketch of ``col`` as a STORABLE
    binary column: ``(*group_cols, sketch binary)``.

    This is the cross-run/incremental form of distinct counting
    (``approx_count_distinct`` gives a number; this gives mergeable
    STATE): persist each snapshot's sketch table (a few KB per group —
    2^lg_k registers) and ask :func:`hll_merge_estimate` for the
    distinct count of ANY union of runs/partitions/days later, without
    rescanning the data — the same ship-state-not-data contract as
    ``dedup.content_digests`` and ``minhash_signatures``. Built on
    Spark's native DataSketches aggregates (``hll_sketch_agg``), so
    partials combine map-side and the shuffle carries sketches, not
    values.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias("sketch")
    )


def hll_merge_estimate(
    sketches: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Merge stored sketch rows (e.g. a union of several runs' sketch
    tables) per group and estimate: ``(*group_cols, n_distinct_approx)``.
    Sketch union is exact over the register state, so merging partial
    sketches gives the SAME estimate as sketching the concatenated data
    (pinned by test)."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "n_distinct_approx"
        )
    )


AGG_STATE_MOMENTS = ("n", "s", "s2", "mn", "mx")


def agg_state(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    distinct_col: str | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Per-key MERGEABLE aggregate state over ``value_col`` —
    ``(*group_cols, n, s, s2, mn, mx[, sketch])`` where ``s2`` is the
    sum of squares and ``sketch`` (when ``distinct_col`` is given) an
    HLL sketch of that column. The materialized-aggregate pattern:
    persist one state table per ingest batch (or maintain one with
    :func:`agg_state_merge`) and derive count/sum/min/max/mean/variance
    /distinct for ANY union of batches later via
    :func:`agg_state_finalize` — no rescan of the data, the incremental
    twin of a plain groupBy the way ``hll_sketches`` is for
    ``approx_count_distinct``.

    Every component is associative-commutative (sums, extrema, sketch
    union), so states merge exactly: variance comes out of the
    (n, s, s2) moment triple, the textbook parallel-variance merge.
    State size is O(groups), independent of row volume; partials
    combine map-side and the shuffle carries moments, not values."""
    v = F.col(value_col).cast("double")
    aggs = [
        F.count(v).alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("s2"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
    ]
    if distinct_col is not None:
        aggs.append(
            F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("sketch")
        )
    return df.groupBy(*group_cols).agg(*aggs)


def agg_state_merge(
    states: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Merge state rows (a union of several runs' state tables) per key
    into one state row of the SAME schema — sums add, extrema fold,
    sketches union — so merging is closed: daily states roll into
    monthly states roll into an all-time state."""
    aggs = [
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("s2").alias("s2"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    ]
    if "sketch" in states.columns:
        aggs.append(F.hll_union_agg("sketch").alias("sketch"))
    return states.groupBy(*group_cols).agg(*aggs)


def agg_state_finalize(state: DataFrame) -> DataFrame:
    """Derive the user-facing aggregates from a state table:
    ``n_rows, total, vmin, vmax, avg, var_samp`` (+
    ``n_distinct_approx`` when the state carries a sketch). ``var_samp``
    is ``(s2 - s²/n) / (n-1)`` — NULL for n < 2, clamped at 0 against
    negative floating-point residue, matching SQL ``VAR_SAMP``."""
    n, s, s2 = F.col("n"), F.col("s"), F.col("s2")
    var = F.when(
        n >= 2, F.greatest((s2 - s * s / n) / (n - F.lit(1)), F.lit(0.0))
    )
    keep = [
        c for c in state.columns if c not in AGG_STATE_MOMENTS + ("sketch",)
    ]
    out = [
        *keep,
        n.alias("n_rows"),
        s.alias("total"),
        F.col("mn").alias("vmin"),
        F.col("mx").alias("vmax"),
        (s / n).alias("avg"),
        var.alias("var_samp"),
    ]
    if "sketch" in state.columns:
        out.append(
            F.hll_sketch_estimate("sketch").alias("n_distinct_approx")
        )
    return state.select(*out)


def cms_build(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 2048,
    seed: int = 0,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of ``key_col`` frequencies (Cormode-Muthukrishnan
    2005, public) as a STORABLE table ``(r, b, cnt)`` — ``d`` hash rows ×
    ``w`` buckets, at most ``d*w`` rows regardless of key cardinality.
    The mergeable-state answer to "how often did key X occur across all
    runs" when the exact per-key table (``heavy_hitter_tokens``'s input)
    is too large to keep per batch: estimates never undercount, and
    overcount by at most ``e/w × total`` with probability ``1 - e^-d``.

    One pass: each key row explodes into its ``d`` (row, bucket) cells
    BEFORE the shuffle, partial aggregation collapses them to ≤ ``d*w``
    rows per map task, so the shuffle carries the sketch, not the data.
    ``weight_col`` counts each row with a weight (e.g. pre-aggregated
    counts) instead of 1."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1, w >= 2; got d={d}, w={w}")
    wt = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(
                            F.xxhash64(F.col(key_col), F.lit(seed * 131 + r)),
                            F.lit(w),
                        ).alias("b"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("cell"),
        wt.alias("_w"),
    )
    return cells.groupBy(
        F.col("cell.r").alias("r"), F.col("cell.b").alias("b")
    ).agg(F.sum("_w").alias("cnt"))


def cms_merge(states: DataFrame) -> DataFrame:
    """Merge CMS state tables (same d/w/seed — the caller's contract,
    like every storable-state operator here): cells add elementwise, so
    the merged sketch is IDENTICAL to one built over the concatenated
    data (exact equality, pinned by test — unlike HLL there is no
    estimator in the state itself)."""
    return states.groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    state: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 2048,
    seed: int = 0,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over the ``d`` rows of
    its bucket counts (missing cell = 0). Returns ``keys`` plus
    ``est_cnt``, ONE OUTPUT ROW PER INPUT ROW — duplicate probe rows
    each get their estimate (a per-row tag keeps the fold from
    collapsing them; review finding). The d/w/seed must match the
    build. The state is ≤ d*w rows — broadcast to the keys side, so
    estimation is a narrow broadcast join however many keys are
    probed. Internal columns are ``_cms_``-prefixed so probe frames
    carrying ``r``/``b``/``cnt`` columns pass through untouched (review
    finding: an existing ``cnt`` was silently overwritten before the
    min-fold); a probe column that still collides (``_cms_*``,
    ``est_cnt``) is refused loudly rather than corrupted."""
    clash = {"_cms_row", "_cms_cell", "_cms_r", "_cms_b", "_cms_cnt",
             "est_cnt"}.intersection(keys.columns)
    if clash:
        raise ValueError(
            f"cms_estimate: probe columns collide with output/internal "
            f"names {sorted(clash)}; rename them before probing"
        )
    probes = keys.withColumn(
        "_cms_row", F.monotonically_increasing_id()
    ).select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(
                            F.xxhash64(F.col(key_col), F.lit(seed * 131 + r)),
                            F.lit(w),
                        ).alias("b"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("_cms_cell"),
    ).select(
        "*",
        F.col("_cms_cell.r").alias("_cms_r"),
        F.col("_cms_cell.b").alias("_cms_b"),
    ).drop("_cms_cell")
    cells = state.select(
        F.col("r").alias("_cms_r"),
        F.col("b").alias("_cms_b"),
        F.col("cnt").alias("_cms_cnt"),
    )
    joined = probes.join(
        F.broadcast(cells), ["_cms_r", "_cms_b"], "left"
    ).withColumn("_cms_cnt", F.coalesce("_cms_cnt", F.lit(0)))
    out_cols = [c for c in keys.columns]
    return (
        joined.groupBy("_cms_row", *out_cols)
        .agg(F.min("_cms_cnt").alias("est_cnt"))
        .drop("_cms_row")
    )


def _applied_epoch(path: str, run_token: str = "") -> int:
    """Highest epoch marker recorded in a state generation for this
    run token (-1 if none). Markers are underscore-prefixed files,
    which parquet readers treat as metadata and skip. The token scopes
    idempotence to ONE streaming run: after a checkpoint reset the
    query gets a fresh id, batch numbering restarts at 0, and markers
    from the previous run must not suppress the new run's batches
    (review finding)."""
    import os

    prefix = f"_epoch-{run_token}-" if run_token else "_epoch--"
    try:
        names = os.listdir(path)
    except OSError:
        return -1
    epochs = [
        int(n.removeprefix(prefix))
        for n in names
        if n.startswith(prefix) and n.removeprefix(prefix).isdigit()
    ]
    if not run_token:
        # pre-run-token markers were written as `_epoch-<n>`; a batch
        # caller's crash-replay straddling the upgrade must still see
        # them (review finding: forgetting them double-counts once)
        epochs += [
            int(n.removeprefix("_epoch-"))
            for n in names
            if n.startswith("_epoch-") and n.removeprefix("_epoch-").isdigit()
        ]
    return max(epochs, default=-1)


def maintain_agg_state(
    batch: DataFrame,
    path: str,
    group_cols: Sequence[str],
    value_col: str,
    distinct_col: str | None = None,
    lg_k: int = 12,
    epoch: int | None = None,
    run_token: str = "",
) -> None:
    """Fold one ingest batch into the persistent state table at
    ``path``: state(batch) merged with the stored state, written back.
    The write is staged-then-swapped (write to ``path + '.staging'``,
    rename over) so a reader never sees a half-written state and a
    failed write leaves the previous generation intact; a transactional
    table format does this swap in production, the filesystem rename is
    the local twin.

    ``epoch`` (+ ``run_token``, scoping epochs to one streaming run)
    makes the fold IDEMPOTENT for at-least-once callers
    (``foreachBatch`` replays the last epoch after a crash): each
    generation carries an ``_epoch-<token>-<n>`` marker file, and a
    fold whose epoch is already recorded for the same run is a no-op —
    the replayed batch cannot double-count. Underscore files are
    metadata to parquet readers, so markers ride inside the state
    directory through the swap.

    The swap is rename-old → rename-staging → drop-old, never
    delete-then-rename: a crash at any point leaves either the old or
    the new generation on disk (recovery at the next fold restores a
    stranded ``.old`` — review finding: rmtree-then-rename had a
    window that lost the whole table). Thin wrapper over
    :func:`maintain_state` with the agg-state build/merge pair."""
    maintain_state(
        batch,
        path,
        build=lambda b: agg_state(
            b, group_cols, value_col, distinct_col=distinct_col, lg_k=lg_k
        ),
        merge=lambda states: agg_state_merge(states, group_cols),
        epoch=epoch,
        run_token=run_token,
    )


def streaming_agg_state(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    group_cols: Sequence[str],
    value_col: str,
    distinct_col: str | None = None,
    available_now: bool = True,
):
    """Continuous aggregate maintenance over an unbounded stream: every
    micro-batch folds into the state table at ``path`` via
    ``foreachBatch`` + :func:`maintain_agg_state`, so
    ``agg_state_finalize(spark.read.parquet(path))`` serves
    count/sum/min/max/mean/variance/distinct for everything that ever
    arrived — the continuous-aggregate / materialized-view pattern, and
    the streaming twin of the batch build→merge cycle (q80).

    State size is O(groups); each epoch reads and rewrites only the
    state table, never reprocesses history. ``foreachBatch`` is
    at-least-once per epoch — exactly-once comes from the epoch-marker
    idempotence in :func:`maintain_agg_state`, keyed on (streaming
    query id, batchId): batch ids restart at 0 after a checkpoint
    reset, so the query id must scope the markers or the new run's
    first batches would be mistaken for replays (review finding).
    DELETING the checkpoint remains destructive in the usual
    foreachBatch way — the source replays from scratch and those rows
    re-fold; the marker scoping only guarantees new data is never
    silently dropped. If the checkpoint's metadata cannot be read at
    all, the token falls back to a per-started-query random value:
    crash replays may then re-fold once per restart (at-least-once) —
    the safe failure direction — so exactly-once holds exactly when
    the query id is readable. Returns the started query."""
    return streaming_state(
        stream,
        path,
        checkpoint,
        build=lambda b: agg_state(
            b, group_cols, value_col, distinct_col=distinct_col
        ),
        merge=lambda states: agg_state_merge(states, group_cols),
        available_now=available_now,
    )


def streaming_state(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    build,
    merge,
    available_now: bool = True,
):
    """Shared streaming scaffold for every continuous-state family:
    ``foreachBatch`` over :func:`maintain_state` with the run-token
    epoch scoping. The token is resolved ONCE per started query and
    cached in the query's own closure — reset-safe (a checkpoint reset
    always starts a new query, hence a new closure) without paying a
    metadata read per micro-batch (review finding: the uncached form
    launched a Spark job per fold on remote-scheme checkpoints).
    Returns the started query."""
    token_cache: list[str] = []

    def fold(batch: DataFrame, epoch: int) -> None:
        if not token_cache:
            token_cache.append(_checkpoint_run_token(batch, checkpoint))
        maintain_state(
            batch,
            path,
            build=build,
            merge=merge,
            epoch=epoch,
            run_token=token_cache[0],
        )

    writer = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _checkpoint_run_token(batch: DataFrame, checkpoint: str) -> str:
    """Per-streaming-run token from the checkpoint's metadata query id
    (regenerated on checkpoint reset). Callers cache it ONCE PER
    STARTED QUERY in the query's own closure (:func:`streaming_state`)
    — reset-safe, because a checkpoint reset always starts a NEW query
    and hence a new closure that re-reads the fresh id. What would
    resurrect the suppression bug is a cache keyed on the CHECKPOINT
    PATH outliving the query object (a reset-in-place run would inherit
    its predecessor's token); never add one. Local paths (scheme-less
    or ``file:``) read via plain ``open()`` — exact-name, no glob
    expansion, so names with ``[ ? * {`` are safe (review finding:
    ``read.text`` glob-expands and broke them); remote schemes read
    through Spark with glob metacharacters escaped. On a genuine read
    failure the token is a random value — failing toward possible
    re-folds, never toward suppressing real data."""
    import json
    import os
    import uuid

    try:
        if "://" not in checkpoint and not checkpoint.startswith("file:"):
            with open(os.path.join(checkpoint, "metadata")) as f:
                meta = f.read()
        elif checkpoint.startswith("file:"):
            with open(os.path.join(checkpoint[5:], "metadata")) as f:
                meta = f.read()
        else:
            escaped = "".join(
                "\\" + ch if ch in "\\[]{}*?" else ch
                for ch in checkpoint + "/metadata"
            )
            meta = "".join(
                r.value
                for r in batch.sparkSession.read.text(escaped).collect()
            )
        token = json.loads(meta)["id"][:8]
    except Exception:
        token = uuid.uuid4().hex[:8]
    return token


def maintain_state(
    batch: DataFrame,
    path: str,
    build,
    merge,
    epoch: int | None = None,
    run_token: str = "",
) -> None:
    """Generalized incremental-state fold: ``build(batch)`` produces a
    state frame, ``merge(old_union_new)`` combines generations — the
    same stage-and-swap + epoch-idempotence machinery
    ``maintain_agg_state`` uses, for ANY mergeable state family
    (CMS cells, HLL sketch tables, digest sets). The build/merge pair
    must be closed over the state schema; everything else (crash
    recovery, replay no-ops, atomic swap) is shared — so the hardening
    that six review batches put into this path applies once, not per
    state type."""
    import os

    from big_data_hadoop_spark.sources.io import (
        _recover_generation,
        _swap_in,
    )

    _recover_generation(path)
    if epoch is not None and _applied_epoch(path, run_token) >= epoch:
        return
    spark = batch.sparkSession
    new = build(batch)
    if os.path.exists(path):
        new = merge(spark.read.parquet(path).unionByName(new))
    staging = path + ".staging"
    new.write.mode("overwrite").parquet(staging)
    if epoch is not None:
        with open(os.path.join(staging, f"_epoch-{run_token}-{epoch}"), "w"):
            pass
    _swap_in(staging, path)


def streaming_cms(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    key_col: str,
    d: int = 4,
    w: int = 2048,
    seed: int = 0,
    available_now: bool = True,
):
    """Continuous Count-Min maintenance over an unbounded stream: every
    micro-batch's sketch folds into the state table at ``path`` (cells
    add — CMS merge is exact), so ``cms_estimate`` answers "how often
    has key X ever occurred" at any moment without reprocessing
    history. Streaming twin of the q81 batch build→merge cycle; the
    epoch/run-token idempotence contract matches
    :func:`streaming_agg_state` (shared :func:`streaming_state`
    scaffold). Shape parameters fail fast HERE, not asynchronously
    inside the first micro-batch of an already-started query."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1, w >= 2; got d={d}, w={w}")
    return streaming_state(
        stream,
        path,
        checkpoint,
        build=lambda b: cms_build(b, key_col, d=d, w=w, seed=seed),
        merge=cms_merge,
        available_now=available_now,
    )
