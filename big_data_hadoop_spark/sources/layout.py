"""Multi-dimensional data layout: Z-order clustering for scan pruning.

Sorting a table by one column makes parquet row-group/file min-max
statistics selective for THAT column only; a filter on any other column
still scans everything. Z-ordering (Morton order — the public technique
behind Delta Lake's ``OPTIMIZE ZORDER BY`` and ClickHouse/DuckDB space-
filling-curve clustering) interleaves the bits of several columns'
rank-buckets into one sort key, so files end up covering small
HYPER-RECTANGLES of the key space: min-max stats stay narrow on EVERY
z-dimension at once and a predicate on any of them prunes most files.

Exact semantics (replicated by the pure-Python oracle in
``tests/test_layout.py``):

* Each z-column is normalized to a ``2^bits``-bucket rank via its
  global min/max: ``bucket = floor((v - mn) / (mx - mn) * (2^bits-1))``
  computed in DOUBLE, clamped to ``[0, 2^bits-1]``; NULLs and
  degenerate ranges (``mx == mn``) map to bucket 0.
* The z-value interleaves bucket bits little-endian by dimension:
  bit ``b`` of dimension ``i`` lands at position ``b * n_dims + i``.

Scale shape: min/max are one tiny global aggregate joined back by
broadcast (lazy — no driver action hidden in plan construction); the
z-value is a flat codegen'd bit expression; the physical clustering is
``repartitionByRange`` on the z-value (one range-sampling pass + one
shuffle — exactly what any global sort costs) followed by within-
partition sort, so files are contiguous z-ranges. The write itself
carries only the original columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "write_zordered", "write_sorted"]


def zorder_value(
    cols: list[str], bits: int = 10, stats_prefix: str = "_zs_"
) -> Column:
    """The interleaved z-value expression over ``cols``.

    Expects, for each column ``c``, companion attributes
    ``{stats_prefix}min_{c}`` / ``{stats_prefix}max_{c}`` in scope
    (``write_zordered`` joins them in; callers composing manually can
    attach constants). Returns a non-null BIGINT.
    """
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits < 1 or bits * len(cols) > 62:
        raise ValueError(
            f"bits={bits} x {len(cols)} dims must fit a signed 64-bit key"
        )
    n = len(cols)
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn = F.col(f"{stats_prefix}min_{c}")
        mx = F.col(f"{stats_prefix}max_{c}")
        span = mx - mn
        v = F.col(c).cast("double")
        # NaN handling (review finding): a single NaN row makes max()
        # return NaN, span NaN, and `span <= 0` FALSE — every row's
        # bucket then computed as NaN, collapsing the whole dimension.
        # NaN values map to bucket 0 per row, and NaN STATS (possible
        # only when the stats aggregation itself saw NaN through a
        # caller-supplied frame) degrade the dimension to bucket 0
        # explicitly instead of silently.
        scaled = F.when(
            F.col(c).isNull()
            | F.isnan(v)
            | F.isnan(span)
            | (span <= F.lit(0.0)),
            F.lit(0).cast("long"),
        ).otherwise(
            F.least(
                F.greatest(
                    F.floor(
                        (F.col(c).cast("double") - mn) / span * F.lit(float(top))
                    ),
                    F.lit(0),
                ),
                F.lit(top),
            ).cast("long")
        )
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(scaled, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the z-order of ``cols``.

    ``n_files`` bounds the output file count (= z-range partitions);
    size it so files land near the target file size at the corpus
    scale. Columns must be castable to double — numeric or timestamp
    types (Spark rejects ``cast(date AS double)``: cast DATE columns to
    timestamp, or derive a day number, before z-ordering). Hash
    non-ordinal strings into a bucket column first if needed —
    interleaving hashed bits buys pruning only for equality predicates.
    """
    # NaN-safe stats: min/max over a raw double column would return NaN
    # if ANY row is NaN (poisoning the whole dimension — see
    # zorder_value); NaN rows are excluded here and bucket to 0 per row.
    stats = df.agg(
        *[
            agg
            for c in cols
            for agg in (
                F.min(
                    F.when(
                        ~F.isnan(F.col(c).cast("double")),
                        F.col(c).cast("double"),
                    )
                ).alias(f"_zs_min_{c}"),
                F.max(
                    F.when(
                        ~F.isnan(F.col(c).cast("double")),
                        F.col(c).cast("double"),
                    )
                ).alias(f"_zs_max_{c}"),
            )
        ]
    )
    out_cols = df.columns
    z = df.join(F.broadcast(stats)).withColumn(
        "_z", zorder_value(cols, bits=bits)
    )
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .select(*out_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Globally range-sorted parquet layout for ONE sort dimension
    chain: rows are range-partitioned on ``sort_cols`` (file i holds
    only keys below every key of file i+1) and sorted within each
    file, so every file's parquet min/max footer stats cover a
    DISJOINT key range — a point or range predicate on the leading
    sort column prunes to the few files that can match, the
    single-dimension complement of the Z-order writer above (which
    trades per-dimension tightness for multi-dimension coverage).

    ``repartitionByRange`` samples the key distribution to place the
    cut points, balancing files across DISTINCT keys; a single hot key
    still lands wholly in one file (range partitioning never splits a
    key — the inherent limit of any sorted layout). The sort is
    per-partition (no global merge). NULL keys sort first, into file 0.
    """
    if not sort_cols:
        raise ValueError("sort_cols must be non-empty")
    cols = [F.col(c) for c in sort_cols]
    part = (
        df.repartitionByRange(n_files, *cols)
        if n_files is not None
        else df.repartitionByRange(*cols)
    )
    part.sortWithinPartitions(*cols).write.mode(mode).parquet(path)
