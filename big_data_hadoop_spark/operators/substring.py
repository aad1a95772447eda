"""Exact duplicated-substring detection and removal (corpus-level).

The window-hash formulation of exact substring deduplication from the
public "Deduplicating Training Data Makes Language Models Better" line of
work (Lee et al. 2021): any substring of length >= k that occurs twice in
the corpus is, position by position, a run of duplicated character
k-grams, so marking every k-char window whose content occurs at an
earlier corpus position and merging overlapping marks recovers the
duplicated regions without a suffix array — the shape that distributes.
The reference repo has no analog; this extends the engine's dedup tier
(exact / MinHash-LSH / SimHash / PPJoin / winnow) down to sub-document
granularity.

Exact semantics (fixed contract, replicated by the pure-Python oracle in
``tests/test_substring.py``):

* Positions are 0-based character offsets into the RAW text (no
  lowercasing or normalization — exact substring dedup is byte-faithful).
* The window at ``(doc_id, pos)`` is REDUNDANT iff the same k-gram
  content also occurs at a lexicographically smaller ``(doc_id, pos)`` —
  corpus-global keep-first, so the first occurrence of any repeated
  region survives removal, and within-document self-repeats count.
* ``duplicate_spans`` merges a document's redundant windows that overlap
  or touch (``next_start <= current_end``, ends exclusive) into maximal
  ``(doc_id, span_start, span_len)`` rows, ``span_len >= k``.
* ``remove_duplicate_spans`` excises exactly those character ranges and
  returns each document's surviving text (order preserved, no joiner
  inserted). Removal can itself create new k-grams across excision
  boundaries; one pass makes no fixpoint claim (neither does the
  published algorithm).

Content identity is ``xxhash64`` of the k-gram, not the k-gram string:
the shuffle moves 8-byte keys instead of k-char substrings. A collision
falsely marks one window redundant; at 64 bits that needs ~2^32
duplicated-window candidates sharing a partition of the hash space —
negligible against corpus sizes this engine targets, and the reason this
family sits in the rows-only verification tier (hash identity is not
ANSI-SQL-reproducible).

Scale shape: ONE narrow per-row pass builds the window-hash array (an
attribute-staged ``transform``, no O(len^2) re-evaluation), ONE explode
to ``(hash, doc, pos)`` rows — linear in corpus characters, the honest
cost of the algorithm — and ONE shuffle of those rows, partitioned by
the 8-byte hash, under ``min(struct(doc, pos)) OVER (PARTITION BY
hash)``; each row compares itself to its hash's minimum in place, so
the dominant relation is shuffled exactly once (the groupBy-then-join
alternative shuffles it twice — measured 2x slower at sf0.1). Only the
surviving redundant rows (duplicated text, typically a small fraction)
reach the per-document aggregation. Span merging and excision are
native expression folds (zero additional shuffle). Nothing is
all-pairs and no posting list is ever collected: hot k-grams
(boilerplate shared by millions of documents) are just rows sharing a
hash partition, never lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["duplicate_spans", "remove_duplicate_spans"]


def _redundant_starts(
    df: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """``(id_col, starts)``: per document, the SORTED 0-based start
    positions of windows whose k-gram content has an earlier occurrence.
    Documents with no redundant window are absent."""
    if k < 2:
        raise ValueError(f"window length k must be >= 2, got {k}")
    staged = df.select(F.col(id_col), F.col(text_col).alias("_t"))
    n_windows = F.length("_t") - k + 1
    hashes = F.when(
        n_windows >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
            lambda i: F.xxhash64(F.substring(F.col("_t"), i, F.lit(k))),
        ),
    )
    occ = staged.select(
        F.col(id_col), F.posexplode(hashes).alias("pos", "h")
    )
    # Unique hashes (the dominant mass) are their own minimum and drop
    # out here; only genuinely duplicated windows survive the filter.
    first = F.min(
        F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
    ).over(Window.partitionBy("h"))
    red = (
        occ.withColumn("first", first)
        .filter(
            (F.col(id_col) != F.col("first.d")) | (F.col("pos") != F.col("first.p"))
        )
        .select(id_col, "pos")
    )
    return red.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("starts")
    )


def _merge_spans(starts: Column, k: int) -> Column:
    """Sorted window starts -> merged ``array<struct<s,e>>`` spans
    (``e`` exclusive), merging windows that overlap or touch."""
    empty = F.expr("cast(array() as array<struct<s:int,e:int>>)")
    span = lambda s, e: F.struct(s.alias("s"), e.alias("e"))  # noqa: E731
    return F.aggregate(
        starts,
        empty,
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (s <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    span(
                        F.element_at(acc, -1)["s"],
                        F.greatest(F.element_at(acc, -1)["e"], s + k),
                    )
                ),
            ),
        ).otherwise(F.concat(acc, F.array(span(s, s + F.lit(k))))),
    )


def duplicate_spans(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal duplicated character spans per document (see module
    docstring for the redundancy contract). Output: ``(id_col,
    span_start, span_len)``, one row per merged span; documents whose
    text repeats nothing emit no rows."""
    spans = _redundant_starts(df, k, text_col, id_col).select(
        F.col(id_col), F.explode(_merge_spans(F.col("starts"), k)).alias("sp")
    )
    return spans.select(
        id_col,
        F.col("sp.s").cast("long").alias("span_start"),
        (F.col("sp.e") - F.col("sp.s")).cast("long").alias("span_len"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents with every duplicated span excised (corpus-global
    keep-first: the earliest occurrence of a repeated region is the one
    that survives). Output: the input columns with ``text_col`` replaced
    by the cleaned text; rows whose text had no duplicated span pass
    through byte-identical."""
    marked = _redundant_starts(df, k, text_col, id_col)
    joined = df.join(marked, id_col, "left")
    spans = _merge_spans(F.col("starts"), k)
    text = F.col(text_col)
    seed = F.struct(
        F.lit(0).alias("prev"), F.lit("").cast("string").alias("out")
    )
    cleaned = F.aggregate(
        spans,
        seed,
        lambda acc, sp: F.struct(
            sp["e"].alias("prev"),
            F.concat(
                acc["out"],
                F.substring(text, acc["prev"] + 1, sp["s"] - acc["prev"]),
            ).alias("out"),
        ),
        lambda acc: F.concat(
            acc["out"],
            F.substring(text, acc["prev"] + 1, F.length(text) - acc["prev"]),
        ),
    )
    out_text = F.when(F.col("starts").isNull(), text).otherwise(cleaned)
    return joined.select(
        *[
            out_text.alias(c) if c == text_col else F.col(c)
            for c in df.columns
        ]
    )
