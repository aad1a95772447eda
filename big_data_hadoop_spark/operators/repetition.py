"""Intra-document repetition signals (the Gopher quality-filter family).

Implements the repetition measurements from the public Gopher paper (Rae
et al. 2021, "Scaling Language Models: Methods, Analysis & Insights from
Training Gopher", Table A1), the family open curation stacks apply before
training: duplicate-line fraction, duplicate-line character fraction, top
n-gram character fraction (small n), and duplicated n-gram character
coverage (larger n). High values mark boilerplate-heavy or degenerate
documents. The reference has no analog (its surface is the six word-count
programs); this extends the engine's LLM-curation tier alongside
``textstats.quality_scores``.

Exact semantics (a fixed contract, replicated instruction-for-instruction
by the pure-Python oracle in ``tests/test_repetition.py``):

* Lines are ``split(text, '\\n')`` with empty lines dropped; paragraphs
  are ``split(text, '\\n\\n')`` with paragraphs dropped when they contain
  only ASCII whitespace (the explicit class ``[ \\t\\n\\x0b\\f\\r]`` —
  both Gopher units).
* ``dup_line_frac`` = (n_lines - n_distinct_lines) / n_lines, and the
  same formula per paragraph as ``dup_para_frac``.
* ``dup_line_char_frac`` = characters in repeated line occurrences beyond
  each line's first / total line characters; ``dup_para_char_frac``
  likewise per paragraph.
* Tokens are the engine's single-space split (``functions.text.
  split_tokens``), lowercased, empties dropped. An n-gram's character
  length is the sum of its token lengths (joining spaces excluded); the
  per-document denominator is the sum of ALL token lengths.
* ``top_{n}gram_char_frac`` = count * chars(g) / total for the most
  frequent n-gram ``g``, clamped to 1.0 — 0.0 when no n-gram repeats or
  the document has fewer than n tokens. Overlapping occurrences each
  count, so the raw ratio exceeds 1 on degenerate docs (12x ``"a"`` →
  11 * 2 / 12); the clamp keeps the [0, 1] bound without moving any
  real filter threshold. Ties break by (count, char length, gram
  string) descending: a determinism pin, not semantics.
* ``dup_{n}gram_char_frac`` = summed length of token positions covered by
  at least one n-gram occurring more than once, / total. Overlapping
  duplicate n-grams cover each position once (coverage, not
  multiplicity) — the Gopher definition. Gram identity on this path is
  ``xxhash64`` over the token slice (the q61 duplicate-span precedent:
  64-bit content identity instead of materialized gram strings — a
  collision, ~#grams²/2⁶⁴, could only mark one extra position
  duplicated).

Scale shape: line metrics and coverage arithmetic are per-row native
expressions (zero shuffle); n-gram frequency is ONE ``posexplode`` over
(doc, n, position) and ONE aggregation keyed ``(doc_id, n, gram)`` — the
same fan-out/aggregate skeleton as the engine's word-count path
(partition-parallel, never O(doc_len^2) per row, never all-pairs), then a
per-document pivot back to columns. Duplicate-gram start positions ride
the aggregation as per-document lists (bounded by document token count),
so no second pass over text is needed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_data_hadoop_spark.functions.text import split_tokens

__all__ = ["dup_line_frac_col", "repetition_signals"]


def _char_sum(arr: Column) -> Column:
    return F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
    )


def dup_line_frac_col(text_col: str = "text") -> Column:
    """``dup_line_frac`` as a STANDALONE per-row Column (same contract as
    the ``repetition_signals`` output column, pinned by test): the
    fraction of non-empty lines that repeat an earlier line. Stateless
    and shuffle-free, so it composes into fused gate predicates — batch
    scan filters and streaming filters alike (``pipeline.curation_gate``
    uses it for the Gopher-style repetition gate)."""
    lines = F.filter(
        F.split(F.col(text_col), "\n", -1), lambda l: l != F.lit("")
    )
    n = F.size(lines).cast("long")
    return (n - F.size(F.array_distinct(lines)).cast("long")).cast(
        "double"
    ) / F.greatest(n, F.lit(1).cast("long"))


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: Sequence[int] = (2, 3, 4),
    dup_ns: Sequence[int] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Per-document repetition signals; see module docstring for the
    exact contract. Output: ``(id_col, dup_line_frac,
    dup_line_char_frac, top_{n}gram_char_frac..., dup_{n}gram_char_frac
    ...)``, one row per input row, all fractions DOUBLE in [0, 1].
    """
    top_ns = sorted(set(top_ns))
    dup_ns = sorted(set(dup_ns))
    all_ns = sorted({*top_ns, *dup_ns})
    if not all_ns or min(all_ns) < 1:
        raise ValueError(f"n-gram sizes must be >= 1: top={top_ns} dup={dup_ns}")

    toks = F.filter(
        split_tokens(F.col(text_col), lowercase=True), lambda t: t != F.lit("")
    )
    lines = F.filter(F.split(F.col(text_col), "\n", -1), lambda l: l != F.lit(""))
    # "whitespace-only" pins an EXPLICIT ASCII class: SQL trim strips
    # only spaces and Python str.strip() strips all unicode whitespace —
    # either shorthand diverges between the engine and its oracle (same
    # precedent as textstats.BPE_PATTERN).
    paras = F.filter(
        F.split(F.col(text_col), "\n\n", -1),
        lambda p: F.regexp_replace(p, "[ \t\n\x0b\f\r]", "") != F.lit(""),
    )

    # Stage arrays as attributes before any reuse: expressions referenced
    # from several places (or inside HOF lambdas) re-evaluate their whole
    # subtree per reference (see textstats.winnow_fingerprints).
    staged = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        lines.alias("_lines"),
        paras.alias("_paras"),
    )

    def _unit_fracs(col: str) -> tuple[Column, Column]:
        n = F.size(col).cast("long")
        dist = F.array_distinct(F.col(col))
        frac = (n - F.size(dist).cast("long")).cast("double") / F.greatest(
            n, F.lit(1).cast("long")
        )
        char_frac = (
            (_char_sum(F.col(col)) - _char_sum(dist)).cast("double")
            / F.greatest(_char_sum(F.col(col)), F.lit(1).cast("long"))
        )
        return frac, char_frac

    line_frac, line_char_frac = _unit_fracs("_lines")
    para_frac, para_char_frac = _unit_fracs("_paras")
    base = staged.select(
        F.col(id_col),
        F.col("_toks"),
        F.transform("_toks", lambda t: F.length(t).cast("long")).alias("_tlens"),
        line_frac.alias("dup_line_frac"),
        line_char_frac.alias("dup_line_char_frac"),
        para_frac.alias("dup_para_frac"),
        para_char_frac.alias("dup_para_char_frac"),
    ).withColumn(
        "_tot",
        F.aggregate("_tlens", F.lit(0).cast("long"), lambda a, x: a + x),
    )

    # One row per (doc, n, gram position). A doc shorter than n yields a
    # NULL array, which posexplode drops — restored as zero-fractions by
    # the left join below. The two signal families key their grams
    # differently, and the difference is the dominant cost at scale:
    #
    # * top_ns (small n, argmax): the gram STRING is load-bearing — the
    #   documented tie-break orders by (count, char length, gram) and
    #   the char length itself comes off the string — so these rows
    #   carry materialized array_join slices.
    # * dup_ns (large n, coverage): the gram is ONLY an identity key, so
    #   rows carry ``xxhash64`` over the token slice instead (the q61
    #   duplicate-span precedent: 8-byte content identity, no per-gram
    #   string build, and the (doc, n, gram) shuffle moves fixed-width
    #   keys instead of up-to-n-token strings). Measured at sf0.1 this
    #   halves the probe; at 100 TB it is the difference between
    #   shuffling hashes and shuffling most of the corpus n times over.
    def _occ(ns: Sequence[int], gram_expr) -> DataFrame:
        with_n = base.select(
            F.col(id_col),
            F.col("_toks"),
            F.explode(F.array(*[F.lit(n) for n in ns])).alias("n"),
        )
        grams = F.when(
            F.size("_toks") >= F.col("n"),
            F.transform(
                F.sequence(F.lit(1), F.size("_toks") - F.col("n") + 1),
                gram_expr,
            ),
        )
        return with_n.select(
            F.col(id_col), F.col("n"), F.posexplode(grams).alias("pos", "gram")
        )

    occ_top = _occ(
        top_ns, lambda i: F.array_join(F.slice("_toks", i, F.col("n")), " ")
    )
    cnt_top = occ_top.groupBy(id_col, "n", "gram").agg(F.count("*").alias("c"))
    gram_chars = (F.length("gram") - F.col("n") + 1).cast("long")
    agg_top = cnt_top.groupBy(id_col, "n").agg(
        F.max(
            F.struct(
                F.col("c").alias("c"),
                gram_chars.alias("gl"),
                F.col("gram").alias("g"),
            )
        ).alias("m"),
    )
    per_top = agg_top.select(
        F.col(id_col),
        "n",
        F.when(F.col("m.c") > 1, F.col("m.c") * F.col("m.gl"))
        .otherwise(F.lit(0).cast("long"))
        .alias("top_chars"),
    )

    occ_dup = _occ(dup_ns, lambda i: F.xxhash64(F.slice("_toks", i, F.col("n"))))
    # collect_list drops the NULL emitted for non-repeated grams.
    cnt_dup = occ_dup.groupBy(id_col, "n", "gram").agg(
        F.count("*").alias("c"), F.collect_list("pos").alias("poss")
    )
    agg_dup = cnt_dup.groupBy(id_col, "n").agg(
        F.flatten(
            F.collect_list(F.when(F.col("c") > 1, F.col("poss")))
        ).alias("starts"),
    )

    # Pivot n back into columns. Each (doc, n) key holds exactly one row,
    # so max(when(n == k, v)) is a plain conditional projection.
    piv_top = per_top.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("top_chars"))).alias(f"_top_{n}")
            for n in top_ns
        ],
    )
    piv_dup = agg_dup.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("starts"))).alias(f"_starts_{n}")
            for n in dup_ns
        ],
    )

    joined = base.join(piv_top, id_col, "left").join(piv_dup, id_col, "left")
    tot = F.greatest(F.col("_tot"), F.lit(1).cast("long"))
    out_cols = [
        F.col(id_col),
        F.col("dup_line_frac"),
        F.col("dup_line_char_frac"),
        F.col("dup_para_frac"),
        F.col("dup_para_char_frac"),
    ]
    for n in top_ns:
        out_cols.append(
            F.least(
                F.coalesce(F.col(f"_top_{n}"), F.lit(0).cast("long")).cast("double")
                / tot,
                F.lit(1.0),
            ).alias(f"top_{n}gram_char_frac")
        )
    for n in dup_ns:
        covered = F.array_distinct(
            F.flatten(
                F.transform(
                    F.coalesce(
                        F.col(f"_starts_{n}"),
                        F.expr("cast(array() as array<int>)"),
                    ),
                    lambda s: F.sequence(s, s + F.lit(n - 1)),
                )
            )
        )
        covered_len = F.aggregate(
            covered,
            F.lit(0).cast("long"),
            lambda a, i: a + F.element_at("_tlens", i + 1),
        )
        out_cols.append(
            (covered_len.cast("double") / tot).alias(f"dup_{n}gram_char_frac")
        )
    return joined.select(*out_cols)
