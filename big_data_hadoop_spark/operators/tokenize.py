"""Tokenization (SURVEY §2.2 P1-P5).

Two shapes, both built on the same split+classify expressions:

- ``tokenized`` keeps the token stream as ARRAY columns (``toks``,
  ``cats``) — the co-occurrence operators consume this form and compute
  windows with array higher-order functions, so adjacency never needs a
  shuffle or a self-join.
- ``tokens`` explodes to one row per raw position — the counting operators
  and the relational surface consume this long form.

Positions are 0-based over the RAW split stream **including** tokens that
match no category: in the reference, a non-matching token occupies a
position and breaks adjacency but never pairs
(``HadoopWordPairs.java:54-78``). Pairs/stripes here are strictly
per-document (per-line for line sources) — a deliberate, documented fix of
the reference's accidental cross-line carryover (SURVEY Q2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_hadoop_spark.functions.text import categorize, split_tokens


def tokenized(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = False,
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Add ``toks: array<string>`` and ``cats: array<string>`` columns.

    ``cats[i]`` is the category of ``toks[i]`` or NULL. Both arrays are
    positionally aligned with the raw split stream.
    """
    arr = split_tokens(F.col(text_col), lowercase=lowercase)
    return df.select(*keep_cols, arr.alias("toks")).withColumn(
        "cats", F.transform("toks", categorize)
    )


def tokens(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = False,
    keep_cols: tuple[str, ...] = ("doc_id",),
    categorized_only: bool = True,
) -> DataFrame:
    """Long form: one row per raw token position.

    Columns: ``*keep_cols, pos int, token string, category string``.
    With ``categorized_only`` (default) rows whose token matches neither
    pattern are dropped — positions are assigned before the filter, so
    adjacency semantics survive.
    """
    t = tokenized(df, text_col=text_col, lowercase=lowercase, keep_cols=keep_cols)
    out = t.select(
        *keep_cols,
        F.posexplode(F.arrays_zip("toks", "cats")).alias("pos", "tc"),
    ).select(
        *keep_cols,
        "pos",
        F.col("tc.toks").alias("token"),
        F.col("tc.cats").alias("category"),
    )
    if categorized_only:
        out = out.filter(F.col("category").isNotNull())
    return out
