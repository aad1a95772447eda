"""Windowed co-occurrence: pairs and stripes (SURVEY §2.4 W1-W4).

The reference's signature computation. For each raw token position ``i``
whose token is categorized, and each offset ``d`` in the window, emit the
co-occurrence ``(t[i], t[i+d])`` iff ``t[i+d]`` has the SAME category
(``HadoopWordPairs.java:54-79``, ``HadoopWordPairs2.java:49-77``,
``HadoopWordStripes2.java:50-112``).

Spark-first formulation: the window is computed with array higher-order
functions over the per-document token array — ``transform`` with an index
lambda enumerates positions, ``F.get`` handles out-of-range neighbors by
returning NULL. There is NO self-join and NO SQL window: the whole
pair-generation is a narrow projection inside whole-stage codegen, and the
single shuffle in the plan is the final count aggregation. At 100 TB this
matters: a band self-join on ``(doc_id, pos BETWEEN ...)`` would shuffle the
token stream twice and explode the equi-join on ``doc_id``; the array form
shuffles only the (much smaller) aggregated pair counts.

Skew note: stopword pairs are Zipf-skewed. The aggregation is a partial
(map-side) + final HashAggregate, so hot keys are pre-compacted in every
task before the shuffle — the same defense the reference wires by hand as a
combiner — and AQE handles residual post-shuffle skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.tokenize import tokenized, tokens


def _window_elements(toks: Column, cats: Column, offsets: list[int]) -> Column:
    """Array of ``struct(category, left, right)`` for every in-window,
    same-category co-occurrence in one document.

    ``offsets`` are the relative positions to pair with (e.g. ``[1]`` for
    distance-1 forward pairs, ``[-m..-1, 1..m]`` for symmetric stripes).
    ``F.get`` returns NULL for out-of-range indexes, and the filter drops
    those along with cross-category and uncategorized pairs — exactly the
    reference's guard structure (``HadoopWordPairs2.java:61-66``).
    """
    offs = F.array(*[F.lit(d) for d in offsets])
    return F.flatten(
        F.transform(
            toks,
            lambda x, i: F.filter(
                F.transform(
                    offs,
                    lambda d: F.struct(
                        F.get(cats, i).alias("category"),
                        x.alias("left"),
                        F.get(toks, i + d).alias("right"),
                        F.get(cats, i + d).alias("right_category"),
                    ),
                ),
                lambda s: s["category"].isNotNull()
                & s["right_category"].isNotNull()
                & (s["category"] == s["right_category"]),
            ),
        )
    )


def _cooccur_counts(
    df: DataFrame,
    offsets: list[int],
    text_col: str = "text",
    lowercase: bool = False,
) -> DataFrame:
    """``(category, left, right, cnt)`` for the given offset window."""
    t = tokenized(df, text_col=text_col, lowercase=lowercase, keep_cols=())
    elems = _window_elements(F.col("toks"), F.col("cats"), offsets)
    return (
        t.select(F.explode(elems).alias("p"))
        .groupBy(
            F.col("p.category").alias("category"),
            F.col("p.left").alias("left"),
            F.col("p.right").alias("right"),
        )
        .agg(F.count("*").alias("cnt"))
    )


def pair_counts(
    df: DataFrame,
    m: int = 1,
    text_col: str = "text",
    lowercase: bool = False,
) -> DataFrame:
    """W1 (``m=1``) / W2 (window ``m``) forward pairs.

    ``(category, left, right, cnt)`` where ``right`` occurs 1..m positions
    after ``left`` in the raw stream and shares its category. ``m`` is a
    plan literal — distribution-safe by construction, unlike the
    reference's driver-JVM static (``HadoopWordPairs2.java:26,123``,
    SURVEY Q3). Pairs are strictly per-document (SURVEY Q2 fix).
    """
    if m < 1:
        raise ValueError(f"window must be >= 1, got {m}")
    return _cooccur_counts(df, list(range(1, m + 1)), text_col, lowercase)


def neighbor_counts(
    df: DataFrame,
    m: int = 1,
    text_col: str = "text",
    lowercase: bool = False,
) -> DataFrame:
    """Symmetric neighbor counts: ``(category, token, neighbor, cnt)`` with
    neighbors at distance 1..m in EITHER direction (stripe edges, W3/W4).

    Emitted in one pass with offsets ``±1..±m`` — one shuffle total, rather
    than deriving from forward pairs with a second aggregation.
    """
    if m < 1:
        raise ValueError(f"window must be >= 1, got {m}")
    offsets = [d for d in range(-m, m + 1) if d != 0]
    nb = _cooccur_counts(df, offsets, text_col, lowercase)
    return nb.select(
        "category",
        F.col("left").alias("token"),
        F.col("right").alias("neighbor"),
        "cnt",
    )


def stripes(
    df: DataFrame,
    m: int = 1,
    text_col: str = "text",
    lowercase: bool = False,
    keep_empty: bool = True,
) -> DataFrame:
    """W3/W4 stripes: ``(category, token, stripe map<string,long>, mass)``.

    Built as the flat neighbor aggregation rolled up to a map —
    ``map_from_entries(sort_array(collect_list(...)))`` — never an in-memory
    per-record map accumulation (the reference's ``MapWritable`` combiner,
    ``HadoopWordStripes.java:115-160``): the flat partial HashAggregate
    compacts earlier and spills, and the collect_list is bounded by a
    token's distinct-neighbor cardinality, not corpus size.

    ``keep_empty`` preserves the reference's behavior of emitting a stripe
    for every categorized token even when it has no same-category neighbor
    (``HadoopWordStripes.java:100``). Map entries are key-sorted so any
    serialization of the map is canonical (SURVEY Q7).
    """
    nb = neighbor_counts(df, m=m, text_col=text_col, lowercase=lowercase)
    agg = nb.groupBy("category", "token").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("neighbor", "cnt")))
        ).alias("stripe"),
        F.sum("cnt").alias("mass"),
    )
    if not keep_empty:
        return agg
    vocab = (
        tokens(df, text_col=text_col, lowercase=lowercase, keep_cols=())
        .select("category", "token")
        .distinct()
    )
    return (
        vocab.join(agg, ["category", "token"], "left")
        .withColumn(
            "stripe",
            F.coalesce("stripe", F.expr("cast(map() as map<string,bigint>)")),
        )
        .withColumn("mass", F.coalesce("mass", F.lit(0).cast("long")))
    )


def stripe_entries(stripes_df: DataFrame) -> DataFrame:
    """Canonical export: stripe map → key-sorted ``['n:cnt', ...]`` array.

    MapType has no defined order, so oracle comparison and text export
    always go through this form (SURVEY §2.8 probe rules).
    """
    return stripes_df.withColumn(
        "stripe",
        F.transform(
            F.map_entries("stripe"),
            lambda e: F.concat_ws(":", e["key"], e["value"]),
        ),
    )
