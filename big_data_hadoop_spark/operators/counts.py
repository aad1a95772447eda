"""Frequency counts and top-K (SURVEY §2.3 A1/A3, §2.5 T1).

The reference's combiner wiring (``HadoopWordCount.java:119``) is subsumed
by Catalyst's automatic partial/final HashAggregate; the Spark job's
driver-side ``sortBy().take(1000)`` + re-parallelize anti-pattern
(``SparkWordCount.scala:34-38``) becomes ``orderBy().limit(k)`` which plans
as ``TakeOrderedAndProject`` — per-partition top-K merged on the reducer,
no full sort, nothing materialized on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.tokenize import tokens


def token_counts(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = False,
    category: str | None = None,
) -> DataFrame:
    """``(category, token, cnt)`` — count of every categorized token.

    ``category`` filters to one class (``'word'``/``'number'``); the filter
    sits below the aggregate so pruning happens before the shuffle.
    """
    t = tokens(df, text_col=text_col, lowercase=lowercase, keep_cols=())
    if category is not None:
        t = t.filter(F.col("category") == category)
    return t.groupBy("category", "token").agg(F.count("*").alias("cnt"))


def top_k(counts: DataFrame, k: int = 1000) -> DataFrame:
    """Top-K tokens by count, deterministic.

    Adds the ``token ASC`` tie-break the reference lacks
    (``SparkWordCount.scala:34-35``, SURVEY Q8) so equal-count boundaries
    are total-ordered — required for oracle hash-matching.
    """
    return counts.orderBy(F.desc("cnt"), F.asc("token")).limit(k)


def salted_token_counts(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = False,
    category: str | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-level (salted) variant of ``token_counts`` for extreme key skew.

    Catalyst's partial aggregation already compacts hot keys map-side, so
    the plain groupBy is usually right. This variant is the explicit
    defense for the residual case — a reduce-side hot key whose partials
    still concentrate on one task (e.g. stopword counts fanned in from
    tens of thousands of map tasks at 100 TB): level 1 aggregates
    ``(token, random_salt)`` spreading each key over ``salt_buckets``
    reducers, level 2 sums the (at most ``salt_buckets``) partials per
    key. Results are identical to ``token_counts`` — sums are associative
    — which the property suite asserts.
    """
    t = tokens(df, text_col=text_col, lowercase=lowercase, keep_cols=())
    if category is not None:
        t = t.filter(F.col("category") == category)
    salt = (F.rand(seed=42) * salt_buckets).cast("int")
    level1 = (
        t.withColumn("_salt", salt)
        .groupBy("category", "token", "_salt")
        .agg(F.count("*").alias("c1"))
    )
    return (
        level1.groupBy("category", "token").agg(F.sum("c1").alias("cnt"))
    )
