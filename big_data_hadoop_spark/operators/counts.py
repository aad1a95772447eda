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


def diagnose_skew(
    df: DataFrame,
    key_cols: list[str] | str,
    n_top: int = 20,
    shuffle_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Pre-flight skew report for a planned ``groupBy``/``join`` on
    ``key_cols``: the top-``n_top`` heaviest keys plus summary numbers
    that say whether the default hash shuffle will straggle and what to
    do about it.

    Returns ``(top_keys, summary)``: ``top_keys`` is a DataFrame of
    ``(<key_cols...>, cnt, share)`` ordered heaviest-first;
    ``summary`` has ``rows``, ``distinct_keys``, ``max_key_rows``,
    ``p50_key_rows``, ``p99_key_rows``, ``avg_task_rows`` (rows /
    shuffle partitions), ``skew_factor`` (max key ÷ avg task — >1 means
    the hottest key alone overflows its task), and
    ``recommended_salt_buckets`` (1 = no salting needed; else the
    bucket count that levels the hottest key to roughly one task's
    share, the input :func:`salted_token_counts`-style two-level aggs
    take).

    Cost: ONE map-side-combinable count per key (the combiner shrinks
    hot keys before the shuffle — counting a skewed key is cheap even
    when joining on it is not) + one tiny aggregate over the O(distinct
    keys) count table. No sampling bias: exact counts.
    """
    import math

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    spark = df.sparkSession
    if shuffle_partitions is None:
        shuffle_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
    per_key = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    row = per_key.agg(
        F.sum("cnt").alias("rows"),
        F.count(F.lit(1)).alias("distinct_keys"),
        F.max("cnt").alias("max_key_rows"),
        F.expr("approx_percentile(cnt, 0.5)").alias("p50_key_rows"),
        F.expr("approx_percentile(cnt, 0.99)").alias("p99_key_rows"),
    ).first()
    rows = row.rows or 0
    avg_task = rows / shuffle_partitions if rows else 0.0
    skew = (row.max_key_rows / avg_task) if avg_task else 0.0
    summary = {
        "rows": rows,
        "distinct_keys": row.distinct_keys,
        "max_key_rows": row.max_key_rows or 0,
        "p50_key_rows": row.p50_key_rows or 0,
        "p99_key_rows": row.p99_key_rows or 0,
        "avg_task_rows": round(avg_task, 1),
        "skew_factor": round(skew, 2),
        "recommended_salt_buckets": (
            1 if skew <= 1.0 else min(int(math.ceil(skew)), shuffle_partitions)
        ),
    }
    top = (
        per_key.orderBy(F.desc("cnt"), *[F.asc(k) for k in keys])
        .limit(n_top)
        .withColumn(
            "share",
            F.round(F.col("cnt") / F.lit(rows if rows else 1), 6),
        )
    )
    return top, summary
