"""Helpers for reading a DataFrame's physical plan as data.

Built on ``explainString(formatted)`` — the same text `.explain()` prints —
so audits match exactly what an operator sees while tuning. AQE re-plans at
runtime; these helpers inspect the initial physical plan, which is where
static properties (pushdown, join strategy selection, top-K form) live.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (pre-execution, pre-AQE-refinement)."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """Every ``PushedFilters`` entry across all scans, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """``ReadSchema`` struct strings of every parquet scan — the columns
    that actually leave the file (column-pruning evidence)."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", formatted_plan(df))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    """True when an ORDER BY + LIMIT planned as TakeOrderedAndProject —
    per-partition top-K merged once, no full sort, nothing driver-side."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def has_cartesian_product(df: DataFrame) -> bool:
    """An unkeyed O(n*m) join with NO broadcast side — at scale this is
    always a bug; BroadcastNestedLoopJoin (deliberate small-side cross) is
    not flagged."""
    return "CartesianProduct" in formatted_plan(df)
