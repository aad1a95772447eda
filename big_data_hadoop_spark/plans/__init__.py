"""Physical-plan inspection and audit (SURVEY §4).

The reference hand-codes every physical decision (combiners, custom
partitioners, reducer counts); this engine delegates them to Catalyst and
instead makes the RESULTING plan shapes assertable: tests pin down that
filters/projections reach the parquet scan, dimension joins broadcast,
top-K plans as TakeOrderedAndProject, and nothing degenerates into a
cartesian product — the properties that decide whether a query survives a
100x scale-up.
"""

from big_data_hadoop_spark.plans.audit import (
    formatted_plan,
    has_broadcast_join,
    has_cartesian_product,
    has_take_ordered,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "has_cartesian_product",
    "has_take_ordered",
    "pushed_filters",
    "read_schemas",
]
