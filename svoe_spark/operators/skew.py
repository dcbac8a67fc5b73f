"""Skew-mitigation helpers.

AQE's skew-join splitting handles joins, and Spark's hash aggregation
already does map-side partial aggregation — so for sum/count/min/max,
key skew is largely pre-compressed before the shuffle. Salting earns
its keep for HOLISTIC aggregates (collect_list/collect_set, exact
percentiles, large HLL merges) where partials don't compress: stage one
spreads a hot key over `salt` sub-groups, stage two merges the
sub-results, bounding any single task's input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    partial_aggs: stage-1 expressions over raw rows (e.g. sum(x) as s).
    merge_aggs: stage-2 expressions over the stage-1 columns (e.g.
    sum(s) as s). Example:

        salted_agg(df, ['k'],
                   {'s': F.sum('x'), 'n': F.count(F.lit(1))},
                   {'s': F.sum('s'), 'n': F.sum('n')})
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merge_aggs.items()]
    )
