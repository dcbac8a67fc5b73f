"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship feature-label-set pipeline on
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with DuckDB oracles (see
svoe_spark/queries.py for the determinism contract).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from svoe_spark.all_queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's core product — a point-in-time-joined
    FeatureLabelSet (mid/volatility/TVI features + lookahead label)
    over the sf0.001 event stream."""
    from svoe_spark.flagship import feature_label_set

    return feature_label_set(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in QUERIES.items() if q.sql is not None}
