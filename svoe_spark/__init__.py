"""svoe_spark — a PySpark-native time-series feature-engineering and
data-processing engine.

Re-expresses the capabilities of the reference feature-store (anovv/svoe —
declarative feature DAGs over timestamped event streams, batch/stream
unified, Parquet-block storage) as idiomatic Spark: DataFrames in,
DataFrames out, Catalyst/Tungsten doing the heavy lifting, Structured
Streaming for the online path.

Layout:
    functions/   scalar/column helpers (time, hashing, vectors, text)
    operators/   DataFrame->DataFrame library ops (as-of join, windows,
                 dedup, similarity, order-book reconstruction, sampling)
    sources/     table loaders, synthetic generators, ingest, catalog
    plans/       feature tree + planner + Featurizer API (YAML config)
    streaming/   Structured Streaming variants of the stateful operators
"""

__version__ = "0.1.0"

from svoe_spark.session import get_spark  # noqa: F401
