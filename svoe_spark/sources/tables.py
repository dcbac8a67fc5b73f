"""Loaders for the driver's deterministic parquet tables.

Scans stay fully declarative (``spark.read.parquet``) so Catalyst keeps
predicate pushdown / column pruning; mirrors the reference's block loader
(reference: svoe/common/pandas/df_utils.py:15-17) without the pandas hop.

Nanosecond-timestamp parquet columns (which Spark rejects by default)
are read as raw INT64 nanos and truncated to microsecond TimestampType
with exact integer division — the same ns->us truncation DuckDB applies,
so event-time semantics agree across engines.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
ALL_TABLES = TPCH_TABLES + ("events", "documents", "embeddings")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=256)
def _nanos_columns(path: str) -> tuple[str, ...]:
    """Columns stored as timestamp[ns] (footer-only read, cached)."""
    import pyarrow.parquet as pq
    import pyarrow.types as pt

    target = path
    if os.path.isdir(path):
        # recurse: partitioned datasets keep every file under
        # day=*/... subdirectories with no top-level .parquet
        target = None
        for root, dirs, files in os.walk(path):
            dirs.sort()
            for f in sorted(files):
                if f.endswith(".parquet"):
                    target = os.path.join(root, f)
                    break
            if target:
                break
        if target is None:
            return ()
    schema = pq.read_schema(target)
    # physical check: pyarrow surfaces Spark-written INT96 timestamps
    # as timestamp[ns] too, but Spark reads those natively — only
    # INT64 TIMESTAMP(NANOS) columns need the nanosAsLong route
    physical = {
        c.name: c.physical_type for c in pq.ParquetFile(target).schema
    }
    return tuple(
        f.name
        for f in schema
        if pt.is_timestamp(f.type)
        and f.type.unit == "ns"
        and physical.get(f.name) == "INT64"
    )


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP (LTZ).

    The driver's parquet stores event time as isAdjustedToUTC=false; with
    the session tz pinned to UTC the cast is value-identical, and LTZ is
    required by watermarks / unix_timestamp / double casts downstream.
    """
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with transparent ns-timestamp and NTZ handling.

    NOTE: reading an ns dataset sets spark.sql.legacy.parquet.nanosAsLong
    for the SESSION (it must stay set while the returned lazy DataFrame
    executes) — after that, a plain spark.read.parquet of another ns
    dataset returns bigint nanos instead of erroring. Always read
    parquet through this function."""
    ns_cols = _nanos_columns(path)
    if not ns_cols:
        return normalize_ntz(spark.read.parquet(path))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # integer DIV keeps exactness at 1e18 nanos; truncation toward
        # zero == DuckDB's ns->us cast for post-epoch data
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return normalize_ntz(df)


#: (table, sf_dir) -> (session, DataFrame): the UNEVALUATED scan plan,
#: memoized per session. Building it costs ~0.1 s per call (a pyarrow
#: footer read for ns-column detection + JVM schema inference), and the
#: bench's ~200 queries each rebuild the identical plan for immutable
#: input tables. The cache holds a logical plan only — every action
#: still scans the parquet files; no data or results are cached. Keyed
#: on session identity like queries_llm._cached_chain, so tests with
#: fresh sessions rebuild. Scoped to load_table (the fixed input
#: tables), NOT generic read_parquet, whose paths can be rewritten
#: between reads (e.g. SCD2Store refresh cycles).
_TABLE_PLAN_CACHE: dict[tuple[str, str], tuple[SparkSession, DataFrame]] = {}


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    key = (name, sf_dir)
    got = _TABLE_PLAN_CACHE.get(key)
    if got is not None and got[0] is spark:
        return got[1]
    if got is not None:
        # another session owns this key: purge EVERY entry of that
        # session (ADVICE r10 — a stopped session's plans must not
        # linger and delay its GC; an alternating live session merely
        # rebuilds, which is the documented churn trade-off)
        stale = got[0]
        for k in [k for k, v in _TABLE_PLAN_CACHE.items() if v[0] is stale]:
            _TABLE_PLAN_CACHE.pop(k, None)
    df = read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))
    _TABLE_PLAN_CACHE[key] = (spark, df)
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in ALL_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so Spark SQL can be used directly."""
    for name in ALL_TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
