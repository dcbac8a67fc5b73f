"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the input has fewer partitions than
    cores. CPU-bound expression work (hashing, shingling) over a corpus
    that arrives as a few fat files would otherwise serialize onto a
    handful of tasks; no-op when the scan is already parallel.

    Streaming DataFrames pass through untouched: partition probing is
    a batch-only action, and micro-batch parallelism is governed by the
    source (maxFilesPerTrigger / topic partitions) anyway."""
    if df.isStreaming:
        return df
    try:
        # no sparkContext/rdd under Spark Connect — same guard as
        # orderbook._default_bundles; pass through rather than probe
        target = df.sparkSession.sparkContext.defaultParallelism
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001
        return df
    if n < target:
        return df.repartition(target)
    return df
