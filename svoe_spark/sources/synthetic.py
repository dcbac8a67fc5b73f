"""Synthetic deterministic sources.

Sine mid-price generator (reference:
synthetic_sine_mid_price/synthetic_sine_mid_price.py:25-46 — params
step/amplitude/mean/freq, num_samples=(end-start)/step): expressed as
``spark.range`` + column math, so it scales to any length without
driver-side generation and stays fully pushdown-friendly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sine_mid_price(
    spark: SparkSession,
    start_ts: float,
    end_ts: float,
    step: float = 1.0,
    amplitude: float = 2000.0,
    mean: float = 10000.0,
    freq: float = 5.0,
    keys: dict[str, str] | None = None,
) -> DataFrame:
    """Uniform-grid sine ticks: mid_price = amplitude*sin(2π·freq·t)+mean,
    t = sample index in seconds."""
    n = int((end_ts - start_ts) / step)
    df = spark.range(n).select(
        (F.lit(start_ts) + F.col("id") * step).cast("timestamp").alias("ts"),
        (
            amplitude * F.sin(2.0 * math.pi * freq * F.col("id") * step) + mean
        ).alias("mid_price"),
    )
    for k, v in (keys or {}).items():
        df = df.withColumn(k, F.lit(v))
    return df
