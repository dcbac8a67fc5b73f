"""Streaming keyed equi-join (reference J3, v2 operator.py:213-252).

The reference buffers both sides per key FOREVER and emits unmatched
rows immediately — unbounded state, no eviction. Structured Streaming's
watermarked stream-stream join gives the same logical join with BOUNDED
state: rows outside the watermark interval are evicted. This is
strictly better semantics at scale (state size ~ rate x interval,
not x stream lifetime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_equi_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    on: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "10 seconds",
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """Join two streams on `key` where events fall within `max_delay` of
    each other. Both sides watermarked (required for state eviction);
    the time-band predicate bounds the join state."""
    lw = left.withWatermark(on, watermark)
    rw = right.withWatermark(on, watermark)
    renamed = rw.select(
        F.col(key).alias(f"{key}{suffix}"),
        F.col(on).alias(f"{on}{suffix}"),
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in right.columns
            if c not in (key, on)
        ],
    )
    cond = (
        (F.col(key) == F.col(f"{key}{suffix}"))
        & (F.col(f"{on}{suffix}") >= F.col(on) - F.expr(f"INTERVAL {max_delay}"))
        & (F.col(f"{on}{suffix}") <= F.col(on) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(renamed, cond, how)
