"""Regular-grid resampling with forward fill (gap filling).

The reference's emission sampling (T3) downsamples an event stream to
at most one row per bucket, but leaves buckets with no events empty; a
training pipeline usually wants a REGULAR grid — one row per (key,
bucket) with the last observation carried forward — so features sampled
at different native rates align on join keys. This operator generates
the grid with ``sequence()`` (no driver-side loop) and fills it with
the library as-of join (one shuffle; bucketed scale path available).

Scale shape: the grid is built from one tiny per-key (min, max) agg —
|keys| rows — and exploded executor-side into |keys| x |buckets| rows;
the fill is the as-of join's single keyed sort. Nothing touches the
driver. For a hot key whose history exceeds one task, pass
``time_bucket`` through to the as-of join exactly as elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from svoe_spark.functions.time import duration_to_seconds
from svoe_spark.operators.asof import asof_join


def resample_ffill(
    df: DataFrame,
    on: str = "ts",
    by: list[str] | str | None = None,
    every: str | float = "1h",
    value_cols: list[str] | None = None,
    tiebreak: str | None = None,
    time_bucket: str | float | None = None,
) -> DataFrame:
    """df(key, ts, values...) -> one row per (key, UTC-aligned bucket of
    ``every``) from floor(min ts) to max ts per key, each carrying the
    latest observation at or before the grid instant (null before the
    first observation). ``tiebreak``: column whose greatest value wins
    among duplicate-timestamp rows (determinism under dup ts)."""
    if isinstance(by, str):
        by = [by]
    by = by or []
    step = int(duration_to_seconds(every))

    bounds = df.groupBy(*by).agg(
        F.min(on).alias("__mn"), F.max(on).alias("__mx")
    )
    grid = bounds.select(
        *by,
        F.explode(
            F.sequence(
                F.timestamp_seconds(
                    F.floor(F.unix_timestamp("__mn") / step) * step
                ),
                F.col("__mx"),
                F.expr(f"INTERVAL {step} SECOND"),
            )
        ).alias(on),
    )
    return asof_join(
        grid,
        df,
        on=on,
        by=by,
        right_cols=value_cols,
        tiebreak=tiebreak,
        time_bucket=time_bucket,
    )
