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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from svoe_spark.functions.time import duration_to_seconds
from svoe_spark.operators.asof import asof_join


def _grid_step(every: str | float) -> int:
    """Whole-second grid step, validated: duration_to_seconds happily
    returns fractions ('500ms' -> 0.5), which a silent int() would
    truncate to step=0 and an empty grid."""
    secs = duration_to_seconds(every)
    step = int(secs)
    if step < 1 or step != secs:
        raise ValueError(
            f"grid step must be a whole number of seconds >= 1, got {every!r}"
        )
    return step


def _time_grid(df: DataFrame, on: str, by: list[str], step: int) -> DataFrame:
    """Per-key regular grid: one row per (key, UTC-aligned ``step``
    bucket) from floor(min ts) to max ts — built from a |keys|-row
    (min, max) agg and exploded executor-side, never on the driver."""
    bounds = df.groupBy(*by).agg(F.min(on).alias("__mn"), F.max(on).alias("__mx"))
    return bounds.select(
        *by,
        F.explode(
            F.sequence(
                F.timestamp_seconds(F.floor(F.unix_timestamp("__mn") / step) * step),
                F.col("__mx"),
                F.expr(f"INTERVAL {step} SECOND"),
            )
        ).alias(on),
    )


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
    grid = _time_grid(df, on, by, _grid_step(every))
    return asof_join(
        grid,
        df,
        on=on,
        by=by,
        right_cols=value_cols,
        tiebreak=tiebreak,
        time_bucket=time_bucket,
    )


def resample_interpolate(
    df: DataFrame,
    on: str = "ts",
    by: list[str] | str | None = None,
    every: str | float = "1h",
    value_col: str = "value",
) -> DataFrame:
    """Gap-filled regular grid with BOTH fill policies (the
    timescaledb `time_bucket_gapfill` + `locf`/`interpolate` pair):
    one row per (key, UTC-aligned bucket of ``every``) from floor(min
    ts) to max ts per key, carrying

      * ``locf``   — last observation at or before the grid instant;
      * ``interp`` — linear interpolation between the bracketing
        observations, exactly the observed value when one lands on the
        grid instant, NULL outside the observed span (no
        extrapolation).

    ``(key, ts)`` must be unique on the data side — pre-aggregate
    duplicate instants first (the registered query does) — so the
    window order key ``(ts, is_grid)`` is unique and the fill is
    deterministic.

    Plan: the grid is exploded executor-side from a |keys|-row
    (min, max) agg, unioned with the data, and filled by two RUNNING
    ignore-nulls LAST frames — the backward bracket in (ts, is_grid)
    order and the forward bracket over the REVERSED order (a
    [current, unboundedFollowing] frame would make Spark re-aggregate
    the tail per row, O(rows²) per key). Two WindowExecs share one
    hash exchange on the key; each is a linear running scan. The
    interpolation ratio is a ratio of int64 microsecond deltas cast to
    double, so Spark and any ANSI engine produce bit-identical
    doubles.
    """
    if isinstance(by, str):
        by = [by]
    by = by or []
    grid = _time_grid(df, on, by, _grid_step(every))
    data = df.select(*by, on, value_col)
    u = data.withColumn("__is_grid", F.lit(0)).unionByName(
        grid.withColumn(value_col, F.lit(None).cast(data.schema[value_col].dataType))
        .withColumn("__is_grid", F.lit(1))
    )
    v = F.col(value_col)
    obs_ts = F.when(v.isNotNull(), F.unix_micros(F.col(on)))
    back = (
        Window.partitionBy(*by)
        .orderBy(on, "__is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the forward bracket as a RUNNING frame over the reversed order:
    # Spark evaluates [current, unboundedFollowing) frames by
    # re-aggregating the whole tail per row — O(rows^2) per key (67 s
    # vs ~1 s at sf0.1) — while both running frames here are O(rows),
    # one shuffle, two local sorts.
    fwd = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).desc(), F.col("__is_grid").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pv = F.last(v, ignorenulls=True).over(back)
    pt = F.last(obs_ts, ignorenulls=True).over(back)
    nv = F.last(v, ignorenulls=True).over(fwd)
    nt = F.last(obs_ts, ignorenulls=True).over(fwd)
    t = F.unix_micros(F.col(on))
    ratio = (t - pt).cast("double") / (nt - pt).cast("double")
    # pt == t: an observation lands exactly on the grid instant (the
    # grid row sorts after same-ts data rows, so the FORWARD bracket
    # may be absent when that observation is the last one — the ratio
    # form would return NULL on an exact hit).
    interp = F.when(pt == t, pv).otherwise(pv + (nv - pv) * ratio)
    return (
        u.select(
            *by,
            on,
            F.col("__is_grid"),
            pv.alias("locf"),
            interp.alias("interp"),
        )
        .where(F.col("__is_grid") == 1)
        .drop("__is_grid")
    )
