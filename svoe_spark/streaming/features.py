"""Streaming variants of the feature operators.

Window-bucket aggregates translate directly (groupBy(window) +
watermark). Per-event trailing features (reference T1 `accumulate`
state machines) can't use analytic range frames in a stream; they
become `applyInPandasWithState` with a bounded per-key lookback buffer
— the Spark-native form of the reference's deque state
(stream_utils.py:31-39, trade_volume_imb_fd.py:22-27).

Watermark policy (T5): the reference assumes strictly ordered input
(sorted-block invariant); we default to a small configurable watermark
and document that 0 reproduces reference semantics for ordered feeds.
Note Spark's watermark lags one micro-batch (the watermark used in
batch N derives from batch N-1's max event time), so a late row is only
dropped once its window was finalized in an EARLIER batch — see
tests/test_skew_combine.py::test_watermark_drops_late_data.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StructField,
    StructType,
    TimestampType,
)

from svoe_spark.functions.time import duration_to_interval_string, duration_to_seconds
from svoe_spark.streaming.chunks import batch_frame


def ohlcv_stream(
    df: DataFrame,
    on: str = "ts",
    price: str = "price",
    amount: str = "amount",
    by: list[str] | str | None = None,
    window: str = "1m",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming OHLCV: watermarked tumbling window, one closed row per
    bucket (reference A1 emits on first event past the window end; the
    watermark generalizes that to bounded disorder)."""
    keys = [by] if isinstance(by, str) else list(by or [])
    w = F.window(on, duration_to_interval_string(window))
    wm = df.withWatermark(on, watermark)
    epoch = F.col(on).cast("double")
    return (
        wm.groupBy(*keys, w.alias("w"))
        .agg(
            F.min_by(price, epoch).alias("open"),
            F.max(price).alias("high"),
            F.min(price).alias("low"),
            F.max_by(price, epoch).alias("close"),
            F.sum(amount).alias("volume"),
            F.when(
                F.sum(amount) != 0,
                F.sum(F.col(price) * F.col(amount)) / F.sum(amount),
            ).alias("vwap"),
            F.count(F.lit(1)).alias("num_trades"),
        )
        .select(*keys, F.col("w.start").alias("window_start"), "open", "high",
                "low", "close", "volume", "vwap", "num_trades")
    )


def sample_last_stream(
    df: DataFrame,
    on: str = "ts",
    by: list[str] | str | None = None,
    every: str = "1s",
    watermark: str = "10 seconds",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming emission sampling (T3): last value per (key, bucket)."""
    keys = [by] if isinstance(by, str) else list(by or [])
    value_cols = value_cols or [
        c for c in df.columns if c not in keys and c != on
    ]
    w = F.window(on, duration_to_interval_string(every))
    epoch = F.col(on).cast("double")
    return (
        df.withWatermark(on, watermark)
        .groupBy(*keys, w.alias("w"))
        .agg(*[F.max_by(c, epoch).alias(c) for c in value_cols])
        .select(*keys, F.col("w.start").alias("bucket"), *value_cols)
    )


def trailing_stddev_stream(
    df: DataFrame,
    on: str = "ts",
    value: str = "price",
    by: str = "symbol",
    window: str = "1m",
) -> DataFrame:
    """Per-event trailing stddev on a stream: applyInPandasWithState
    keyed by instrument; state = the lookback buffer of (ts, value)
    within the window — bounded by construction (reference T1/A2,
    volatility_stddev_fd.py:30-56).

    Assumes per-key event-time order within and across batches for
    exact parity with the batch window form (the reference's stated
    input invariant)."""
    win_s = duration_to_seconds(window)

    out_schema = StructType(
        [
            StructField(by, df.schema[by].dataType),
            StructField(on, TimestampType()),
            StructField(value, df.schema[value].dataType),
            StructField("volatility", DoubleType()),
        ]
    )
    # state: the within-window lookback buffer, as parallel arrays
    state_schema = StructType(
        [
            StructField("ts_buf", ArrayType(DoubleType())),
            StructField("v_buf", ArrayType(DoubleType())),
        ]
    )

    def fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import numpy as np

        if state.exists:
            ts_list, v_list = state.get
            ts_buf = np.asarray(ts_list, dtype=float)
            v_buf = np.asarray(v_list, dtype=float)
        else:
            ts_buf = np.array([])
            v_buf = np.array([])

        # whole micro-batch as one frame, sorted once (chunk arrival
        # order is fetch order, not event-time — chunks.batch_frame)
        pdf = batch_frame(pdfs, [on], columns=[on, value])
        ts = pdf[on].astype("int64").to_numpy() / 1e9
        vals = pdf[value].to_numpy(dtype=float)
        all_ts = np.concatenate([ts_buf, ts])
        all_v = np.concatenate([v_buf, vals])
        out = np.full(len(ts), np.nan)
        for i in range(len(ts)):
            lo = np.searchsorted(all_ts, ts[i] - win_s, side="left")
            # peers included: the batch RANGE frame covers ALL rows
            # with equal ts, not just the ones that arrived earlier
            hi = np.searchsorted(all_ts, ts[i], side="right")
            seg = all_v[lo:hi]
            if len(seg) > 1:
                out[i] = seg.std(ddof=1)
        ts_buf, v_buf = all_ts, all_v
        keep = ts_buf >= (ts_buf[-1] - win_s) if len(ts_buf) else slice(0, 0)
        ts_buf, v_buf = ts_buf[keep], v_buf[keep]
        yield pd.DataFrame(
            {
                by: key[0],
                on: pdf[on],
                value: pdf[value],
                "volatility": out,
            }
        )

        state.update((list(map(float, ts_buf)), list(map(float, v_buf))))

    return (
        df.select(by, on, value)
        .groupBy(by)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
