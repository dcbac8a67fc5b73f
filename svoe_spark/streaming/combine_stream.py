"""Streaming combine_latest (reference J5 online path,
feature_stream_graph.py:114-119 streamz combine_latest): one output per
input tick carrying the latest value of every feature stream — the live
inference vector.

applyInPandasWithState keyed by instrument; state = one latest value
per stream (fixed, tiny). Assumes per-key in-order delivery (T5)."""

from __future__ import annotations

import math
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, StringType, StructField, StructType, TimestampType


def combine_latest_stream(
    df: DataFrame,
    streams: list[str],
    key: str = "symbol",
    on: str = "ts",
    stream_col: str = "stream",
    value_col: str = "value",
) -> DataFrame:
    """df: a union'd tagged stream (key, ts, stream, value). Output: one
    row per event with columns '{stream}_value' = latest per key."""
    out_schema = StructType(
        [
            StructField(key, df.schema[key].dataType),
            StructField(on, TimestampType()),
            StructField(stream_col, StringType()),
            *[StructField(f"{s}_value", DoubleType()) for s in streams],
        ]
    )
    state_schema = StructType(
        [StructField(f"latest_{s}", DoubleType()) for s in streams]
    )
    idx = {s: i for i, s in enumerate(streams)}

    def fn(
        key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        latest = list(state.get) if state.exists else [None] * len(streams)
        latest = [None if v is not None and math.isnan(v) else v for v in latest]
        for pdf in pdfs:
            pdf = pdf.sort_values(on)
            rows = []
            for ts, s, v in zip(pdf[on], pdf[stream_col], pdf[value_col]):
                if s in idx:
                    latest[idx[s]] = float(v)
                rows.append((key_tuple[0], ts, s, *latest))
            yield pd.DataFrame(
                rows, columns=[key, on, stream_col, *[f"{s}_value" for s in streams]]
            )
        state.update(tuple(latest))

    return (
        df.select(key, on, stream_col, value_col)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
