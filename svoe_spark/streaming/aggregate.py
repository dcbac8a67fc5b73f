"""Streaming keyed running reduce (reference A6: per-key incremental
reduce emitting EVERY update — v2 operator.py:171-191,
data_stream.py:122-129; the reference's aggregate() was
NotImplementedError).

Plain streaming groupBy can't emit per-update rows; this is
applyInPandasWithState with a numeric accumulator vector. Supported
reduces: sum, count, min, max, last (enough to cover the reference's
lambda-reduce uses; arbitrary Python folds fit the same template)."""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, StructField, StructType, TimestampType

_INITS = {"sum": 0.0, "count": 0.0, "min": float("inf"), "max": float("-inf"), "last": float("nan")}


def running_reduce_stream(
    df: DataFrame,
    value: str,
    ops: list[str],
    key: str = "symbol",
    on: str = "ts",
) -> DataFrame:
    """df(key, ts, value) -> one row per event with running <op>s."""
    for op in ops:
        if op not in _INITS:
            raise ValueError(f"unsupported reduce op: {op}; use {sorted(_INITS)}")

    out_schema = StructType(
        [
            StructField(key, df.schema[key].dataType),
            StructField(on, TimestampType()),
            StructField(value, DoubleType()),
            *[StructField(f"{op}_{value}", DoubleType()) for op in ops],
        ]
    )
    state_schema = StructType(
        [StructField(f"acc_{op}", DoubleType()) for op in ops]
    )

    def fn(
        key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        accs = list(state.get) if state.exists else [_INITS[op] for op in ops]
        for pdf in pdfs:
            pdf = pdf.sort_values(on)
            vals = pdf[value].astype(float)
            out = {key: key_tuple[0], on: pdf[on], value: vals}
            cols = {}
            for i, op in enumerate(ops):
                if op == "sum":
                    series = vals.cumsum() + accs[i]
                    accs[i] = float(series.iloc[-1]) if len(series) else accs[i]
                elif op == "count":
                    series = pd.Series(range(1, len(vals) + 1), index=vals.index, dtype=float) + accs[i]
                    accs[i] = float(series.iloc[-1]) if len(series) else accs[i]
                elif op == "min":
                    series = vals.cummin().clip(upper=accs[i])
                    accs[i] = float(series.iloc[-1]) if len(series) else accs[i]
                elif op == "max":
                    series = vals.cummax().clip(lower=accs[i])
                    accs[i] = float(series.iloc[-1]) if len(series) else accs[i]
                else:  # last
                    series = vals
                    accs[i] = float(series.iloc[-1]) if len(series) else accs[i]
                cols[f"{op}_{value}"] = series
            out.update(cols)
            yield pd.DataFrame(out)
        state.update(tuple(accs))

    return (
        df.select(key, on, value)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
