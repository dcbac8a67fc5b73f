"""Kappa form of `operators.changepoint.cusum_scores`: the CUSUM
recursion carried across micro-batches with FOUR longs of state per
key (both prefix sums and their running extrema — the min is seeded
at 0, which IS the P_0 sentinel of the batch identity, so stream ==
batch bit-exactly from the first row).

Baseline and slack must be columns already on the stream (or integer
constants): a sequential detector monitors NEW data against a scale
frozen from history — recomputing the median per micro-batch would be
a different (and non-causal) detector. Contract shared with
ofi_stream/drawdown_stream: event time non-decreasing per key across
micro-batches; within a batch the operator sorts by (on, tiebreak).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from svoe_spark.streaming.chunks import batch_frame


def cusum_stream(
    df: DataFrame,
    value_col: str,
    on: str,
    key: str,
    baseline_col: str | None = None,
    slack=0,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-row two-sided CUSUM scores over a keyed stream; output one
    row per input row: (key, on [, tiebreak], value, c_pos, c_neg).
    Integer contract as the batch operator: value/baseline/slack are
    int64, every intermediate is exact."""
    sort_cols = ["__ts"] + (["__tb"] if tiebreak is not None else [])
    out_schema = StructType(
        [
            StructField(key, df.schema[key].dataType),
            StructField(on, df.schema[on].dataType),
            *(
                [StructField(tiebreak, df.schema[tiebreak].dataType)]
                if tiebreak is not None
                else []
            ),
            StructField(value_col, LongType()),
            StructField("c_pos", LongType()),
            StructField("c_neg", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("pp", LongType()),
            StructField("pn", LongType()),
            StructField("mn", LongType()),
            StructField("mx", LongType()),
        ]
    )
    cols = [value_col] + ([baseline_col] if baseline_col else [])
    if isinstance(slack, str):
        cols.append(slack)

    def fn(
        key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pp0, pn0, mn0, mx0 = state.get if state.exists else (0, 0, 0, 0)
        pdf = batch_frame(pdfs, sort_cols, columns=[*sort_cols, *cols])
        if not len(pdf):
            return
        v = pdf[value_col].astype("int64")
        base = (
            pdf[baseline_col].astype("int64")
            if baseline_col
            else np.int64(0)
        )
        k = (
            pdf[slack].astype("int64")
            if isinstance(slack, str)
            else np.int64(int(slack))
        )
        pp = pp0 + (v - base - k).cumsum()
        pn = pn0 + (v - base + k).cumsum()
        mn = np.minimum(pp.cummin(), mn0)
        mx = np.maximum(pn.cummax(), mx0)
        out = {key: key_tuple[0], on: pdf["__ts"]}
        if tiebreak is not None:
            out[tiebreak] = pdf["__tb"]
        out[value_col] = v
        out["c_pos"] = pp - mn
        out["c_neg"] = mx - pn
        yield pd.DataFrame(out)
        state.update(
            (int(pp.iloc[-1]), int(pn.iloc[-1]), int(mn.iloc[-1]), int(mx.iloc[-1]))
        )

    src = df.select(
        F.col(key),
        F.col(on).alias("__ts"),
        *([F.col(tiebreak).alias("__tb")] if tiebreak is not None else []),
        *[F.col(c) for c in cols],
    )
    return src.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
