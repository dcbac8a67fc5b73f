"""Kappa forms of the directional as-of joins (`operators/asof.py`):
streaming forward and nearest matches (VERDICT r6 ask 4).

The backward as-of is purely causal (the flagship feature stream
already computes it: `streaming/features.py`). Forward and nearest
need the first right observation AT-OR-AFTER a left row — a DELAY, not
an impossibility, exactly like the linear-interpolation gapfill
(`streaming/resample_stream.py`): a left row's match is computable the
moment the gap-CLOSING right observation arrives, so each left row is
held as pending state and emitted FINAL (no retraction, no watermark
hold) on the first right row at-or-after it.

Why stream == batch exactly on closed rows (the equivalence tests
drive both): processing (key, ts)-ordered events with right rows
before left rows at equal instants,

* forward (`operators/asof.py:asof_join` direction='forward'): a left
  row at t matches the EARLIEST right at r >= t. A right at exactly t
  has already been processed when the left arrives (emit immediately);
  otherwise the first right with r > t is, by arrival order, the
  earliest right after t — emit the pending left with it.
* nearest (`operators/asof.py:asof_join_nearest`): the backward
  candidate (latest right <= t) is final the moment the left arrives —
  snapshot it into the pending entry; the forward candidate is the
  first right with r > t. When it arrives, both distances are known
  exact int64 microseconds and the batch tie-break (backward wins ties)
  evaluates identically. A left row whose backward distance is ZERO is
  emitted immediately: no future right can beat an exact match.

Whole-row semantics match the batch operators: with several value
columns, every emitted value comes from the ONE matched right row (the
candidate is snapshotted as a unit), never a per-column mix of rows.

The only batch rows a stream can never finalize are left rows after
the last right observation of ALL TIME (no closing right exists) —
the same un-emittable tail as the interpolation stream's trailing
NULLs, which doesn't exist in an unbounded stream by definition. The
equivalence tests compare exactly the closed set.

Contracts (shared with the other Kappa twins): cross-batch event-time
ordered replay; unique (key, ts) per side (pre-aggregate duplicate
right instants — the batch operators' tiebreak column has no stream
counterpart); tolerance is exact integer microseconds, matching the
batch operators token for token (an out-of-tolerance row emits with
NULL values, exactly like the batch fill).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from svoe_spark.functions.time import duration_to_seconds
from svoe_spark.streaming.chunks import batch_frame


def _norm_cols(
    value_col: str | list[str], out: str | list[str] | None, default: str
) -> tuple[list[str], list[str]]:
    cols = [value_col] if isinstance(value_col, str) else list(value_col)
    if not cols:
        raise ValueError("value_col must name at least one column")
    if out is None:
        names = [default] if len(cols) == 1 else list(cols)
    elif isinstance(out, str):
        if len(cols) != 1:
            raise ValueError(
                "out must be a list when value_col names several columns"
            )
        names = [out]
    else:
        if len(out) != len(cols):
            raise ValueError("out and value_col must have the same length")
        names = list(out)
    return cols, names


def _tagged_union(
    left: DataFrame, right: DataFrame, on: str, by: str, cols: list[str]
) -> DataFrame:
    """One keyed stream: right rows side=0 (sorting BEFORE left rows at
    the same instant — a same-instant right is a backward match), left
    rows side=1, timestamps as exact unix micros, the right row's value
    columns as one double array (the whole-row candidate unit)."""
    l_ = left.select(
        F.col(by),
        F.unix_micros(F.col(on)).alias("__us"),
        F.lit(1).cast("int").alias("__side"),
        F.lit(None).cast("array<double>").alias("__v"),
    )
    r_ = right.select(
        F.col(by),
        F.unix_micros(F.col(on)).alias("__us"),
        F.lit(0).cast("int").alias("__side"),
        F.array(*[F.col(c).cast("double") for c in cols]).alias("__v"),
    )
    return l_.unionByName(r_)


def _out_schema(df: DataFrame, by: str, names: list[str]) -> StructType:
    return StructType(
        [StructField(by, df.schema[by].dataType), StructField("ts_us", LongType())]
        + [StructField(n, DoubleType()) for n in names]
    )


def _emit_frame(by, key_tuple, names, out_t, out_v):
    data = {by: [key_tuple[0]] * len(out_t), "ts_us": out_t}
    for j, n in enumerate(names):
        data[n] = pd.array(
            [None if v is None else v[j] for v in out_v], dtype="float64"
        )
    return pd.DataFrame(data)


def asof_forward_stream(
    left: DataFrame,
    right: DataFrame,
    on: str = "timestamp",
    by: str = "symbol",
    value_col: str | list[str] = "value",
    out: str | list[str] | None = None,
    tolerance: str | float | None = None,
) -> DataFrame:
    """Streaming forward as-of: for each left row at t, the value
    columns of the EARLIEST right row at r >= t, emitted FINAL when
    that right row arrives (immediately when a right at exactly t
    precedes it). Out-of-tolerance matches emit with NULL values, like
    the batch fill. State per key: the last right (ts, values) + the
    pending left instants. Output: (by, on, *out); ``out`` defaults to
    'fwd_value' for a single column, the columns' own names for a
    list."""
    cols, names = _norm_cols(value_col, out, "fwd_value")
    tol_us = (
        None
        if tolerance is None
        else int(round(duration_to_seconds(tolerance) * 1_000_000))
    )
    out_schema = _out_schema(left, by, names)
    state_schema = StructType(
        [
            StructField("pr_ts", LongType()),
            StructField("pr_v", ArrayType(DoubleType(), containsNull=True)),
            StructField("pend_ts", ArrayType(LongType())),
        ]
    )

    def fn(
        key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            pr_ts, pr_v, pend = state.get
            pr_v = list(pr_v) if pr_v is not None else None
            pend = list(pend) if pend is not None else []
        else:
            pr_ts, pr_v, pend = None, None, []
        out_t: list[int] = []
        out_v: list[list[float] | None] = []

        def emit(t: int, r: int, v: list) -> None:
            out_t.append(t)
            out_v.append(v if tol_us is None or (r - t) <= tol_us else None)

        pdf = batch_frame(
            pdfs, ["__us", "__side"], columns=["__us", "__side", "__v"]
        )
        for us, side, v in zip(pdf["__us"], pdf["__side"], pdf["__v"]):
            us = int(us)
            if side == 0:
                v = [None if pd.isna(x) else float(x) for x in v]
                still = []
                for t in pend:
                    if t <= us:
                        emit(t, us, v)
                    else:
                        still.append(t)
                pend = still
                pr_ts, pr_v = us, v
            else:
                if pr_ts is not None and pr_ts == us:
                    emit(us, pr_ts, pr_v)
                else:
                    pend.append(us)
        state.update((pr_ts, pr_v, pend))
        if out_t:
            yield _emit_frame(by, key_tuple, names, out_t, out_v)

    u = _tagged_union(left, right, on, by, cols)
    res = u.groupBy(by).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return res.select(by, F.timestamp_micros("ts_us").alias(on), *names)


def asof_nearest_stream(
    left: DataFrame,
    right: DataFrame,
    on: str = "timestamp",
    by: str = "symbol",
    value_col: str | list[str] = "value",
    out: str | list[str] | None = None,
    tolerance: str | float | None = None,
) -> DataFrame:
    """Streaming nearest as-of: for each left row at t, the value
    columns of the right row minimizing |r - t| (ties -> backward),
    emitted FINAL when the first right row with r > t closes the
    comparison — or immediately on an exact backward match (distance 0
    is unbeatable). Out-of-tolerance rows emit with NULL values, like
    the batch fill. State per key: the last right (ts, values) +
    pending left instants, each with its (final) backward-candidate
    snapshot. Output: (by, on, *out); ``out`` defaults to
    'nearest_value' for a single column, the columns' own names for a
    list."""
    cols, names = _norm_cols(value_col, out, "nearest_value")
    tol_us = (
        None
        if tolerance is None
        else int(round(duration_to_seconds(tolerance) * 1_000_000))
    )
    out_schema = _out_schema(left, by, names)
    state_schema = StructType(
        [
            StructField("pr_ts", LongType()),
            StructField("pr_v", ArrayType(DoubleType(), containsNull=True)),
            StructField("pend_ts", ArrayType(LongType())),
            StructField("pend_bts", ArrayType(LongType(), containsNull=True)),
            StructField(
                "pend_bv",
                ArrayType(
                    ArrayType(DoubleType(), containsNull=True), containsNull=True
                ),
            ),
        ]
    )

    def fn(
        key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            pr_ts, pr_v, p_t, p_bt, p_bv = state.get
            pr_v = list(pr_v) if pr_v is not None else None
            p_t = list(p_t) if p_t is not None else []
            p_bt = list(p_bt) if p_bt is not None else []
            p_bv = [
                (list(x) if x is not None else None) for x in (p_bv or [])
            ]
        else:
            pr_ts, pr_v, p_t, p_bt, p_bv = None, None, [], [], []
        out_t: list[int] = []
        out_v: list[list[float] | None] = []

        def emit(t: int, bt, bv, ft: int, fv: list) -> None:
            # mirror operators/asof.py:asof_join_nearest's choice: exact
            # int64 distances, backward wins ties, tolerance on the
            # CHOSEN distance, NULL values when out of tolerance
            bdist = None if bt is None else t - bt
            fdist = ft - t
            use_b = bdist is not None and bdist <= fdist
            dist = bdist if use_b else fdist
            val = bv if use_b else fv
            out_t.append(t)
            out_v.append(val if tol_us is None or dist <= tol_us else None)

        pdf = batch_frame(
            pdfs, ["__us", "__side"], columns=["__us", "__side", "__v"]
        )
        for us, side, v in zip(pdf["__us"], pdf["__side"], pdf["__v"]):
            us = int(us)
            if side == 0:
                v = [None if pd.isna(x) else float(x) for x in v]
                keep_t, keep_bt, keep_bv = [], [], []
                for t, bt, bv in zip(p_t, p_bt, p_bv):
                    if t <= us:
                        emit(t, bt, bv, us, v)
                    else:
                        keep_t.append(t)
                        keep_bt.append(bt)
                        keep_bv.append(bv)
                p_t, p_bt, p_bv = keep_t, keep_bt, keep_bv
                pr_ts, pr_v = us, v
            else:
                if pr_ts is not None and pr_ts == us:
                    # exact backward match: distance 0 is final now
                    out_t.append(us)
                    out_v.append(pr_v)
                else:
                    p_t.append(us)
                    p_bt.append(pr_ts)
                    p_bv.append(pr_v)
        state.update((pr_ts, pr_v, p_t, p_bt, p_bv))
        if out_t:
            yield _emit_frame(by, key_tuple, names, out_t, out_v)

    u = _tagged_union(left, right, on, by, cols)
    res = u.groupBy(by).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return res.select(by, F.timestamp_micros("ts_us").alias(on), *names)
