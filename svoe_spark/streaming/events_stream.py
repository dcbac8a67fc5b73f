"""Kappa forms of the events-analytics operators (funnel, retention):
the SAME answer as `operators.events_analytics` computed incrementally
over a replayed or live stream — the repo-wide T6 bar (stream == batch,
equivalence-tested) applied to the round-4 analytics layer.

Both operators keep per-user state with `applyInPandasWithState` (the
same legacy-state API the other stateful ops use — the tWS twin is
protobuf-gated in this environment) and process each micro-batch in
event-time order. Contract shared with `drawdown_stream`: event time
must be non-decreasing ACROSS micro-batches per key (a replay of
time-ranged files, or any watermark-ordered source) — within a batch
the operator sorts, so intra-batch disorder is free.

Why the streaming funnel is exactly the batch min-agg chain: the batch
operator anchors step 0 at the user's earliest step-0 event and step i
at the earliest step-i event strictly after the step-(i-1) instant.
Processing events in ascending event time, the running chain state
(m_0..m_{k-1}) can only be extended the first time each constraint is
satisfiable — the first admitted step-i event IS min{ts_i > m_{i-1}},
because every earlier step-i event was already seen and rejected.
So sequential replay reproduces the batch fixpoint without ever
re-reading history (state is k instants per user, not event arrays).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from svoe_spark.streaming.chunks import batch_frame

_MICROS = 1_000_000


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str | None = None,
) -> DataFrame:
    """Streaming ordered-funnel state: per user, the running conversion
    chain (one instant per step, NULL while unreached) — the Kappa form
    of ``events_analytics.funnel``. Emits one row per user per
    micro-batch: (user, n_events, m_0..m_{k-1} as epoch micros);
    ``n_events`` is the user's cumulative processed-event count, so the
    row with the highest ``n_events`` is the user's latest state (see
    ``funnel_counts``). State is k+1 numbers per user — no event
    arrays, same as the batch plan's per-user footprint."""
    if not steps:
        raise ValueError("funnel_stream needs at least one step")
    k = len(steps)
    horizon_us = None
    if within is not None:
        from svoe_spark.functions.time import duration_to_seconds

        horizon_us = int(duration_to_seconds(within)) * _MICROS

    out_schema = StructType(
        [
            StructField("user", events.schema[user_col].dataType),
            StructField("n_events", LongType()),
            *[StructField(f"m{i}", LongType()) for i in range(k)],
        ]
    )
    state_schema = StructType(
        [
            StructField("n_events", LongType()),
            *[StructField(f"m{i}", LongType()) for i in range(k)],
        ]
    )
    step_index = {s: i for i, s in enumerate(steps)}

    def fn(
        key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_events, *chain = state.get
            chain = list(chain)
        else:
            n_events, chain = 0, [None] * k
        pdf = batch_frame(pdfs, ["__ts"], columns=["__t", "__ts"])
        for t, ts in zip(pdf["__t"], pdf["__ts"]):
            n_events += 1
            i = step_index.get(t)
            if i is None or chain[i] is not None:
                continue
            ts = int(ts)
            if i == 0:
                chain[0] = ts
                continue
            prev = chain[i - 1]
            if prev is None or ts <= prev:
                continue
            if horizon_us is not None and ts > chain[0] + horizon_us:
                continue
            chain[i] = ts
        state.update((n_events, *chain))
        yield pd.DataFrame(
            {
                "user": [key_tuple[0]],
                "n_events": [n_events],
                **{f"m{i}": pd.array([chain[i]], dtype="Int64") for i in range(k)},
            }
        )

    src = events.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.unix_micros(F.col(ts_col)).alias("__ts"),
    )
    return src.groupBy("__u").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_counts(state_rows: DataFrame, steps: list[str]) -> DataFrame:
    """Fold the ``funnel_stream`` emissions into the batch operator's
    output shape (step_index, step_name, n_users): keep each user's
    LATEST state row (max n_events — emissions are cumulative), then
    count users whose step-i instant is set."""
    latest = state_rows.groupBy("user").agg(
        *[
            F.max_by(f"m{i}", "n_events").alias(f"m{i}")
            for i in range(len(steps))
        ]
    )
    out = None
    for i, step in enumerate(steps):
        row = latest.where(F.col(f"m{i}").isNotNull()).agg(
            F.lit(i).alias("step_index"),
            F.lit(step).alias("step_name"),
            F.count("*").cast("long").alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def retention_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int | None = None,
) -> DataFrame:
    """Streaming retention deltas: the Kappa form of
    ``events_analytics.retention_cohorts``. Per user, state is the
    cohort day plus the set of day-offsets already credited; each
    micro-batch emits one (+1) row per NEWLY seen (cohort_day,
    offset_days) pair, so a trivial downstream groupBy-count over all
    emissions equals the batch retention triangle. State is one long
    per distinct active day per user — bounded by the calendar, not by
    event volume."""
    out_schema = StructType(
        [
            StructField("cohort_day", LongType()),
            StructField("offset_days", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("cohort", LongType()),
            StructField("seen", ArrayType(LongType())),
        ]
    )

    def fn(
        key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cohort, seen = state.get
            seen = set(seen)
        else:
            cohort, seen = None, set()
        fresh: list[int] = []
        pdf = batch_frame(pdfs, columns=["__d"])
        for d in sorted(int(x) for x in pdf["__d"].unique()):
            if cohort is None:
                cohort = d
            off = d - cohort
            if off < 0 or off in seen:
                continue
            if max_offset_days is not None and off > max_offset_days:
                continue
            seen.add(off)
            fresh.append(off)
        state.update((cohort, sorted(seen)))
        if fresh:
            yield pd.DataFrame(
                {
                    "cohort_day": [cohort] * len(fresh),
                    "offset_days": fresh,
                }
            )

    src = events.select(
        F.col(user_col).alias("__u"),
        F.datediff(F.to_date(ts_col), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("__d"),
    )
    return src.groupBy("__u").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def retention_counts(delta_rows: DataFrame) -> DataFrame:
    """Fold ``retention_stream`` emissions into the batch shape
    (cohort_day: date, offset_days, n_users)."""
    return delta_rows.groupBy(
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("cohort_day").cast("int"))
        .alias("cohort_day"),
        "offset_days",
    ).agg(F.count("*").cast("long").alias("n_users"))


def session_windows_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 minute",
) -> DataFrame:
    """Streaming session windows (T4's session type under T6's Kappa
    bar): Spark's native `session_window` over a watermarked stream —
    state is the open session per user (merged on every in-gap event),
    and a session is emitted exactly once, when the watermark passes
    its close (last event + gap). Same output shape and exact-integer
    value arithmetic as the batch `session_windows_30m` query, so
    emitted rows are bit-identical to the batch operator's rows for
    every closed session (pytest-pinned). Late events beyond
    ``watermark`` are dropped by contract — the standard Structured
    Streaming lateness trade; widen the watermark to widen tolerance
    (state cost grows with the open-session horizon, not history)."""
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents) / 100.0).alias("total_value"),
        )
        .drop("w")
    )


def transition_stream(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak: str | None = None,
    gap_seconds: int | None = None,
) -> DataFrame:
    """Kappa form of ``events_analytics.transition_matrix``: one output
    row per observed (from_state -> to_state) transition, emitted the
    moment the successor event arrives, with TWO values of state per
    key (the last event's instant and state). Aggregating the emitted
    rows (``transition_counts``) reproduces the batch matrix exactly —
    equivalence-tested, including the tiny-Arrow-chunk shape.

    Contract shared with drawdown_stream/ofi_stream: event time
    non-decreasing per key ACROSS micro-batches (the operator sorts by
    (ts, tiebreak) within each batch). ``gap_seconds`` mirrors the
    batch bound: a successor later than the gap re-anchors the journey
    without emitting a transition."""
    sort_cols = ["__ts"] + (["__tb"] if tiebreak is not None else [])
    # the state column keeps its INPUT type (string labels, integer
    # codes, ...) — hardcoding StringType would break stream == batch
    # for non-string state columns
    state_type = events.schema[state_col].dataType
    out_schema = StructType(
        [
            StructField(key, events.schema[key].dataType),
            StructField("from_state", state_type),
            StructField("to_state", state_type),
            StructField("ts_us", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("last_ts", LongType()), StructField("last_state", state_type)]
    )
    gap_us = None if gap_seconds is None else int(gap_seconds) * _MICROS

    def fn(
        key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        prev = state.get if state.exists else None
        pdf = batch_frame(pdfs, sort_cols, columns=[*sort_cols, "__st"])
        if not len(pdf):
            return
        st = pdf["__st"]
        ts = pdf["__ts"]
        # dtype-preserving shift: copy + slide, then seed row 0 from
        # state (pandas shift() would upcast int64 state codes to
        # float64 via NaN)
        frm = st.copy()
        if len(st) > 1:
            frm.iloc[1:] = st.values[:-1]
        fts = ts.shift(fill_value=0)
        valid = pd.Series(True, index=pdf.index)
        if prev is None:
            valid.iloc[0] = False
        else:
            fts.iloc[0] = prev[0]
            frm.iloc[0] = prev[1]
        if gap_us is not None:
            valid &= (ts - fts) <= gap_us
        yield pd.DataFrame(
            {
                key: key_tuple[0],
                "from_state": frm[valid],
                "to_state": st[valid],
                "ts_us": ts[valid],
            }
        )
        last = st.iloc[-1]
        state.update(
            (int(ts.iloc[-1]), last.item() if hasattr(last, "item") else last)
        )

    src = events.select(
        F.col(key),
        F.col(state_col).alias("__st"),
        F.unix_micros(F.col(ts_col)).alias("__ts"),
        *([F.col(tiebreak).alias("__tb")] if tiebreak is not None else []),
    )
    return src.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transition_counts(transition_rows: DataFrame) -> DataFrame:
    """Fold the per-transition stream output to the batch matrix shape
    (from_state, to_state, n, p) — same one-division normalization as
    `transition_matrix`."""
    from pyspark.sql import Window

    counts = transition_rows.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return counts.select(
        "from_state",
        "to_state",
        "n",
        (F.col("n") / F.sum("n").over(Window.partitionBy("from_state"))).alias("p"),
    )
