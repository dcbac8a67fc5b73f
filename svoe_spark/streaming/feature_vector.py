"""Fused streaming feature-vector operator — the online Kappa path.

Spark allows only ONE applyInPandasWithState per streaming query, so
the per-key feature graph runs fused inside a single stateful operator:
each source event updates every feature in dependency order and emits
one combined vector row — which is also precisely the reference's
online execution model (one worker actor pushing each event through the
whole streamz feature graph synchronously,
featurizer_stream_worker_actor.py:29-61, feature_stream_graph.py:114-136).

Supported feature kinds (the reference's online set):
  source : passthrough of a source column
  stddev : trailing-window stddev of an upstream feature (T1/A2)
  ewma   : exponential moving average of an upstream feature
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StructField,
    StructType,
    TimestampType,
)

from svoe_spark.streaming.chunks import batch_frame


def feature_vector_stream(
    src: DataFrame,
    specs: list[dict],
    key: str = "symbol",
    on: str = "ts",
) -> DataFrame:
    """src: streaming df (key, ts, source cols). specs: ordered feature
    specs, e.g. [{'name':'mid','kind':'source','col':'value'},
    {'name':'vol','kind':'stddev','of':'mid','window':3600.0}].
    Output: one row per source event with '{name}_value' columns."""
    names = [s["name"] for s in specs]
    by_name = {s["name"]: s for s in specs}
    for s in specs:
        if s["kind"] not in ("source", "stddev", "ewma"):
            raise ValueError(f"unsupported streaming feature kind: {s['kind']!r}")
        if s["kind"] in ("stddev", "ewma") and s["of"] not in by_name:
            raise ValueError(f"{s['name']}: unknown upstream {s['of']!r}")

    stateful = [s for s in specs if s["kind"] == "stddev"]
    ewmas = [s for s in specs if s["kind"] == "ewma"]
    source_cols = sorted({s["col"] for s in specs if s["kind"] == "source"})

    if not stateful and not ewmas:
        # source-only graph: no state to carry — a plain projection
        # (an applyInPandasWithState with an EMPTY state struct is
        # rejected by the engine: 'head of empty list')
        from pyspark.sql import functions as F

        return src.select(
            key,
            on,
            *[
                F.col(s["col"]).cast("double").alias(f"{s['name']}_value")
                for s in specs
            ],
        )

    out_schema = StructType(
        [
            StructField(key, src.schema[key].dataType),
            StructField(on, TimestampType()),
            *[StructField(f"{n}_value", DoubleType()) for n in names],
        ]
    )
    state_schema = StructType(
        [
            *[
                f
                for s in stateful
                for f in (
                    StructField(f"ts_{s['name']}", ArrayType(DoubleType())),
                    StructField(f"v_{s['name']}", ArrayType(DoubleType())),
                )
            ],
            *[StructField(f"ewma_{s['name']}", DoubleType()) for s in ewmas],
        ]
    )

    def fn(
        key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals = list(state.get)
        else:
            vals = [[] for _ in stateful for _ in range(2)] + [
                float("nan") for _ in ewmas
            ]
        bufs = {
            s["name"]: (
                np.asarray(vals[2 * i] or [], dtype=float),
                np.asarray(vals[2 * i + 1] or [], dtype=float),
            )
            for i, s in enumerate(stateful)
        }
        ew = {
            s["name"]: vals[2 * len(stateful) + i] for i, s in enumerate(ewmas)
        }

        pdf = batch_frame(pdfs, [on], columns=[on, *source_cols])  # one frame, one sort —
        # chunk arrival order is fetch order, not event time
        ts = pdf[on].astype("int64").to_numpy() / 1e9
        series: dict[str, np.ndarray] = {}
        for s in specs:
            if s["kind"] == "source":
                series[s["name"]] = pdf[s["col"]].to_numpy(dtype=float)
            elif s["kind"] == "stddev":
                up = series[s["of"]]
                tbuf, vbuf = bufs[s["name"]]
                all_ts = np.concatenate([tbuf, ts])
                all_v = np.concatenate([vbuf, up])
                out = np.full(len(ts), np.nan)
                win = float(s["window"])
                for i in range(len(ts)):
                    lo = np.searchsorted(all_ts, ts[i] - win, side="left")
                    # peers included: the batch RANGE frame covers
                    # ALL rows with equal ts, not just earlier ones
                    hi = np.searchsorted(all_ts, ts[i], side="right")
                    seg = all_v[lo:hi]
                    if len(seg) > 1:
                        out[i] = seg.std(ddof=1)
                keep = all_ts >= (all_ts[-1] - win) if len(all_ts) else slice(0, 0)
                bufs[s["name"]] = (all_ts[keep], all_v[keep])
                series[s["name"]] = out
            else:  # ewma
                up = series[s["of"]]
                alpha = float(s.get("alpha", 0.1))
                prev = ew[s["name"]]
                out = np.empty(len(up))
                for i, x in enumerate(up):
                    prev = x if (prev != prev) else (alpha * x + (1 - alpha) * prev)
                    out[i] = prev
                ew[s["name"]] = prev
                series[s["name"]] = out
        data = {key: key_tuple[0], on: pdf[on]}
        for n in names:
            data[f"{n}_value"] = series[n]
        yield pd.DataFrame(data)

        new_vals = []
        for s in stateful:
            tbuf, vbuf = bufs[s["name"]]
            new_vals += [list(map(float, tbuf)), list(map(float, vbuf))]
        new_vals += [float(ew[s["name"]]) for s in ewmas]
        state.update(tuple(new_vals))

    return (
        src.select(key, on, *source_cols)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
