"""Incremental rollup store: merge algebra + partition-scoped refresh
(operators/rollup.py). The registered ohlcv_1h_rollup query pins the
two-level batch algebra against the direct-1h DuckDB oracle; these
tests pin the incremental path."""

import os

from pyspark.sql import functions as F

from svoe_spark.operators.rollup import (
    RollupStore,
    bars_from_ticks,
    combine_bars,
    finish_bars,
    rollup_bars,
)
from svoe_spark.queries import ticks


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def test_incremental_refresh_equals_full_recompute(spark, sf_small, tmp_path):
    t = ticks(spark, sf_small).cache()
    cut = t.selectExpr("percentile(unix_micros(ts), 0.5) AS m").first()["m"]
    first = t.where(F.unix_micros("ts") <= cut)
    second = t.where(F.unix_micros("ts") > cut)
    assert first.count() > 0 and second.count() > 0

    store = RollupStore(spark, str(tmp_path / "bars_1h"))
    days1 = store.refresh(first)
    days2 = store.refresh(second)
    assert days1 and days2

    full = finish_bars(
        rollup_bars(bars_from_ticks(t, window="1m"), window="1h")
    )
    assert _sorted_rows(store.read()) == _sorted_rows(full)
    t.unpersist()


def test_refresh_rewrites_only_touched_days(spark, sf_small, tmp_path):
    t = ticks(spark, sf_small)
    days = sorted(
        str(r["d"]) for r in t.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    assert len(days) >= 2
    d0, rest = days[0], days[1:]
    store = RollupStore(spark, str(tmp_path / "bars"))
    store.refresh(t)
    d0_dir = os.path.join(str(tmp_path / "bars"), f"day={d0}")
    before = {
        f: os.path.getmtime(os.path.join(d0_dir, f)) for f in os.listdir(d0_dir)
    }
    # refresh with a batch touching only the OTHER days
    touched = store.refresh(t.where(F.to_date("ts") != F.lit(d0).cast("date")))
    assert d0 not in touched and set(touched) == set(rest)
    after = {
        f: os.path.getmtime(os.path.join(d0_dir, f)) for f in os.listdir(d0_dir)
    }
    assert before == after  # untouched partition not rewritten


def test_combine_bars_associative_batching(spark, sf_small):
    t = ticks(spark, sf_small)
    b = bars_from_ticks(t, window="1m")
    thirds = [
        b.where(F.pmod(F.xxhash64("event_type", "window_start"), F.lit(3)) == i)
        for i in range(3)
    ]
    merged = combine_bars(combine_bars(thirds[0], thirds[1]), thirds[2])
    assert _sorted_rows(merged) == _sorted_rows(b)
