"""Salted aggregation + streaming combine_latest + watermark/late-data
semantics."""

import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.combine import combine_latest
from svoe_spark.operators.skew import salted_agg
from svoe_spark.sources.tables import load_table
from svoe_spark.streaming.combine_stream import combine_latest_stream
from svoe_spark.streaming.sinks import run_available_to_memory
from svoe_spark.streaming.sources import replay_parquet

pytestmark = pytest.mark.heavy  # multi-minute suite: deselected by the
# default `pytest tests/ -q` tier (pytest.ini); scripts/ptest.py shards and
# the round-close sweep run it



def test_salted_agg_equals_direct(spark, sf_small):
    e = load_table(spark, "events", sf_small)
    direct = {
        (r["event_type"]): (r["s"], r["n"], sorted(r["vals"]))
        for r in e.groupBy("event_type")
        .agg(
            F.sum("user_id").alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.collect_list("event_id").alias("vals"),
        )
        .collect()
    }
    salted = {
        (r["event_type"]): (r["s"], r["n"], sorted(r["vals"]))
        for r in salted_agg(
            e,
            ["event_type"],
            {
                "s": F.sum("user_id"),
                "n": F.count(F.lit(1)),
                "vals": F.collect_list("event_id"),
            },
            {
                "s": F.sum("s"),
                "n": F.sum("n"),
                "vals": F.flatten(F.collect_list("vals")),
            },
        ).collect()
    }
    assert salted == direct


def test_combine_latest_stream_equals_batch(spark, sf_small, tmp_path):
    e = load_table(spark, "events", sf_small).filter(
        F.col("event_type").isin("view", "click")
    )
    tagged = e.select(
        F.col("user_id").cast("string").alias("symbol"),
        "ts",
        F.col("event_type").alias("stream"),
        "value",
    )
    path = str(tmp_path / "tagged")
    tagged.write.parquet(path)

    got = run_available_to_memory(
        combine_latest_stream(
            replay_parquet(spark, path), streams=["view", "click"]
        )
    )

    streams = {
        name: e.filter(F.col("event_type") == name).select(
            F.col("user_id").cast("string").alias("symbol"),
            "ts",
            F.col("value").alias(f"{name}_value"),
        )
        for name in ("view", "click")
    }
    want = combine_latest(
        {n: df for n, df in streams.items()}, on="ts", by="symbol"
    )
    g = {
        (r["symbol"], r["ts"]): (r["view_value"], r["click_value"])
        for r in got.collect()
    }
    w = {
        (r["symbol"], r["ts"]): (r["view-view_value"], r["click-click_value"])
        for r in want.collect()
    }
    assert g == w and len(g) > 0


def test_watermark_drops_late_data(spark, tmp_path):
    """T5: the reference assumes ordered input; our watermark policy
    makes lateness explicit — an event older than the watermark when
    its window has already been finalized is dropped."""
    import datetime as dt
    import time

    from svoe_spark.streaming.features import ohlcv_stream

    base = dt.datetime(2024, 1, 1)
    mk = lambda off, px: (base + dt.timedelta(seconds=off), "X", px, 1.0)  # noqa: E731
    schema = "ts timestamp, symbol string, price double, amount double"
    path = str(tmp_path / "late")
    # batch 0: minutes 0 and 10; batch 1: minute 20 (the watermark used
    # in batch N comes from batch N-1's max event time, so it reaches
    # 19:50 only in batch 2); batch 2: a 20-minutes-late event
    spark.createDataFrame([mk(0, 1.0), mk(600, 2.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    time.sleep(1.1)
    spark.createDataFrame([mk(1200, 3.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    time.sleep(1.1)
    spark.createDataFrame([mk(5, 99.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = run_available_to_memory(
        ohlcv_stream(stream, on="ts", by="symbol", window="1m", watermark="10 seconds")
    ).collect()
    by_min = {r["window_start"].minute: r for r in out if r["window_start"].hour == 0}
    # minute-0 window was finalized before the late event arrived: the
    # 99.0 print must NOT appear
    assert by_min[0]["num_trades"] == 1 and by_min[0]["high"] == 1.0
