"""Unit tests for resample_ffill: hand-computed grid + a pandas
resample/ffill differential on a larger deterministic series."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.resample import resample_ffill

BASE = dt.datetime(2024, 3, 1, 0, 17)  # deliberately off-grid start


@pytest.fixture(scope="module")
def sparse(spark):
    rows = [
        ("a", BASE, 1.0),
        ("a", BASE + dt.timedelta(minutes=50), 2.0),
        ("a", BASE + dt.timedelta(hours=3, minutes=1), 3.0),
        ("b", BASE + dt.timedelta(hours=1), 10.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_grid_and_ffill_hand_computed(sparse):
    out = {
        (r["k"], r["ts"]): r["v"]
        for r in resample_ffill(sparse, on="ts", by="k", every="1h").collect()
    }
    h = dt.datetime(2024, 3, 1, 0)  # floor of the off-grid start
    # key a: grid 00:00..03:00 (max ts 03:18 -> last point 03:00)
    assert out == {
        ("a", h): None,  # grid precedes first observation (00:17)
        ("a", h + dt.timedelta(hours=1)): 1.0,  # latest <= 01:00 is 00:17
        ("a", h + dt.timedelta(hours=2)): 2.0,  # 01:07 carried forward
        ("a", h + dt.timedelta(hours=3)): 2.0,  # 03:18 is after the instant
        ("b", h + dt.timedelta(hours=1)): None,  # obs at 01:17, grid at 01:00
    }


def test_matches_pandas_resample(spark, sf_small):
    from svoe_spark.sources.tables import load_table

    e = (
        load_table(spark, "events", sf_small)
        .filter(F.col("event_type") == "view")
        .groupBy("ts")
        .agg(F.max_by("value", "event_id").alias("v"))
        .withColumn("k", F.lit("view"))
    )
    got = {
        r["ts"]: r["v"]
        for r in resample_ffill(e, on="ts", by="k", every="30m").collect()
    }
    pdf = e.select("ts", "v").toPandas().sort_values("ts").set_index("ts")
    want = pdf["v"].resample("30min").ffill()
    assert len(got) == len(want)
    for ts, v in want.items():
        g = got[ts.to_pydatetime()]
        assert (pd.isna(v) and g is None) or g == v


def test_interpolate_midpoint_and_exact_hit(spark):
    from svoe_spark.operators.resample import resample_interpolate

    df = spark.createDataFrame(
        [
            ("k", dt.datetime(2024, 1, 1, 0), 10.0),
            ("k", dt.datetime(2024, 1, 1, 2), 20.0),
            ("k", dt.datetime(2024, 1, 1, 3), 14.0),
        ],
        "g string, ts timestamp, value double",
    )
    got = {
        r["ts"]: (r["locf"], r["interp"])
        for r in resample_interpolate(df, by="g", every="1h").collect()
    }
    assert got[dt.datetime(2024, 1, 1, 0)] == (10.0, 10.0)  # exact hit
    assert got[dt.datetime(2024, 1, 1, 1)] == (10.0, 15.0)  # midpoint
    assert got[dt.datetime(2024, 1, 1, 2)] == (20.0, 20.0)
    assert got[dt.datetime(2024, 1, 1, 3)] == (14.0, 14.0)
    assert len(got) == 4


def test_interpolate_no_extrapolation(spark):
    from svoe_spark.operators.resample import resample_interpolate

    # observation at 00:30 only: the 00:00 grid row precedes the first
    # observation -> both fills NULL there; 01:00 is past the last ->
    # locf carries, interp does not extrapolate... max ts == 00:30 so
    # the grid stops at 00:00 only; extend with a second point
    df = spark.createDataFrame(
        [
            ("k", dt.datetime(2024, 1, 1, 0, 30), 5.0),
            ("k", dt.datetime(2024, 1, 1, 1, 30), 7.0),
        ],
        "g string, ts timestamp, value double",
    )
    got = {
        r["ts"]: (r["locf"], r["interp"])
        for r in resample_interpolate(df, by="g", every="1h").collect()
    }
    assert got[dt.datetime(2024, 1, 1, 0)] == (None, None)  # before 1st obs
    assert got[dt.datetime(2024, 1, 1, 1)] == (5.0, 6.0)


def test_interpolate_two_running_windows_one_exchange(spark):
    from svoe_spark.operators.resample import resample_interpolate

    df = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1, 0), 1.0)],
        "g string, ts timestamp, value double",
    )
    plan = resample_interpolate(df, by="g")._jdf.queryExecution().executedPlan().toString()
    # two RUNNING frames (forward bracket = reversed sort), never a
    # per-row-reaggregated [current, unboundedFollowing] frame; both
    # windows reuse one hash exchange on the key
    assert plan.count("+- Window") == 2
    assert "unboundedfollowing" not in plan.lower()
    # the two windows share one key exchange: only a Sort between them
    # (the other Exchange in the plan feeds the grid's min/max agg)
    first = plan.index("Window [")
    second = plan.index("Window [", first + 1)
    assert "Exchange" not in plan[first:second]


def test_subsecond_step_rejected(spark):
    from svoe_spark.operators.resample import resample_ffill, resample_interpolate

    df = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1), 1.0)], "g string, ts timestamp, value double"
    )
    with pytest.raises(ValueError):
        resample_ffill(df, by="g", every="500ms")
    with pytest.raises(ValueError):
        resample_interpolate(df, by="g", every=0.5)
