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
