"""Count-min sketch: the never-underestimate guarantee, exact
mergeability, forced-collision overestimation, NULL handling, and the
bounded sketch size."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.sketches import CMSParams, cms_build, cms_lookup, cms_merge
from svoe_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_mid):
    return load_table(spark, "events", sf_mid).persist()


def _est_vs_true(events, params):
    sketch = cms_build(events, "user_id", params)
    est = cms_lookup(sketch, events.select("user_id").distinct(), "user_id", params)
    tru = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("t"))
    return {
        r["user_id"]: (r["est_count"], r["t"])
        for r in est.join(tru, "user_id").collect()
    }


def test_cms_never_underestimates(events):
    got = _est_vs_true(events, CMSParams(width=256, depth=4))
    assert len(got) > 0
    for uid, (est, t) in got.items():
        assert est >= t, uid


def test_cms_tiny_width_forces_overestimates_but_never_under(events):
    got = _est_vs_true(events, CMSParams(width=4, depth=2))
    assert any(est > t for est, t in got.values())  # collisions happen
    assert all(est >= t for est, t in got.values())  # guarantee holds


def test_cms_sketch_size_is_bounded(events):
    params = CMSParams(width=64, depth=3)
    sketch = cms_build(events, "user_id", params).collect()
    assert len(sketch) <= params.width * params.depth
    assert {r["row"] for r in sketch} <= set(range(params.depth))


def test_cms_merge_equals_whole(events):
    params = CMSParams(width=128, depth=4)
    a = events.where(F.col("event_id") % 2 == 0)
    b = events.where(F.col("event_id") % 2 != 0)
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_merge(
            cms_build(a, "user_id", params), cms_build(b, "user_id", params)
        ).collect()
    }
    whole = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(events, "user_id", params).collect()
    }
    assert merged == whole


def test_cms_null_keys_counted_under_sentinel(spark):
    params = CMSParams(width=32, depth=3)
    df = spark.createDataFrame([("a",), (None,), (None,)], "k string")
    sketch = cms_build(df, "k", params)
    est = cms_lookup(
        sketch, spark.createDataFrame([(None,), ("a",)], "k string"), "k", params
    )
    got = {r["k"]: r["est_count"] for r in est.collect()}
    assert got[None] >= 2 and got["a"] >= 1


def test_cms_absent_key_estimates_small(spark, events):
    params = CMSParams(width=1024, depth=4)
    sketch = cms_build(events, "user_id", params)
    ghost = spark.createDataFrame([(99999999,)], "user_id bigint")
    est = cms_lookup(sketch, ghost, "user_id", params).collect()[0]
    # an absent key can only pick up collision mass; with width 1024
    # over ~1e4 events the min across 4 rows is almost surely small
    assert est["est_count"] < 200
