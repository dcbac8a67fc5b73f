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
    # yield + unpersist: a cached load_table relation substitutes into
    # other modules' plans (shared session) and breaks plan-shape gates
    df = load_table(spark, "events", sf_mid).persist()
    yield df
    df.unpersist()


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


def test_bloom_no_false_negatives_and_some_pruning(spark, sf_mid):
    from svoe_spark.operators.sketches import bloom_build, bloom_filter_keys

    params = CMSParams(width=8192, depth=4)
    # every customer in this fixture has orders, so build over the
    # high-value subset to create a genuine absent class to prune
    big = load_table(spark, "orders", sf_mid).where(
        F.col("o_totalprice") > 450000
    )
    cust = load_table(spark, "customer", sf_mid)
    bloom = bloom_build(big, "o_custkey", params)
    verdict = {
        r["c_custkey"]: r["might_contain"]
        for r in bloom_filter_keys(
            bloom, cust.select("c_custkey"), "c_custkey", params
        ).collect()
    }
    present = {
        r["o_custkey"] for r in big.select("o_custkey").distinct().collect()
    }
    assert 0 < len(present) < len(verdict)  # both classes exist
    # Bloom law: every present key tests positive
    for ck in present:
        assert verdict[ck] is True, ck
    # and the filter actually prunes: some absent customer tests negative
    negatives = [ck for ck, v in verdict.items() if not v]
    assert len(negatives) > 0
    assert all(ck not in present for ck in negatives)


def test_bloom_tiny_width_saturates_but_never_false_negative(spark, sf_mid):
    from svoe_spark.operators.sketches import bloom_build, bloom_filter_keys

    params = CMSParams(width=8, depth=2)
    orders = load_table(spark, "orders", sf_mid)
    cust = load_table(spark, "customer", sf_mid)
    bloom = bloom_build(orders, "o_custkey", params)
    rows = bloom.collect()
    assert len(rows) <= params.width * params.depth
    verdict = bloom_filter_keys(
        bloom, cust.select("c_custkey"), "c_custkey", params
    )
    with_orders = orders.select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    missed = verdict.join(with_orders, "c_custkey", "left_semi").where(
        ~F.col("might_contain")
    )
    assert missed.count() == 0  # no false negatives even saturated
