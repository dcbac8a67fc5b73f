"""funnel / retention_cohorts / interval_concurrency semantics."""

import datetime as dt

import pytest

from svoe_spark.operators.events_analytics import (
    funnel,
    interval_concurrency,
    retention_cohorts,
)


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def ev(spark):
    # u1: full ordered path; u2: click BEFORE view (must not convert
    # past step 0); u3: view only; u4: converts but outside a 1h window
    rows = [
        (1, "view", _ts(1, 0)),
        (1, "click", _ts(1, 1)),
        (1, "purchase", _ts(1, 2)),
        (2, "click", _ts(1, 0)),
        (2, "view", _ts(1, 1)),
        (3, "view", _ts(2, 0)),
        (4, "view", _ts(3, 0)),
        (4, "click", _ts(3, 5)),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def test_funnel_order_strictness(spark, ev):
    got = {
        r["step_name"]: r["n_users"]
        for r in funnel(ev, ["view", "click", "purchase"]).collect()
    }
    # u2's click precedes their view, so only u1 and u4 pass step 1
    assert got == {"view": 4, "click": 2, "purchase": 1}


def test_funnel_within_horizon(spark, ev):
    got = {
        r["step_name"]: r["n_users"]
        for r in funnel(ev, ["view", "click"], within="1h").collect()
    }
    # u4 clicks 5h after their first view — outside the 1h horizon
    assert got == {"view": 4, "click": 1}


def test_funnel_counts_non_increasing(spark, ev):
    rows = sorted(
        funnel(ev, ["view", "click", "purchase"]).collect(),
        key=lambda r: r["step_index"],
    )
    ns = [r["n_users"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_funnel_empty_step(spark, ev):
    got = {
        r["step_name"]: r["n_users"]
        for r in funnel(ev, ["view", "signup"]).collect()
    }
    assert got["signup"] == 0


def test_retention_offsets(spark):
    rows = [
        (1, _ts(1)),
        (1, _ts(1, 5)),  # same day — distinct-day dedup
        (1, _ts(3)),
        (2, _ts(2)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r["cohort_day"]), r["offset_days"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }


def test_concurrency_half_open(spark):
    # [1,3) and [3,5): at ts=3 the first has ENDED -> concurrent == 1
    iv = spark.createDataFrame(
        [("k", 1.0, 3.0), ("k", 3.0, 5.0), ("k", 2.0, 4.0)],
        "g string, s double, e double",
    )
    got = {
        r["ts"]: r["concurrent"]
        for r in interval_concurrency(iv, "s", "e", by="g").collect()
    }
    assert got == {1.0: 1, 2.0: 2, 3.0: 2, 4.0: 1, 5.0: 0}


def test_concurrency_null_bounds_dropped(spark):
    iv = spark.createDataFrame(
        [("k", 1.0, None), ("k", None, 2.0), ("k", 1.0, 2.0)],
        "g string, s double, e double",
    )
    got = interval_concurrency(iv, "s", "e", by="g").collect()
    assert {r["ts"]: r["concurrent"] for r in got} == {1.0: 1, 2.0: 0}


def test_registered_parity(spark, sf_small):
    from svoe_spark.testing import run_parity

    for name in (
        "funnel_view_click_purchase",
        "retention_day_cohorts",
        "concurrent_open_orders",
    ):
        ok, msg = run_parity(spark, name, sf_small)
        assert ok, msg
