"""funnel / retention_cohorts / interval_concurrency semantics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

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


def test_purged_time_folds_roles(spark):
    from svoe_spark.operators.curation import purged_time_folds

    # 10 points at seconds 0..9 -> lo=0, hi=9s+1us, width=(9s+1)//2
    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, i)) for i in range(10)]
    df = spark.createDataFrame(rows, "i long, ts timestamp")
    lab = purged_time_folds(df, n_folds=2, embargo="2s")
    got = {(r["i"], r["fold"]): r["role"] for r in lab.collect()}
    assert len(got) == 20  # every row labeled for every fold
    # fold 0 test window = [0s, 4.5s): seconds 0..4 test; 5,6 purged
    assert got[(0, 0)] == "test" and got[(4, 0)] == "test"
    assert got[(5, 0)] == "purged" and got[(6, 0)] == "purged"
    assert got[(7, 0)] == "train"
    # fold 1 test window = [4.5s, hi): 5..9 test; 3,4 purged (embargo)
    assert got[(5, 1)] == "test" and got[(9, 1)] == "test"
    assert got[(4, 1)] == "purged" and got[(3, 1)] == "purged"
    assert got[(2, 1)] == "train"


def test_purged_time_folds_validation(spark):
    from svoe_spark.operators.curation import purged_time_folds

    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))], "i long, ts timestamp")
    with pytest.raises(ValueError):
        purged_time_folds(df, n_folds=1)


def test_robust_outliers_hand_example(spark):
    from svoe_spark.operators.profiling import robust_outliers

    # values 1..7 plus wild 1000: median = 5th smallest of 8 = 4 (k =
    # floor(7*0.5)+1 = 4... values sorted: 1,2,3,4,5,6,7,1000 -> k=4
    # -> med=4; devs: 3,2,1,0,1,2,3,996 sorted 0,1,1,2,2,3,3,996 ->
    # mad = 4th = 2
    vals = [1, 2, 3, 4, 5, 6, 7, 1000]
    df = spark.createDataFrame([("g", i, v) for i, v in enumerate(vals)],
                               "g string, i long, v long")
    got = {r["v"]: (r["dev"], r["score"]) for r in
           robust_outliers(df, "v", ["g"]).collect()}
    assert got[4] == (0, 0.0)
    assert got[1000] == (996, 498.0)
    assert got[1] == (3, 1.5)


def test_robust_outliers_zero_mad_guarded(spark):
    from svoe_spark.operators.profiling import robust_outliers

    df = spark.createDataFrame(
        [("g", i, 5 if i < 4 else 9) for i in range(5)],
        "g string, i long, v long",
    )
    rows = robust_outliers(df, "v", ["g"]).collect()
    assert all(r["score"] is None for r in rows)  # MAD = 0


def test_candle_patterns_hand_bars(spark):
    from svoe_spark.operators.quant import candle_patterns

    # bar1: red 110->90; bar2: green 85->115 engulfing bar1's body;
    # bar3: doji open=close inside a 40-wide range
    bars = spark.createDataFrame(
        [
            ("k", 1, 110, 120, 80, 90),
            ("k", 2, 85, 125, 80, 115),
            ("k", 3, 100, 130, 90, 101),
        ],
        "event_type string, window_start long, open_c long, high_c long, "
        "low_c long, close_c long",
    )
    got = {r["window_start"]: r for r in candle_patterns(bars).collect()}
    assert not got[1]["is_bullish_engulfing"]
    assert got[2]["is_bullish_engulfing"] and not got[2]["is_bearish_engulfing"]
    assert got[3]["is_doji"]  # body 1 <= 10% of range 40
    assert not got[2]["is_doji"]  # body 30 > 10% of range 45


def test_concurrency_reversed_interval_dropped(spark):
    from svoe_spark.operators.events_analytics import interval_concurrency

    iv = spark.createDataFrame(
        [("k", 5.0, 3.0), ("k", 1.0, 2.0)], "g string, s double, e double"
    )
    got = {r["ts"]: r["concurrent"]
           for r in interval_concurrency(iv, "s", "e", by="g").collect()}
    # the reversed row contributes nothing; no negative counts ever
    assert got == {1.0: 1, 2.0: 0}


def test_purged_folds_null_ts_dropped(spark):
    from svoe_spark.operators.curation import purged_time_folds

    rows = [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 2)), (3, None)]
    df = spark.createDataFrame(rows, "i long, ts timestamp")
    lab = purged_time_folds(df, n_folds=2)
    assert {r["i"] for r in lab.collect()} == {1, 2}


def test_robust_outliers_null_group_kept(spark):
    from svoe_spark.operators.profiling import robust_outliers

    rows = [(None, i, v) for i, v in enumerate([1, 2, 3])] + [
        ("g", 10, 5), ("g", 11, 6), ("g", 12, 7)]
    df = spark.createDataFrame(rows, "g string, i long, v long")
    out = robust_outliers(df, "v", ["g"])
    assert out.count() == 6  # NULL-group rows scored, not dropped
    nulls = out.where(F.col("g").isNull()).collect()
    assert {r["v"]: r["dev"] for r in nulls} == {1: 1, 2: 0, 3: 1}


def test_funnel_sql_escapes_quotes():
    from svoe_spark.operators.events_analytics import funnel_sql

    sql = funnel_sql(["o'brien", "click"])
    assert "o''brien" in sql and "o'brien'" not in sql.replace("o''brien", "")


# ---------------------------------------------------------------------------
# transition_matrix
# ---------------------------------------------------------------------------


def _seq(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_s string, event_id long"
    )
    return df.selectExpr(
        "user_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts", "event_id"
    )


def test_transition_matrix_counts_and_normalizes(spark):
    from svoe_spark.operators.events_analytics import transition_matrix

    ev = _seq(
        spark,
        [
            (1, "a", "2024-01-01 00:00:00", 1),
            (1, "b", "2024-01-01 00:01:00", 2),
            (1, "a", "2024-01-01 00:02:00", 3),
            (1, "c", "2024-01-01 00:03:00", 4),
            (2, "a", "2024-01-01 00:00:00", 5),
            (2, "b", "2024-01-01 00:01:00", 6),
        ],
    )
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["p"])
        for r in transition_matrix(ev, tiebreak="event_id").collect()
    }
    # from 'a': b,c,b -> a->b 2/3, a->c 1/3; from 'b': b->a 1/1
    assert got == {
        ("a", "b"): (2, 2 / 3),
        ("a", "c"): (1, 1 / 3),
        ("b", "a"): (1, 1.0),
    }


def test_transition_matrix_gap_bound_and_key_isolation(spark):
    from svoe_spark.operators.events_analytics import transition_matrix

    ev = _seq(
        spark,
        [
            (1, "a", "2024-01-01 00:00:00", 1),
            (1, "b", "2024-01-01 02:00:00", 2),  # > gap: dropped
            (1, "c", "2024-01-01 02:10:00", 3),  # b->c within gap
            (2, "x", "2024-01-01 00:00:00", 4),  # other key: no cross-user pair
        ],
    )
    got = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in transition_matrix(
            ev, tiebreak="event_id", gap_seconds=1800
        ).collect()
    }
    assert got == {("b", "c"): 1}


def test_transition_matrix_tiebreak_orders_equal_timestamps(spark):
    from svoe_spark.operators.events_analytics import transition_matrix

    ev = _seq(
        spark,
        [
            (1, "z", "2024-01-01 00:00:00", 2),
            (1, "a", "2024-01-01 00:00:00", 1),  # same instant, lower id first
            (1, "b", "2024-01-01 00:01:00", 3),
        ],
    )
    got = sorted(
        (r["from_state"], r["to_state"])
        for r in transition_matrix(ev, tiebreak="event_id").collect()
    )
    assert got == [("a", "z"), ("z", "b")]


# ---------------------------------------------------------------------------
# association_rules (market basket)
# ---------------------------------------------------------------------------


def test_association_rules_exact_scores(spark):
    from svoe_spark.operators.basket import association_rules

    rows = [  # 4 baskets; {x,y} co-occur 3x, {x,z} once
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "y"), (3, "z"),
        (4, "x"), (4, "z"), (4, "x"),  # dup membership collapses
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(df, "b", "i").collect()
    }
    xy = got[("x", "y")]
    assert (xy["n_ab"], xy["n_a"], xy["n_b"]) == (3, 4, 3)
    assert xy["confidence"] == 3 / 4
    assert xy["lift"] == (4 * 3) / (4 * 3)  # exactly independence
    xz = got[("x", "z")]
    assert (xz["n_ab"], xz["n_a"], xz["n_b"]) == (2, 4, 2)
    assert xz["lift"] == (4 * 2) / (4 * 2)
    yz = got[("y", "z")]
    assert yz["n_ab"] == 1 and yz["lift"] == 4 / 6


def test_association_rules_min_support_and_cap(spark):
    from pyspark.sql import functions as F

    from svoe_spark.operators.basket import association_rules

    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    # a mega-basket containing 50 items would add C(50,2) noise pairs
    rows += [(9, f"junk{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "b long, i string")
    out = association_rules(df, "b", "i", min_support=2, cap_items=10)
    got = [(r["item_a"], r["item_b"], r["n_ab"]) for r in out.collect()]
    assert got == [("a", "b", 2)]
    # without the cap the junk pairs appear (at support 1)
    n_all = association_rules(df, "b", "i").count()
    assert n_all == 1 + 50 * 49 // 2
