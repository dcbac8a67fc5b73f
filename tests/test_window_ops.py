"""Direct unit tests for the window-operator library helpers not
already covered by oracle queries: trailing_agg (A5), prefix_columns
(P5), ohlcv on a hand-computed fixture."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.sampling import prefix_columns
from svoe_spark.operators.windows import ohlcv, trailing_agg

BASE = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        # (sec offset, price, amount, side)
        (0, 100.0, 1.0, "BUY"),
        (10, 101.0, 2.0, "SELL"),
        (30, 99.0, 1.0, "BUY"),
        (70, 102.0, 3.0, "SELL"),  # new minute
        (75, 98.0, 1.0, "BUY"),
    ]
    return spark.createDataFrame(
        [(BASE + dt.timedelta(seconds=o), p, a, s, i) for i, (o, p, a, s) in enumerate(rows)],
        "ts timestamp, price double, amount double, side string, seq long",
    )


def test_ohlcv_hand_computed(trades):
    out = {r["window_start"].minute: r for r in ohlcv(trades, on="ts").collect()}
    m0, m1 = out[0], out[1]
    assert (m0["open"], m0["high"], m0["low"], m0["close"]) == (100.0, 101.0, 99.0, 99.0)
    assert m0["volume"] == 4.0 and m0["num_trades"] == 3
    assert m0["vwap"] == pytest.approx((100 + 2 * 101 + 99) / 4.0)
    assert (m1["open"], m1["close"], m1["num_trades"]) == (102.0, 98.0, 2)


def test_trailing_agg_generic(trades):
    out = trailing_agg(
        trades,
        {"n_30s": F.count(F.lit(1)), "max_30s": F.max("price")},
        on="ts",
        window="30s",
    )
    by_seq = {r["seq"]: r for r in out.collect()}
    assert by_seq[0]["n_30s"] == 1
    assert by_seq[2]["n_30s"] == 3 and by_seq[2]["max_30s"] == 101.0  # 0,10,30 all in [0,30]
    assert by_seq[4]["n_30s"] == 2 and by_seq[4]["max_30s"] == 102.0  # 70,75


def test_prefix_columns(trades):
    out = prefix_columns(trades.select("ts", "price"), "feat-", exclude=["ts"])
    assert out.columns == ["ts", "feat-price"]


def test_approx_sketches_error_bound(spark, sf_mid):
    """Relational-HLL estimates (p=9, small-range-corrected: linear
    counting below raw 2.5m) stay within 10% of exact counts (measured
    max 3.5% at sf0.01 — deep in the LC regime — and 7.3% at sf0.1,
    the raw regime near the switch, vs the m=512 sigma of 4.6%), and
    the running union is EXACTLY monotone — the register-wise-max
    merge only grows the register mass and only fills zero registers,
    and the fixture series never crosses the LC/raw switch."""
    from svoe_spark.all_queries import QUERIES

    rows = QUERIES["approx_distinct_daily"].fn(spark, sf_mid).collect()
    assert rows
    # Regime guard (ADVICE r9): the monotonicity assertion below is
    # only sound while the running-union series stays on ONE side of
    # the LC/raw switch (raw = 2.5m, i.e. ~2.5*512 = 1280 in estimate
    # space, where the small-range correction is discontinuous). If a
    # regenerated/rescaled fixture crosses it, fail HERE with the real
    # cause instead of flaking on a legitimate dip.
    assert all(r["est_users_to_date"] < 0.9 * 2.5 * 512 for r in rows), (
        "fixture's running union approaches the LC/raw switch — the "
        "monotonicity assertion below is no longer regime-safe"
    )
    prev = 0.0
    for r in sorted(rows, key=lambda r: r["day"]):
        assert abs(r["est_users"] - r["exact_users"]) <= 0.1 * r["exact_users"]
        assert r["est_users_to_date"] >= prev  # exact monotonicity
        prev = r["est_users_to_date"]


def test_native_hll_matches_relational(spark, sf_mid):
    """The engine-native sketch forms (hll_sketch_agg /
    approx_count_distinct) — the documented EXAMPLE the registered
    approx_distinct_daily deliberately does not use, because HLL++
    internals are implementation-defined and no cross-engine oracle can
    exist for them — agree with the exact counts within their tighter
    default-precision envelope, and the mergeable running union
    (hll_union_agg over an expanding frame) is monotone."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from svoe_spark.sources.tables import load_table

    e = load_table(spark, "events", sf_mid).select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    daily = e.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    rows = daily.select(
        "day",
        F.hll_sketch_estimate("sk").alias("est_users"),
        "exact_users",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias(
            "est_users_to_date"
        ),
    ).collect()
    assert rows
    prev = 0.0
    for r in sorted(rows, key=lambda r: r["day"]):
        assert abs(r["est_users"] - r["exact_users"]) <= 0.05 * r["exact_users"]
        assert r["est_users_to_date"] >= prev * 0.95  # estimate jitter only
        prev = r["est_users_to_date"]


def test_subsecond_trailing_window(spark):
    """Regression: float-seconds rangeBetween bounds crashed py4j for
    any sub-second window; the micros frame must work at '500ms'."""
    import datetime as dt

    from pyspark.sql import Row

    from svoe_spark.operators.windows import trailing_window

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(k="A", ts=base + dt.timedelta(milliseconds=m), v=float(i))
        for i, m in enumerate([0, 300, 600, 1200])
    ]
    df = spark.createDataFrame(rows)
    w = trailing_window("ts", "500ms", by="k")
    out = {
        int((r["ts"] - base).total_seconds() * 1000): r["s"]
        for r in df.select("ts", F.sum("v").over(w).alias("s")).collect()
    }
    # 0ms: {0}; 300ms: {0,1}; 600ms: {1,2} (0 is 600ms away, excluded
    # only if > 500ms — inclusive frame keeps 300ms row); 1200ms: {3}
    assert out[0] == 0.0
    assert out[300] == 1.0  # 0+1
    assert out[600] == 3.0  # 1+2
    assert out[1200] == 3.0  # just row 3


def test_tvi_prefix_matches_frame(spark, sf_small):
    from svoe_spark.operators.windows import tvi
    from svoe_spark.queries import ticks

    t = ticks(spark, sf_small).select(
        "event_type", F.col("ts").alias("timestamp"),
        F.col("value").alias("price"), F.col("qty").cast("double").alias("amount"),
        "side", "event_id",
    )
    frame = tvi(t, by="event_type", window="1h")
    prefix = tvi(t, by="event_type", window="1h", method="prefix")
    f = {r["event_id"]: r["tvi"] for r in frame.collect()}
    p = {r["event_id"]: r["tvi"] for r in prefix.collect()}
    assert set(f) == set(p)
    for k in f:
        assert p[k] == pytest.approx(f[k], rel=1e-8, abs=1e-10)


def test_trailing_sums_prefix_peer_rows_included(spark):
    import datetime as dt

    from svoe_spark.operators.windows import trailing_sums_prefix

    # two rows at the SAME instant: a range frame includes both for
    # both rows; the prefix rewrite must agree (range-running cum)
    t0 = dt.datetime(2024, 1, 1)
    rows = [("k", t0, 1.0), ("k", t0, 2.0), ("k", t0 + dt.timedelta(seconds=30), 4.0)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = trailing_sums_prefix(
        df, {"s": F.col("v")}, on="ts", by="g", window="1m"
    )
    got = sorted(r["s"] for r in out.collect())
    assert got == [3.0, 3.0, 7.0]


def test_sliding_stddev_auto_dispatch(spark, sf_small):
    from svoe_spark.operators.windows import sliding_stddev
    from svoe_spark.queries import ticks

    t = ticks(spark, sf_small).select(
        "event_type", F.col("ts").alias("timestamp"),
        F.col("value").alias("mid_price"), "event_id",
    )
    # sparse fixture -> auto picks the frame plan; result must equal it
    auto = sliding_stddev(t, by="event_type", window="1h", method="auto")
    frame = sliding_stddev(t, by="event_type", window="1h", method="frame")
    a = {r["event_id"]: r["volatility"] for r in auto.collect()}
    f = {r["event_id"]: r["volatility"] for r in frame.collect()}
    assert a == f


def test_sliding_stddev_prefix_null_values_match_frame(spark):
    from svoe_spark.operators.windows import sliding_stddev

    rows = [
        ("k", dt.datetime(2024, 1, 1, 0, 0, 0), None),
        ("k", dt.datetime(2024, 1, 1, 0, 0, 1), 5.0),
        ("k", dt.datetime(2024, 1, 1, 0, 0, 2), 7.0),
    ]
    df = spark.createDataFrame(rows, "g string, timestamp timestamp, mid_price double")
    f = {r["timestamp"]: r["volatility"]
         for r in sliding_stddev(df, by="g", window="1m").collect()}
    p = {r["timestamp"]: r["volatility"]
         for r in sliding_stddev(df, by="g", window="1m", method="prefix").collect()}
    for ts, want in f.items():
        got = p[ts]
        if want is None:
            assert got is None
        else:
            assert got == pytest.approx(want, rel=1e-9)
