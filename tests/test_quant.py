"""rolling_corr / pairwise_corr: numpy ground truth, determinism
shape, degenerate series, single-sort plan."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.quant import pairwise_corr, rolling_corr


@pytest.fixture(scope="module")
def xy(spark):
    rng = np.random.RandomState(7)
    xs = rng.randint(0, 1000, size=40).tolist()
    ys = (np.array(xs) * 2 + rng.randint(0, 500, size=40)).tolist()
    rows = [("k", i, int(x), int(y)) for i, (x, y) in enumerate(zip(xs, ys))]
    df = spark.createDataFrame(rows, "g string, i long, x long, y long")
    return df, xs, ys


def test_rolling_matches_numpy(spark, xy):
    df, xs, ys = xy
    got = {
        r["i"]: r["corr"]
        for r in rolling_corr(df, "x", "y", by="g", order="i", window_rows=9).collect()
    }
    for i in range(len(xs)):
        lo = max(0, i - 9)
        want = np.corrcoef(xs[lo : i + 1], ys[lo : i + 1])[0, 1]
        if math.isnan(want):
            assert got[i] is None or math.isnan(got[i])
        else:
            assert got[i] == pytest.approx(want, rel=1e-12)


def test_rolling_constant_series_null(spark):
    df = spark.createDataFrame(
        [("k", i, 5, i) for i in range(6)], "g string, i long, x long, y long"
    )
    assert all(
        r["corr"] is None
        for r in rolling_corr(df, "x", "y", by="g", order="i").collect()
    )


def test_rolling_two_windows_one_sort(spark, xy):
    df, _, _ = xy
    plan = (
        rolling_corr(df, "x", "y", by="g", order="i")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # running cumsums + their lags: two Window operators, no bounded
    # sliding frame (Spark re-aggregates those per row), sharing one
    # exchange and one sort
    assert plan.count("+- Window") == 2
    # no [-w, current] sliding frame anywhere (lag's offset frame
    # (RowFrame, -51, -51) is fine — it's O(1)/row)
    import re

    assert not re.search(r"RowFrame, -\d+, currentrow", plan)
    first = plan.index("Window [")
    second = plan.index("Window [", first + 1)
    assert "Exchange" not in plan[first:second]
    assert "Sort" not in plan[first:second]


def test_pairwise_matches_numpy(spark):
    rng = np.random.RandomState(3)
    series = {k: rng.randint(0, 100, size=12).tolist() for k in "abc"}
    rows = [
        (k, b, int(v)) for k, vs in series.items() for b, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "k string, b long, v long")
    got = {
        (r["key_x"], r["key_y"]): r["corr"]
        for r in pairwise_corr(df, "k", "b", "v").collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (kx, ky), c in got.items():
        want = np.corrcoef(series[kx], series[ky])[0, 1]
        assert c == pytest.approx(want, rel=1e-12)


def test_pairwise_inner_alignment(spark):
    # key b missing bucket 2: the (a, b) corr uses buckets {0, 1} only
    rows = [("a", 0, 1), ("a", 1, 2), ("a", 2, 3), ("b", 0, 2), ("b", 1, 5)]
    df = spark.createDataFrame(rows, "k string, b long, v long")
    out = pairwise_corr(df, "k", "b", "v").collect()
    assert len(out) == 1 and out[0]["n_buckets"] == 2
    assert out[0]["corr"] == pytest.approx(1.0)


def test_registered_parity(spark, sf_small):
    from svoe_spark.testing import run_parity

    for name in ("rolling_corr_price_qty", "pairwise_corr_types", "gapfill_linear_6h"):
        ok, msg = run_parity(spark, name, sf_small)
        assert ok, msg


def test_max_drawdown_hand_example(spark):
    from svoe_spark.operators.quant import max_drawdown

    rows = [("k", i, v) for i, v in enumerate([100, 120, 80, 110, 60, 90])]
    df = spark.createDataFrame(rows, "g string, i long, v long")
    out = max_drawdown(df, "v", by="g", order="i").collect()[0]
    assert out["max_dd"] == 60  # peak 120 -> trough 60
    assert out["max_dd_pct"] == pytest.approx(0.5)


def test_max_drawdown_monotone_rising_is_zero(spark):
    from svoe_spark.operators.quant import max_drawdown

    df = spark.createDataFrame(
        [("k", i, i * 10) for i in range(5)], "g string, i long, v long"
    )
    out = max_drawdown(df, "v", by="g", order="i").collect()[0]
    assert out["max_dd"] == 0 and out["max_dd_pct"] == 0.0


def test_max_drawdown_zero_peak_guard(spark):
    from svoe_spark.operators.quant import max_drawdown

    df = spark.createDataFrame([("k", 0, 0)], "g string, i long, v long")
    out = max_drawdown(df, "v", by="g", order="i").collect()[0]
    assert out["max_dd"] == 0 and out["max_dd_pct"] is None


def test_rolling_corr_null_pairs_consistent(spark):
    from svoe_spark.operators.quant import rolling_corr

    # one row missing y: it must contribute to NO moment — with a raw
    # count(*) the (1,1),(2,NULL) window reported corr=-1 from a
    # single valid pair
    df = spark.createDataFrame(
        [("k", 0, 1, 1), ("k", 1, 2, None), ("k", 2, 2, 2)],
        "g string, i long, x long, y long",
    )
    got = {r["i"]: r["corr"] for r in
           rolling_corr(df, "x", "y", by="g", order="i").collect()}
    assert got[1] is None  # one valid pair -> zero variance -> NULL
    assert got[2] == pytest.approx(1.0)  # pairs (1,1),(2,2)


def test_rsi_hand_example(spark):
    from svoe_spark.operators.quant import rsi

    # diffs: +1 x3, -1 x1 over periods=4 -> rsi = 100*3/(3+1) = 75
    vals = [10, 11, 12, 13, 12]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "g string, i long, v long"
    )
    got = {r["i"]: r["rsi"] for r in
           rsi(df, "v", by="g", order="i", periods=4).collect()}
    assert got[0] is None and got[3] is None  # warm-up: < 4 diffs
    assert got[4] == 75.0


def test_rsi_extremes_and_flat(spark):
    from svoe_spark.operators.quant import rsi

    up = spark.createDataFrame(
        [("k", i, 10 + i) for i in range(6)], "g string, i long, v long"
    )
    assert {r["rsi"] for r in rsi(up, "v", by="g", order="i", periods=3)
            .where("i >= 3").collect()} == {100.0}
    flat = spark.createDataFrame(
        [("k", i, 7) for i in range(6)], "g string, i long, v long"
    )
    assert all(r["rsi"] is None for r in
               rsi(flat, "v", by="g", order="i", periods=3).collect())


def test_bollinger_matches_numpy(spark):
    import numpy as np

    from svoe_spark.operators.quant import bollinger

    rng = np.random.RandomState(11)
    vals = rng.randint(50, 150, size=30).tolist()
    df = spark.createDataFrame(
        [("k", i, int(v)) for i, v in enumerate(vals)],
        "g string, i long, v long",
    )
    rows = {r["i"]: r for r in
            bollinger(df, "v", by="g", order="i", window_rows=9).collect()}
    assert rows[5]["bb_mid"] is None  # warm-up
    for i in range(9, 30):
        w = np.array(vals[i - 9 : i + 1], dtype=float)
        mid, sd = w.mean(), w.std(ddof=1)
        assert rows[i]["bb_mid"] == pytest.approx(mid, rel=1e-12)
        assert rows[i]["bb_up"] == pytest.approx(mid + 2 * sd, rel=1e-12)
        assert rows[i]["bb_pctb"] == pytest.approx(
            (vals[i] - (mid - 2 * sd)) / (4 * sd), rel=1e-10
        )


def test_leadlag_recovers_planted_lag(spark):
    import numpy as np

    from svoe_spark.operators.quant import leadlag_corr

    rng = np.random.RandomState(9)
    x = rng.randint(0, 1000, size=40)
    rows = [("x", b, int(v)) for b, v in enumerate(x)]
    # y = x shifted by +2 buckets: corr(x_t, y_{t+2}) == 1 at lag +2
    rows += [("y", b + 2, int(v)) for b, v in enumerate(x)]
    df = spark.createDataFrame(rows, "k string, b long, v long")
    got = {
        (r["key_x"], r["key_y"], r["lag"]): r["corr"]
        for r in leadlag_corr(df, "k", "b", "v", max_lag=3).collect()
    }
    assert got[("x", "y", 2)] == pytest.approx(1.0)
    # other lags correlate noise against noise, strictly below 1
    assert abs(got[("x", "y", 0)]) < 0.9


def test_leadlag_self_pairs_positive_lags_only(spark):
    from svoe_spark.operators.quant import leadlag_corr

    rows = [("x", b, b * b % 97) for b in range(30)]
    df = spark.createDataFrame(rows, "k string, b long, v long")
    got = leadlag_corr(df, "k", "b", "v", max_lag=2).collect()
    assert {r["lag"] for r in got} == {1, 2}  # ACF: no lag 0 / negatives


def test_bollinger_null_value_not_counted(spark):
    from svoe_spark.operators.quant import bollinger

    rows = [("k", i, None if i == 3 else 100 + i) for i in range(6)]
    df = spark.createDataFrame(rows, "g string, i long, v long")
    out = {r["i"]: r["bb_mid"] for r in
           bollinger(df, "v", by="g", order="i", window_rows=4).collect()}
    # windows containing the null never reach 5 non-null values
    assert all(out[i] is None for i in range(6))


def test_atr_hand_example(spark):
    from svoe_spark.operators.quant import atr

    # bars (h, l, c); TR1 = h-l = 10; TR2 = max(8, |15-9|, |7-9|) = 8;
    # TR3 = max(4, |14-12|, |10-12|) = 4 -> ATR(3) at bar3 = 22/3
    bars = spark.createDataFrame(
        [("k", 1, 12, 2, 9), ("k", 2, 15, 7, 12), ("k", 3, 14, 10, 11)],
        "g string, window_start long, high_c long, low_c long, close_c long",
    )
    got = {r["window_start"]: r["atr"] for r in
           atr(bars, by="g", periods=3).collect()}
    assert got[1] is None and got[2] is None
    assert got[3] == pytest.approx(22 / 3)


def test_atr_gap_bar_true_range(spark):
    from svoe_spark.operators.quant import atr

    # gap down: bar2 entirely below bar1's close -> TR = |l - pc| side
    bars = spark.createDataFrame(
        [("k", 1, 110, 100, 108), ("k", 2, 95, 90, 91)],
        "g string, window_start long, high_c long, low_c long, close_c long",
    )
    got = {r["window_start"]: r["atr"] for r in
           atr(bars, by="g", periods=2).collect()}
    # TR1 = 10, TR2 = max(5, |95-108|=13, |90-108|=18) = 18
    assert got[2] == pytest.approx((10 + 18) / 2)


def test_order_flow_imbalance_arms(spark):
    from svoe_spark.operators.quant import order_flow_imbalance

    rows = [
        # (key, ts, bid_px, bid_sz, ask_px, ask_sz)
        ("X", 1, 100, 10, 102, 20),  # first row -> 0
        ("X", 2, 101, 7, 102, 21),   # bid up: +7; ask equal: -21 +20
        ("X", 3, 100, 5, 103, 9),    # bid down: -7; ask up: +21
        ("X", 4, 100, 6, 101, 4),    # bid equal: +6-5; ask down: -4
        ("Y", 1, 50, 1, 51, 1),      # other key independent -> 0
    ]
    df = spark.createDataFrame(
        rows, "k string, ts long, bp long, bs long, ap long, asz long"
    )
    out = order_flow_imbalance(df, "k", "ts", "bp", "bs", "ap", "asz")
    got = {(r["k"], r["ts"]): r["e_ofi"] for r in out.collect()}
    assert got[("X", 1)] == 0
    assert got[("X", 2)] == 7 - 21 + 20  # +qb (b up), ask equal: -qa + pqa
    assert got[("X", 3)] == -7 + 21      # -pqb (b down), +pqa (a up)
    assert got[("X", 4)] == 6 - 5 - 4    # b equal: +qb - pqb; a down: -qa
    assert got[("Y", 1)] == 0


# ---------------------------------------------------------------------------
# ols_fit
# ---------------------------------------------------------------------------


def test_ols_perfect_line_recovers_parameters(spark):
    from svoe_spark.operators.quant import ols_fit

    # y = 3x + 7 exactly
    rows = [("g", x, 3 * x + 7) for x in range(10)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = ols_fit(df, "x", "y", by=["g"]).collect()[0]
    assert (r["n"], r["slope"], r["intercept"], r["r2"]) == (10, 3.0, 7.0, 1.0)


def test_ols_degenerate_groups_are_null(spark):
    from svoe_spark.operators.quant import ols_fit

    rows = [("cx", 5, v) for v in (1, 2, 3)]  # constant x: undefined fit
    rows += [("cy", x, 4) for x in (1, 2, 3)]  # constant y: slope 0, r2 0/0
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in ols_fit(df, "x", "y", by=["g"]).collect()}
    assert got["cx"]["slope"] is None and got["cx"]["r2"] is None
    assert got["cy"]["slope"] == 0.0 and got["cy"]["intercept"] == 4.0
    assert got["cy"]["r2"] is None


def test_ols_matches_numpy_polyfit(spark):
    import numpy as np

    from svoe_spark.operators.quant import ols_fit

    xs = [1, 2, 4, 7, 11, 13, 17, 20]
    ys = [3, 9, 4, 15, 22, 18, 31, 29]
    df = spark.createDataFrame(
        list(zip(xs, ys)), "x long, y long"
    )
    r = ols_fit(df, "x", "y").collect()[0]
    slope, intercept = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
    assert abs(r["slope"] - slope) < 1e-9
    assert abs(r["intercept"] - intercept) < 1e-9
    corr = np.corrcoef(xs, ys)[0, 1]
    assert abs(r["r2"] - corr * corr) < 1e-9


# ---------------------------------------------------------------------------
# spearman_corr
# ---------------------------------------------------------------------------


def test_spearman_matches_scipy_semantics(spark):
    """Exact average-tie-rank Spearman must equal the textbook value
    (numpy-computed on average ranks), including a tie-heavy column."""
    import numpy as np

    xs = [1, 2, 2, 4, 5, 5, 5, 8]
    ys = [3, 1, 4, 4, 6, 9, 8, 10]
    from svoe_spark.operators.quant import spearman_corr

    df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
    got = spearman_corr(df, "x", "y").collect()[0]["spearman"]

    def avg_ranks(v):
        v = np.asarray(v, dtype=float)
        order = v.argsort(kind="stable")
        ranks = np.empty(len(v))
        i = 0
        sv = v[order]
        while i < len(v):
            j = i
            while j < len(v) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j - 1) / 2 + 1
            i = j
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    want = np.corrcoef(rx, ry)[0, 1]
    assert abs(got - want) < 1e-12


def test_spearman_invariances_and_degenerates(spark):
    from pyspark.sql import functions as F

    from svoe_spark.operators.quant import spearman_corr

    base = spark.range(50).select(
        F.col("id").alias("x"), (F.col("id") * F.col("id")).alias("y")
    )
    # monotone transform: +/-1 up to the shared double tree's sqrt ulp
    # (num/(sqrt(d)*sqrt(d)) is 1 ulp under 1 — same value both engines)
    got = spearman_corr(base, "x", "y").collect()[0]["spearman"]
    assert abs(got - 1.0) < 1e-12
    rev = base.select("x", (-F.col("y")).alias("y"))
    got = spearman_corr(rev, "x", "y").collect()[0]["spearman"]
    assert abs(got + 1.0) < 1e-12
    # constant column: undefined -> NULL
    const = base.select("x", F.lit(7).alias("y"))
    assert spearman_corr(const, "x", "y").collect()[0]["spearman"] is None
    # NULL rows excluded pairwise
    with_null = base.select(
        "x", F.when(F.col("x") < 10, F.col("y")).alias("y")
    )
    r = spearman_corr(with_null, "x", "y").collect()[0]
    assert r["n"] == 10 and abs(r["spearman"] - 1.0) < 1e-12
