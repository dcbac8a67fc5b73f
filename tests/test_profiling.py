"""Dataset-profiling operators: values vs a pandas-computed reference,
plus the plan property that makes the profiler viable at 100 TB —
approx mode is ONE scan with no Expand (exact mode's Expand is the
documented trade for bit-reproducibility)."""

from __future__ import annotations

import contextlib
import io
import math

import pandas as pd
import pytest

from svoe_spark.operators.profiling import (
    key_skew_report,
    numeric_histogram,
    profile_columns,
)
from svoe_spark.sources.tables import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def docs_pd(spark, sf_small):
    return load_table(spark, "documents", sf_small).toPandas()


def test_profile_exact_matches_pandas(spark, sf_small, docs_pd):
    docs = load_table(spark, "documents", sf_small)
    got = {
        r["col_name"]: r.asDict()
        for r in profile_columns(docs, distinct="exact").collect()
    }
    assert set(got) == set(docs_pd.columns)
    for c in docs_pd.columns:
        s = docs_pd[c]
        row = got[c]
        assert row["n_rows"] == len(s)
        assert row["n_null"] == int(s.isna().sum())
        assert row["n_distinct"] == int(s.dropna().nunique())
        assert row["min_value"] == str(s.dropna().min())
        assert row["max_value"] == str(s.dropna().max())
        if s.dtype == object:
            assert row["len_sum"] == int(s.dropna().str.len().sum())
            assert row["num_sum"] is None
        else:
            assert row["len_sum"] is None
            assert row["num_sum"] == int(s.dropna().sum())


def test_profile_handles_nulls_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "a")], "x bigint, s string"
    )
    got = {r["col_name"]: r.asDict() for r in profile_columns(df, distinct="exact").collect()}
    assert got["x"]["n_null"] == 1 and got["x"]["n_distinct"] == 2
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 1
    assert got["s"]["len_sum"] == 2  # nulls excluded
    empty = spark.createDataFrame([], "x bigint, s string")
    er = {r["col_name"]: r.asDict() for r in profile_columns(empty, distinct="exact").collect()}
    assert er["x"]["n_rows"] == 0 and er["x"]["min_value"] is None


def test_profile_approx_is_single_scan_no_expand(spark, sf_small):
    docs = load_table(spark, "documents", sf_small)
    plan = _plan(profile_columns(docs, distinct="approx"))
    assert "Expand" not in plan
    # one scan of the parquet relation (one file index in the details),
    # partial+final aggregate only
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_profile_rejects_bad_args(spark, sf_small):
    docs = load_table(spark, "documents", sf_small)
    with pytest.raises(ValueError):
        profile_columns(docs, ["nope"])
    with pytest.raises(ValueError):
        profile_columns(docs, distinct="maybe")


def test_key_skew_matches_pandas(spark, sf_small):
    events = load_table(spark, "events", sf_small)
    pdf = events.toPandas()
    counts = pdf.groupby(pdf["event_type"].astype(str)).size()
    row = key_skew_report(events, "event_type", top_k=3).collect()[0]
    assert row["n_rows"] == len(pdf)
    assert row["n_keys"] == counts.size
    assert row["max_count"] == int(counts.max())
    assert row["min_count"] == int(counts.min())
    assert row["max_share"] == counts.max() / float(len(pdf))
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert row["topk_csv"] == ",".join(f"{k}:{v}" for k, v in want)


def test_histogram_matches_pandas(spark, sf_small):
    events = load_table(spark, "events", sf_small)
    pdf = events.toPandas()
    vals = pdf["value"].astype(float).dropna()
    lo, hi = vals.min(), vals.max()
    bins = 8
    binned = ((vals - lo) * float(bins) / (hi - lo)).apply(math.floor).clip(upper=bins - 1)
    want = binned.value_counts().to_dict()
    got = numeric_histogram(events, "value", bins=bins).collect()
    assert len(got) == bins
    assert sum(r["n_rows"] for r in got) == len(vals)
    for r in got:
        assert r["n_rows"] == want.get(r["bin_id"], 0)
        assert r["bin_lo"] == lo + r["bin_id"] * ((hi - lo) / bins)
    # edges tile [lo, hi]
    assert got[0]["bin_lo"] == lo and got[-1]["bin_hi"] == pytest.approx(hi)


def test_histogram_degenerate_inputs(spark):
    const = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    rows = numeric_histogram(const, "v", bins=4).collect()
    assert [r["n_rows"] for r in rows] == [2, 0, 0, 0]
    empty = spark.createDataFrame([], "v double")
    assert numeric_histogram(empty, "v", bins=4).count() == 0
    withnull = spark.createDataFrame([(1.0,), (None,), (3.0,)], "v double")
    rows = numeric_histogram(withnull, "v", bins=2).collect()
    assert sum(r["n_rows"] for r in rows) == 2


def test_key_skew_null_keys_counted_as_sentinel(spark):
    df = spark.createDataFrame(
        [("a",), (None,), (None,), ("b",)], "k string"
    )
    row = key_skew_report(df, "k", top_k=3).collect()[0]
    assert row["n_keys"] == 3 and row["max_count"] == 2
    assert row["topk_csv"] == "<NULL>:2,a:1,b:1"


# ---------------------------------------------------------------------------
# distribution_drift
# ---------------------------------------------------------------------------


def test_drift_zero_for_identical_populations(spark):
    from svoe_spark.operators.profiling import distribution_drift

    ref = spark.range(1000).selectExpr("id % 100 AS v")
    out = distribution_drift(ref, ref, "v", n_buckets=10).collect()
    assert len(out) == 10
    assert sum(r["n_ref"] for r in out) == 1000
    for r in out:
        # identical populations: equal counts per bucket, zero drift
        # (bucket sizes vary around 100 — type-1 cuts land ON values)
        assert r["n_ref"] == r["n_cur"] > 0
        assert r["drift_term"] == 0.0


def test_drift_concentrates_where_mass_moved(spark):
    from pyspark.sql import functions as F

    from svoe_spark.operators.profiling import distribution_drift

    ref = spark.range(1000).selectExpr("id % 100 AS v")
    cur = ref.select((F.col("v") + 50).alias("v"))  # shift up by 50
    out = {r["bucket"]: r for r in
           distribution_drift(ref, cur, "v", n_buckets=4).collect()}
    # cur (50..149) has nothing in ref's bottom quartile, and piles up
    # in the top bucket (every cur value >= 50 lands at or above the
    # ref's q3 cut more often than ref itself does)
    assert out[0]["n_cur"] == 0 and out[0]["drift_term"] > 0
    top = max(out)
    assert out[top]["n_cur"] > out[top]["n_ref"] > 0
    total = sum(r["drift_term"] for r in out.values())
    assert total > 0.3  # a gross shift scores high


def test_drift_constant_reference_single_bucket(spark):
    from svoe_spark.operators.profiling import distribution_drift

    ref = spark.range(100).selectExpr("7 AS v")
    cur = spark.range(100).selectExpr("CAST(id % 20 AS LONG) AS v")
    out = {r["bucket"]: r for r in
           distribution_drift(ref, cur, "v", n_buckets=10).collect()}
    # all 9 cuts equal 7: buckets are 0 (v<7) and 9 (v>=7) only
    assert set(out) == {0, 9}
    assert out[9]["n_ref"] == 100
    with __import__("pytest").raises(ValueError):
        distribution_drift(ref, cur, "v", n_buckets=1)


# ---------------------------------------------------------------------------
# gini / hhi
# ---------------------------------------------------------------------------


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def test_gini_known_values(spark):
    from svoe_spark.operators.profiling import gini

    rows = [("eq", v) for v in [5, 5, 5, 5]]          # perfect equality: 0
    rows += [("mono", 0), ("mono", 0), ("mono", 0), ("mono", 12)]
    rows += [("zero", 0), ("zero", 0)]                # undefined: NULL
    got = {r["g"]: r for r in gini(_vals(spark, rows), "v", ["g"]).collect()}
    assert got["eq"]["gini"] == 0.0
    # one owner of everything among n=4: G = (n-1)/n = 0.75
    assert got["mono"]["gini"] == 0.75
    assert got["zero"]["gini"] is None
    # differential vs the textbook O(n^2) mean-absolute-difference form
    import itertools

    vs = [3, 1, 4, 1, 5, 9, 2, 6]
    want = sum(abs(a - b) for a, b in itertools.product(vs, vs)) / (
        2 * len(vs) ** 2 * (sum(vs) / len(vs))
    )
    got2 = gini(
        _vals(spark, [("x", v) for v in vs]), "v", ["g"]
    ).collect()[0]["gini"]
    assert abs(got2 - want) < 1e-12


def test_hhi_known_values(spark):
    from svoe_spark.operators.profiling import hhi

    rows = [("even", 10), ("even", 10), ("even", 10), ("even", 10)]
    rows += [("mono", 0), ("mono", 20)]
    rows += [("zero", 0)]
    got = {r["g"]: r for r in hhi(_vals(spark, rows), "v", ["g"]).collect()}
    assert got["even"]["hhi"] == 0.25  # 1/n for even shares
    assert got["mono"]["hhi"] == 1.0
    assert got["zero"]["hhi"] is None
    assert got["even"]["total"] == 40


def test_robust_outliers_windowed_matches_joined(spark):
    """Bit-identity pin for the round-11 windowed rewrite: the windowed
    order-statistic form must reproduce robust_outliers exactly —
    including NULL values inside a group (rank offset), an all-NULL
    group (dropped whole, like the inner med-join), a MAD=0 group
    (NULL score), a NULL group key, and even-count medians (type-1
    lower statistic)."""
    from svoe_spark.operators.profiling import (
        robust_outliers,
        robust_outliers_windowed,
    )

    rows = [
        # group a: odd count with one NULL value
        ("a", 1, 10), ("a", 2, 12), ("a", 3, 40), ("a", 4, None), ("a", 5, 11),
        # group b: MAD = 0 (constant values)
        ("b", 6, 7), ("b", 7, 7), ("b", 8, 7),
        # group c: all NULL -> dropped by both forms
        ("c", 9, None), ("c", 10, None),
        # NULL group key is a real group
        (None, 11, 5), (None, 12, 9),
        # group d: even count (type-1 lower median)
        ("d", 13, 1), ("d", 14, 2), ("d", 15, 3), ("d", 16, 100),
    ]
    df = spark.createDataFrame(rows, "g string, id long, v long")

    def canon(out):
        return sorted(
            ((r["g"], r["id"], r["v"], r["dev"], r["score"]) for r in out.collect()),
            key=lambda t: (t[0] is not None, t[0] or "", t[1]),
        )

    joined = canon(robust_outliers(df, "v", ["g"]))
    windowed = canon(robust_outliers_windowed(df, "v", ["g"]))
    assert windowed == joined
    # ungrouped form agrees too (NULLs included)
    j2 = canon(robust_outliers(df, "v", []))
    w2 = canon(robust_outliers_windowed(df, "v", []))
    assert w2 == j2
    # retained med/mad columns are the order-statistic values
    kept = robust_outliers_windowed(
        df, "v", ["g"], out_med="med", out_mad="mad"
    )
    got = {
        (r["g"], r["id"]): (r["med"], r["mad"]) for r in kept.collect()
    }
    assert got[("a", 1)] == (11, 1)   # median of {10,11,12,40}=11 (type-1), MAD med{0,1,1,29}=1
    assert got[("b", 6)] == (7, 0)
    assert got[("d", 13)] == (2, 1)   # even count: lower median
