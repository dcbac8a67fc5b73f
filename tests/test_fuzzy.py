"""fuzzy_join (q-gram blocked edit-distance join) and frequent_items
(sketch-pruned exact heavy hitters)."""

import random

import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.fuzzy import fuzzy_join
from svoe_spark.operators.sketches import frequent_items


def _pairs(df):
    return {(r["left_val"], r["right_val"], r["distance"]) for r in df.collect()}


def test_fuzzy_basic_edits(spark):
    left = spark.createDataFrame(
        [("widgets",), ("gadget",), ("sprocket",)], "s string"
    )
    right = spark.createDataFrame(
        [("widget",), ("gadget",), ("sprocket2",), ("unrelated",)], "t string"
    )
    got = _pairs(fuzzy_join(left, right, "s", "t", max_distance=2))
    assert ("widgets", "widget", 1) in got  # deletion
    assert ("gadget", "gadget", 0) in got  # exact
    assert ("sprocket", "sprocket2", 1) in got  # insertion
    assert not any(r == "unrelated" for _, r, _ in got)


def test_fuzzy_short_string_fallback(spark):
    # both sides too short to guarantee a shared 2-gram: the short
    # bucket must still pair them ("ab" vs "cd" = distance 2)
    left = spark.createDataFrame([("ab",)], "s string")
    right = spark.createDataFrame([("cd",)], "t string")
    got = _pairs(fuzzy_join(left, right, "s", "t", max_distance=2))
    assert got == {("ab", "cd", 2)}


def test_fuzzy_exact_vs_bruteforce(spark):
    rng = random.Random(5)
    base = ["".join(rng.choices("abcdef", k=8)) for _ in range(30)]

    def typo(s):
        i = rng.randrange(len(s))
        return s[:i] + rng.choice("abcdef") + s[i:]

    vals = base + [typo(s) for s in base[:10]]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = _pairs(
        fuzzy_join(df, df, "s", "s", max_distance=2).where(
            F.col("left_val") < F.col("right_val")
        )
    )
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(sorted(set(vals)), 2)
        if lev(a, b) <= 2
    }
    assert got == want


def test_frequent_items_equals_groupby(spark):
    rows = [(f"u{i % 7}",) for i in range(200)] + [("rare%d" % i,) for i in range(50)]
    df = spark.createDataFrame(rows, "k string")
    got = {(r["k"], r["n"]) for r in frequent_items(df, "k", 20).collect()}
    want = {
        (r["k"], r["cnt"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where("cnt >= 20")
        .collect()
    }
    assert got == want and len(got) == 7


def test_frequent_items_no_false_results(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(100)], "k string")
    assert frequent_items(df, "k", 2).count() == 0


def test_registered_parity(spark, sf_small):
    from svoe_spark.testing import run_parity

    for name in ("fuzzy_part_name_pairs", "frequent_active_users"):
        ok, msg = run_parity(spark, name, sf_small)
        assert ok, msg


def test_fuzzy_doc_freq_cap_keeps_rare_gram_pairs(spark):
    # 60 names share the hot prefix "name"; cap 10 drops the prefix
    # grams but each typo pair still shares its rare digit grams
    # (names with a second digit, e.g. name3/name30..39, would push the
    # "e3" gram itself over the cap — the documented recall trade)
    base = [f"name{i}" for i in range(60)]
    vals = base + [base[7] + "x", base[8] + "x"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = _pairs(
        fuzzy_join(df, df, "s", "s", max_distance=1, max_doc_freq=10).where(
            F.col("left_val") < F.col("right_val")
        )
    )
    assert ("name7", "name7x", 1) in got
    assert ("name8", "name8x", 1) in got


def test_fuzzy_non_ascii_and_large_q(spark):
    # the old base-256 int32 gram packing overflowed under ANSI mode
    # at q>=5 (any data) and q=4 with non-ASCII characters
    left = spark.createDataFrame([("café-latté",), ("espresso",)], "s string")
    right = spark.createDataFrame([("cafe-latté",)], "t string")
    got = _pairs(fuzzy_join(left, right, "s", "t", max_distance=1, q=4))
    assert got == {("café-latté", "cafe-latté", 1)}
    got5 = _pairs(fuzzy_join(left, right, "s", "t", max_distance=1, q=5))
    assert got5 == {("café-latté", "cafe-latté", 1)}


def test_frequent_items_low_threshold_fallback(spark):
    # threshold so low that no sketch width can prune: the operator
    # must fall back to the plain exact groupBy (and stay exact)
    rows = [(f"k{i % 50}",) for i in range(400)]
    df = spark.createDataFrame(rows, "k string")
    got = {(r["k"], r["n"]) for r in frequent_items(df, "k", 2).collect()}
    assert len(got) == 50 and all(n == 8 for _, n in got)
