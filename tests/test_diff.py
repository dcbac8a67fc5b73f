"""snapshot_diff / apply_changeset: classification, the round-trip
law, and the narrow payload=False form."""

import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.diff import apply_changeset, snapshot_diff


@pytest.fixture(scope="module")
def snaps(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "id long, s string, v long",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 99), (4, "d", 40), (5, "e", 50)],
        "id long, s string, v long",
    )
    return old, new


def test_classification(spark, snaps):
    old, new = snaps
    got = {
        r["id"]: r["change"]
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    # 1 removed; 2 unchanged (absent); 3 changed (v); 4 changed
    # (NULL -> 'd' must count as different); 5 added
    assert got == {1: "removed", 3: "changed", 4: "changed", 5: "added"}


def test_payload_values_and_narrow_form(spark, snaps):
    old, new = snaps
    rows = {r["id"]: r for r in snapshot_diff(old, new, ["id"]).collect()}
    assert rows[3]["old_v"] == 30 and rows[3]["new_v"] == 99
    assert rows[5]["old_v"] is None and rows[5]["new_s"] == "e"
    narrow = snapshot_diff(old, new, ["id"], payload=False)
    assert narrow.columns == ["id", "change"]
    assert narrow.count() == 4


def test_compare_cols_subset(spark, snaps):
    old, new = snaps
    # comparing only s: id=3 (v-only change) becomes unchanged
    got = {
        r["id"]: r["change"]
        for r in snapshot_diff(old, new, ["id"], compare_cols=["s"]).collect()
    }
    assert 3 not in got and got[4] == "changed"


def test_roundtrip_law(spark, snaps):
    old, new = snaps
    changes = snapshot_diff(old, new, ["id"])
    rebuilt = apply_changeset(old, changes, ["id"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_identical_snapshots_empty_diff(spark, snaps):
    old, _ = snaps
    assert snapshot_diff(old, old, ["id"]).count() == 0


def test_multi_key(spark):
    old = spark.createDataFrame(
        [(1, "x", 5), (1, "y", 6)], "id long, k string, v long"
    )
    new = spark.createDataFrame(
        [(1, "x", 5), (1, "y", 7)], "id long, k string, v long"
    )
    got = snapshot_diff(old, new, ["id", "k"]).collect()
    assert [(r["id"], r["k"], r["change"]) for r in got] == [(1, "y", "changed")]


def test_registered_query_parity(spark, sf_small):
    from svoe_spark.testing import run_parity

    ok, msg = run_parity(spark, "snapshot_diff_daily", sf_small)
    assert ok, msg


def test_diff_plan_is_one_join_no_extra_shuffle(spark, snaps):
    old, new = snaps
    plan = snapshot_diff(old, new, ["id"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1
