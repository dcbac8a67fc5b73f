"""SCD2 history: compression semantics, merge == full recompression,
idempotence."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.scd import scd2_compress, scd2_merge


def _t(day, h=0):
    return datetime(2024, 1, day, h)


@pytest.fixture()
def log(spark):
    rows = [
        # user 1: A A B A  -> three runs
        (1, _t(1), 10, "A"),
        (1, _t(2), 11, "A"),
        (1, _t(3), 12, "B"),
        (1, _t(4), 13, "A"),
        # user 2: single observation -> one current run
        (2, _t(1), 20, "X"),
        # user 3: same-ts tie broken by event_id (14 before 15)
        (3, _t(5), 14, "P"),
        (3, _t(5), 15, "Q"),
    ]
    return spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int, state string")


def test_compress_runs_and_intervals(log):
    h = scd2_compress(log, "user_id", ["state"], ts="ts", tie_col="event_id")
    got = {
        (r["user_id"], r["version"]): (
            r["state"], r["valid_from"], r["valid_to"], r["is_current"]
        )
        for r in h.collect()
    }
    assert got[(1, 1)] == ("A", _t(1), _t(3), False)  # AA absorbed
    assert got[(1, 2)] == ("B", _t(3), _t(4), False)
    assert got[(1, 3)] == ("A", _t(4), None, True)
    assert got[(2, 1)] == ("X", _t(1), None, True)
    # same-ts: event_id order decides; P opens, Q supersedes at the same instant
    assert got[(3, 1)] == ("P", _t(5), _t(5), False)
    assert got[(3, 2)] == ("Q", _t(5), None, True)
    assert len(got) == 6


def test_compress_idempotent_over_boundary_expansion(log):
    from svoe_spark.operators.scd import scd2_to_log

    h1 = scd2_compress(log, "user_id", ["state"], ts="ts", tie_col="event_id")
    relog = scd2_to_log(h1, "user_id", ["state"], ts="ts", tie_col="event_id")
    h2 = scd2_compress(relog, "user_id", ["state"], ts="ts", tie_col="event_id")
    assert sorted(h1.collect()) == sorted(h2.collect())


def test_merge_late_different_state_inside_run(spark, log):
    """The round-6 review case: a late row with a DIFFERENT state
    landing inside an existing run must split the run and re-open the
    old state at its last observation — identical to full
    recompression when the run has no absorbed interior observations
    between the splice point and the run end."""
    # user 1 history from rows 10 (t1,A) and 12.. ; absorb (t2,A=11) later
    first = log.where(F.col("event_id").isin(10, 11, 20, 14, 15))  # run A spans t1..t2
    hist = scd2_compress(first, "user_id", ["state"], ts="ts", tie_col="event_id")
    late = spark.createDataFrame(
        [(1, _t(1, 12), 99, "B")],  # t1.5: inside the A run
        "user_id int, ts timestamp, event_id int, state string",
    )
    merged = scd2_merge(hist, late, "user_id", ["state"], ts="ts", tie_col="event_id")
    full = scd2_compress(
        first.unionByName(late), "user_id", ["state"], ts="ts", tie_col="event_id"
    )
    assert sorted(merged.collect()) == sorted(full.collect())
    # and the semantics are right: A re-opens at t2, B holds [t1.5, t2)
    u1 = {r["version"]: (r["state"], r["valid_from"], r["valid_to"]) for r in
          merged.where("user_id = 1").collect()}
    assert u1[1] == ("A", _t(1), _t(1, 12))
    assert u1[2] == ("B", _t(1, 12), _t(2))
    assert u1[3] == ("A", _t(2), None)


def test_merge_equals_full_recompress(spark, log):
    # split the log at an arbitrary boundary, including an out-of-order
    # late row for user 1 landing BETWEEN existing intervals
    first = log.where(F.col("event_id").isin(10, 12, 13, 20, 14, 15))
    late = log.where(F.col("event_id") == 11)  # ts(2), inside run 1
    hist = scd2_compress(first, "user_id", ["state"], ts="ts", tie_col="event_id")
    merged = scd2_merge(hist, late, "user_id", ["state"], ts="ts", tie_col="event_id")
    full = scd2_compress(log, "user_id", ["state"], ts="ts", tie_col="event_id")
    assert sorted(merged.collect()) == sorted(full.collect())


def test_merge_touches_only_batch_keys(spark, log):
    hist = scd2_compress(log, "user_id", ["state"], ts="ts", tie_col="event_id")
    upd = spark.createDataFrame(
        [(2, _t(9), 99, "Y")], "user_id int, ts timestamp, event_id int, state string"
    )
    merged = scd2_merge(hist, upd, "user_id", ["state"], ts="ts", tie_col="event_id")
    # user 2 gains a version; users 1 and 3 are byte-identical
    others_before = sorted(hist.where("user_id != 2").collect())
    others_after = sorted(merged.where("user_id != 2").collect())
    assert others_before == others_after
    u2 = {r["version"]: (r["state"], r["is_current"]) for r in merged.where("user_id = 2").collect()}
    assert u2 == {1: ("X", False), 2: ("Y", True)}


def test_merge_null_safe_attr_runs(spark):
    rows = [
        (1, _t(1), 1, None),
        (1, _t(2), 2, None),  # NULL == NULL: absorbed
        (1, _t(3), 3, "A"),
    ]
    log = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int, state string")
    h = scd2_compress(log, "user_id", ["state"], ts="ts", tie_col="event_id")
    vs = {r["version"]: r["state"] for r in h.collect()}
    assert vs == {1: None, 2: "A"}
