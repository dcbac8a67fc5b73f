"""Kappa parity for the directional as-of joins (VERDICT r6 ask 4):
streaming forward and nearest matches over a time-ranged replay must
equal the batch operators on the CLOSED row set — every left row with
a right observation at-or-after it (the gap-closing row exists); the
un-closable tail past the last right observation of all time is the
same un-emittable set as the interpolation stream's trailing NULLs."""

import time

import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.asof import asof_join, asof_join_nearest
from svoe_spark.streaming.asof_stream import (
    asof_forward_stream,
    asof_nearest_stream,
)
from svoe_spark.streaming.sinks import run_available_to_memory

SHIFT_US = 7 * 60 * 1_000_000  # left instants = right instants + 7min


def _sides(spark, sf_small):
    """Right = unique-(key, ts) tick series; left = the same instants
    shifted +7min (key-preserving), so matches are non-trivial in both
    directions and every distance is a fresh comparison."""
    from svoe_spark.queries import ticks

    right = (
        ticks(spark, sf_small)
        .groupBy("event_type", "ts")
        .agg(F.max("value").alias("value"))
    )
    left = right.select(
        "event_type",
        F.timestamp_micros(F.unix_micros("ts") + SHIFT_US).alias("ts"),
    )
    return left, right


@pytest.fixture(scope="module")
def asof_parquet(spark, sf_small, tmp_path_factory):
    """Left and right written as three aligned time-slice files each
    (same GLOBAL bounds for both sides, so micro-batch i holds both
    sides' slice i and cross-batch event-time order holds across the
    union — the shared replay contract)."""
    base = tmp_path_factory.mktemp("asofstream")
    lp, rp = str(base / "left"), str(base / "right")
    left, right = _sides(spark, sf_small)
    left, right = left.persist(), right.persist()
    qs = right.selectExpr(
        "percentile(unix_micros(ts), array(0.34, 0.67)) AS q"
    ).first()["q"]
    bounds = [None, *[int(q) for q in qs], None]
    for i in range(3):
        for df, path in ((left, lp), (right, rp)):
            sl = df
            if bounds[i] is not None:
                sl = sl.where(F.unix_micros("ts") > bounds[i])
            if bounds[i + 1] is not None:
                sl = sl.where(F.unix_micros("ts") <= bounds[i + 1])
            sl.coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)
    left.unpersist()
    right.unpersist()
    return lp, rp


def _replay(spark, path):
    return (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _closed(df, right, on="ts", by="event_type"):
    """Restrict a batch result to the stream's closable rows: left
    instants at or before the key's LAST right observation."""
    mx = right.groupBy(by).agg(F.max(on).alias("__mx"))
    return (
        df.join(F.broadcast(mx), by)
        .where(F.col(on) <= F.col("__mx"))
        .drop("__mx")
    )


def _stream_vs_batch(spark, sf_small, asof_parquet, kind, tolerance=None):
    lp, rp = asof_parquet
    fn = asof_forward_stream if kind == "forward" else asof_nearest_stream
    out = run_available_to_memory(
        fn(
            _replay(spark, lp),
            _replay(spark, rp),
            on="ts",
            by="event_type",
            value_col="value",
            out="v",
            tolerance=tolerance,
        )
    )
    got = sorted((r["event_type"], r["ts"], r["v"]) for r in out.collect())
    left, right = _sides(spark, sf_small)
    if kind == "forward":
        batch = asof_join(
            left, right, on="ts", by=["event_type"], right_cols=["value"],
            direction="forward", tolerance=tolerance,
        )
    else:
        batch = asof_join_nearest(
            left, right, on="ts", by=["event_type"], right_cols=["value"],
            tolerance=tolerance,
        )
    want = sorted(
        (r["event_type"], r["ts"], r["value"])
        for r in _closed(batch, right).collect()
    )
    return got, want


def test_asof_forward_stream_equals_batch(spark, sf_small, asof_parquet):
    got, want = _stream_vs_batch(spark, sf_small, asof_parquet, "forward")
    assert got == want and len(got) > 100
    assert any(v is not None for *_, v in got)


def test_asof_nearest_stream_equals_batch(spark, sf_small, asof_parquet):
    got, want = _stream_vs_batch(spark, sf_small, asof_parquet, "nearest")
    assert got == want and len(got) > 100
    assert any(v is not None for *_, v in got)


def test_asof_nearest_stream_tolerance_nulls_match_batch(
    spark, sf_small, asof_parquet
):
    """Out-of-tolerance rows emit with a NULL value in BOTH forms —
    the batch fill's semantics, not a dropped row."""
    got, want = _stream_vs_batch(
        spark, sf_small, asof_parquet, "nearest", tolerance="5m"
    )
    assert got == want
    assert any(v is None for *_, v in got)  # the tolerance bites
    assert any(v is not None for *_, v in got)


def test_asof_forward_stream_tolerance_nulls_match_batch(
    spark, sf_small, asof_parquet
):
    got, want = _stream_vs_batch(
        spark, sf_small, asof_parquet, "forward", tolerance="5m"
    )
    assert got == want
    assert any(v is None for *_, v in got)
    assert any(v is not None for *_, v in got)


def test_asof_nearest_stream_survives_tiny_arrow_chunks(
    spark, sf_small, asof_parquet
):
    """The shared Arrow-chunk-reassembly guard (chunks.batch_frame):
    3-row chunks must not break cross-chunk event-time ordering."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "3")
    try:
        got, want = _stream_vs_batch(spark, sf_small, asof_parquet, "nearest")
        assert got == want
    finally:
        spark.conf.set(key, old)


def test_asof_nearest_stream_multi_value_whole_row(
    spark, sf_small, asof_parquet, tmp_path
):
    """Several value columns ride the ONE matched right row (the batch
    operators' whole-row semantics) — never a per-column mix of rows.
    The second column is a recomputable function of the first, so any
    row-mixing would break the invariant check."""
    import glob
    import os

    lp, rp = asof_parquet
    # rebuild the 3-slice replay order for the widened right side (one
    # slice per source file, same mod-time ordering contract)
    rp2 = str(tmp_path / "right2")
    for f in sorted(
        glob.glob(rp + "/part-*.parquet"), key=os.path.getmtime
    ):
        (
            spark.read.parquet(f)
            .withColumn("neg", -F.col("value") - 1.0)
            .coalesce(1)
            .write.mode("append")
            .parquet(rp2)
        )
        time.sleep(1.1)
    out = run_available_to_memory(
        asof_nearest_stream(
            _replay(spark, lp),
            _replay(spark, rp2),
            on="ts",
            by="event_type",
            value_col=["value", "neg"],
        )
    )
    rows = out.collect()
    assert len(rows) > 100
    for r in rows:
        assert (r["value"] is None) == (r["neg"] is None)
        if r["value"] is not None:
            assert r["neg"] == -r["value"] - 1.0
    # and the first column still equals the single-column stream
    got = sorted((r["event_type"], r["ts"], r["value"]) for r in rows)
    left, right = _sides(spark, sf_small)
    want = sorted(
        (r["event_type"], r["ts"], r["value"])
        for r in _closed(
            asof_join_nearest(
                left, right, on="ts", by=["event_type"], right_cols=["value"]
            ),
            right,
        ).collect()
    )
    assert got == want


def test_asof_nearest_hand_case_tiebreak_and_exact_match(spark, tmp_path):
    """Hand-pinned semantics: (a) equidistant left row -> backward wins
    (the pandas tie-break); (b) a left row at exactly a right instant
    emits IMMEDIATELY (distance 0, no forward wait) — it appears even
    though no later right ever arrives; (c) a left row past the last
    right never emits."""
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    # right: k at t=100s (v=1.0) and t=300s (v=2.0)
    # left:  t=200s (equidistant -> backward 1.0), t=300s (exact -> 2.0),
    #        t=999s (after last right -> never emitted)
    right_rows = [("k", 100, 1.0), ("k", 300, 2.0)]
    left_rows = [("k", 200), ("k", 300), ("k", 999)]
    spark.createDataFrame(
        right_rows,
        "event_type string, sec long, value double",
    ).select(
        "event_type", F.timestamp_seconds("sec").alias("ts"), "value"
    ).coalesce(1).write.parquet(rp)
    spark.createDataFrame(
        left_rows, "event_type string, sec long"
    ).select(
        "event_type", F.timestamp_seconds("sec").alias("ts")
    ).coalesce(1).write.parquet(lp)
    out = run_available_to_memory(
        asof_nearest_stream(
            _replay(spark, lp),
            _replay(spark, rp),
            on="ts",
            by="event_type",
            value_col="value",
            out="v",
        )
    )
    got = sorted(
        (r["event_type"], int(r["ts"].timestamp()), r["v"])
        for r in out.collect()
    )
    assert got == [("k", 200, 1.0), ("k", 300, 2.0)]
