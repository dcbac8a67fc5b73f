"""Storage/catalog + ingest: lake round-trips, partition pruning,
materialized-feature short-circuit, ingest normalization + ledger dedup."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from svoe_spark.queries import ticks
from svoe_spark.sources.catalog import FeatureStore, read_time_range, write_partitioned
from svoe_spark.sources.ingest import IngestLedger, ingest_csv
from svoe_spark.sources.tables import load_table


def test_lake_roundtrip_and_pruning(spark, sf_small, tmp_path):
    t = ticks(spark, sf_small)
    path = str(tmp_path / "lake")
    write_partitioned(t, path, ts_col="ts")

    # day-partitioned layout on disk
    days = [d for d in os.listdir(path) if d.startswith("day=")]
    assert len(days) == 30

    full = read_time_range(spark, path)
    assert full.count() == t.count()
    assert set(full.columns) == set(t.columns)

    start, end = "2024-01-10 00:00:00", "2024-01-12 23:59:59"
    sub = read_time_range(spark, path, start, end)
    want = t.filter(F.col("ts").between(start, end)).count()
    assert sub.count() == want > 0
    # partition pruning visible in the physical plan
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day" in plan


def test_feature_store_short_circuit(spark, sf_small, tmp_path):
    store = FeatureStore(spark, str(tmp_path / "features"))
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return ticks(spark, sf_small).select("ts", "event_type", "value")

    a = store.get_or_compute("mid-abc123", compute)
    assert calls["n"] == 1 and a.count() == 1000
    b = store.get_or_compute("mid-abc123", compute)
    assert calls["n"] == 1  # second call read the materialization
    assert b.count() == 1000
    assert store.meta("mid-abc123")["rows"] == 1000


@pytest.mark.heavy  # round-10 quick-tier trim (slowest cases -> sharded tier)
def test_compact_and_sortedness(spark, sf_small, tmp_path):
    from svoe_spark.sources.catalog import assert_ts_sorted, compact

    t = ticks(spark, sf_small)
    path = str(tmp_path / "lake2")
    # write fragmented: many small files
    (
        t.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .repartition(24)
        .write.partitionBy("day")
        .parquet(path)
    )
    before = sum(
        1 for _, _, fs in __import__("os").walk(path) for f in fs if f.endswith(".parquet")
    )
    n_after = compact(spark, path, target_mb=128, ts_col="ts")
    assert n_after < before
    out = spark.read.parquet(path)
    assert out.count() == 1000
    assert set(out.drop("day").columns) == set(t.columns)

    # sortedness invariant holds along event_id; a shuffled order col fails
    assert_ts_sorted(out, order_col="event_id", on="ts")
    with pytest.raises(ValueError, match="violate ts-sortedness"):
        shuffled = out.withColumn("bad_order", F.col("event_id") * -1)
        assert_ts_sorted(shuffled, order_col="bad_order", on="ts")


def test_ingest_csv_normalize_and_ledger(spark, sf_small, tmp_path):
    # fabricate a provider CSV from events (provider-style column names,
    # ISO timestamps, boolean side) — the cryptotick renames shape
    events = load_table(spark, "events", sf_small)
    raw = events.select(
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("time_exchange"),
        F.col("value").alias("base_amount"),
        (F.col("event_id") % 2 == 0).alias("taker_side"),
        F.col("event_id").alias("guid"),
    )
    src_dir = tmp_path / "raw"
    raw.coalesce(1).write.option("header", "true").csv(str(src_dir))
    csv_file = glob.glob(str(src_dir / "*.csv"))[0]

    dest = str(tmp_path / "ingested")
    ledger = IngestLedger(str(tmp_path / "ledger.json"))
    n = ingest_csv(
        spark,
        csv_file,
        dest,
        renames={
            "time_exchange": "timestamp",
            "base_amount": "amount",
            "taker_side": "side",
            "guid": "id",
        },
        side_col="side",
        ledger=ledger,
    )
    assert n == 1
    out = spark.read.parquet(dest)
    assert out.count() == 1000
    assert set(out.columns) == {"timestamp", "amount", "side", "id", "day"}
    assert dict(out.dtypes)["timestamp"] == "timestamp"
    assert set(r["side"] for r in out.select("side").distinct().collect()) == {"bid", "ask"}

    # ledger dedup: second ingest of the same file is a no-op
    assert ingest_csv(spark, csv_file, dest, ledger=ledger) == 0
    assert spark.read.parquet(dest).count() == 1000


def test_bucketed_join_has_no_exchange(spark, sf_small, tmp_path):
    """Co-located join: both fact tables bucketed on the join key ->
    the join plan contains NO Exchange (no shuffle) and agrees with the
    plain shuffle join's result."""
    import contextlib
    import io

    from svoe_spark.sources.catalog import write_bucketed
    from svoe_spark.sources.tables import load_table

    o = load_table(spark, "orders", sf_small)
    l = load_table(spark, "lineitem", sf_small)
    ob = write_bucketed(o, "orders_b", str(tmp_path / "ob"), "o_orderkey", 8)
    lb = write_bucketed(
        l, "lineitem_b", str(tmp_path / "lb"), "l_orderkey", 8
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert j.count() == l.join(o, l.l_orderkey == o.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_content_hash_deterministic_and_order_insensitive(spark):
    """The digest must survive re-partitioning/row order AND be stable
    across processes: it folds only unsalted numeric hashes (round-3
    ADVICE — a str in the tuple made it PYTHONHASHSEED-dependent)."""
    from svoe_spark.sources.catalog import content_hash

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "x int, s string"
    )
    h1 = content_hash(df)
    h2 = content_hash(df.orderBy(F.desc("x")).repartition(7))
    assert h1 == h2
    assert h1 != content_hash(df.where(F.col("x") < 3))
    # xor alone would cancel the duplicated pair; the multiset-sum leg
    # must keep {A,A,B} != {B}
    dup = df.unionAll(df.where(F.col("x") == 1))
    assert content_hash(dup) != content_hash(df)
    # cross-process stability: recompute what content_hash hashes with
    # a fresh interpreter under a different hash seed
    import json
    import subprocess
    import sys

    row = (
        df.selectExpr("xxhash64(x, s) as h")
        .groupBy()
        .agg(
            F.expr("bit_xor(h)").alias("x"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    code = (
        "import sys,json; x,s,n=json.load(sys.stdin); "
        "print(hash((x,int(s),n)))"
    )
    for seed in ("0", "12345"):
        out = subprocess.run(
            [sys.executable, "-c", code],
            input=json.dumps([row["x"], str(row["s"]), row["n"]]),
            capture_output=True,
            text=True,
            env={"PYTHONHASHSEED": seed, "PATH": "/usr/bin:/bin"},
        )
        assert int(out.stdout.strip()) == h1, (seed, out.stderr)


def test_write_clustered_row_group_stats(spark, sf_small, tmp_path):
    """The clustered layout's two structural promises, asserted in a
    session-parallelism-independent form (the old min==max single-key
    row-group count measured how often distinct keys hash-collide into
    one write task, so it flipped with the task count): (a) rows
    inside every file are key-contiguous — one run per key, the
    ordering the dynamic-partition writer silently destroyed before
    `day` led the sort — so row-group stats tighten as files grow; and
    (b) key -> task co-location: every key's rows land in at most ONE
    file per day, so a per-key scan reads ~1/parallelism of the lake.
    The key filter must also reach the scan (PushedFilters)."""
    import collections
    import glob
    import itertools

    import pyarrow.parquet as pq

    from svoe_spark.queries import ticks
    from svoe_spark.sources.catalog import write_clustered

    t = ticks(spark, sf_small).select("event_type", "ts", "value")
    path = str(tmp_path / "clustered")
    spark.conf.set("spark.hadoop.parquet.block.size", 64 * 1024)
    try:
        write_clustered(t, path, cluster_cols="event_type")
    finally:
        spark.conf.unset("spark.hadoop.parquet.block.size")

    files_with_key = collections.Counter()
    n_days = len(glob.glob(path + "/day=*"))
    n_files = 0
    for f in glob.glob(path + "/day=*/*.parquet"):
        n_files += 1
        et = pq.ParquetFile(f).read(columns=["event_type"]).to_pandas()[
            "event_type"
        ]
        # (a) key-contiguity: as many runs as distinct keys in the file
        assert len([k for k, _ in itertools.groupby(et)]) == et.nunique(), f
        for k in et.unique():
            files_with_key[k] += 1
    assert n_days > 4 and n_files >= n_days
    # (b) co-location: each key touches at most one file per day
    for k, n in files_with_key.items():
        assert n <= n_days, (k, n, n_days)

    p_lines = (
        spark.read.parquet(path)
        .where(F.col("event_type") == "purchase")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in p_lines and "event_type" in p_lines, p_lines
