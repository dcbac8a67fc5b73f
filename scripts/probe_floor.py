#!/usr/bin/env python
"""Measure the fixed-cost floor: py4j round-trip latency (with and
without TCP_NODELAY), per-job latency, and Catalyst phase times for a
few representative tail queries (QueryPlanningTracker)."""

from __future__ import annotations

import os
import socket
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svoe_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(
        "svoe_spark_floor",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm

    # --- py4j round-trip latency ---
    sysc = jvm.java.lang.System
    sysc.nanoTime()  # warm
    n = 3000
    t0 = time.perf_counter()
    for _ in range(n):
        sysc.nanoTime()
    t1 = time.perf_counter()
    print(f"py4j round trip (default): {(t1 - t0) / n * 1e6:.1f} us")

    # check socket options on the live connection
    import py4j.clientserver as cs

    client = spark.sparkContext._gateway._gateway_client
    conn = None
    try:
        conn = client.get_thread_connection()
    except Exception:
        pass
    if conn is None:
        # pinned-thread mode: deque
        try:
            conn = client.deque[0]
        except Exception:
            pass
    if conn is not None and hasattr(conn, "socket"):
        nd = conn.socket.getsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY)
        print(f"TCP_NODELAY on python->jvm socket: {nd}")
        conn.socket.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        t0 = time.perf_counter()
        for _ in range(n):
            sysc.nanoTime()
        t1 = time.perf_counter()
        print(f"py4j round trip (TCP_NODELAY=1): {(t1 - t0) / n * 1e6:.1f} us")

    # --- per-job latency floor ---
    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    r = spark.range(1000)
    _force(r)  # warm codegen for this shape
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        _force(spark.range(1000))
    t1 = time.perf_counter()
    print(f"noop job floor (range scan, no shuffle): {(t1 - t0) / n * 1e3:.1f} ms")

    from pyspark.sql import functions as F

    g = spark.range(10000).groupBy((F.col("id") % 7).alias("k")).count()
    _force(g)
    t0 = time.perf_counter()
    for _ in range(n):
        _force(spark.range(10000).groupBy((F.col("id") % 7).alias("k")).count())
    t1 = time.perf_counter()
    print(f"noop job floor (1-shuffle groupBy, AQE): {(t1 - t0) / n * 1e3:.1f} ms")

    # --- Catalyst phase times for representative tail queries ---
    from svoe_spark.all_queries import QUERIES
    from svoe_spark.sources.tables import load_tables

    for df in load_tables(spark, SF_DIR).values():
        df.count()

    names = sys.argv[1:] or [
        "revenue_by_nation",
        "q1_pricing_summary",
        "ohlcv_1m",
        "volatility_1h",
        "token_frequencies",
        "events_content_dedup",
        "every_nth_10",
        "pct_change_1h",
        "session_windows_30m",
        "gini_spend_by_nation",
    ]
    for name in names:
        q = QUERIES[name]
        t0 = time.perf_counter()
        df = q.fn(spark, SF_DIR)
        t1 = time.perf_counter()
        _force(df)
        t2 = time.perf_counter()
        je = df._jdf.queryExecution()
        tr = je.tracker()
        phases = tr.phases()
        ph = {}
        it = phases.keysIterator()
        while it.hasNext():
            k = it.next()
            s = phases.apply(k)
            ph[k] = (s.endTimeMs() - s.startTimeMs()) / 1000.0
        print(
            f"{name}: fn={t1-t0:.2f} exec={t2-t1:.2f} phases={ph}"
        )


if __name__ == "__main__":
    main()
