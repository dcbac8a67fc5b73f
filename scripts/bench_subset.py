#!/usr/bin/env python
"""Isolated per-query timing: bench.py's exact methodology (same
session conf, table warm, worker warm, codegen warm, noop sink) over
only the query names given on argv — for profiling a family without
paying the full 196-query run. Pass --repeat N to time each query N
times in one session (first = cold incl. shared-relation builds,
rest = warm)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svoe_spark.all_queries import QUERIES  # noqa: E402
from svoe_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    repeat = 1
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i : i + 2]
    names = args
    spark = get_spark(
        "svoe_spark_bench_subset",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from svoe_spark.sources.tables import load_tables

    for df in load_tables(spark, SF_DIR).values():
        df.count()

    def _warm(batches):
        yield from batches

    _force(
        spark.range(64)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .mapInPandas(_warm, "id long")
    )
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

    out: dict[str, list[float]] = {}
    for name in names:
        q = QUERIES[name]
        spark.sparkContext.setJobDescription(name)
        ts = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            _force(q.fn(spark, SF_DIR))
            ts.append(round(time.perf_counter() - t0, 3))
        out[name] = ts
        print(json.dumps({name: ts}), flush=True)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"total_first": round(sum(v[0] for v in out.values()), 3)}))


if __name__ == "__main__":
    main()
