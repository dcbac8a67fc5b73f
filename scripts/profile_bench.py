#!/usr/bin/env python
"""Decompose bench cost per query: fn-build wall, execute wall, Spark
job count (dagScheduler nextJobId delta), py4j round-trip count.

Same session/warm-up as bench.py. Writes /tmp/profile_bench.json.
"""

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
    names = sys.argv[1:] or None
    spark = get_spark(
        "svoe_spark_profile",
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

    # py4j round-trip counter: wrap the client's send_command
    import py4j.clientserver as cs

    counter = {"n": 0}
    orig = cs.ClientServerConnection.send_command

    def counting_send(self, command):
        counter["n"] += 1
        return orig(self, command)

    cs.ClientServerConnection.send_command = counting_send

    sc = spark.sparkContext
    dag = sc._jsc.sc().dagScheduler()

    out = {}
    for name, q in QUERIES.items():
        if not q.bench:
            continue
        if names and name not in names:
            continue
        sc.setJobDescription(name)
        j0 = dag.nextJobId()
        c0 = counter["n"]
        t0 = time.perf_counter()
        df = q.fn(spark, SF_DIR)
        t1 = time.perf_counter()
        _force(df)
        t2 = time.perf_counter()
        j1 = dag.nextJobId()
        out[name] = {
            "fn": round(t1 - t0, 3),
            "exec": round(t2 - t1, 3),
            "total": round(t2 - t0, 3),
            "jobs": j1 - j0,
            "py4j": counter["n"] - c0,
        }
    sc.setJobDescription(None)

    with open("/tmp/profile_bench.json", "w") as f:
        json.dump(out, f, indent=1)
    tot_fn = sum(v["fn"] for v in out.values())
    tot_ex = sum(v["exec"] for v in out.values())
    tot_j = sum(v["jobs"] for v in out.values())
    tot_p = sum(v["py4j"] for v in out.values())
    print(
        f"n={len(out)} fn={tot_fn:.1f}s exec={tot_ex:.1f}s "
        f"jobs={tot_j} py4j={tot_p}"
    )


if __name__ == "__main__":
    main()
