#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/r10/.

Usage: python scripts/capture_plans.py <suffix> <query> [<query> ...]
  suffix: "before" or "after" — file name tail.

Runs the bench session (get_spark) so plans match what bench.py
executes. Iterative operators (pagerank/hits/bfs) execute their rounds
eagerly inside the query function; their captured plan is the final
projection over the checkpointed rank relation — the honest shape of
the returned DataFrame.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from svoe_spark.all_queries import QUERIES
    from svoe_spark.session import get_spark

    spark = get_spark(
        "svoe_spark_plans",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..",
        "plans",
        os.environ.get("PLANS_ROUND", "r11"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
