#!/usr/bin/env python
"""Scale smoke: key operators at 20M rows with deliberate key skew.

Generates synthetic ticks with spark.range (no driver-side data, no
test fixtures touched): 3 instruments where one carries 90% of volume —
the hot-key shape that breaks naive per-key plans. Times:

  * as-of join, default plan (per-key sort: the hot key serializes)
  * as-of join, time-bucketed plan (parallelism = keys x buckets)
  * OHLCV tumbling agg, trailing-window volatility, exact dedup

Prints one JSON line; summarized in docs/ARCHITECTURE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from svoe_spark.operators.asof import asof_join  # noqa: E402
from svoe_spark.operators.windows import ohlcv, sliding_stddev  # noqa: E402
from svoe_spark.session import get_spark  # noqa: E402

N_LEFT = 20_000_000
N_RIGHT = 2_000_000


def gen_ticks(spark, n, start=1_700_000_000.0, span=86_400.0):
    # 90% of rows land on the hot instrument
    sym = (
        F.when(F.col("id") % 10 < 9, F.lit("HOT"))
        .when(F.col("id") % 10 == 9, F.lit("COLD-A"))
        .otherwise(F.lit("COLD-B"))
    )
    return spark.range(n).select(
        (F.lit(start) + (F.col("id") / n) * span).cast("timestamp").alias("ts"),
        sym.alias("symbol"),
        (100.0 + F.sin(F.col("id") / 1000.0) * 5.0).alias("price"),
    )


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main():
    spark = get_spark("scale_smoke")
    spark.sparkContext.setLogLevel("ERROR")
    force = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731

    left = gen_ticks(spark, N_LEFT)
    right = gen_ticks(spark, N_RIGHT).withColumnRenamed("price", "ref_price")

    results = {"rows_left": N_LEFT, "rows_right": N_RIGHT}
    results["asof_default_sec"] = timed(
        lambda: force(
            asof_join(left, right, on="ts", by="symbol", right_cols=["ref_price"])
        )
    )
    results["asof_bucketed_sec"] = timed(
        lambda: force(
            asof_join(
                left, right, on="ts", by="symbol", right_cols=["ref_price"],
                time_bucket="10m",
            )
        )
    )
    results["ohlcv_1m_sec"] = timed(
        lambda: force(
            ohlcv(left.withColumn("amount", F.lit(1.0)), on="ts", by="symbol")
        )
    )
    results["sliding_stddev_frame_2M_sec"] = timed(
        lambda: force(
            sliding_stddev(
                gen_ticks(spark, 2_000_000), on="ts", value="price",
                by="symbol", window="1m", method="frame",
            )
        )
    )
    results["sliding_stddev_prefix_20M_sec"] = timed(
        lambda: force(
            sliding_stddev(
                left, on="ts", value="price",
                by="symbol", window="1m", method="prefix",
            )
        )
    )

    # order book, 2M updates, one hot instrument carrying 90%: the
    # sequential plan serializes on the hot key; the bucketed plan's
    # parallelism is keys x buckets
    from svoe_spark.operators.orderbook import (  # noqa: E402
        reconstruct_book,
        reconstruct_book_bucketed,
    )

    n_book = 2_000_000
    base = gen_ticks(spark, n_book)
    upd = base.select(
        "symbol",
        "ts",
        F.when(F.col("price") < 95.2, F.lit("SNAPSHOT"))
        .when(F.col("price") < 99.0, F.lit("SET"))
        .when(F.col("price") < 103.0, F.lit("ADD"))
        .otherwise(F.lit("SUB"))
        .alias("update_type"),
        F.array(
            F.struct(
                F.when(F.col("price") < 100.0, F.lit("bid")).otherwise(F.lit("ask")).alias("side"),
                F.round("price", 1).alias("price"),
                (F.pmod(F.round(F.col("price") * 10, 0), F.lit(7.0)) + 1).alias("size"),
            )
        ).alias("orders"),
    )
    results["orderbook_rows"] = n_book
    results["orderbook_sequential_sec"] = timed(
        lambda: force(reconstruct_book(upd, depth=10, emit_every="1m"))
    )
    results["orderbook_bucketed_sec"] = timed(
        lambda: force(
            reconstruct_book_bucketed(upd, depth=10, emit_every="1m", bucket="10m")
        )
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
