#!/usr/bin/env python
"""End-to-end market-analytics pipeline over the tick stream:

    ticks -> hourly integer-cents OHLC bars -> candlestick pattern
    flags -> gap-filled (locf + linear) hourly price grid -> trailing
    price/size rolling correlation -> per-instrument max drawdown +
    median/MAD outliers -> pairwise instrument correlation panel ->
    purged 5-fold CV labeling of the final feature rows

Every stage is one of the library's partition-parallel operators and
every floating value comes from a fixed expression tree over exact
integer moments, so re-running (or re-partitioning) the pipeline
yields byte-identical outputs. Prints one JSON line of per-stage
counts.

    python examples/quant_features_pipeline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from svoe_spark.functions.time import bucket_start  # noqa: E402
from svoe_spark.operators.curation import purged_time_folds  # noqa: E402
from svoe_spark.operators.profiling import robust_outliers  # noqa: E402
from svoe_spark.operators.quant import (  # noqa: E402
    candle_patterns,
    max_drawdown,
    pairwise_corr,
    rolling_corr,
)
from svoe_spark.operators.resample import resample_interpolate  # noqa: E402
from svoe_spark.queries import ticks  # noqa: E402
from svoe_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("quant_features_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, int] = {}

    t = ticks(spark, sf_dir)
    out["ticks"] = t.count()

    bars = t.groupBy(
        "event_type", bucket_start("ts", "1h").alias("window_start")
    ).agg(
        F.min_by("value_c", "event_id").alias("open_c"),
        F.max("value_c").alias("high_c"),
        F.min("value_c").alias("low_c"),
        F.max_by("value_c", "event_id").alias("close_c"),
    )
    flags = candle_patterns(bars)
    out["bars"] = bars.count()
    out["pattern_flagged_bars"] = flags.where(
        F.col("is_doji")
        | F.col("is_bullish_engulfing")
        | F.col("is_bearish_engulfing")
    ).count()

    # regular hourly price grid (locf + linear) from the deduped ticks
    series = t.groupBy("event_type", "ts").agg(F.max("value").alias("value"))
    grid = resample_interpolate(series, by="event_type", every="1h")
    out["grid_rows"] = grid.count()

    corr = rolling_corr(
        t, "value_c", "qty", by="event_type", order=["ts", "event_id"],
        window_rows=50, out="corr_50",
    )
    out["corr_rows_non_null"] = corr.where(F.col("corr_50").isNotNull()).count()

    dd = max_drawdown(t, "value_c", by="event_type", order=["ts", "event_id"])
    out["instruments"] = dd.count()

    from svoe_spark.operators.quant import atr, bollinger, rsi

    ohlc = t.groupBy(
        "event_type", bucket_start("ts", "1h").alias("window_start")
    ).agg(
        F.max("value_c").alias("high_c"),
        F.min("value_c").alias("low_c"),
        F.max_by("value_c", "event_id").alias("close_c"),
    )
    ta = bollinger(
        atr(ohlc, by="event_type", periods=14),
        "close_c", by="event_type", order="window_start", window_rows=19,
    )
    out["ta_bars_full_window"] = ta.where(F.col("bb_mid").isNotNull()).count()
    r = rsi(t, "value_c", by="event_type", order=["ts", "event_id"], periods=14)
    out["rsi_overbought_ticks"] = r.where(F.col("rsi") > 70).count()

    scored = robust_outliers(t, "value_c", ["event_type"])
    out["mad_outliers_gt3"] = scored.where(F.col("score") > 3).count()

    panel = pairwise_corr(
        t.groupBy(
            "event_type", bucket_start("ts", "1h").alias("bucket")
        ).agg(F.sum("value_c").alias("v")),
        "event_type", "bucket", "v",
    )
    out["corr_pairs"] = panel.count()

    folds = purged_time_folds(
        corr.select("event_type", "ts", "corr_50"), n_folds=5, embargo="12h"
    )
    out["fold_train_rows"] = folds.where(F.col("role") == "train").count()
    out["fold_test_rows"] = folds.where(F.col("role") == "test").count()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
