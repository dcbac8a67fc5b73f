"""The flagship end-to-end pipeline: the reference's minimum slice
(SURVEY §7.2) — per-instrument features + lookahead label, point-in-time
joined into a FeatureLabelSet (reference builder.py:302-330,
README quick-start)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from svoe_spark.operators.asof import asof_join_multi, lookahead_shift
from svoe_spark.queries import ticks, tvi_1h, volatility_1h


def feature_label_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label rows = purchase events; features = trailing volatility per
    instrument and TVI per user, as-of joined; label = price 1h ahead."""
    t = ticks(spark, sf_dir)
    vol = volatility_1h(spark, sf_dir).select(
        "ts", "event_type", "volatility"
    )
    tvi = tvi_1h(spark, sf_dir).select("ts", "event_type", "tvi")
    labels = lookahead_shift(
        t.select("event_id", "ts", "event_type", "value"),
        "1h",
        on="ts",
        by="event_type",
        value_cols=["value"],
        prefix="label_",
    )
    return asof_join_multi(
        labels,
        {"volatility-": vol, "tvi-": tvi},
        on="ts",
        by="event_type",
        right_cols={"volatility-": ["volatility"], "tvi-": ["tvi"]},
    )
