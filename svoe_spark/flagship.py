"""The flagship end-to-end pipeline: the reference's minimum slice
(SURVEY §7.2) — per-instrument features + lookahead label, point-in-time
joined into a FeatureLabelSet (reference builder.py:302-330, README
quick-start) — driven through the Featurizer config API."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from svoe_spark.plans.featurizer import Featurizer


def flagship_config(sf_dir: str) -> dict:
    return {
        "data_source": {
            "kind": "table",
            "table": "events",
            "sf_dir": sf_dir,
            "select": ["ts", "event_type", "value"],
        },
        "keys": ["event_type"],
        "features": [
            {"name": "mid", "feature_definition": "mid_price",
             "params": {"price_col": "value"}},
            {"name": "vol", "feature_definition": "volatility_stddev",
             "deps": ["mid"], "params": {"window": "1h"}},
            {"name": "mom", "feature_definition": "diff",
             "deps": ["mid"], "params": {"value_col": "mid_price", "window": "1h"}},
        ],
        "label_feature": "mid",
        "label_lookahead": "1h",
    }


def feature_label_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label rows = every event of its instrument stream; features =
    mid price, trailing volatility, momentum; label = mid 1h ahead."""
    return Featurizer(spark).run(flagship_config(sf_dir))
