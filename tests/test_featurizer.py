"""End-to-end minimum slice (SURVEY §7.2): sine source -> mid price +
volatility -> 5s-lookahead label -> point-in-time join. Checks the
reference's own invariant (test_featurizer.py:10-30): on a uniform 1s
grid, the label equals the mid price exactly `lookahead` seconds later.
"""

import math

import pytest
from pyspark.sql import functions as F

from svoe_spark.plans.featurizer import Featurizer

CONFIG = {
    "data_source": {
        "kind": "sine",
        "start_ts": 1_700_000_000.0,
        "end_ts": 1_700_000_600.0,
        "step": 1.0,
        "amplitude": 2000.0,
        "mean": 10000.0,
        "freq": 5.0,
        "keys": {"symbol": "SYN-USD"},
    },
    "keys": ["symbol"],
    "features": [
        {"name": "mid", "feature_definition": "mid_price",
         "params": {"price_col": "mid_price"}},
        {"name": "vol", "feature_definition": "volatility_stddev",
         "deps": ["mid"], "params": {"window": "30s"}},
        {"name": "mom", "feature_definition": "diff",
         "deps": ["mid"], "params": {"value_col": "mid_price", "window": "30s"}},
    ],
    "label_feature": "mid",
    "label_lookahead": "5s",
}


@pytest.fixture(scope="module")
def fls(spark):
    return Featurizer(spark).run(CONFIG).collect()


def test_schema_and_rowcount(fls):
    cols = set(fls[0].asDict().keys())
    assert {"symbol", "ts", "label_mid-mid_price", "mid-mid_price",
            "vol-volatility", "mom-diff"} <= cols
    # 600 samples, tail truncated by the 5s lookahead
    assert len(fls) == 595


def test_label_is_future_value(fls):
    """label(t) == mid_price(t+5) == amplitude*sin(2π·f·(t+5))+mean."""
    start = 1_700_000_000.0
    for r in fls:
        t = r["ts"].timestamp() - start
        expected = 2000.0 * math.sin(2 * math.pi * 5.0 * (t + 5.0)) + 10000.0
        assert r["label_mid-mid_price"] == pytest.approx(expected, abs=1e-6)
        assert r["mid-mid_price"] == pytest.approx(
            2000.0 * math.sin(2 * math.pi * 5.0 * t) + 10000.0, abs=1e-6
        )


def test_volatility_positive_after_warmup(fls):
    by_ts = sorted(fls, key=lambda r: r["ts"])
    assert by_ts[0]["vol-volatility"] is None  # single point -> no stddev
    assert all(r["vol-volatility"] > 0 for r in by_ts[2:])


def test_yaml_roundtrip(spark):
    import yaml

    out = Featurizer(spark).run(yaml.safe_dump(CONFIG))
    assert out.count() == 595


def test_materialized_decimation(spark):
    out = Featurizer(spark).get_materialized_data(CONFIG, pick_every_nth_row=10)
    assert out.count() == 60  # ceil(595/10)


def test_features_to_store_roundtrip(spark, tmp_path):
    """Stored-feature short-circuit (reference builder.py:83-150): the
    second run reads the materialization; results identical."""
    from svoe_spark.sources.catalog import FeatureStore

    cfg = dict(CONFIG)
    cfg["features_to_store"] = ["vol"]
    store = FeatureStore(spark, str(tmp_path / "store"))

    a = Featurizer(spark, store=store).run(cfg)
    a_rows = sorted((r["ts"], r["vol-volatility"]) for r in a.collect())
    materialized = list((tmp_path / "store").iterdir())
    assert len(materialized) == 1 and materialized[0].name.startswith("vol-")

    b = Featurizer(spark, store=store).run(cfg)
    b_rows = sorted((r["ts"], r["vol-volatility"]) for r in b.collect())
    assert a_rows == b_rows
