"""Product-level Kappa: the flagship's ONLINE leg (feature stream ->
block sink -> combine_latest inference vector -> in-stream scoring)
must reproduce the BATCH FeatureLabelSet's feature columns and model
predictions at every event instant."""

import math

import pytest
from pyspark.sql import functions as F

from svoe_spark.consumers.trainer import score, train_regressor
from svoe_spark.flagship import flagship_streaming_scored
from svoe_spark.plans.featurizer import Featurizer

MID, VOL = "mid-mid_price", "vol-volatility"

CFG = {
    "data_source": {"kind": "table", "table": "events", "sf_dir": "unused",
                    "select": ["ts", "event_type", "value"]},
    "keys": ["event_type"],
    "features": [
        {"name": "mid", "feature_definition": "mid_price",
         "params": {"price_col": "value"}},
        {"name": "vol", "feature_definition": "volatility_stddev",
         "deps": ["mid"], "params": {"window": "1h"}},
    ],
    "label_feature": "mid",
    "label_lookahead": "1h",
}


@pytest.mark.heavy  # round-9 quick-tier trim: ptest.py/round-close still run it
def test_streaming_flagship_equals_batch(spark, sf_small, tmp_path):
    cfg = {**CFG, "data_source": {**CFG["data_source"], "sf_dir": sf_small}}
    fls = Featurizer(spark).run(cfg)
    model = train_regressor(fls, [MID, VOL], "label_mid-mid_price")

    batch = {
        (r["event_type"], r["ts"]): (r[MID], r[VOL], r["prediction"])
        for r in score(model, fls).collect()
    }
    stream = {
        (r["event_type"], r["ts"]): (r[MID], r[VOL], r["prediction"])
        for r in flagship_streaming_scored(
            spark, sf_small, str(tmp_path), model
        ).collect()
    }

    # batch label rows are the lookahead-truncated subset of all events;
    # the stream scores every event — compare on the batch's instants.
    # (scoring skips warmup rows with null/NaN vol on both sides.)
    missing = set(batch) - set(stream)
    assert not missing
    compared = 0
    for k, (bm, bv, bp) in batch.items():
        sm, sv, sp = stream[k]
        assert sm == bm, k
        assert sv == pytest.approx(bv, rel=1e-9), k
        assert sp == pytest.approx(bp, rel=1e-6), k
        compared += 1
    assert compared > 500


@pytest.mark.heavy  # r10 trim: 9.6 s streaming e2e; round-close sweep runs it
def test_streaming_flagship_scores_all_events(spark, sf_small, tmp_path):
    cfg = {**CFG, "data_source": {**CFG["data_source"], "sf_dir": sf_small}}
    fls = Featurizer(spark).run(cfg)
    model = train_regressor(fls, [MID, VOL], "label_mid-mid_price")
    out = flagship_streaming_scored(spark, sf_small, str(tmp_path), model)
    # every non-warmup source event yields one scored vector row
    n = out.count()
    assert n > 900  # 1000 events at sf0.001 minus per-key warmup rows
    assert out.filter(F.col("prediction").isNull()).count() == 0
    # predictions are finite numbers
    bad = [
        r
        for r in out.select("prediction").collect()
        if r["prediction"] is None or math.isnan(r["prediction"])
    ]
    assert not bad
