"""sliding_stddev method='prefix' (O(n) prefix moments + as-of) must
agree with the exact range-frame form."""

import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.windows import sliding_stddev
from svoe_spark.queries import ticks


def test_prefix_equals_frame(spark, sf_small):
    t = ticks(spark, sf_small).select("event_type", "ts", "value")
    frame = sliding_stddev(
        t, on="ts", value="value", by="event_type", window="1h", method="frame"
    )
    prefix = sliding_stddev(
        t, on="ts", value="value", by="event_type", window="1h", method="prefix"
    )
    f = {(r["event_type"], r["ts"]): r["volatility"] for r in frame.collect()}
    p = {(r["event_type"], r["ts"]): r["volatility"] for r in prefix.collect()}
    assert set(f) == set(p) and len(f) == 1000
    for k, fv in f.items():
        pv = p[k]
        if fv is None:
            assert pv is None, k
        else:
            assert pv == pytest.approx(fv, rel=1e-8, abs=1e-10), k
