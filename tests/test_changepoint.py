"""CUSUM changepoint scores (operators/changepoint.py): the window
identity must reproduce Page's recursion exactly (differential vs a
pure-Python mirror), detect a planted level shift, and respect the
slack allowance."""

import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.changepoint import cusum_scores


def _python_cusum(values, baseline, slack):
    cp = cn = 0
    out = []
    for v in values:
        cp = max(0, cp + (v - baseline - slack))
        cn = max(0, cn - (v - baseline + slack))
        out.append((cp, cn))
    return out


def _series(spark, values, key="k"):
    rows = [(key, i, int(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "key string, t long, v long")


@pytest.mark.heavy  # r10 trim: slowest quick-tier case (17 s call)
def test_cusum_matches_python_recursion(spark):
    values = [5, 5, 6, 4, 5, 9, 11, 10, 12, 5, 5, 1, 0, 2, 5, 5]
    df5 = _series(spark, values).withColumn("base", F.lit(5))
    got = {
        r["t"]: (r["c_pos"], r["c_neg"])
        for r in cusum_scores(
            df5, "v", on="t", by=["key"], baseline_col="base", slack=1
        ).collect()
    }
    want = dict(enumerate(_python_cusum(values, 5, 1)))
    assert got == want


def test_cusum_detects_planted_shift_and_resets(spark):
    # flat at 10, shift to 14 for 6 steps, back to 10
    values = [10] * 8 + [14] * 6 + [10] * 8
    df = _series(spark, values).withColumn("base", F.lit(10))
    rows = sorted(
        (r["t"], r["c_pos"])
        for r in cusum_scores(
            df, "v", on="t", by=["key"], baseline_col="base", slack=1
        ).collect()
    )
    scores = [s for _, s in rows]
    # accumulates (14-10-1)=3 per shifted step...
    assert max(scores) == 18
    # ...and decays by slack after the shift ends (10-10-1 = -1/step)
    assert scores[-1] == 18 - 8
    # pre-shift is exactly zero (slack absorbs no-drift noise)
    assert all(s == 0 for s in scores[:8])


def test_cusum_slack_column_and_multi_key_isolation(spark):
    rows = [("a", i, 10 + (3 if i >= 5 else 0)) for i in range(10)]
    rows += [("b", i, 10) for i in range(10)]
    df = spark.createDataFrame(rows, "key string, t long, v long")
    df = df.withColumn("base", F.lit(10)).withColumn("k", F.lit(1))
    out = cusum_scores(
        df, "v", on="t", by=["key"], baseline_col="base", slack="k"
    )
    a = {r["t"]: r["c_pos"] for r in out.where("key = 'a'").collect()}
    b = {r["t"]: r["c_pos"] for r in out.where("key = 'b'").collect()}
    assert a[9] == 2 * 5  # (13-10-1) per step for 5 steps
    assert all(v == 0 for v in b.values())  # no bleed between keys


def test_cusum_global_series_and_tiebreak(spark):
    # two rows share t=1; tiebreak orders them deterministically
    rows = [(0, 0, 12), (1, 0, 20), (1, 1, 4), (2, 0, 12)]
    df = spark.createDataFrame(rows, "t long, tb long, v long").withColumn(
        "base", F.lit(10)
    )
    out = {
        (r["t"], r["tb"]): r["c_pos"]
        for r in cusum_scores(
            df, "v", on="t", baseline_col="base", slack=0, tiebreak="tb"
        ).collect()
    }
    # order: (0,0)+2 -> (1,0)+10=12 -> (1,1)-6=6 -> (2,0)+2=8
    assert out == {(0, 0): 2, (1, 0): 12, (1, 1): 6, (2, 0): 8}


def test_cusum_rejects_invalid_slack(spark):
    import pytest

    df = _series(spark, [1, 2, 3])
    for bad in (2.5, -1, True):
        with pytest.raises(ValueError, match="slack"):
            cusum_scores(df, "v", on="t", by=["key"], slack=bad)
