"""KMV set-operation estimates: identical sets give jaccard 1 and the
union estimate, disjoint sets give jaccard 0, and the estimator is
the documented function of the merged sketch (Python mirror)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.sketches import (
    HASH_SPACE,
    kmv_build,
    kmv_set_ops,
)

K = 32


def _h(v) -> int:
    hx = hashlib.md5(str(v).encode()).hexdigest()
    return int(hx[:15], 16)


def _mirror(a_vals, b_vals, k=K):
    """Driver-side mirror of the theta-sketch estimator."""
    sa = sorted({_h(v) for v in a_vals})[:k]
    sb = sorted({_h(v) for v in b_vals})[:k]
    m = sorted(set(sa) | set(sb))[:k]
    n, hk = len(m), max(m)
    nboth = sum(1 for h in m if h in set(sa) and h in set(sb))
    est_u = float(n) if n < k else float((k - 1) * HASH_SPACE) / float(hk)
    jac = float(nboth) / float(n)
    return est_u, jac, jac * est_u


def _sketch(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    return kmv_build(df, "x", k=K)


def test_identical_sets(spark):
    vals = list(range(1000))
    sk = _sketch(spark, vals)
    out = kmv_set_ops(sk, sk, k=K).first()
    assert out["jaccard"] == 1.0
    assert out["est_intersection"] == out["est_union"]


def test_disjoint_sets(spark):
    a = _sketch(spark, range(0, 500))
    b = _sketch(spark, range(10_000, 10_500))
    out = kmv_set_ops(a, b, k=K).first()
    assert out["jaccard"] == 0.0
    assert out["est_intersection"] == 0.0


def test_matches_python_mirror(spark):
    a_vals, b_vals = list(range(0, 800)), list(range(400, 1200))
    out = kmv_set_ops(_sketch(spark, a_vals), _sketch(spark, b_vals), k=K).first()
    eu, ja, ei = _mirror(a_vals, b_vals)
    assert out["est_union"] == eu
    assert out["jaccard"] == ja
    assert out["est_intersection"] == ei
    # and the estimates are in the right neighborhood of the truth
    assert 0.2 < out["jaccard"] < 0.6  # true jaccard = 400/1200 = 1/3
    assert 800 < out["est_union"] < 1700  # true union = 1200


def test_grouped(spark):
    rows = [("g1", v) for v in range(300)] + [("g2", v) for v in range(5000, 5300)]
    df = spark.createDataFrame(rows, "g string, x long")
    a = kmv_build(df, "x", k=K, group_cols=["g"])
    b = kmv_build(df.where(F.col("g") == "g1"), "x", k=K).crossJoin(
        df.select("g").distinct()
    ).select("g", "h")
    out = {r["g"]: r["jaccard"] for r in kmv_set_ops(a, b, k=K, group_cols=["g"]).collect()}
    assert out["g1"] == 1.0
    assert out["g2"] == 0.0
