"""Hard-negative mining: known-answer correctness on crafted vectors,
label-exclusion invariant, and the broadcast plan shape."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.similarity import hard_negatives, hard_negatives_lsh
from svoe_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def crafted(spark):
    # anchor 0 (label A) at e1; vec 1 (label A) AT e1 — same label, must
    # be skipped; vec 2 (label B) near e1 — the true hard negative;
    # vec 3 (label B) orthogonal — easy negative
    rows = [
        (0, "A", [1.0, 0.0, 0.0, 0.0]),
        (1, "A", [1.0, 0.0, 0.0, 0.0]),
        (2, "B", [0.9, 0.1, 0.0, 0.0]),
        (3, "B", [0.0, 0.0, 1.0, 0.0]),
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, label string, embedding array<double>"
    )


def test_hard_negatives_picks_most_similar_other_label(crafted):
    got = hard_negatives(
        crafted, crafted.where(F.col("vec_id") == 0), k=2
    ).collect()
    assert [r["neg_id"] for r in got] == [2, 3]
    assert got[0]["cosine"] > got[1]["cosine"]


def test_hard_negatives_never_returns_same_label(spark, sf_mid):
    emb = load_table(spark, "embeddings", sf_mid)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    out = hard_negatives(emb, emb.where(F.col("vec_id") < 10), k=3).collect()
    assert len(out) > 0
    for r in out:
        assert labels[r["anchor_id"]] != labels[r["neg_id"]]


def test_hard_negatives_lsh_matches_exact_when_truth_shares_bucket(spark, sf_mid):
    from svoe_spark.operators.similarity import lsh_bucket

    emb = load_table(spark, "embeddings", sf_mid)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    buckets = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id", lsh_bucket("embedding", 64).alias("b")
        ).collect()
    }
    out = {r["anchor_id"]: r for r in hard_negatives_lsh(emb, dim=64, k=1).collect()}
    anchors = list(out)
    assert len(anchors) > 0
    for r in out.values():
        assert labels[r["anchor_id"]] != labels[r["neg_id"]]
    # the REAL check: for anchors whose exact (unblocked) hard negative
    # happens to share their bucket, the LSH pick must equal the exact
    # pick (same cosine expression, same tie-break)
    probe = emb.where(F.col("vec_id") < 40)
    exact = {
        r["anchor_id"]: r
        for r in hard_negatives(emb, probe, k=1).collect()
    }
    compared = 0
    for aid, er in exact.items():
        if buckets[er["neg_id"]] == buckets[aid]:
            compared += 1
            assert out[aid]["neg_id"] == er["neg_id"], aid
            assert out[aid]["cosine"] == er["cosine"], aid
    assert compared >= 3  # the fixture provides in-bucket truths


def test_hard_negatives_plan_broadcasts_anchors(spark, sf_mid):
    emb = load_table(spark, "embeddings", sf_mid)
    df = hard_negatives(emb, emb.where(F.col("vec_id") < 10), k=1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
