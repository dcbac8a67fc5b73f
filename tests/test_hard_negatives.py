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


def test_hard_negatives_lsh_subset_of_exact_and_label_safe(spark, sf_mid):
    emb = load_table(spark, "embeddings", sf_mid)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    out = hard_negatives_lsh(emb, dim=64, k=1).collect()
    # every anchor with a cross-label bucket-mate appears exactly once
    anchors = [r["anchor_id"] for r in out]
    assert len(anchors) == len(set(anchors)) and len(anchors) > 0
    for r in out:
        assert labels[r["anchor_id"]] != labels[r["neg_id"]]


def test_hard_negatives_plan_broadcasts_anchors(spark, sf_mid):
    emb = load_table(spark, "embeddings", sf_mid)
    df = hard_negatives(emb, emb.where(F.col("vec_id") < 10), k=1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
