"""Incremental near-dup index: parquet round trip, append-equals-
rebuild, probe vs full-corpus recompute, survivor semantics, signature
mode, and the plan property that the corpus side is never shuffled."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.dedup import MinHashParams, minhash_dedup_pairs
from svoe_spark.operators.dedup_index import (
    append_index,
    dedup_against_index,
    index_tables,
    probe_index,
    read_index,
    write_index,
)
from svoe_spark.sources.tables import load_table

_MH = MinHashParams()


@pytest.fixture(scope="module")
def docs(spark, sf_mid):
    return load_table(spark, "documents", sf_mid).persist()


@pytest.fixture(scope="module")
def split(docs):
    old = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)
    return old, new


def _pairs(df):
    return {(r["id_new"], r["id_old"]) for r in df.collect()}


def test_probe_matches_full_corpus_recompute(docs, split):
    """Probing new-vs-index must find exactly the full-corpus verified
    pairs that straddle the split (plus identical jaccard values)."""
    old, new = split
    bands, sets = index_tables(old, params=_MH)
    got = probe_index(new, bands, sets, params=_MH, threshold=0.5)
    full = minhash_dedup_pairs(docs, params=_MH, threshold=0.5)
    want = set()
    for r in full.collect():
        a, b = r["id_a"], r["id_b"]
        if a % 5 == 0 and b % 5 != 0:
            want.add((a, b))
        elif b % 5 == 0 and a % 5 != 0:
            want.add((b, a))
    full._svoe_persisted.unpersist()
    assert _pairs(got) == want and len(want) > 0


def test_write_read_probe_round_trip(spark, split, tmp_path):
    old, new = split
    path = str(tmp_path / "idx")
    write_index(old, path, params=_MH)
    bands, sets = read_index(spark, path)
    got = probe_index(new, bands, sets, params=_MH, threshold=0.5)
    mem_bands, mem_sets = index_tables(old, params=_MH)
    want = probe_index(new, mem_bands, mem_sets, params=_MH, threshold=0.5)
    assert _pairs(got) == _pairs(want)
    # layout: bands partitioned by band -> probe scans prune partitions
    import os

    assert any(d.startswith("band=") for d in os.listdir(f"{path}/bands"))


def test_append_equals_rebuild(spark, split, tmp_path):
    old, new = split
    half1 = old.where(F.col("doc_id") % 2 == 0)
    half2 = old.where(F.col("doc_id") % 2 != 0)
    inc = str(tmp_path / "inc")
    write_index(half1, inc, params=_MH)
    append_index(half2, inc, params=_MH)
    full = str(tmp_path / "full")
    write_index(old, full, params=_MH)
    for sub in ("bands", "sets"):
        a = spark.read.parquet(f"{inc}/{sub}")
        b = spark.read.parquet(f"{full}/{sub}")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_survivors_have_no_index_match_and_no_batch_dups(split):
    old, new = split
    bands, sets = index_tables(old, params=_MH)
    kept = dedup_against_index(new, bands, sets, params=_MH, threshold=0.5)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    kept._svoe_persisted.unpersist()
    # nothing kept matches the index
    dup_new = {
        r["id_new"]
        for r in probe_index(new, bands, sets, params=_MH, threshold=0.5).collect()
    }
    assert kept_ids.isdisjoint(dup_new)
    # nothing kept is a higher-id verified duplicate of another survivor
    pairs = minhash_dedup_pairs(
        new.where(F.col("doc_id").isin(list(kept_ids))), params=_MH, threshold=0.5
    )
    dup_b = {r["id_b"] for r in pairs.collect()}
    pairs._svoe_persisted.unpersist()
    assert kept_ids.isdisjoint(dup_b)
    # and every new doc is either kept or explained by one of the rules
    assert len(kept_ids) > 0


def test_signature_mode_needs_no_sets_and_bounds_fraction(split):
    old, new = split
    bands, _ = index_tables(old, params=_MH)
    est = probe_index(
        new, bands, None, params=_MH, threshold=1.0 / _MH.bands,
        verify="signature",
    )
    rows = est.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 < r["jaccard"] <= 1.0
        # quantized to multiples of 1/bands
        steps = r["jaccard"] * _MH.bands
        assert abs(steps - round(steps)) < 1e-9
    with pytest.raises(ValueError):
        probe_index(new, bands, None, params=_MH, verify="sets")
    with pytest.raises(ValueError):
        probe_index(new, bands, None, params=_MH, verify="maybe")


def test_probe_plan_broadcasts_batch_not_index(split):
    old, new = split
    bands, sets = index_tables(old, params=_MH)
    df = probe_index(new, bands, sets, params=_MH, threshold=0.5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p, p
    assert "BroadcastExchange" in p, p
