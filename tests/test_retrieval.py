"""BM25 retrieval: scoring semantics on a hand-checked fixture, df-cap
behaviour, log-idf variant, and plan shape (broadcast query side)."""

import math

import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_topk,
    inverted_index,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
            (4, "apple durian"),
        ],
        "doc_id long, text string",
    )


def _queries(spark, *texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "query_id long, query_text string"
    )


def _py_bm25(tf, df, dlen, n, total, k1=BM25_K1, b=BM25_B, log_idf=False):
    idf = (n - df + 0.5) / (df + 0.5)
    if log_idf:
        idf = math.log(idf + 1.0)
    den = tf + k1 * ((1.0 - b) + b * dlen * n / total)
    return idf * ((tf * (k1 + 1.0)) / den)


def test_inverted_index_postings(spark):
    rows = {
        (r["term"], r["doc_id"]): (r["tf"], r["dlen"], r["df"])
        for r in inverted_index(_corpus(spark)).collect()
    }
    assert rows[("apple", 1)] == (2, 3, 2)
    assert rows[("apple", 4)] == (1, 2, 2)
    assert rows[("cherry", 3)] == (3, 4, 2)
    assert ("banana", 3) not in rows


def test_inverted_index_df_cap_drops_stop_terms(spark):
    docs = spark.createDataFrame(
        [(i, "the filler" if i else "the rare") for i in range(5)],
        "doc_id long, text string",
    )
    terms = {
        r["term"] for r in inverted_index(docs, max_df=4).collect()
    }
    assert "the" not in terms  # df=5 > cap
    assert {"filler", "rare"} <= terms  # df 4 and 1 survive


def test_bm25_matches_python_reference(spark):
    out = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in bm25_topk(_corpus(spark), _queries(spark, "apple cherry")).collect()
    }
    n, total = 4, 3 + 2 + 4 + 2
    expect = {
        1: _py_bm25(2, 2, 3, n, total),  # apple only
        2: _py_bm25(1, 2, 2, n, total),  # cherry only
        3: _py_bm25(3, 2, 4, n, total),
        4: _py_bm25(1, 2, 2, n, total),
    }
    assert set(out) == set(expect)
    for d, s in expect.items():
        assert out[d][0] == pytest.approx(s, abs=0, rel=0), d
    # docs 2 and 4 tie exactly (same tf/df/dlen) — rank breaks by id
    assert out[2][1] < out[4][1]


def test_bm25_multi_term_sums_and_k_limits(spark):
    out = bm25_topk(
        _corpus(spark), _queries(spark, "apple banana cherry durian"), k=2
    ).collect()
    assert len(out) == 2
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]


def test_bm25_log_idf_variant_orders_like_rational(spark):
    docs = _corpus(spark)
    q = _queries(spark, "apple cherry")
    rat = [r["doc_id"] for r in bm25_topk(docs, q).orderBy("rank").collect()]
    log = [
        r["doc_id"]
        for r in bm25_topk(docs, q, log_idf=True).orderBy("rank").collect()
    ]
    assert rat == log


def test_bm25_query_side_joins_broadcast(spark, sf_mid):
    import contextlib
    import io

    from svoe_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_mid)
    df = bm25_topk(docs, _queries(spark, "spark join stream"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_rrf_fuse_semantics(spark):
    from svoe_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, doc_id long, rank long",
    )
    dense = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)],
        "query_id long, doc_id long, rank long",
    )
    out = {r["doc_id"]: r for r in rrf_fuse([lex, dense], k=10).collect()}
    # doc 11 is in both lists: 1/62 + 1/61; doc 10 lexical-only: 1/61
    assert out[11]["rrf_score"] == 1.0 / 62 + 1.0 / 61
    assert out[10]["rrf_score"] == 1.0 / 61
    assert out[13]["rrf_score"] == 1.0 / 62
    # consensus doc outranks either single-list doc
    assert out[11]["rank"] == 1
    # ties (10 vs none) broken by ascending doc_id
    ranks = sorted((r["rank"], d) for d, r in out.items())
    assert [d for _, d in ranks] == [11, 10, 13, 12]


def test_rrf_fuse_respects_k_and_c(spark):
    from svoe_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(0, i, i) for i in range(1, 8)], "query_id long, doc_id long, rank long"
    )
    out = rrf_fuse([lex], k=3, c=0).collect()
    assert len(out) == 3
    assert out[0]["rrf_score"] == 1.0  # 1/(0+1)
