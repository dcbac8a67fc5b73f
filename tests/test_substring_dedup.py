"""repeated_ngram_spans semantics on crafted corpora + kgram_hashes
consistency with the existing word-trigram shingles."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from svoe_spark.operators.dedup import repeated_ngram_spans


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_kgram3_equals_word_shingles(spark):
    from svoe_spark.functions.text import (
        kgram_hashes,
        token_hashes,
        word_shingles_from_hashes,
    )

    df = _docs(spark, ["a b c d e f g", "x y", "one two three"])
    out = df.select(
        F.col("doc_id"),
        kgram_hashes(token_hashes("text"), 3).alias("k3"),
        word_shingles_from_hashes(token_hashes("text")).alias("sh"),
    ).collect()
    for r in out:
        assert list(r["k3"]) == list(r["sh"]), r["doc_id"]


def test_cross_doc_repeated_span_detected(spark):
    # docs 0 and 1 share the 6-token run "q w e r t y" embedded in
    # otherwise-unique text; k=3 grams inside it repeat across docs
    docs = _docs(
        spark,
        [
            "a0 b0 q w e r t y c0 d0",
            "a1 q w e r t y b1",
            "zz yy xx ww vv uu",
        ],
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"]): r
        for r in repeated_ngram_spans(docs, k=3, min_count=2).collect()
    }
    # doc 0: grams at token positions 2..5 ("q w e".."r t y") repeat;
    # merged span covers tokens 2..7
    assert (0, 2, 7) in spans
    assert (1, 1, 6) in spans
    assert spans[(0, 2, 7)]["span_tokens"] == 6
    assert spans[(0, 2, 7)]["n_gram_hits"] == 4
    # doc 2 shares nothing
    assert not any(d == 2 for d, _, _ in spans)


def test_within_doc_repetition_counts(spark):
    # the same 3-gram twice within ONE doc also reaches min_count=2
    docs = _docs(spark, ["p q r zz1 zz2 zz3 p q r"])
    spans = repeated_ngram_spans(docs, k=3, min_count=2).collect()
    got = {(r["span_start"], r["span_end"]) for r in spans}
    assert got == {(0, 2), (6, 8)}


def test_disjoint_spans_not_merged(spark):
    # two repeated regions separated by a gap > k stay separate spans
    docs = _docs(
        spark,
        [
            "q w e g0 g1 g2 g3 g4 m n o",
            "q w e h0 h1 h2 h3 h4 m n o",
        ],
    )
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_ngram_spans(docs, k=3, min_count=2).collect()
    )
    assert spans == [(0, 0, 2), (0, 8, 10), (1, 0, 2), (1, 8, 10)]


def test_short_docs_emit_nothing(spark):
    docs = _docs(spark, ["a b", "a b", ""])
    assert repeated_ngram_spans(docs, k=3, min_count=2).count() == 0


def test_min_count_threshold(spark):
    docs = _docs(spark, ["s t u v", "s t u v", "s t u v"])
    # every gram occurs 3x; min_count=4 filters all
    assert repeated_ngram_spans(docs, k=3, min_count=4).count() == 0
    out = repeated_ngram_spans(docs, k=3, min_count=3).collect()
    assert {(r["doc_id"], r["span_start"], r["span_end"]) for r in out} == {
        (0, 0, 3),
        (1, 0, 3),
        (2, 0, 3),
    }


def test_remove_repeated_spans_cuts_shared_region(spark):
    from svoe_spark.operators.dedup import remove_repeated_spans

    docs = _docs(
        spark,
        [
            "a0 b0 q w e r t y c0 d0",
            "a1 q w e r t y b1",
            "zz yy xx ww vv uu",
        ],
    )
    out = {r["doc_id"]: r for r in remove_repeated_spans(docs, k=3).collect()}
    assert out[0]["clean_text"] == "a0 b0 c0 d0"
    assert out[0]["n_tokens"] == 10 and out[0]["n_tokens_removed"] == 6
    assert out[1]["clean_text"] == "a1 b1"
    # untouched doc passes through whole
    assert out[2]["clean_text"] == "zz yy xx ww vv uu"
    assert out[2]["n_tokens_removed"] == 0


def test_remove_repeated_spans_full_removal_empty_string(spark):
    from svoe_spark.operators.dedup import remove_repeated_spans

    docs = _docs(spark, ["s t u", "s t u"])
    out = remove_repeated_spans(docs, k=3).collect()
    assert all(r["clean_text"] == "" and r["n_tokens_removed"] == 3 for r in out)


def test_contamination_spans_marks_benchmark_overlap(spark):
    from svoe_spark.operators.dedup import contamination_spans

    bench = _docs(spark, ["secret eval question one two"])
    corpus = spark.createDataFrame(
        [
            # doc 10 embeds a 5-token benchmark run at positions 2..6
            (10, "c0 c1 secret eval question one two c2"),
            # doc 11 shares only 2 benchmark tokens (no full 3-gram)
            (11, "secret eval x y z"),
        ],
        "doc_id long, text string",
    )
    spans = contamination_spans(corpus, bench, k=3).collect()
    got = {(r["doc_id"], r["span_start"], r["span_end"]) for r in spans}
    assert got == {(10, 2, 6)}
