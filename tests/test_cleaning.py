"""Edge-case tests for the corpus-cleaning operators (operators/
cleaning.py) — the sf parity suite (test_oracle_parity) covers the
fixture-scale oracle equality; these pin the semantics on crafted
inputs."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from svoe_spark.operators.cleaning import (
    chunk_dedup,
    pii_redact,
    repetition_signals,
    source_mixture_weights,
)
from svoe_spark.operators.similarity import quantize_embeddings


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_pii_redact_all_categories(spark):
    df = _docs(
        spark,
        ["mail a.b@site.org ip 10.0.0.1 call 555-123-4567 acct 123456789 end"],
    )
    r = pii_redact(df).collect()[0]
    assert (r.n_email, r.n_ip, r.n_phone, r.n_id) == (1, 1, 1, 1)
    assert r.redacted == "mail <EMAIL> ip <IP> call <PHONE> acct <ID> end"


def test_pii_redact_no_double_count(spark):
    # digits inside a letter-prefixed email local part must not count
    # as a long ID (no word boundary after the letter), and the email's
    # domain dots must not count as an IP
    r = pii_redact(_docs(spark, ["x u123456789123@dom.com y"])).collect()[0]
    assert (r.n_email, r.n_id, r.n_ip) == (1, 0, 0)
    assert r.redacted == "x <EMAIL> y"


def test_pii_redact_digit_local_part_counts_once(spark):
    # a digit-only email local part is n_email only — progressive
    # counting runs the ID pattern on the already-redacted text, so
    # the address's digit run is attributed to exactly one category
    r = pii_redact(_docs(spark, ["m 123456789@dom.com t"])).collect()[0]
    assert (r.n_email, r.n_id) == (1, 0)
    assert r.redacted == "m <EMAIL> t"


def test_pii_redact_clean_text_unchanged(spark):
    r = pii_redact(_docs(spark, ["just plain words here"])).collect()[0]
    assert r.redacted == "just plain words here"
    assert (r.n_email, r.n_ip, r.n_phone, r.n_id) == (0, 0, 0, 0)


def test_repetition_signals_known_ratios(spark):
    # "a a a b": top word 3/4; 2-grams [a a, a a, a b] -> 1 dup of 3
    r = repetition_signals(_docs(spark, ["a a a b"])).collect()[0]
    assert r.n_tokens == 4
    assert r.top_word_ratio == pytest.approx(0.75)
    assert r.dup_2gram_ratio == pytest.approx(1 / 3)
    assert r.dup_3gram_ratio == pytest.approx(0.0)


def test_repetition_signals_single_token(spark):
    r = repetition_signals(_docs(spark, ["solo"])).collect()[0]
    assert r.n_tokens == 1
    assert r.top_word_ratio == pytest.approx(1.0)
    assert r.dup_2gram_ratio == 0.0 and r.dup_3gram_ratio == 0.0


def test_chunk_dedup_first_occurrence_wins(spark):
    # doc 0 and doc 1 share the chunk "a b"; doc 0 keeps it, doc 1 loses
    # it; doc 2 is entirely a duplicate of doc 0 -> reassembles to ''
    df = _docs(spark, ["a b", "a b c d", "a b"])
    out = {r.doc_id: r for r in chunk_dedup(df, width=2).collect()}
    assert out[0].text_dedup == "a b" and out[0].n_removed == 0
    assert out[1].text_dedup == "c d" and out[1].n_removed == 1
    assert out[2].text_dedup == "" and out[2].n_removed == 1
    assert out[2].n_chunks == 1


def test_chunk_dedup_partial_tail_chunk(spark):
    # 5 tokens, width 4 -> chunks of 4 and 1; both unique -> intact
    r = chunk_dedup(_docs(spark, ["v w x y z"]), width=4).collect()[0]
    assert r.text_dedup == "v w x y z"
    assert r.n_chunks == 2 and r.n_removed == 0


def test_source_mixture_weights_uniform_target(spark):
    df = spark.createDataFrame(
        [
            Row(source="a", text="one two three"),  # 3 tokens
            Row(source="b", text="one"),  # 1 token
        ]
    )
    out = {r.source: r for r in source_mixture_weights(df).collect()}
    assert out["a"].token_share == pytest.approx(0.75)
    # weight = (1/2) / share; under-represented domain gets weight > 1
    assert out["a"].mixture_weight == pytest.approx(0.5 / 0.75)
    assert out["b"].mixture_weight == pytest.approx(0.5 / 0.25)
    shares = sum(r.token_share for r in out.values())
    assert shares == pytest.approx(1.0)


def test_quantize_embeddings_zero_vector_and_extremes(spark):
    df = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[0.0, 0.0]),
            Row(vec_id=1, embedding=[1.0, -1.0]),
            Row(vec_id=2, embedding=[0.5, -0.25]),
        ]
    )
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert out[0].q_scale == 0.0 and out[0].q_csv == "0,0"
    # max|x| maps to +/-127 exactly
    assert out[1].q_csv == "127,-127" and out[1].q_sum == 0
    assert out[2].q_csv == "127,-63"  # floor(-63.5+0.5) = -63
    assert out[2].l2_norm == pytest.approx((0.5**2 + 0.25**2) ** 0.5)


def test_token_rarity_hand_computed(spark):
    from svoe_spark.operators.text_analysis import token_rarity

    # corpus: "a a b" + "c" -> N=4; counts a:2 b:1 c:1
    df = _docs(spark, ["a a b", "c"])
    out = {r.doc_id: r for r in token_rarity(df, rare_max=1).collect()}
    # doc0: invs = [4/2, 4/2, 4/1] -> mean = 8/3; rare (c<=1): only b
    assert out[0].n_tokens == 3
    assert out[0].mean_inv_prob == pytest.approx(8 / 3)
    assert out[0].n_rare_tokens == 1
    # doc1: inv = 4/1 -> mean 4; c is rare
    assert out[1].mean_inv_prob == pytest.approx(4.0)
    assert out[1].n_rare_tokens == 1


@pytest.mark.heavy  # round-9 quick-tier trim: ptest.py/round-close still run it
def test_text_ops_survive_unicode(spark):
    """The fixtures are ASCII, but operators must not crash (and must
    stay deterministic) on unicode input: multibyte tokens, emoji,
    combining marks, RTL text."""
    from svoe_spark.operators.cleaning import (
        chunk_dedup,
        corpus_filter,
        normalize_text,
    )
    from svoe_spark.operators.dedup import minhash_signature
    from svoe_spark.operators.text_analysis import token_rarity

    texts = [
        "héllo wörld héllo",
        "日本語 テキスト 処理 日本語",
        "مرحبا بالعالم",
        "emoji 🚀 mixed ascii",
        "á combining á",  # a + combining acute
    ]
    df = _docs(spark, texts)
    assert len(pii_redact(df).collect()) == len(texts)
    assert len(repetition_signals(df).collect()) == len(texts)
    assert len(chunk_dedup(df).collect()) == len(texts)
    assert len(corpus_filter(df).collect()) == len(texts)
    assert len(token_rarity(df).collect()) == len(texts)
    # docs with < 3 tokens have no trigram shingles -> no signature row
    n_shingled = sum(1 for t in texts if len(t.split()) >= 3)
    assert len(minhash_signature(df).collect()) == n_shingled
    norm = {r.doc_id: r.text_norm for r in normalize_text(df).collect()}
    # normalization strips non [a-z0-9 ] — unicode letters become spaces
    assert norm[3] == "emoji mixed ascii"
    # determinism: identical unicode tokens hash identically
    sig = minhash_signature(_docs(spark, ["日本語 日本語 日本語 日本語"] * 2)).collect()
    assert sig[0]["m0"] == sig[1]["m0"]


def test_bigram_surprise_known_counts(spark):
    from pyspark.sql import Row

    from svoe_spark.operators.text_analysis import bigram_surprise

    docs = spark.createDataFrame(
        [Row(doc_id=0, text="a b c"), Row(doc_id=1, text="a b a"),
         Row(doc_id=2, text="z"), Row(doc_id=3, text="")]
    )
    out = {r["doc_id"]: r for r in bigram_surprise(docs).collect()}
    # corpus bigrams: (a,b):2 (b,c):1 (b,a):1; head counts a:2 b:2
    # doc0: inv = [2/2, 2/1] -> mean 1.5 ; doc1: inv = [2/2, 2/1]
    assert set(out) == {0, 1}  # <2-token docs emit nothing
    for d in (0, 1):
        assert out[d]["n_bigrams"] == 2
        assert out[d]["mean_inv_cond_prob"] == 1.5


def test_chunk_freq_dedup_removes_every_copy(spark):
    from svoe_spark.operators.cleaning import chunk_freq_dedup

    # "a b" appears in docs 0, 1 and 2 -> ALL copies cut (unlike
    # chunk_dedup, which keeps doc 0's); "c d" is unique -> survives
    df = _docs(spark, ["a b", "a b c d", "a b"])
    out = {r.doc_id: r for r in chunk_freq_dedup(df, width=2).collect()}
    assert out[0].text_clean == "" and out[0].n_removed == 1
    assert out[1].text_clean == "c d" and out[1].n_removed == 1
    assert out[2].text_clean == "" and out[2].n_removed == 1


def test_chunk_freq_dedup_max_df_threshold(spark):
    from svoe_spark.operators.cleaning import chunk_freq_dedup

    # "a b" occurs twice: max_df=2 keeps both copies, max_df=1 cuts both
    df = _docs(spark, ["a b x y", "a b"])
    keep2 = {r.doc_id: r for r in chunk_freq_dedup(df, width=2, max_df=2).collect()}
    assert keep2[0].text_clean == "a b x y" and keep2[0].n_removed == 0
    assert keep2[1].text_clean == "a b"
    cut1 = {r.doc_id: r for r in chunk_freq_dedup(df, width=2, max_df=1).collect()}
    assert cut1[0].text_clean == "x y" and cut1[0].n_removed == 1
    assert cut1[1].text_clean == "" and cut1[1].n_removed == 1


def test_adaptive_threshold_filter_per_group(spark):
    from svoe_spark.operators.cleaning import adaptive_threshold_filter

    rows = [(i, "a", float(i)) for i in range(100)] + [
        (100 + i, "b", float(1000 + i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, score double")
    out = adaptive_threshold_filter(
        df, "score", ["src"], q=0.5, p=1.0, thr_out="thr"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r)
    # p=1.0: thresholds are the exact per-group medians; each group
    # keeps its own top half — a global cut would keep all of 'b' and
    # none of 'a'
    for src, kept in by_src.items():
        assert len(kept) == 51  # type-1 median of 100 = 50th value
        assert all(r["score"] >= r["thr"] for r in kept)
    assert min(r["score"] for r in by_src["a"]) == 49.0
    assert min(r["score"] for r in by_src["b"]) == 1049.0


@pytest.mark.heavy  # round-10 quick-tier trim (slowest cases -> sharded tier)
def test_adaptive_threshold_filter_deterministic_sample(spark):
    from svoe_spark.operators.cleaning import adaptive_threshold_filter

    rows = [(i, "a", float(i % 37)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, src string, score double")
    a = sorted(
        r["doc_id"]
        for r in adaptive_threshold_filter(df, "score", ["src"], p=0.3).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in adaptive_threshold_filter(
            df.repartition(11), "score", ["src"], p=0.3
        ).collect()
    )
    assert a == b and len(a) > 0


@pytest.mark.heavy  # round-10 quick-tier trim (slowest cases -> sharded tier)
def test_winsorize_clips_to_order_statistics(spark):
    from svoe_spark.operators.cleaning import winsorize

    vals = list(range(1, 21)) + [1000]  # 21 values; p95 cut = k=20th = 20
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "s string, i long, v long"
    )
    out = winsorize(df, "v", q_low=0.05, q_high=0.95, group_cols=["s"])
    got = {r["i"]: r["v_w"] for r in out.collect()}
    assert got[20] == 20  # 1000 clipped to the p95 order statistic
    assert got[0] == 2  # 1 clipped up to the p5 cut (k=floor(20*.05)+1=2)
    assert got[10] == 11  # interior value untouched
    assert out.count() == len(vals)  # row-preserving


def test_winsorize_per_group_cuts_differ(spark):
    from svoe_spark.operators.cleaning import winsorize

    rows = [("a", i, v) for i, v in enumerate(range(0, 100, 10))]
    rows += [("b", 100 + i, v) for i, v in enumerate(range(0, 1000, 100))]
    df = spark.createDataFrame(rows, "s string, i long, v long")
    out = winsorize(df, "v", 0.1, 0.9, group_cols=["s"]).collect()
    a_max = max(r["v_w"] for r in out if r["s"] == "a")
    b_max = max(r["v_w"] for r in out if r["s"] == "b")
    assert a_max < 100 and b_max >= 800  # cuts are group-local


def test_winsorize_nulls_pass_through(spark):
    from svoe_spark.operators.cleaning import winsorize

    rows = [("g", i, v) for i, v in enumerate(list(range(1, 11)) + [None])]
    df = spark.createDataFrame(rows, "s string, i long, v long")
    out = {r["i"]: r["v_w"] for r in
           winsorize(df, "v", 0.1, 0.9, group_cols=["s"]).collect()}
    assert out[10] is None  # NULL value passes through unclipped
    # cuts computed over the NON-NULL domain of 10 values:
    # k_lo = floor(9*0.1)+1 = 1 -> 1; k_hi = floor(9*0.9)+1 = 9 -> 9
    assert out[9] == 9  # 10 clipped to the p90 cut
    assert out[0] == 1


def test_adaptive_threshold_filter_keeps_null_group(spark):
    """ADVICE r4 (medium): a NULL group is a real group — its rows must
    be filtered against their OWN threshold, not silently dropped by a
    non-null-safe join."""
    from svoe_spark.operators.cleaning import adaptive_threshold_filter

    rows = [(i, "a", float(i)) for i in range(20)] + [
        (100 + i, None, float(i)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, score double")
    out = adaptive_threshold_filter(df, "score", ["src"], q=0.5, p=1.0).collect()
    null_kept = [r for r in out if r["src"] is None]
    assert len(null_kept) == 11  # top half of the NULL group survives
    assert min(r["score"] for r in null_kept) == 9.0


def test_adaptive_threshold_filter_keeps_unsampled_group_whole(spark):
    """ADVICE r4 (medium): a group that draws zero rows in the p-rate
    sample has no threshold — policy is KEEP WHOLE (NULL threshold =>
    no cut), not silent drop."""
    from svoe_spark.operators.cleaning import adaptive_threshold_filter
    from svoe_spark.operators.curation import hash_sample

    rows = [(i, "big", float(i)) for i in range(2000)] + [
        (10_000, "tiny", 0.0)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, score double")
    # hunt a salt where the 1-row 'tiny' group misses the p=0.05 sample
    salt = None
    for cand in map(str, range(40)):
        s = hash_sample(df.where("src = 'tiny'"), id_col="doc_id", p=0.05,
                        salt=cand)
        if s.count() == 0:
            salt = cand
            break
    assert salt is not None
    out = adaptive_threshold_filter(
        df, "score", ["src"], q=0.5, p=0.05, salt=salt, thr_out="thr"
    )
    tiny = [r for r in out.collect() if r["src"] == "tiny"]
    assert len(tiny) == 1 and tiny[0]["thr"] is None  # kept, threshold NULL


def test_adaptive_threshold_filter_null_values_pass_through(spark):
    """ADVICE r5: NULL value rows pass through in EVERY group — in a
    thresholded group (NULL >= thr must not cut them) and, trivially,
    in an unsampled group — so retention of a missing score never
    depends on whether its group was sampled. Same policy as
    winsorize."""
    from svoe_spark.operators.cleaning import adaptive_threshold_filter

    rows = [(i, "a", float(i)) for i in range(20)] + [
        (100, "a", None),
        (101, "b", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, score double")
    out = adaptive_threshold_filter(df, "score", ["src"], q=0.5, p=1.0)
    kept = {r["doc_id"] for r in out.collect()}
    assert 100 in kept  # NULL score in a thresholded group survives
    assert 101 in kept  # NULL score in an all-NULL group survives


def test_winsorize_preserves_all_null_group(spark):
    """ADVICE r4: a group whose value column is entirely NULL has no
    order-statistics row; its rows must still pass through (NULL)."""
    from svoe_spark.operators.cleaning import winsorize

    rows = [("g", i, v) for i, v in enumerate(range(1, 11))]
    rows += [("allnull", 100, None), ("allnull", 101, None)]
    df = spark.createDataFrame(rows, "s string, i long, v long")
    out = winsorize(df, "v", 0.1, 0.9, group_cols=["s"])
    assert out.count() == 12  # row-preserving incl. the all-NULL group
    got = {r["i"]: r["v_w"] for r in out.collect()}
    assert got[100] is None and got[101] is None
