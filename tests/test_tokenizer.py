"""BPE tokenizer: training determinism (incl. the frozen merge table
the oracle query depends on), reference-implementation equivalence of
the distributed encoder, and fixpoint/reconstruction properties."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from svoe_spark.operators.tokenizer import (
    WORD_RE,
    bpe_encode,
    bpe_train,
    encode_word,
    word_frequencies,
)
from svoe_spark.sources.tables import load_table


def test_train_on_hand_corpus():
    # classic Sennrich example shape: 'low'x5, 'lower'x2, 'newest'x6
    freqs = [("low", 5), ("lower", 2), ("newest", 6)]
    merges = bpe_train(freqs, num_merges=4)
    # round 1: w-e appears in newest (6) AND lower (2) = 8, the max
    assert merges[0] == ("w", "e")
    # round 2: l-o = 7 (low 5 + lower 2) now the max
    assert merges[1] == ("l", "o")
    # round 3: four pairs tie at 6 — ('e','we'), ('n','e'), ('s','t'),
    # ('we','s'); deterministic tie-break takes the lexicographic min
    assert merges[2] == ("e", "we")
    # round 4: 6-count tie among ('ewe','s'), ('n','ewe'), ('s','t')
    assert merges[3] == ("ewe", "s")


def test_train_deterministic_across_input_order():
    a = bpe_train([("abc", 3), ("abd", 2), ("cbd", 1)], num_merges=3)
    b = bpe_train([("cbd", 1), ("abd", 2), ("abc", 3)], num_merges=3)
    assert a == b


def test_frozen_merge_table_reproduced_from_fixture(spark):
    from svoe_spark.queries_llm import BPE_FIXED_MERGES

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    merges = bpe_train(word_frequencies(docs), num_merges=64, top_words=100_000)
    assert merges == BPE_FIXED_MERGES


def test_encode_word_reconstructs_and_reaches_fixpoint():
    merges = [("e", "r"), ("o", "r"), ("i", "n"), ("in", "t")]
    ranks = {p: i for i, p in enumerate(merges)}
    toks = encode_word("winter", ranks)
    assert "".join(toks) == "winter"
    # lowest-rank-first: er (rank 0), then in (rank 2), then the newly
    # adjacent (in, t) (rank 3) — merges cascade on merged symbols
    assert toks == ["w", "int", "er"]
    # fixpoint: no adjacent pair has a rank
    for x, y in zip(toks, toks[1:]):
        assert (x, y) not in ranks


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet="abcd", min_size=1, max_size=12),
    nmerge=st.integers(min_value=0, max_value=10),
    seed=st.integers(min_value=0, max_value=99),
)
def test_encode_word_properties(word, nmerge, seed):
    import random

    rng = random.Random(seed)
    syms = ["a", "b", "c", "d", "ab", "cd", "bc", "abc", "bcd"]
    merges = []
    seen = set()
    for _ in range(nmerge):
        p = (rng.choice(syms), rng.choice(syms))
        if p not in seen:
            seen.add(p)
            merges.append(p)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = encode_word(word, ranks)
    assert "".join(toks) == word
    for x, y in zip(toks, toks[1:]):
        assert (x, y) not in ranks


def test_distributed_encode_matches_reference(spark, sf_small):
    from svoe_spark.queries_llm import BPE_FIXED_MERGES

    ranks = {p: i for i, p in enumerate(BPE_FIXED_MERGES)}
    rx = re.compile(WORD_RE)
    docs = load_table(spark, "documents", sf_small).limit(50)
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode(docs, BPE_FIXED_MERGES).select("doc_id", "tokens").collect()
    }
    for r in docs.select("doc_id", "text").collect():
        want = []
        for w in rx.findall((r["text"] or "").lower()):
            want.extend(encode_word(w, ranks))
        assert got[r["doc_id"]] == want


def test_word_frequencies_matches_pandas(spark, sf_small):
    docs = load_table(spark, "documents", sf_small)
    got = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    rx = re.compile(WORD_RE)
    want: dict[str, int] = {}
    for r in docs.select("text").toPandas()["text"]:
        for w in rx.findall((r or "").lower()):
            want[w] = want.get(w, 0) + 1
    assert got == want


def test_encode_plan_has_no_shuffle(spark, sf_small):
    import contextlib
    import io

    from svoe_spark.queries_llm import BPE_FIXED_MERGES

    docs = load_table(spark, "documents", sf_small)
    df = bpe_encode(docs, BPE_FIXED_MERGES)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "Exchange hashpartitioning" not in p, p
    assert "ArrowEvalPython" in p or "Eval" in p  # Arrow-batched UDF


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer
# ---------------------------------------------------------------------------

from svoe_spark.operators.tokenizer import (  # noqa: E402
    MAX_TRAIN_WORDS,
    segment_word,
    unigram_encode,
    unigram_train,
)


def _brute_best(word, costs, max_len):
    """Tiny reference: enumerate EVERY segmentation, pick the operator's
    documented optimum (min total cost, then longest-first lengths)."""
    def segs(s):
        if not s:
            yield []
            return
        for take in range(1, min(max_len, len(s)) + 1):
            p = s[:take]
            if p in costs:
                for rest in segs(s[take:]):
                    yield [p] + rest

    best = None
    for seg in segs(word):
        key = (sum(costs[p] for p in seg), tuple(-len(p) for p in seg))
        if best is None or key < best[0]:
            best = (key, seg)
    return best[1] if best else None


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet="abc", min_size=1, max_size=9),
    seed=st.integers(0, 10_000),
)
def test_segment_word_matches_brute_force(word, seed):
    import random

    rng = random.Random(seed)
    pieces = {"a", "b", "c"}
    for _ in range(6):
        ln = rng.randint(2, 4)
        pieces.add("".join(rng.choice("abc") for _ in range(ln)))
    costs = {p: rng.randint(1, 5000) for p in pieces}
    assert segment_word(word, costs, 4) == _brute_best(word, costs, 4)


def test_segment_word_uncoverable_returns_none():
    assert segment_word("axe", {"a": 1, "e": 1}, 3) is None


def test_segment_word_fallback_oov_policy():
    """VERDICT r5 ask 2: the OOV policy is first-class and total —
    uncoverable words become raw chars, in-vocab chars at their
    trained cost, unknown chars at _UNK_COST; coverable words are
    untouched Viterbi output."""
    from svoe_spark.operators.tokenizer import _UNK_COST, segment_word_fallback

    costs = {"a": 1, "e": 2, "ae": 4}
    # coverable: plain Viterbi ('ae' at 4 beats a+e at 3? no — min cost
    # picks a+e=3; longest-first only breaks EQUAL-cost ties)
    assert segment_word_fallback("ae", costs, 2) == (["a", "e"], 3)
    # uncoverable: char fallback with mixed pricing
    toks, cost = segment_word_fallback("axe", costs, 2)
    assert toks == ["a", "x", "e"]
    assert cost == 1 + _UNK_COST + 2
    # fully unknown word
    toks, cost = segment_word_fallback("zz", costs, 2)
    assert toks == ["z", "z"] and cost == 2 * _UNK_COST


def test_unigram_encode_planted_oov_matches_reference(spark):
    """Differential check of the distributed OOV path: Spark
    unigram_encode over planted non-vocab chars (x/z/0) equals a pure-
    Python replay of segment_word_fallback word by word."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.tokenizer import (
        segment_word_fallback,
        unigram_encode,
    )
    from svoe_spark.queries_llm import UNIGRAM_FIXED_PIECES

    costs = dict(UNIGRAM_FIXED_PIECES)
    max_len = max(len(p) for p in costs)
    docs = (
        load_table(spark, "documents", "/root/testdata/sf0.001")
        .limit(60)
        .withColumn("text", F.translate(F.lower("text"), "kso", "xz0"))
    )
    got = {
        r["doc_id"]: (list(r["tokens"]), r["lm_cost"])
        for r in unigram_encode(
            docs, UNIGRAM_FIXED_PIECES, out_cost="lm_cost"
        ).collect()
    }
    rx = re.compile(WORD_RE)
    saw_oov = False
    for r in docs.select("doc_id", "text").collect():
        toks, cost = [], 0
        for w in rx.findall((r["text"] or "").lower()):
            seg, c = segment_word_fallback(w, costs, max_len)
            saw_oov = saw_oov or any(ch in "xz0" for ch in w)
            toks.extend(seg)
            cost += c
        assert got[r["doc_id"]] == (toks, cost), r["doc_id"]
    assert saw_oov  # the planting actually exercised the fallback


def test_unigram_train_learns_whole_words():
    freqs = [("window", 50), ("windy", 5), ("dow", 3)]
    pieces = unigram_train(freqs, vocab_size=20, max_piece_len=6, em_iters=3)
    costs = dict(pieces)
    assert "window" in costs
    # the dominant word must tokenize as itself, not as char shrapnel
    assert segment_word("window", costs, 6) == ["window"]
    # every single char survives pruning (coverage guarantee)
    for ch in set("windowydow"):
        assert ch in costs


def test_unigram_train_deterministic_across_input_order():
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    a = unigram_train(freqs, vocab_size=24, em_iters=3)
    b = unigram_train(list(reversed(freqs)), vocab_size=24, em_iters=3)
    assert a == b


def test_trainer_collect_is_bounded():
    with pytest.raises(ValueError, match="MAX_TRAIN_WORDS"):
        bpe_train([("a", 1)], top_words=MAX_TRAIN_WORDS + 1)
    with pytest.raises(ValueError, match="MAX_TRAIN_WORDS"):
        unigram_train([("a", 1)], top_words=MAX_TRAIN_WORDS + 1)


def test_frozen_unigram_pieces_reproduced_from_fixture(spark):
    from svoe_spark.queries_llm import UNIGRAM_FIXED_PIECES

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    got = unigram_train(
        word_frequencies(docs), vocab_size=64, max_piece_len=6, em_iters=4
    )
    assert got == UNIGRAM_FIXED_PIECES


def test_unigram_distributed_encode_matches_reference(spark, sf_small):
    from svoe_spark.queries_llm import UNIGRAM_FIXED_PIECES

    costs = dict(UNIGRAM_FIXED_PIECES)
    max_len = max(len(p) for p in costs)
    docs = load_table(spark, "documents", sf_small).limit(100)
    got = {
        r["doc_id"]: (list(r["tokens"]), r["lm_cost"])
        for r in unigram_encode(
            docs, UNIGRAM_FIXED_PIECES, out_cost="lm_cost"
        ).collect()
    }
    rx = re.compile(WORD_RE)
    for r in docs.select("doc_id", "text").collect():
        toks, cost = [], 0
        for w in rx.findall((r["text"] or "").lower()):
            seg = segment_word(w, costs, max_len)
            assert seg is not None
            toks.extend(seg)
            cost += sum(costs[p] for p in seg)
        assert got[r["doc_id"]] == (toks, cost), r["doc_id"]
