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
