"""Property-based tests for the corpus-cleaning / clustering layer:
random inputs against single-process Python oracles (union-find for
components, direct recomputation for chunk dedup invariants) — the
same differential pattern as the as-of property suite."""

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from svoe_spark.operators.cleaning import chunk_dedup, repetition_signals
from svoe_spark.operators.graph import connected_components

pytestmark = pytest.mark.heavy  # multi-minute suite: deselected by the
# default `pytest tests/ -q` tier (pytest.ini); scripts/ptest.py shards and
# the round-close sweep run it


_slow = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=30,
)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to the true minimum representative
    return {x: find(x) for x in parent}


@_slow
@given(edges=edges_strategy)
def test_connected_components_matches_union_find(spark, edges):
    pairs = spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])
    got = {r.id: r.comp for r in connected_components(pairs).collect()}
    assert got == _union_find_components(edges)


@_slow
@given(edges=edges_strategy)
def test_twostar_components_match_union_find(spark, edges):
    from svoe_spark.operators.graph import connected_components_twostar

    pairs = spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])
    got = {r.id: r.comp for r in connected_components_twostar(pairs).collect()}
    assert got == _union_find_components(edges)


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


@_slow
@given(texts=docs_strategy)
def test_chunk_dedup_invariants(spark, texts):
    width = 3
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    out = {r.doc_id: r for r in chunk_dedup(df, width=width).collect()}

    def chunks_of(t):
        toks = [x for x in t.split(" ") if x]
        return [
            " ".join(toks[i : i + width]) for i in range(0, len(toks), width)
        ]

    # (1) corpus-wide uniqueness: every surviving chunk text appears
    # exactly once across all outputs; (2) survivors preserve order and
    # are a subsequence of the doc's own chunks; (3) counts reconcile
    seen = set()
    for i, t in enumerate(texts):
        own = chunks_of(t)
        if not own:
            assert i not in out  # zero-token docs produce no chunk rows
            continue
        r = out[i]
        assert r.n_chunks == len(own)
        kept = chunks_of(r.text_dedup) if r.text_dedup else []
        assert r.n_removed == len(own) - len(kept)
        # survivors are an ordered subsequence of the doc's own chunks
        j = 0
        for c in kept:
            while j < len(own) and own[j] != c:
                j += 1
            assert j < len(own), (own, kept)
            j += 1
        for c in kept:
            assert c not in seen, c
            seen.add(c)


@_slow
@given(texts=docs_strategy)
def test_repetition_signals_bounds(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    for r in repetition_signals(df).collect():
        toks = [x for x in texts[r.doc_id].split(" ") if x]
        assert r.n_tokens == len(toks)
        if toks:
            from collections import Counter

            top = Counter(toks).most_common(1)[0][1]
            assert abs(r.top_word_ratio - top / len(toks)) < 1e-12
        assert 0.0 <= r.dup_2gram_ratio <= 1.0
        assert 0.0 <= r.dup_3gram_ratio <= 1.0
