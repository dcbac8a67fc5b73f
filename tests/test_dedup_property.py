"""Property-based tests for MinHash/LSH dedup: random small-vocab
corpora against a pure-Python re-implementation of the shingle/Jaccard
math (hashlib md5, same constants) — verifies both the precision
contract (every emitted pair's Jaccard is real and >= threshold) and
the exact-duplicate recall contract (identical shingle sets always
collide in every band)."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from svoe_spark.functions.text import P_HASH
from svoe_spark.operators.dedup import minhash_dedup_pairs

import pytest

pytestmark = pytest.mark.heavy  # round-9 quick-tier trim: the
# hypothesis differential suites run via scripts/ptest.py and the
# round-close sweep

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small vocab + repeated draws -> real near-duplicates appear often
docs_strategy = st.lists(
    st.lists(st.sampled_from(["w%d" % i for i in range(6)]), min_size=0, max_size=10)
    .map(" ".join),
    min_size=2,
    max_size=10,
)


def _py_token_hash(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % P_HASH


def _py_shingles(text: str) -> set:
    th = [_py_token_hash(t) for t in text.split(" ") if t]
    return {
        ((th[i] * 31 + th[i + 1]) % P_HASH * 31 + th[i + 2]) % P_HASH
        for i in range(len(th) - 2)
    }


def _py_jaccard(a: set, b: set) -> float:
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


@_slow
@given(texts=docs_strategy)
def test_minhash_pairs_precision_and_exact_recall(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = minhash_dedup_pairs(df, threshold=0.5).collect()
    sets = {i: _py_shingles(t) for i, t in enumerate(texts)}

    # precision: every emitted pair is a true near-duplicate, with the
    # exact Jaccard value (int/int division -> bit-comparable)
    for r in got:
        a, b = sets[r.id_a], sets[r.id_b]
        assert a and b, "pairs must never involve empty shingle sets"
        assert r.id_a < r.id_b
        assert _py_jaccard(a, b) == r.jaccard
        assert r.jaccard >= 0.5

    # exact-duplicate recall: identical non-empty shingle sets produce
    # identical signatures, hence collide in every band -> always found
    emitted = {(r.id_a, r.id_b) for r in got}
    for i in sets:
        for j in sets:
            if i < j and sets[i] and sets[i] == sets[j]:
                assert (i, j) in emitted, (i, j, texts[i], texts[j])
