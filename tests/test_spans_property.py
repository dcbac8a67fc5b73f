"""Property tests for repeated_ngram_spans / remove_repeated_spans:
random small-vocab corpora against a pure-Python reference
implementation of the same semantics (corpus-frequent k-grams by TOKEN
CONTENT -> per-doc maximal merged spans -> span removal). The Spark
side identifies grams by the dual rolling hash; at property-test sizes
a joint collision is ~impossible, so content-identity is the correct
reference."""

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from svoe_spark.operators.dedup import remove_repeated_spans, repeated_ngram_spans

pytestmark = pytest.mark.heavy  # multi-minute suite: deselected by the
# default `pytest tests/ -q` tier (pytest.ini); scripts/ptest.py shards and
# the round-close sweep run it


_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny vocab + short docs -> repeated k-grams appear constantly
docs_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12).map(
        " ".join
    ),
    min_size=1,
    max_size=8,
)

K = 3


def _py_spans(texts, k=K, min_count=2):
    """Reference: maximal merged spans of corpus-frequent k-grams."""
    from collections import Counter

    toks = [tuple(t for t in s.split(" ") if t) for s in texts]
    counts = Counter(
        tt[i : i + k] for tt in toks for i in range(len(tt) - k + 1)
    )
    out = {}
    for d, tt in enumerate(toks):
        hits = [
            i
            for i in range(len(tt) - k + 1)
            if counts[tt[i : i + k]] >= min_count
        ]
        spans = []
        for p in hits:
            if spans and p - spans[-1][1] <= k:
                spans[-1] = (spans[-1][0], p, spans[-1][2] + 1)
            else:
                spans.append((p, p, 1))
        out[d] = [
            (s, e + k - 1, e + k - 1 - s + 1, n) for (s, e, n) in spans
        ]
    return out


def _py_clean(texts, k=K, min_count=2):
    spans = _py_spans(texts, k, min_count)
    out = {}
    for d, s in enumerate(texts):
        tt = [t for t in s.split(" ") if t]
        covered = set()
        for a, b, _, _ in spans[d]:
            covered.update(range(a, b + 1))
        kept = [t for i, t in enumerate(tt) if i not in covered]
        out[d] = (" ".join(kept), len(tt), len(tt) - len(kept))
    return out


@_slow
@given(docs_strategy)
def test_spans_match_python_reference(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {}
    for r in repeated_ngram_spans(df, k=K, min_count=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_tokens"], r["n_gram_hits"])
        )
    want = _py_spans(texts)
    for d in range(len(texts)):
        assert sorted(got.get(d, [])) == sorted(want[d]), (d, texts[d])


@_slow
@given(docs_strategy)
def test_clean_matches_python_reference(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_tokens_removed"])
        for r in remove_repeated_spans(df, k=K, min_count=2).collect()
    }
    want = _py_clean(texts)
    assert got == want


# ---------------------------------------------------------------------------
# Rollup store: random batching invariance
# ---------------------------------------------------------------------------

batching_strategy = st.lists(
    st.integers(min_value=0, max_value=3), min_size=20, max_size=60
)


@settings(
    max_examples=4,  # each example runs 4 store refreshes + a full
    # compare (~6s of parquet round-trips); 4 adversarial batchings
    # exercise the associativity as well as 8 did at half the wall
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batching_strategy)
def test_rollup_refresh_batching_invariant(spark, tmp_path_factory, assignment):
    """Splitting a tick set into ANY sequence of refresh batches yields
    the same finished store as one refresh — the associativity the
    incremental design rests on, under adversarial batching (batches
    interleave in time and may be empty)."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.rollup import (
        RollupStore,
        bars_from_ticks,
        finish_bars,
        rollup_bars,
    )

    rows = [
        (
            i,  # event_id
            f"2024-01-0{1 + (i % 2)} 0{i % 6}:{i % 60:02d}:00",
            "S%d" % (i % 2),
            100.0 + (i % 7),
            int(round((100.0 + (i % 7)) * 100)),
            1 + i % 3,
        )
        for i in range(len(assignment))
    ]
    t = spark.createDataFrame(
        rows,
        "event_id long, ts_s string, event_type string, value double,"
        " value_c long, qty long",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
        "value",
        "value_c",
        "qty",
    )
    base = tmp_path_factory.mktemp("rollup_prop")
    store = RollupStore(spark, str(base / "bars"))
    for b in range(4):
        idx = [i for i, a in enumerate(assignment) if a == b]
        store.refresh(t.where(F.col("event_id").isin(idx)))
    full = finish_bars(rollup_bars(bars_from_ticks(t, window="1m"), window="1h"))
    cols = sorted(full.columns)
    got = sorted(tuple(r[c] for c in cols) for r in store.read().collect())
    want = sorted(tuple(r[c] for c in cols) for r in full.collect())
    assert got == want
