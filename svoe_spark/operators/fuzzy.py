"""Fuzzy (edit-distance) join with q-gram blocking — entity
resolution over dirty string keys (near-identical product names,
venue symbols, user handles) without an all-pairs comparison.

Candidate generation uses the classic q-gram count-filter bound
(Gravano et al., VLDB 2001): one edit operation destroys at most ``q``
q-grams, so two strings within edit distance ``d`` share at least
``max(|a|, |b|) - q + 1 - d*q`` q-grams. Whenever that bound is
positive — i.e. ``max(|a|, |b|) > (d+1)*q - 1`` — the pair is
guaranteed to share at least ONE q-gram and is found by an inverted
equi-join on grams. Pairs of strings BOTH short enough to evade the
bound are handled exactly by a separate short-bucket cross pairing
(strings of length <= (d+1)*q - 1 — a bounded set by construction:
the alphabet caps it; the operator asserts nothing and documents the
assumption that the short bucket is broadcast-sized).

Every candidate is verified with the exact Levenshtein distance
(JVM-side `levenshtein`, identical unit-cost definition in DuckDB),
so the result is EXACT: blocking affects cost only, never the answer.

Scale shape: one gram explode per side (narrow), one equi-join on the
gram key (the only data shuffle), a distinct on candidate pairs, and
a length pre-filter ``||a| - |b|| <= d`` before the O(len^2) verify.
The gram join generates O(sum over grams of |postings|^2) candidates:
on a large corpus the lever is gram SELECTIVITY: raise ``q`` until
posting lists are short (smoke: 210k 12-char names at q=4 → ~35-entry
lists, 7.5 s with all 10k planted typo pairs found; the same corpus
at q=2 has 10k-hot digit grams and is quadratic). Raising q
also raises the short-string threshold (d+1)*q - 1, so very short
keys fall back to the cross bucket — pick q just large enough. For
residual hot grams (a corpus-wide prefix, a common word) pass
``max_doc_freq`` to drop them — the n-gram dedup blocker's contract:
within-cap corpora keep the exact answer; above it, recall is lost
only for pairs whose EVERY shared gram is hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _grams(col: str, q: int) -> F.Column:
    """Distinct q-grams as xxhash64 ids: UNPADDED (boundary padding
    would mint pad+first-char / last-char+pad grams shared by every
    string with the same first or last character — measured ~70x
    candidate blowup on the 210k-name smoke; strings shorter than q
    have no grams but are below the short-bucket threshold by
    construction), and HASHED rather than base-256-packed (the int32
    packing overflows under ANSI mode at q>=5, or q=4 with any
    non-ASCII character; a hash collision only adds a candidate the
    exact verify removes)."""
    c = F.col(col)
    return F.array_distinct(
        F.when(
            F.length(c) >= q,
            F.transform(
                F.sequence(F.lit(1), F.length(c) - (q - 1)),
                lambda i: F.xxhash64(c.substr(i, F.lit(q))),
            ),
        ).otherwise(F.array().cast("array<bigint>"))
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_distance: int = 2,
    q: int = 2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All (left value, right value) pairs of DISTINCT non-null strings
    within Levenshtein distance ``max_distance``, with the exact
    distance. Returns (left_val, right_val, distance) — join it back
    to carry ids/payloads (values are the dedup unit, so the verify
    runs once per distinct pair, not once per row pair).

    ``max_doc_freq``: optional cap on a gram's posting list, judged
    over BOTH sides together (drop grams carried by more than this
    many values corpus-wide) — the skew escape hatch; within-cap
    corpora get the exact uncapped answer, above it recall is traded
    away only for pairs whose EVERY shared gram is hot (same contract
    as dedup.ngram_jaccard_pairs).
    """
    d, thr = max_distance, (max_distance + 1) * q - 1
    a = left.select(F.col(left_on).alias("left_val")).where(
        F.col("left_val").isNotNull()
    ).distinct()
    b = right.select(F.col(right_on).alias("right_val")).where(
        F.col("right_val").isNotNull()
    ).distinct()

    ga = a.select("left_val", F.explode(_grams("left_val", q)).alias("__g"))
    gb = b.select("right_val", F.explode(_grams("right_val", q)).alias("__g"))
    if max_doc_freq is not None:
        # hotness is judged over BOTH sides together, so the cap's
        # contract is symmetric: a pair is lost only when its every
        # shared gram is hot corpus-wide (per-side caps would also
        # drop grams hot on one side but rare on the other)
        hot = (
            ga.select("__g")
            .unionByName(gb.select("__g"))
            .groupBy("__g")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > max_doc_freq)
            .select("__g")
        )
        ga = ga.join(F.broadcast(hot), "__g", "left_anti")
        gb = gb.join(F.broadcast(hot), "__g", "left_anti")
    blocked = ga.join(gb, "__g").select("left_val", "right_val").distinct()

    # completeness fallback: pairs where BOTH sides are short enough to
    # evade the shared-gram bound (max len <= (d+1)*q - 1)
    sa = a.where(F.length("left_val") <= thr)
    sb = b.where(F.length("right_val") <= thr)
    short = sa.join(F.broadcast(sb)).select("left_val", "right_val")

    cands = blocked.unionByName(short).distinct().where(
        F.abs(F.length("left_val") - F.length("right_val")) <= d
    )
    dist = F.levenshtein("left_val", "right_val")
    return cands.select(
        "left_val", "right_val", dist.cast("long").alias("distance")
    ).where(F.col("distance") <= d)
