"""Byte-pair-encoding tokenizer: distributed vocabulary statistics,
deterministic driver-side merge training, and distributed encoding —
the token-budget half of a training-data pipeline (sequence packing,
per-source token mixtures and rarity scoring all consume token
counts; this operator makes the tokenization itself a first-class,
reproducible part of the pipeline instead of an external artifact).

Scale design — the standard industrial split:

  1. ``word_frequencies`` is the ONLY corpus-scale pass: one
     regexp_extract_all + explode + count groupBy (partial-aggregated
     shuffle on uniformly-hashed words). At 100 TB this reduces the
     corpus to a word-frequency relation of ~10-100 M rows.
  2. ``bpe_train`` consumes the TOP ``top_words`` of that relation
     (driver-sized; the head of a Zipfian distribution carries almost
     all pair mass — the same cap every practical BPE trainer applies)
     and runs classic Sennrich et al. (2016) merges with a fully
     deterministic tie-break (max pair count, then lexicographically
     smallest pair), so the same corpus always yields the same merge
     table.
  3. ``bpe_encode`` applies a FIXED merge table distributedly: an
     Arrow-batched pandas UDF with an unbounded per-executor word
     cache — zero shuffles; Zipf makes the cache hit rate ~the
     type/token ratio. (A tokenizer is a frozen artifact: train once,
     encode any corpus — which is also what makes the encoding
     SQL-oracle-checkable: the oracle applies the same constant merge
     table via a recursive CTE.)

Pre-tokenization is ``lower(text)`` split into ``[a-z0-9]+`` runs —
deliberately simple and expressible identically in Spark, DuckDB and
Python, so all three implementations agree bit-for-bit. A production
byte-level pre-tokenizer slots into the same pipeline shape.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

WORD_RE = "[a-z0-9]+"


def word_frequencies(
    docs: DataFrame, text: str = "text", out_word: str = "word"
) -> DataFrame:
    """(word, freq) over the corpus — one narrow extract + one
    partial-aggregated shuffle. The corpus-scale step of BPE training."""
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text)), F.lit(WORD_RE), 0)
        ).alias(out_word)
    )
    return words.groupBy(out_word).agg(F.count(F.lit(1)).alias("freq"))


def _pairs(seq: tuple[str, ...]) -> Iterable[tuple[str, str]]:
    return zip(seq, seq[1:])


def bpe_train(
    word_freqs: DataFrame | list[tuple[str, int]],
    num_merges: int = 200,
    top_words: int = 100_000,
    word_col: str = "word",
    freq_col: str = "freq",
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a word-frequency relation.

    Accepts the ``word_frequencies`` DataFrame (its top ``top_words``
    by (freq desc, word asc) are collected — a driver-sized TakeOrdered,
    the documented head-of-Zipf cap) or an explicit (word, freq) list.
    Deterministic: pair counts break ties by lexicographically smallest
    pair, the top-word cut by (freq desc, word asc). Returns merges in
    rank order (rank 0 applied first)."""
    if isinstance(word_freqs, DataFrame):
        rows = (
            word_freqs.orderBy(F.desc(freq_col), F.asc(word_col))
            .limit(top_words)
            .collect()
        )
        vocab = [(r[word_col], int(r[freq_col])) for r in rows]
    else:
        vocab = sorted(word_freqs, key=lambda wf: (-wf[1], wf[0]))[:top_words]
    seqs: list[tuple[tuple[str, ...], int]] = [(tuple(w), f) for w, f in vocab]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for seq, f in seqs:
            for p in _pairs(seq):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nxt = []
        for seq, f in seqs:
            if len(seq) > 1:
                out = []
                i = 0
                while i < len(seq):
                    if (
                        i + 1 < len(seq)
                        and seq[i] == best[0]
                        and seq[i + 1] == best[1]
                    ):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seq = tuple(out)
            nxt.append((seq, f))
        seqs = nxt
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference BPE encoding of one word: repeatedly merge the
    LOWEST-RANK adjacent pair (leftmost occurrence) until no pair has a
    rank. The exact procedure the SQL oracle's recursive CTE mirrors."""
    seq = list(word)
    while len(seq) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text: str = "text",
    out_tokens: str = "tokens",
) -> DataFrame:
    """Append ``out_tokens`` (array<string>) — the BPE tokens of the
    document under the fixed merge table. Arrow-batched pandas UDF with
    a per-executor word cache (Zipf => hit rate ~ type/token ratio);
    zero shuffles, the merge table rides in the serialized closure.
    Justified Python: the merge loop is inherently iterative per word —
    no relational form exists (the SQL oracle needs a recursive CTE)."""
    ranks = {p: i for i, p in enumerate(merges)}
    import re

    rx = re.compile(WORD_RE)
    # hoisted OUTSIDE the UDF body: the closure (and this dict) is
    # deserialized once per python worker, so the cache persists across
    # Arrow batches — a per-executor-process cache, not per-batch
    cache: dict[str, list[str]] = {}

    @pandas_udf("array<string>")
    def _enc(col: pd.Series) -> pd.Series:
        def enc_doc(t: str) -> list[str]:
            if t is None:
                return []
            out: list[str] = []
            for w in rx.findall(t.lower()):
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, ranks)
                    cache[w] = got
                out.extend(got)
            return out

        return col.map(enc_doc)

    return docs.withColumn(out_tokens, _enc(F.col(text)))
