"""Corpus-cleaning operators for LLM training-data pipelines: PII
redaction, repetition signals (Gopher-style quality heuristics),
corpus-wide chunk-level deduplication, and domain mixture weighting.

All four are relational — column expressions and shuffles on narrow
keys, no Python row loops — so they fuse with the parquet scan and
survive a 1000-executor scale-up:

* `pii_redact` is a pure per-row expression chain (zero shuffle).
* `repetition_signals` shuffles (doc_id, token) pairs once for the
  top-word mode; n-gram ratios stay array-side (zero shuffle).
* `chunk_dedup` shuffles on chunk text (uniform hash keys) then on
  doc_id — the same two-shuffle shape as exact dedup + reassembly.
* `source_mixture_weights` is a groupBy over a tiny domain relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from svoe_spark.functions.text import tokens

# Redaction patterns, valid in BOTH Java regex (Spark) and RE2 (DuckDB):
# no lookaround, no backreferences, ASCII word boundaries only. Order
# matters (emails are redacted before long-digit IDs so an address's
# digits are not double-counted); both engines apply the same order.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("id", r"\b\d{9,}\b", "<ID>"),
)


def pii_redact(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact PII-shaped spans (emails, IPv4s, phone numbers, long
    digit IDs) and count matches per category.

    Counts are taken on the ORIGINAL text, replacements applied in
    fixed pattern order. A production deployment swaps in NER-based
    detection as a pandas UDF behind the same signature; the regex
    core keeps the operator self-contained, scan-fused (zero shuffle,
    whole-stage codegen) and oracle-checkable.
    """
    cols = [F.col(id_col)]
    red = F.col(text)
    for name, pat, repl in PII_PATTERNS:
        cols.append(
            F.size(F.regexp_extract_all(F.col(text), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, repl)
    return df.select(*cols, red.alias("redacted"))


def repetition_signals(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition heuristics per document: fraction of
    tokens belonging to the single most frequent token (top_word_ratio)
    and duplicate 2-gram / 3-gram fractions.

    n-gram ratios are computed array-side (zip_with + array_distinct —
    linear, zero shuffle). The top-word mode uses one explode +
    two-level aggregation: (doc, token) keys are near-unique, so the
    shuffle is skew-free at any corpus size; an array-side mode would
    be O(tokens^2) per document and die on a 100k-token document.
    """
    toks = tokens(text)
    n = F.size(toks)
    n1 = F.greatest(n - 1, F.lit(0))
    n2 = F.greatest(n - 2, F.lit(0))
    two = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    three = F.zip_with(
        F.slice(two, 1, n2),
        F.slice(toks, 3, n2),
        lambda a, b: F.concat_ws(" ", a, b),
    )

    def dup_ratio(grams):
        m = F.size(grams)
        return F.when(
            m > 0, (m - F.size(F.array_distinct(grams))) / m
        ).otherwise(F.lit(0.0))

    arrays = df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        dup_ratio(two).alias("dup_2gram_ratio"),
        dup_ratio(three).alias("dup_3gram_ratio"),
    )

    per_tok = df.select(F.col(id_col), F.explode(toks).alias("__tok"))
    counts = per_tok.groupBy(id_col, "__tok").agg(F.count(F.lit(1)).alias("__c"))
    top = counts.groupBy(id_col).agg(F.max("__c").alias("__top"))
    return (
        arrays.join(top, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.when(
                F.col("n_tokens") > 0, F.col("__top") / F.col("n_tokens")
            )
            .otherwise(F.lit(0.0))
            .alias("top_word_ratio"),
            "dup_2gram_ratio",
            "dup_3gram_ratio",
        )
    )


def chunk_dedup(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", width: int = 4
) -> DataFrame:
    """Corpus-wide chunk-level exact dedup (the paragraph-dedup of
    C4/RefinedWeb, adapted to unstructured text): split each document
    into consecutive ``width``-token chunks, keep only the FIRST
    occurrence of each chunk text corpus-wide (ordered by doc id then
    chunk position), and reassemble the surviving chunks in order.

    Returns (id, text_dedup, n_chunks, n_removed). Scale shape: one
    shuffle on chunk text (uniform content-hash keys — no skew), one
    on doc id for reassembly; both linear. The first-occurrence rule
    makes the output deterministic and order-independent.
    """
    toks = tokens(text)
    ex = df.select(F.col(id_col), F.posexplode(toks).alias("__pos", "__tok"))
    chunks = ex.groupBy(
        id_col, F.floor(F.col("__pos") / width).alias("__ci")
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__tok"))),
                lambda s: s["__tok"],
            ),
            " ",
        ).alias("__chunk")
    )
    w = Window.partitionBy("__chunk").orderBy(id_col, "__ci")
    ranked = chunks.withColumn("__keep", F.row_number().over(w) == 1)
    return ranked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__keep"), F.struct("__ci", "__chunk"))
                    )
                ),
                lambda s: s["__chunk"],
            ),
            " ",
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(~F.col("__keep"), 1).otherwise(0)).alias("n_removed"),
    )


def source_mixture_weights(
    df: DataFrame, group_col: str = "source", text: str = "text"
) -> DataFrame:
    """Domain mixture weighting (the DoReMi/Pile recipe's bookkeeping
    step): per domain, token counts and the resampling weight that
    equalizes token share across domains (weight = target_share /
    actual_share with a uniform target).

    One groupBy over a tiny domain relation; the weights are then
    applied corpus-side as a broadcast join + bernoulli/repeat sample.
    """
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(text))).alias("n_tokens"),
    )
    w = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(w)
    n_dom = F.count(F.lit(1)).over(w)
    return per.select(
        group_col,
        "n_docs",
        "n_tokens",
        share.alias("token_share"),
        F.when(share > 0, (1.0 / n_dom) / share).otherwise(F.lit(0.0)).alias(
            "mixture_weight"
        ),
    )
