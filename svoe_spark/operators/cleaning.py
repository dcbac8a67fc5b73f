"""Corpus-cleaning operators for LLM training-data pipelines: PII
redaction, repetition signals (Gopher-style quality heuristics),
corpus-wide chunk-level deduplication, and domain mixture weighting.

All four are relational — column expressions and shuffles on narrow
keys, no Python row loops — so they fuse with the parquet scan and
survive a 1000-executor scale-up:

* `pii_redact` is a pure per-row expression chain (zero shuffle).
* `repetition_signals` is array-side per row (zero shuffle) — the
  top-word mode is a sorted run-length fold, not an explode.
* `chunk_dedup` shuffles on chunk text (uniform hash keys) then on
  doc_id — the same two-shuffle shape as exact dedup + reassembly.
* `source_mixture_weights` is a groupBy over a tiny domain relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from svoe_spark.functions.text import tokens
from svoe_spark.operators.util import spread as _spread

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

    Each category is counted on the PROGRESSIVELY redacted text (after
    the previous categories were replaced), so one span is attributed
    to exactly one category — an email's digit run is n_email only,
    never also n_id. A production deployment swaps in NER-based
    detection as a pandas UDF behind the same signature; the regex
    core keeps the operator self-contained, scan-fused (zero shuffle,
    whole-stage codegen) and oracle-checkable.
    """
    cols = [F.col(id_col)]
    red = F.col(text)
    for name, pat, repl in PII_PATTERNS:
        cols.append(
            F.size(F.regexp_extract_all(red, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, repl)
    return _spread(df).select(*cols, red.alias("redacted"))


def _top_token_count(toks):
    """Count of the most frequent token, as a run-length fold over the
    sorted token array: acc = (prev token, current run, best run).
    O(n log n) per doc, array-side — no explode, no shuffle."""
    return F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("cur"), F.lit(0).alias("best")
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1)).alias("cur"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def repetition_signals(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition heuristics per document: fraction of
    tokens belonging to the single most frequent token (top_word_ratio)
    and duplicate 2-gram / 3-gram fractions.

    Everything is computed array-side in ONE scan stage — zero
    shuffles. The top-word mode is a sorted run-length fold
    (array_sort + aggregate, O(n log n) per doc), NOT the naive
    O(n^2) count-each-distinct-token form; a document only has to fit
    in a task, which any row-based engine requires anyway. n-gram
    ratios are zip_with + array_distinct, built directly from the
    token array (not nested through the 2-gram expression — repeated
    higher-order subtrees are interpreted, not codegen'd, so nesting
    multiplies evaluation cost).
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
        F.zip_with(
            F.slice(toks, 1, n2),
            F.slice(toks, 2, n2),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        F.slice(toks, 3, n2),
        lambda a, b: F.concat_ws(" ", a, b),
    )

    def dup_ratio(grams):
        m = F.size(grams)
        return F.when(
            m > 0, (m - F.size(F.array_distinct(grams))) / m
        ).otherwise(F.lit(0.0))

    top_count = _top_token_count(toks)

    return _spread(df).select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.when(n > 0, top_count / n).otherwise(F.lit(0.0)).alias("top_word_ratio"),
        dup_ratio(two).alias("dup_2gram_ratio"),
        dup_ratio(three).alias("dup_3gram_ratio"),
    )


def corpus_filter(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_distinct_ratio: float = 0.4,
    max_top_word_ratio: float = 0.12,
    max_dup_2gram_ratio: float = 0.06,
    classifier_weights: list[float] | None = None,
    classifier_bias: float = 0.0,
    min_logit: float = 0.0,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """C4/Gopher-style composed keep/drop decision: length bounds,
    vocabulary diversity, and repetition caps evaluated in ONE
    zero-shuffle scan (signals recomputed inline rather than joined
    from the per-signal operators — three array expressions beat two
    shuffles at any corpus size). Emits the signals plus the boolean,
    so downstream can audit why a document was dropped;
    `filter(keep)` is the pipeline step.

    ``classifier_weights`` composes the MODEL-based gate into the same
    scan (VERDICT r5 ask 5): the fastText-shaped hashed-BoW logit of
    ``text_analysis.quality_classifier`` — typically the FROZEN
    trained artifact from ``train_quality_classifier`` +
    ``quantize_weights`` (queries_llm.QC_TRAINED_WEIGHTS / _BIAS), not
    the stand-in defaults — folds inline (same document-order fold, so
    scores stay bit-portable), an extra ``logit`` audit column is
    emitted, and ``logit >= min_logit`` ANDs into ``keep``. Still one
    zero-shuffle map-only pass; the weight table is a plan literal.

    ``passthrough`` carries extra input columns (e.g. source/lang/
    text) through the scan so a downstream consumer can
    ``filter(keep)`` directly instead of joining the verdicts back to
    the corpus on ``id_col`` — the pass is row-local, so the join and
    the filter are the same relation, minus one exchange per side."""
    toks = tokens(text)
    n = F.size(toks)
    n1 = F.greatest(n - 1, F.lit(0))
    two = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    m = F.size(two)
    dup2 = F.when(m > 0, (m - F.size(F.array_distinct(two))) / m).otherwise(
        F.lit(0.0)
    )
    distinct_ratio = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(
        F.lit(0.0)
    )
    top_ratio = F.when(n > 0, _top_token_count(toks) / n).otherwise(F.lit(0.0))
    keep = (
        (n >= min_tokens)
        & (n <= max_tokens)
        & (distinct_ratio >= min_distinct_ratio)
        & (top_ratio <= max_top_word_ratio)
        & (dup2 <= max_dup_2gram_ratio)
    )
    extra = []
    if classifier_weights is not None:
        from svoe_spark.functions.text import token_hashes
        from svoe_spark.operators.text_analysis import hashed_bow_logit

        logit = hashed_bow_logit(
            token_hashes(text), n, classifier_weights, classifier_bias
        )
        extra = [logit.alias("logit")]
        keep = keep & (logit >= F.lit(float(min_logit)))
    return _spread(df).select(
        F.col(id_col),
        *[F.col(c) for c in (passthrough or [])],
        n.alias("n_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        top_ratio.alias("top_word_ratio"),
        dup2.alias("dup_2gram_ratio"),
        *extra,
        keep.alias("keep"),
    )


def _chunk_explode(
    df: DataFrame, text: str, id_col: str, width: int
) -> DataFrame:
    """(id, __ci, __chunk): consecutive ``width``-token chunks, built
    ARRAY-SIDE (slice + array_join over the token array — no
    explode/collect_list round trip, which would add a full shuffle
    plus an object-hash aggregation), then exploded once. Shared by
    both chunk-dedup rules so their chunking can never diverge."""
    toks = tokens(text)
    n = F.size(toks)
    chunk_arr = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), F.ceil(n / width) - 1),
            lambda i: F.array_join(F.slice(toks, i * width + 1, width), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return _spread(df).select(
        F.col(id_col), F.posexplode(chunk_arr).alias("__ci", "__chunk")
    )


def _chunk_reassemble(ranked: DataFrame, id_col: str, out_col: str) -> DataFrame:
    """Reassemble the chunks flagged ``__keep`` in document order;
    (id, out_col, n_chunks, n_removed)."""
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
        ).alias(out_col),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(~F.col("__keep"), 1).otherwise(0)).alias("n_removed"),
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
    ex = _chunk_explode(df, text, id_col, width)
    w = Window.partitionBy("__chunk").orderBy(id_col, "__ci")
    ranked = ex.withColumn("__keep", F.row_number().over(w) == 1)
    return _chunk_reassemble(ranked, id_col, "text_dedup")


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
    per = _spread(df).groupBy(group_col).agg(
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


def normalize_text(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical text normalization (the pre-dedup step of every corpus
    pipeline): lowercase, strip non-alphanumeric punctuation to spaces,
    collapse whitespace runs, trim. Pure regexp/lower expressions —
    zero shuffle, scan-fused, and portable (same RE2/Java semantics)
    so normalized-form dedup keys match across engines."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return _spread(df).select(
        F.col(id_col),
        norm.alias("text_norm"),
        F.length(norm).alias("n_chars_norm"),
    )


def chunk_freq_dedup(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    width: int = 4,
    max_df: int = 1,
) -> DataFrame:
    """Frequency-thresholded chunk removal — the RefinedWeb/MassiveText
    line-dedup rule adapted to unstructured text: a chunk occurring
    more than ``max_df`` times corpus-wide is boilerplate (cookie
    banners, navigation, license headers) and EVERY copy is removed —
    unlike ``chunk_dedup``, which keeps the first occurrence. With
    ``max_df=1`` any repeated chunk disappears entirely.

    Same scale shape as chunk_dedup (shared _chunk_explode /
    _chunk_reassemble): one shuffle on chunk text for the corpus-wide
    count, one on doc id for reassembly. The keep rule is a windowed
    count (no ordering — a frame-less count over the chunk partition),
    so the decision is order-independent and deterministic."""
    ex = _chunk_explode(df, text, id_col, width)
    w = Window.partitionBy("__chunk")
    ranked = ex.withColumn("__keep", F.count(F.lit(1)).over(w) <= max_df)
    return _chunk_reassemble(ranked, id_col, "text_clean")


def duplication_report(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    width: int = 4,
) -> DataFrame:
    """Per-group duplication health report — the scan you read BEFORE
    choosing dedup thresholds: per ``group_col``, document count, chunk
    count, corpus-duplicated chunk count (df > 1 anywhere, not just
    within the group) and their ratio. Same two bounded shuffles as the
    chunk-dedup operators (content-keyed frame-less count, doc->group
    rollup); the ratio is one division of exact integers. Documents
    with zero chunks (empty text) are excluded."""
    ex = _chunk_explode(df, text, id_col, width)
    w = Window.partitionBy("__chunk")
    flagged = ex.withColumn("__df", F.count(F.lit(1)).over(w))
    per_doc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("__df") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup"),
    )
    joined = per_doc.join(df.select(id_col, group_col), id_col)
    return joined.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chunks").cast("bigint").alias("n_chunks"),
        F.sum("n_dup").cast("bigint").alias("n_dup_chunks"),
        (
            F.sum("n_dup").cast("double") / F.sum("n_chunks").cast("double")
        ).alias("dup_ratio"),
    )


def adaptive_threshold_filter(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    q: float = 0.25,
    p: float = 0.25,
    id_col: str = "doc_id",
    salt: str = "",
    thr_out: str | None = None,
) -> DataFrame:
    """Percentile-adaptive corpus gate: per group, drop rows whose
    ``value_col`` falls below the group's q-quantile — thresholds that
    FOLLOW each source's own score distribution instead of one global
    magic number (a web source and a books source have incomparable
    quality scales; a fixed cut over- or under-prunes one of them).

    The quantile is an exact type-1 order statistic computed over a
    mergeable ``hash_sample`` of rate ``p`` (error ~1/sqrt(p·n) per
    group), NOT over the full corpus — so the only per-group window
    runs on the sample, and the thresholds relation (one row per
    group) joins back as a broadcast feeding a narrow filter. Fully
    deterministic end-to-end: hash-membership sample + rank-selected
    data value + one comparison. ``thr_out`` keeps the applied
    threshold as an output column.

    Group-edge policy (explicit by design): the thresholds attach is a
    NULL-SAFE LEFT join (`profiling.attach_broadcast`), so (a) a NULL
    group is a real group that keeps its own threshold, and (b) a
    group that drew zero rows in the rate-``p`` sample has no
    threshold and is KEPT WHOLE (NULL threshold ⇒ no cut) — an
    unsampled group is evidence the group is tiny, not that its rows
    are bad. NULL ``value_col`` rows PASS THROUGH in every group
    (same policy as ``winsorize``): a missing score is not evidence of
    low quality, and retention must not depend on whether the row's
    group happened to be sampled."""
    from svoe_spark.operators.curation import hash_sample
    from svoe_spark.operators.profiling import attach_broadcast, order_statistics

    s = hash_sample(df, id_col=id_col, p=p, salt=salt)
    thr = order_statistics(
        s, value_col, [q], group_cols=group_cols, out="__thr"
    ).drop("q")
    out = attach_broadcast(df, thr, group_cols, how="left").where(
        F.col("__thr").isNull()
        | F.col(value_col).isNull()
        | (F.col(value_col) >= F.col("__thr"))
    )
    if thr_out is not None:
        return out.withColumnRenamed("__thr", thr_out)
    return out.drop("__thr")


def winsorize(
    df: DataFrame,
    value_col: str,
    q_low: float = 0.01,
    q_high: float = 0.99,
    group_cols: list[str] | None = None,
    out: str | None = None,
) -> DataFrame:
    """Winsorization — clip an integer column to its per-group
    [q_low, q_high] empirical quantiles (the standard heavy-tail
    treatment before training on a numeric feature). Both cut points
    are exact type-1 order statistics (`profiling.order_statistics`),
    so the clipped values are actual data values and the whole
    transform is bit-portable; NULL values pass through unclipped.

    Scale shape: one ranked pass for the two order statistics (run on
    the full column here — compose with `curation.hash_sample` first
    when the group is unbounded, exactly like
    `adaptive_threshold_filter`), a |groups|-row pivot broadcast back,
    and a narrow clip projection.
    """
    from svoe_spark.operators.profiling import attach_broadcast, order_statistics

    groups = list(group_cols or [])
    out = out or f"{value_col}_w"
    cuts = order_statistics(
        df, value_col, [q_low, q_high], groups, out="__cut"
    )
    lo_q = F.min(F.when(F.col("q") == q_low, F.col("__cut")))
    hi_q = F.min(F.when(F.col("q") == q_high, F.col("__cut")))
    wide = cuts.groupBy(*groups).agg(
        lo_q.alias("__lo"), hi_q.alias("__hi")
    )
    # LEFT attach: a group whose value_col is entirely NULL has no
    # cuts row (order_statistics excludes NULLs) — the transform must
    # still preserve those rows (their clip is NULL anyway)
    joined = attach_broadcast(df, wide, groups, prefix="__w_", how="left")
    v = F.col(value_col)
    # greatest/least SKIP nulls, so an unguarded clip would rewrite a
    # NULL value to the low cut — guard to keep the pass-through
    clipped = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    )
    return joined.withColumn(out, clipped).drop("__lo", "__hi")
