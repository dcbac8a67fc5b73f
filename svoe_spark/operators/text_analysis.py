"""Text analysis for training-data pipelines: token statistics, quality
scoring, language-ID heuristic, and document fingerprinting.

Pure column expressions (no UDFs): at 100 TB these run fused with the
scan, and column pruning means only `text` is ever read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from svoe_spark.functions.text import md5_hash, tokens
from svoe_spark.operators.util import spread as _spread

# shared with the SQL oracle generator — keep sorted & lowercase
EN_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "in", "is", "it", "of", "on", "or", "that", "the", "to",
    "was", "with",
)
BPE_CHARS_PER_TOKEN = 4  # crude BPE estimate: ~4 chars/token


def token_stats(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counts: whitespace tokens, distinct tokens, a BPE-ish
    estimate (ceil(chars/4)), and mean token length."""
    toks = tokens(text)
    n_tok = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.expr(
            f"(length({text}) + {BPE_CHARS_PER_TOKEN - 1}) DIV {BPE_CHARS_PER_TOKEN}"
        ).alias("n_bpe_tokens_est"),
        F.when(n_tok > 0, sum_len / n_tok).alias("mean_token_len"),
    )


def quality_score(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality features + a combined score: length, stopword
    ratio (fluency proxy), distinct-token ratio (repetition proxy)."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    n_distinct = F.size(F.array_distinct(toks))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    distinct_ratio = F.when(n_tok > 0, n_distinct / n_tok).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        F.length(text).alias("n_chars"),
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        (stop_ratio * 0.5 + distinct_ratio * 0.5).alias("quality_score"),
    )


def lang_id(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", threshold: float = 0.05
) -> DataFrame:
    """Stopword-density language heuristic: density of English function
    words over the token stream; >= threshold classifies 'en'. (A real
    deployment plugs fasttext/cld3 in as a pandas UDF behind the same
    signature; the heuristic keeps the operator self-contained and
    oracle-checkable.)"""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    density = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        density.alias("en_density"),
        F.when(density >= threshold, F.lit("en")).otherwise(F.lit("other")).alias(
            "lang_guess"
        ),
    )


def fingerprint(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", fast: bool = False
) -> DataFrame:
    """Whole-document rolling-hash fingerprint (content identity key —
    reference uses joblib content hashes for block identity,
    df_utils.py:163-164 / feature_tree.py:76-89)."""
    h = F.xxhash64(F.col(text)) if fast else md5_hash(text)
    return _spread(df).select(
        F.col(id_col), h.alias("fingerprint"), F.length(text).alias("n_chars_fp")
    )


def lang_id_ngram(
    df: DataFrame,
    labeled: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    top: int = 20,
) -> DataFrame:
    """Char-trigram-profile language ID (the classic n-gram classifier,
    upgraded from the stopword-density heuristic): build the top-``top``
    trigram profile per language from a labeled sample, score each
    document by distinct-trigram overlap with every profile, predict
    the argmax language (ties -> lexicographically first).

    Fully relational: one groupBy builds the profiles (a tiny,
    broadcastable relation — languages x top rows), one equi-join on
    packed-int trigrams + a per-doc argmax scores the corpus. At 100 TB
    the profile build runs on a sample; scoring is one broadcast-join
    pass. Documents sharing no profile trigram are unclassified (absent
    from the output)."""
    from pyspark.sql import Window

    from svoe_spark.functions.text import char_shingles

    prof_rows = labeled.select(
        F.col(lang_col).alias("lang"),
        F.explode(F.array_distinct(char_shingles(text))).alias("sh"),
    )
    counts = prof_rows.groupBy("lang", "sh").agg(F.count(F.lit(1)).alias("n"))
    wp = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("sh").asc())
    prof = (
        counts.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= top)
        .select("lang", "sh")
    )
    doc_tri = _spread(df).select(
        F.col(id_col), F.explode(F.array_distinct(char_shingles(text))).alias("sh")
    )
    overlap = (
        doc_tri.join(F.broadcast(prof), "sh")
        .groupBy(id_col, "lang")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    wd = Window.partitionBy(id_col).orderBy(F.col("o").desc(), F.col("lang").asc())
    return (
        overlap.withColumn("rk", F.row_number().over(wd))
        .filter(F.col("rk") == 1)
        .select(
            F.col(id_col),
            F.col("lang").alias("pred_lang"),
            F.col("o").alias("n_profile_trigrams"),
        )
    )


def token_rarity(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    rare_max: int = 2,
) -> DataFrame:
    """Corpus-statistics rarity signals per document (the CCNet-style
    LM-scoring stage, with exact arithmetic instead of a log-prob:
    `ln` differs by 1 ulp across engines, division does not):

    * mean_inv_prob — arithmetic mean over the document's tokens of
      1/p(token) under the corpus unigram distribution (= N_total /
      count(token)); high values = rare-token-heavy documents (the
      proxy for high perplexity).
    * n_rare_tokens — tokens whose corpus count is <= ``rare_max``.

    Deterministic bit-for-bit: the per-token inverse probabilities are
    folded IN DOCUMENT ORDER (collect_list(struct(pos, val)) +
    array_sort + fold), so the float sum has one defined association
    order on any partitioning and in any engine.

    Scale shape: one explode shuffle to count tokens, one join of
    occurrences to the (vocab-sized, usually broadcastable) count
    relation, one doc-id groupBy. All keys narrow; stop-token skew
    lands on the count join's build side, not on a hot shuffle key.
    """
    from pyspark.sql import Window

    ex = _spread(df).select(
        F.col(id_col), F.posexplode(tokens(text)).alias("__pos", "__tok")
    )
    # persist the (vocab-sized, aggregated) count relation: it feeds
    # both the total-token aggregate and the occurrence join — without
    # it the scan+tokenize+explode subtree re-executes per use. The
    # exploded occurrences themselves stay uncached (caching them
    # would pin the whole tokenized corpus); handle exposed as
    # result._svoe_persisted per the library convention.
    cnt = ex.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c")).persist()
    total = cnt.agg(F.sum("__c").alias("__n")).select(
        F.col("__n").cast("double").alias("__n")
    )
    scored = (
        ex.join(cnt, "__tok")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            "__pos",
            (F.col("__n") / F.col("__c")).alias("__inv"),
            (F.col("__c") <= rare_max).cast("int").alias("__rare"),
        )
    )
    arr = F.array_sort(F.collect_list(F.struct("__pos", "__inv")))
    fold = F.aggregate(arr, F.lit(0.0), lambda a, s: a + s["__inv"])
    out = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (fold / F.count(F.lit(1))).alias("mean_inv_prob"),
        F.sum("__rare").alias("n_rare_tokens"),
    )
    out._svoe_persisted = cnt
    return out


def bigram_model(
    df: DataFrame, text: str = "text", top: int = 50
) -> DataFrame:
    """Corpus bigram model: the ``top`` most frequent token bigrams with
    exact conditional probability p(b|a) = count(a,b)/count(a) — the
    training step of an n-gram LM as two aggregations (bigram counts,
    unigram counts) and a broadcast-sized join. Ties rank by bigram
    text so the cut is deterministic. Exact integer/real arithmetic
    only (oracle-portable). The top-k cut is a distributed
    orderBy+limit (TakeOrdered — per-partition heaps, never a global
    single-task window), so it survives a vocab^2-sized bigram
    relation."""
    toks = tokens(text)
    n = F.size(toks)
    n1 = F.greatest(n - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    ex = _spread(df).select(F.explode(grams).alias("g")).select("g.a", "g.b")
    bg = ex.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    ug = bg.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    return (
        bg.join(ug, "a")
        .orderBy(F.col("n_ab").desc(), F.col("a"), F.col("b"))
        .limit(top)
        .select(
            "a",
            "b",
            "n_ab",
            "n_a",
            (F.col("n_ab") / F.col("n_a")).alias("p_b_given_a"),
        )
    )


# --------------------------------------------------------------------------
# Linear quality classifier (fastText-style hashed bag-of-words)
# --------------------------------------------------------------------------

QC_BUCKETS = 64


def default_classifier_weights(buckets: int = QC_BUCKETS) -> list[float]:
    """Deterministic stand-in weight vector (dyadic rationals, so the
    decimal literals parse to EXACTLY the same doubles in any engine):
    w_i = ((i * 2654435761) mod 2048 - 1024) / 1024. A production
    pipeline drops in trained weights (e.g. from a logistic fit);
    the operator's value is the distributed scoring plumbing, which is
    identical either way."""
    return [
        ((i * 2654435761) % 2048 - 1024) / 1024.0 for i in range(buckets)
    ]


def hashed_bow_logit(th, n, weights: list[float], bias: float):
    """THE fastText-shaped scoring fold, single-source: logit = bias +
    (1/n) * sum_t w[hash(t) mod B], folded left-to-right over the hash
    array ``th`` with ``n`` tokens; empty docs score the bare bias.
    Both ``quality_classifier`` and ``cleaning.corpus_filter`` build
    their logit from this one expression, so the hash family, fold
    order, and empty-doc policy can never diverge between the scorer,
    the gate, and the DuckDB oracles that replay them."""
    if not weights:
        raise ValueError("hashed_bow_logit: empty weight vector")
    # one parsed literal: F.lit on a Python list recurses element-wise
    # through py4j (~B round trips for the weight table)
    from svoe_spark.operators.util import lit_double_array

    warr = lit_double_array(float(x) for x in weights)
    b = len(weights)
    dot = F.aggregate(
        th,
        F.lit(0.0),
        lambda acc, h: acc + F.element_at(warr, (h % b + 1).cast("int")),
    )
    return (
        F.when(n > 0, F.lit(float(bias)) + dot / n.cast("double"))
        .otherwise(F.lit(float(bias)))
    )


def quality_classifier(
    docs: DataFrame,
    weights: list[float] | None = None,
    bias: float = 0.0,
    threshold: float = 0.0,
    text: str = "text",
    id_col: str = "doc_id",
    passthrough: bool = False,
) -> DataFrame:
    """Model-based quality scoring, fastText-shaped (Joulin et al.,
    "Bag of Tricks for Efficient Text Classification", EACL 2017 — the
    architecture behind the GPT-3/CCNet-style quality filters): hashed
    bag-of-words features, mean-pooled, dotted with a weight vector.

    Instead of materializing the histogram, the dot product folds
    directly over the token hashes — score = bias + (1/n) * sum_t
    w[hash(t) mod B] — O(tokens) per doc, one array fold inside the
    scan, ZERO shuffle. The weight table is a broadcast literal; at
    100 TB this is a map-only pass. The fold order is document order
    on both engines, so scores are bit-identical (the squash stays
    linear — no exp/sigmoid, which is not bit-portable; thresholding a
    logit is equivalent to thresholding the sigmoid).

    Returns (id, n_tokens, logit, keep); with ``passthrough=True`` the
    input columns ride along instead (the streaming-composable form —
    a pure projection needs no post-hoc join, which a stream could not
    do without watermarked join keys)."""
    w = weights if weights is not None else default_classifier_weights()
    if not w:
        raise ValueError("quality_classifier: empty weight vector")
    from svoe_spark.functions.text import token_hashes

    carry = [c for c in docs.columns if c != id_col] if passthrough else []
    t = _spread(docs).select(
        F.col(id_col),
        *carry,
        F.explode(F.array(token_hashes(text))).alias("__th"),
    )
    scored = t.select(
        id_col,
        *carry,
        F.size("__th").cast("long").alias("n_tokens"),
        hashed_bow_logit(F.col("__th"), F.size("__th"), w, bias).alias(
            "logit"
        ),
    )
    return scored.withColumn("keep", F.col("logit") >= F.lit(float(threshold)))


def bigram_surprise(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean inverse CONDITIONAL bigram probability — the
    bigram upgrade of `token_rarity`'s unigram perplexity proxy (the
    CCNet-style LM filter, exact arithmetic: 1/p(b|a) = n_a/n_ab needs
    only division, which is bit-portable where ln is not). High values
    = documents whose word TRANSITIONS are unusual for the corpus —
    catches shuffled/templated text that unigram rarity cannot.

    Folded in document order (collect_list + array_sort + fold, the
    token_rarity pattern), so the float sum has one defined association
    order on any partitioning and in any engine.

    Scale shape: ONE tokenize pass — the corpus counts are window
    counts over the exploded pair stream itself (count over (a,b) =
    n_ab; count over (a) = n_a, since every occurrence with head `a`
    is one pair), so unlike an aggregate-then-join form the expensive
    tokenize+explode lineage is never recomputed. Three narrow-key
    shuffles total ((a,b), (a), doc id). Docs with < 2 tokens emit
    nothing (no bigrams)."""
    t = _spread(df).select(F.col(id_col), tokens(text).alias("__t")).where(
        F.size("__t") >= 2
    )
    pairs = t.select(
        F.col(id_col),
        F.posexplode(
            F.arrays_zip(
                F.slice(F.col("__t"), 1, F.size("__t") - 1).alias("a"),
                F.slice(F.col("__t"), 2, F.size("__t") - 1).alias("b"),
            )
        ).alias("__pos", "__ab"),
    ).select(
        id_col, "__pos", F.col("__ab.a").alias("__a"), F.col("__ab.b").alias("__b")
    )
    from pyspark.sql import Window

    w_ab = Window.partitionBy("__a", "__b")
    w_a = Window.partitionBy("__a")
    scored = (
        pairs.withColumn("__nab", F.count(F.lit(1)).over(w_ab))
        .withColumn("__na", F.count(F.lit(1)).over(w_a))
        .select(
            id_col,
            "__pos",
            (F.col("__na").cast("double") / F.col("__nab")).alias("__inv"),
        )
    )
    arr = F.array_sort(F.collect_list(F.struct("__pos", "__inv")))
    fold = F.aggregate(arr, F.lit(0.0), lambda a, s: a + s["__inv"])
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (fold / F.count(F.lit(1))).alias("mean_inv_cond_prob"),
    )


def train_quality_classifier(
    docs: DataFrame,
    label_col: str = "label",
    text: str = "text",
    buckets: int = QC_BUCKETS,
    reg_param: float = 1e-6,
    max_iter: int = 200,
) -> tuple[list[float], float]:
    """Fit the weight vector ``quality_classifier`` scores with — the
    training half of the fastText-shaped filter (Joulin 2017): the
    feature map is EXACTLY the scorer's algebra (mean-pooled hashed
    bag-of-words: x_j = |{t: hash(t) mod B = j}| / n_tokens, so
    logit = bias + w·x is literally the scoring fold), fitted with
    SparkML LogisticRegression. Returns (weights, bias) ready to pass
    to ``quality_classifier(weights=..., bias=...)``.

    ``reg_param`` defaults NONZERO on purpose: on linearly separable
    labels the unregularized MLE diverges, so maxIter-truncated weights
    would depend on gradient summation order (partition layout, core
    count). L2 regularization makes the optimum unique and the fit
    reproducible. The default is deliberately TINY (1e-6): the
    mean-pooled features live on a 1/n_tokens scale, so a stronger
    penalty shrinks the signal bucket below separability (measured on
    the planted-label fixture: held-out AUC 0.63 at 1e-4, 0.83 at
    1e-5, 0.98 at 1e-6 — all layout-stable). Compare frozen artifacts
    with a grid-scale tolerance, not exact equality, all the same.

    Freeze trained weights through ``quantize_weights`` before
    embedding them in cross-engine artifacts: dyadic rationals
    round-trip decimal literals exactly in every engine (same contract
    as ``default_classifier_weights``)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    from svoe_spark.functions.text import token_hashes

    base = docs.where(F.col(label_col).isNotNull()).select(
        F.col(label_col).cast("double").alias("label"),
        token_hashes(text).alias("__th"),
    )
    n = F.size("__th")
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(buckets - 1)),
        lambda j: F.when(
            n > 0,
            F.size(F.filter(F.col("__th"), lambda h: h % buckets == j))
            / n.cast("double"),
        ).otherwise(F.lit(0.0)),
    )
    train = base.select(
        "label", array_to_vector(dense.cast("array<double>")).alias("features")
    )
    model = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    ).fit(train)
    return [float(x) for x in model.coefficients], float(model.intercept)


def quantize_weights(
    weights: list[float], bias: float, bits: int = 20
) -> tuple[list[float], float]:
    """Snap weights to dyadic rationals (multiples of 2^-bits): the
    decimal literals of dyadic rationals parse to exactly the same
    doubles in any engine, which is what makes a frozen trained
    artifact oracle-checkable bit-for-bit. 2^-20 ~ 1e-6 — far below
    any meaningful logit resolution."""
    s = float(1 << bits)
    return [round(x * s) / s for x in weights], round(bias * s) / s


def mixed_language_flags(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.05,
) -> DataFrame:
    """Chunk-level language consistency: split each document into its
    two token halves, language-ID each with the same stopword-density
    heuristic as `lang_id`, and flag documents whose halves disagree —
    the code-switch / boilerplate-contamination signal whole-document
    lang-ID misses (a half-English half-X page averages to a confident
    wrong label; per-chunk voting catches it, cf. CCNet's paragraph-
    level scoring). One zero-shuffle projection; swap in more/smaller
    chunks or a real classifier behind the same signature at will."""
    toks = tokens(text)
    n = F.size(toks)
    half = F.floor(n / 2).cast("int")
    a = F.slice(toks, F.lit(1), half)
    b = F.slice(toks, half + 1, (n - half).cast("int"))

    def density(part):
        cnt = F.size(F.filter(part, lambda t: t.isin(*EN_STOPWORDS)))
        return F.when(F.size(part) > 0, cnt / F.size(part)).otherwise(F.lit(0.0))

    da, db = density(a), density(b)
    la = F.when(da >= threshold, F.lit("en")).otherwise(F.lit("other"))
    lb = F.when(db >= threshold, F.lit("en")).otherwise(F.lit("other"))
    return _spread(df).select(
        F.col(id_col),
        da.alias("en_density_a"),
        db.alias("en_density_b"),
        la.alias("lang_a"),
        lb.alias("lang_b"),
        # a 1-token doc has an EMPTY first half (density 0 -> 'other'),
        # which would flag every single-stopword doc as code-switched —
        # mixing needs two non-empty halves
        ((n >= 2) & (la != lb)).alias("is_mixed"),
    )


def collocations(
    df: DataFrame,
    text: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k corpus collocations by rational lift — PMI's argument
    without the log: lift(a,b) = N * n_ab / (n_a * n_b) over the
    adjacent-pair stream (n_a = pairs headed by a, n_b = pairs tailed
    by b, N = all pairs). log is monotone, so ranking by lift IS
    ranking by PMI, and the integer products + ONE double division are
    bit-portable where ln is not (the tfidf_keywords trade). Rare-pair
    noise is cut by ``min_count``; ties break on (a, b).

    Scale shape: one tokenize+explode pass, one (a,b) count with
    map-side combine, two tiny marginal aggregates broadcast back, a
    TakeOrdered top-k. Overflow: N * n_ab needs int64 headroom — at
    ~1e9+ corpus pairs swap the products to decimal(38,0)."""
    t = _spread(df).select(tokens(text).alias("__t")).where(F.size("__t") >= 2)
    pairs = t.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("__t"), 1, F.size("__t") - 1).alias("a"),
                F.slice(F.col("__t"), 2, F.size("__t") - 1).alias("b"),
            )
        ).alias("__ab")
    ).select(F.col("__ab.a").alias("a"), F.col("__ab.b").alias("b"))
    # materialize the pair counts ONCE: bg feeds FOUR subtrees (the
    # main branch + three broadcast marginals), and each broadcast side
    # is its own job — unpersisted, the tokenize+explode+count pipeline
    # re-ran per side (measured: four sequential full-corpus stages at
    # sf0.1). The relation is distinct-pair-sized (already aggregated),
    # far smaller than the token stream it summarizes.
    bg = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .localCheckpoint(eager=True)
    )
    na = bg.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    nb = bg.groupBy("b").agg(F.sum("n_ab").alias("n_b"))
    n = bg.agg(F.sum("n_ab").alias("n_pairs"))
    lift = (F.col("n_pairs") * F.col("n_ab")).cast("double") / (
        F.col("n_a") * F.col("n_b")
    ).cast("double")
    return (
        bg.where(F.col("n_ab") >= min_count)
        .join(F.broadcast(na), "a")
        .join(F.broadcast(nb), "b")
        .crossJoin(F.broadcast(n))
        .select("a", "b", "n_ab", "n_a", "n_b", lift.alias("lift"))
        .orderBy(F.desc("lift"), "a", "b")
        .limit(k)
    )
