"""Lexical retrieval over a document corpus: inverted index + BM25
top-k (Robertson & Zaragoza 2009, "The Probabilistic Relevance
Framework: BM25 and Beyond").

Beyond-reference layer (SURVEY §2.13): quality-targeted retrieval is a
standard step in training-data curation (e.g. pulling documents that
match a trusted query set). Everything is relational — the inverted
index is one explode + groupBy, candidate generation is a broadcast
join of the (tiny) query-term side against the postings relation, and
scoring is pure column arithmetic — so at 100 TB the index build is a
single shuffle on term and Catalyst keeps the whole scoring pipeline
inside whole-stage codegen.

Determinism contract (see svoe_spark/queries.py): the per-term BM25
contribution is one fixed expression tree over exact integers (tf, df,
dlen, corpus totals) and round-tripped float constants, and the
per-document score is a fold-left over the TERM-SORTED contribution
list — so Spark and the DuckDB oracle produce bit-identical doubles.
The default idf is the log-free odds ratio (N - df + 0.5)/(df + 0.5)
(the quantity BM25 takes the log of): ln() differs by 1 ulp across
libm implementations, and the rational form preserves the ranking for
single-term queries while keeping multi-term scores reproducible
across engines. Pass ``log_idf=True`` for textbook BM25 when
cross-engine bit-parity is not required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from svoe_spark.functions.text import tokens
from svoe_spark.operators.util import spread

BM25_K1 = 1.2
BM25_B = 0.75


def inverted_index(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Postings relation (term, <id>, tf, dlen, df).

    One explode + one groupBy on (term, id) builds the postings; df is
    a window count over the term-shuffled relation (no self-join, no
    second scan of the corpus). ``max_df`` drops stop-term posting
    lists — on a web-scale corpus the few hundred most common terms
    own posting lists with ~every document in them, which is both the
    storage bottleneck and the join-skew bottleneck; capping df is the
    standard fix and changes no ranking that involves a discriminative
    term.
    """
    toks = tokens(text)
    ex = (
        spread(docs)
        .select(F.col(id_col), toks.alias("__toks"))
        .select(
            F.col(id_col),
            F.size("__toks").alias("dlen"),
            F.explode("__toks").alias("term"),
        )
    )
    postings = ex.groupBy("term", id_col).agg(
        F.count(F.lit(1)).alias("tf"), F.first("dlen").alias("dlen")
    )
    wdf = Window.partitionBy("term")
    postings = postings.withColumn("df", F.count(F.lit(1)).over(wdf))
    if max_df is not None:
        postings = postings.filter(F.col("df") <= max_df)
    return postings


def _bm25_contrib(
    tf: Column,
    df: Column,
    dlen: Column,
    n_docs: Column,
    total_len: Column,
    k1: float,
    b: float,
    log_idf: bool,
) -> Column:
    """One BM25 term contribution as a FIXED expression tree — the SQL
    mirror (`sql_bm25_contrib`) renders the identical tree, token for
    token, so the doubles match bitwise."""
    idf = (n_docs - df + F.lit(0.5)) / (df + F.lit(0.5))
    if log_idf:
        idf = F.log(idf + F.lit(1.0))
    den = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * dlen * n_docs / total_len
    )
    return idf * ((tf * F.lit(k1 + 1.0)) / den)


def sql_bm25_contrib(
    tf: str,
    df: str,
    dlen: str,
    n_docs: str,
    total_len: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB mirror of `_bm25_contrib` (rational-idf form). Float
    constants are embedded via repr() AND cast to DOUBLE — DuckDB
    parses bare decimal literals as DECIMAL and would run part of the
    tree in exact decimal arithmetic, drifting 1 ulp from Spark."""

    def dbl(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    half = dbl(0.5)
    idf = f"(({n_docs} - {df} + {half}) / ({df} + {half}))"
    den = (
        f"({tf} + {dbl(k1)} * ({dbl(1.0 - b)} + {dbl(b)} * {dlen} * {n_docs}"
        f" / {total_len}))"
    )
    return f"{idf} * (({tf} * {dbl(k1 + 1.0)}) / {den})"


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_df: int | None = None,
    text: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
    log_idf: bool = False,
) -> DataFrame:
    """Top-k documents per query by BM25.

    Returns (query_id, <id>, score, rank), rank 1-based, ties broken
    by ascending <id>.

    Scale shape: the query side is term-exploded and BROADCAST (a
    query workload is tiny next to the corpus), so candidate
    generation adds no shuffle on the postings relation; scoring
    regroups candidates once on (query, doc). The final top-k is a
    per-query window — each query's candidate set is bounded by the
    union of its terms' posting lists, which ``max_df`` keeps free of
    stop-term blowup. The per-document score folds the term-sorted
    contribution list left-to-right so float addition order is
    deterministic (see module docstring).
    """
    idx = inverted_index(docs, text=text, id_col=id_col, max_df=max_df)
    stats = docs.select(tokens(text).alias("__t")).agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum(F.size("__t")).alias("__total_len"),
    )
    qterms = queries.select(
        F.col(qid_col),
        F.explode(F.array_distinct(tokens(qtext_col))).alias("term"),
    )
    matched = (
        idx.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(qid_col),
            F.col(id_col),
            F.col("term"),
            _bm25_contrib(
                F.col("tf"),
                F.col("df"),
                F.col("dlen"),
                F.col("__n_docs"),
                F.col("__total_len"),
                k1,
                b,
                log_idf,
            ).alias("__contrib"),
        )
    )
    scored = (
        matched.groupBy(qid_col, id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("term", "__contrib"))
            ).alias("__cs")
        )
        .select(
            F.col(qid_col),
            F.col(id_col),
            F.aggregate(
                F.col("__cs"),
                F.lit(0.0),
                lambda acc, s: acc + s["__contrib"],
            ).alias("score"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "score", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: int = 60,
    qid_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    out: str = "rrf_score",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of N ranked
    lists: score(d) = Σ_i 1/(c + rank_i(d)), summed in LIST ORDER over
    the lists that retrieved d — the standard way to combine lexical
    (BM25) and dense (ANN) retrieval without score calibration, since
    it reads only ranks, never incomparable raw scores.

    Returns (query_id, doc_id, rrf_score, rank) with rank 1-based,
    ties broken by ascending id. Determinism: each term is a single
    IEEE division by an integer and the N-term sum is one fixed
    left-to-right expression tree (no SUM aggregate whose order could
    float), so the fused score is bit-portable. Scale shape: ranked
    lists are k-bounded per query, so the N-1 full-outer joins and the
    per-query ranking window all run on relations of size
    |queries| * k — negligible next to retrieval itself.
    """
    sides = [
        r.select(
            qid_col, id_col, F.col(rank_col).alias(f"__r{i}")
        )
        for i, r in enumerate(rankings)
    ]
    fused = sides[0]
    for s in sides[1:]:
        fused = fused.join(s, [qid_col, id_col], "full_outer")
    score = None
    for i in range(len(sides)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(f"__r{i}")), F.lit(0.0)
        )
        score = term if score is None else score + term
    w = Window.partitionBy(qid_col).orderBy(F.desc(out), F.asc(id_col))
    return (
        fused.withColumn(out, score)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(qid_col, id_col, out, "rank")
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k keywords per document by df-normalized term frequency
    (score = tf / df — the rational tf-idf variant: monotone in tf and
    in 1/df like tf*idf, but ONE IEEE double division instead of a
    transcendental log, so any engine reproduces the scores and
    ranking bit-for-bit; a log-idf tie to a different base reorders
    nothing within a document when tf is equal anyway). Ties break on
    the token, so the k rows are fully deterministic.

    Composes the `inverted_index` postings (one explode + one groupBy
    + one term-window df); the per-doc top-k is a WindowGroupLimit —
    applied per task before the doc exchange, so no document's full
    term list is ever sorted at one reducer."""
    postings = inverted_index(docs, text=text, id_col=id_col)
    score = F.col("tf").cast("double") / F.col("df").cast("double")
    w = Window.partitionBy(id_col).orderBy(F.desc("__score"), F.col("term"))
    return (
        postings.withColumn("__score", score)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.col("__score").alias("score"),
            F.col("__rn").alias("rank"),
        )
    )
