"""LLM-data-pipeline queries (dedup / similarity / text analysis) with
code-generated DuckDB oracles.

The oracle SQL is generated from the SAME Python constants (hash
coefficients, hyperplane patterns, stopword lists) as the Spark
implementation, and both sides express every floating reduction as the
same fold-left — so results are bit-identical (see the determinism
contract in svoe_spark/queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from svoe_spark.functions.text import (
    P_HASH,
    sql_char_shingles,
    sql_codepoints,
    sql_kgram_hashes,
    sql_md5_hash,
    sql_md5_tokens,
    sql_token_hashes_from_digests,
    sql_token_hashes,
    sql_tokens,
    sql_word_shingles_from_hashes,
)
from svoe_spark.operators.multimodal import (
    HIST_BINS,
    attach_payload,
    byte_features,
    frame_sample,
)
from svoe_spark.functions.vectors import hyperplane_signs, sql_cosine, sql_signed_projection
from svoe_spark.operators.dedup import (
    SIMHASH_BITS,
    MinHashParams,
    exact_duplicate_groups,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from svoe_spark.operators.similarity import (
    DEFAULT_PLANES,
    ann_ivf_topk,
    ann_lsh_topk,
    brute_force_topk,
    embedding_neardup_pairs,
)
from svoe_spark.operators.text_analysis import (
    BPE_CHARS_PER_TOKEN,
    EN_STOPWORDS,
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)
from svoe_spark.queries import query
from svoe_spark.sources.tables import load_table

EMB_DIM = 64
_MH = MinHashParams()


@query(
    "doc_fingerprint",
    f"""
    SELECT doc_id, {sql_md5_hash('text')} AS fingerprint,
           length(text) AS n_chars_fp
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, "documents", sf_dir))


@query(
    "dedup_exact",
    f"""
    SELECT fingerprint, min(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM (
      SELECT doc_id, {sql_md5_hash('text')} AS fingerprint, length(text) AS lk
      FROM documents
    )
    GROUP BY fingerprint, lk
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_duplicate_groups(load_table(spark, "documents", sf_dir))


def _shingle_sql() -> str:
    """Word-trigram shingles from token hashes (mirrors doc_shingles)."""
    return sql_word_shingles_from_hashes("th")


def _minhash_sql() -> str:
    """WITH-clause SQL computing the same minhash signature."""
    ms = ",\n             ".join(
        f"list_min(list_transform(sh, x -> (CAST({a} AS BIGINT)*x + {b}) % {P_HASH})) AS m{i}"
        for i, (a, b) in enumerate(_MH.coefficients())
    )
    return f"""
    th AS (SELECT doc_id, {sql_token_hashes('text')} AS th FROM documents),
    shingled AS (SELECT doc_id, {_shingle_sql()} AS sh FROM th),
    sets AS (
      SELECT doc_id, list_distinct(sh) AS sset FROM shingled
    ),
    sigs AS (
      SELECT doc_id,
             {ms}
      FROM shingled
    ),
    bands AS (
      {" UNION ALL ".join(
        "SELECT %d AS band, %s AS bkey, doc_id FROM sigs"
        % (b, " || '_' || ".join(
            f"CAST(m{b * _MH.rows + r} AS VARCHAR)" for r in range(_MH.rows)))
        for b in range(_MH.bands)
      )}
    ),
    cands AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id
    )
    """


@query(
    "dedup_minhash_lsh",
    f"""
    WITH {_minhash_sql()}
    SELECT id_a, id_b,
           len(list_intersect(a.sset, b.sset)) /
             (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset))) AS jaccard
    FROM cands
    JOIN sets a ON cands.id_a = a.doc_id
    JOIN sets b ON cands.id_b = b.doc_id
    WHERE len(list_intersect(a.sset, b.sset)) /
          (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset))) >= 0.5
    """,
)
def _mh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-keyed verified MinHash pair relation (id_a, id_b,
    jaccard), persisted and materialized once per (session, sf_dir) —
    the _SUPPLY_EDGE_CACHE discipline applied to the pair generation
    that dedup_minhash_lsh / dedup_clusters / curation_pagerank_gate
    all rank or cluster (the signature cache is released once the tiny
    pair relation is materialized)."""

    def build():
        p = minhash_dedup_pairs(
            load_table(spark, "documents", sf_dir), params=_MH
        )
        out = p.persist()
        out.count()
        if hasattr(p, "_svoe_persisted"):
            p._svoe_persisted.unpersist()
        return out

    return _cached_chain(spark, sf_dir, "mh_pairs", build)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (16 hashes) + banded LSH (8x2) candidate generation,
    verified by true trigram-set Jaccard >= 0.5."""
    return _mh_pairs(spark, sf_dir)


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH th AS (
      SELECT doc_id, source, {sql_token_hashes('text')} AS th FROM documents
    ),
    sets AS (
      SELECT doc_id, source, list_distinct({_shingle_sql()}) AS s
      FROM th
    )
    SELECT a.source AS source, a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.s, b.s)) /
             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
    FROM sets a JOIN sets b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s)) /
          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs, blocked by source
    (max_doc_freq=None: the exact, uncapped form)."""
    return ngram_jaccard_pairs(
        load_table(spark, "documents", sf_dir),
        group_cols=["source"],
        threshold=0.5,
        max_doc_freq=None,
    )


@query(
    "dedup_ngram_jaccard_capped",
    f"""
    WITH th AS (SELECT doc_id, {sql_token_hashes('text')} AS th FROM documents),
    sets AS (SELECT doc_id, list_distinct({_shingle_sql()}) AS s FROM th),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sets),
    kept AS (
      SELECT doc_id, sh FROM (
        SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM ex
      ) WHERE df <= 10
    ),
    sized AS (
      SELECT doc_id, sh, count(*) OVER (PARTITION BY doc_id) AS sz FROM kept
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sa, b.sz AS sb,
             count(*) AS inter
      FROM sized a JOIN sized b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, inter / (sa + sb - inter) AS jaccard
    FROM pairs
    WHERE inter / (sa + sb - inter) >= 0.5
    """,
)
def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard with the stop-shingle document-frequency cap
    active (df <= 10): Jaccard over the sub-cap shingle universe — the
    100 TB skew-safe default path of ngram_jaccard_pairs, driven at a
    cap low enough that the fixtures actually exercise the exclusion.
    The oracle replicates the cap (windowed doc-frequency filter +
    post-filter set sizes), so the capped semantics are themselves
    hash-checked, not just the uncapped form."""
    return ngram_jaccard_pairs(
        load_table(spark, "documents", sf_dir), threshold=0.5, max_doc_freq=10
    )


def _simhash_sql() -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS)
    )
    return f"""
    toks AS (
      SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM documents
    ),
    hashes AS (
      SELECT doc_id, ({sql_md5_hash('tok')}) % {1 << SIMHASH_BITS} AS h FROM toks
    ),
    votes AS (
      SELECT doc_id, {votes} FROM hashes GROUP BY doc_id
    )
    SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes
    """


@query("dedup_simhash", "WITH " + _simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level SimHash fingerprints (30-bit)."""
    return simhash(load_table(spark, "documents", sf_dir))


_SW = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


@query(
    "text_token_stats",
    f"""
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct_tokens,
           (length(text) + {BPE_CHARS_PER_TOKEN - 1}) // {BPE_CHARS_PER_TOKEN}
             AS n_bpe_tokens_est,
           CASE WHEN len(toks) > 0
                THEN list_reduce(list_prepend(0, list_transform(toks, t -> length(t))),
                                 (acc, v) -> acc + v) / len(toks)
                ELSE NULL END AS mean_token_len
    FROM (SELECT doc_id, text, {sql_tokens('text')} AS toks FROM documents)
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(load_table(spark, "documents", sf_dir))


@query(
    "text_quality",
    f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len(toks) AS n_tokens,
           stop_ratio AS stopword_ratio,
           distinct_ratio,
           stop_ratio * 0.5 + distinct_ratio * 0.5 AS quality_score
    FROM (
      SELECT doc_id, text, toks,
             CASE WHEN len(toks) > 0
                  THEN len(list_filter(toks, t -> t IN ({_SW}))) / len(toks)
                  ELSE 0.0 END AS stop_ratio,
             CASE WHEN len(toks) > 0
                  THEN len(list_distinct(toks)) / len(toks)
                  ELSE 0.0 END AS distinct_ratio
      FROM (SELECT doc_id, text, {sql_tokens('text')} AS toks FROM documents)
    )
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(load_table(spark, "documents", sf_dir))


@query(
    "text_lang_id",
    f"""
    SELECT doc_id, en_density,
           CASE WHEN en_density >= 0.05 THEN 'en' ELSE 'other' END AS lang_guess
    FROM (
      SELECT doc_id,
             CASE WHEN len(toks) > 0
                  THEN len(list_filter(toks, t -> t IN ({_SW}))) / len(toks)
                  ELSE 0.0 END AS en_density
      FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents)
    )
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(load_table(spark, "documents", sf_dir))


@query(
    "multimodal_byte_features",
    f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           ord(substr(text, 1, 1)) AS first_byte,
           list_reduce(list_prepend(CAST(0 AS BIGINT), cp), (a, b) -> a + b) AS checksum,
           array_to_string(
             list_transform(range(0, {HIST_BINS}),
                            bin -> CAST(len(list_filter(cp, c -> c // {256 // HIST_BINS} = bin)) AS BIGINT)),
             ',') AS byte_hist
    FROM (SELECT doc_id, text, {sql_codepoints('text')} AS cp FROM documents)
    """,
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, oracle-checked end-to-end: text -> BINARY
    payload column -> Arrow-batched mapInPandas feature extraction
    (numpy over raw bytes). ASCII fixtures make bytes == codepoints, so
    DuckDB can verify the byte math exactly. The histogram is serialized
    to a CSV string for the comparison: the driver's canonicalizer sorts
    result columns through pandas, which cannot hash list-typed cells
    (CORRECTNESS_r03's crash on this query)."""
    docs = load_table(spark, "documents", sf_dir)
    feats = byte_features(attach_payload(docs))
    return feats.select(
        "doc_id",
        "n_bytes",
        "first_byte",
        "checksum",
        F.array_join(F.col("byte_hist").cast("array<string>"), ",").alias(
            "byte_hist"
        ),
    )


@query(
    "multimodal_frame_sample",
    """
    SELECT doc_id, frame_idx, n_frames,
           substr(text, frame_idx * 64 + 1, 64) AS frame_text
    FROM (
      SELECT doc_id, text,
             CAST(ceil(length(text) / 64.0) AS INT) AS n_frames,
             unnest(range(0, CAST(ceil(length(text) / 64.0) AS INT))) AS frame_idx
      FROM documents
    )
    WHERE frame_idx % 2 = 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling over binary payloads: chunk + every-nth
    sample, pure Spark expressions over the bytes."""
    docs = load_table(spark, "documents", sf_dir)
    frames = frame_sample(attach_payload(docs), frame_bytes=64, every_nth=2)
    return frames.select(
        "doc_id",
        "frame_idx",
        "n_frames",
        F.decode("frame", "utf-8").alias("frame_text"),
    )


@query(
    "ann_cosine_topk",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, {sql_cosine('embedding', 'qv')} AS cosine
    FROM embeddings, q
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the vec_id=0 query vector —
    the exact ANN baseline."""
    emb = load_table(spark, "embeddings", sf_dir)
    return brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=10)


def _lsh_bucket_sql(vec: str) -> str:
    bits = []
    for p in range(DEFAULT_PLANES):
        proj = sql_signed_projection(vec, hyperplane_signs(p, EMB_DIM))
        bits.append(f"CASE WHEN {proj} >= 0 THEN {1 << p} ELSE 0 END")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


@query(
    "ann_lsh_topk",
    f"""
    WITH b AS (
      SELECT vec_id, embedding, {_lsh_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT embedding AS qv, bucket AS qbucket FROM b WHERE vec_id = 0)
    SELECT vec_id, {sql_cosine('embedding', 'qv')} AS cosine
    FROM b, q
    WHERE b.bucket = q.qbucket
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN: scores only the query's bucket
    (~1/2^8 of the corpus)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return ann_lsh_topk(emb, emb.filter(F.col("vec_id") == 0), dim=EMB_DIM, k=10)


IVF_K = 16


@query(
    "ann_ivf_topk",
    f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF_K}
    ),
    a AS (
      SELECT e.vec_id, e.embedding, c.cid AS cluster_id
      FROM embeddings e, cents c
      QUALIFY row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY {sql_cosine('e.embedding', 'c.cv')} DESC, c.cid
      ) = 1
    ),
    q AS (SELECT embedding AS qv, cluster_id AS qc FROM a WHERE vec_id = 0)
    SELECT a.vec_id, {sql_cosine('a.embedding', 'qv')} AS cosine
    FROM a, q
    WHERE a.cluster_id = q.qc
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN, nprobe=1. Deterministic codebook = the first 16 vectors
    (stand-in for a pyspark.ml KMeans fit — assignment/probe is the
    operator; training is stock MLlib). Assignment is a shuffle-free
    argmax expression; the oracle derives the same assignment
    relationally (arg_max over a centroid cross join)."""
    emb = load_table(spark, "embeddings", sf_dir)
    cents = _ivf_cents(spark, sf_dir)
    return ann_ivf_topk(emb, emb.filter(F.col("vec_id") == 0), cents, k=10)


@query(
    "embedding_neardup",
    f"""
    WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
    SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
           {sql_cosine('a.embedding', 'b.embedding')} AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {sql_cosine('a.embedding', 'b.embedding')} >= 0.3
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked by an explicit label —
    the EXACT-within-block oracle variant (quadratic in the largest
    label block, so bounded block sizes only). The operator's default
    path, and the one to use at scale, is LSH-bucket blocking:
    `embedding_neardup_lsh` / `embedding_neardup_pairs(group_cols=None)`."""
    return embedding_neardup_pairs(
        load_table(spark, "embeddings", sf_dir), group_cols=["label"], threshold=0.3
    )


# ---------------------------------------------------------------------------
# Dataset curation (training-data pipeline: shuffle / split / packing)
# ---------------------------------------------------------------------------

_SHUF_KEY_SQL = sql_md5_hash("CAST(doc_id AS VARCHAR)")


@query(
    "dataset_shuffle_rank",
    f"""
    WITH keyed AS (SELECT doc_id, {_SHUF_KEY_SQL} AS k FROM documents)
    SELECT doc_id, CAST(row_number() OVER (ORDER BY k) - 1 AS BIGINT) AS shuffle_rank
    FROM keyed
    """,
)
def dataset_shuffle_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudo-random epoch ordering (md5-keyed global
    rank) computed with the parallel bucket-prefix decomposition — no
    single-task global window (operators/curation.py). The oracle is
    the single-reducer formulation of the same ordering."""
    from svoe_spark.operators.curation import deterministic_shuffle

    docs = load_table(spark, "documents", sf_dir)
    return deterministic_shuffle(docs).select("doc_id", "shuffle_rank")


@query(
    "dataset_hash_split",
    f"""
    WITH s AS (
      SELECT doc_id, length(text) AS n_chars,
             CASE WHEN ({_SHUF_KEY_SQL}) % 100 < 80 THEN 'train'
                  WHEN ({_SHUF_KEY_SQL}) % 100 < 90 THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM s GROUP BY split
    """,
)
def dataset_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split: md5(id) mod 100
    thresholds — assignment survives any re-partitioning (randomSplit
    does not). Aggregated per split for verification."""
    from svoe_spark.operators.curation import hash_split

    docs = load_table(spark, "documents", sf_dir)
    return (
        hash_split(docs)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("sum_chars"),
        )
    )


PACK_BUDGET = 2048  # power of two: the /budget division is float-exact


@query(
    "sequence_packing",
    f"""
    WITH t AS (
      SELECT doc_id, len({sql_tokens('text')}) AS n_tokens FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT CAST(floor((cum - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS bin_id,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
    FROM c GROUP BY bin_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing to a 2048-token budget (streaming-pack: a doc
    belongs to the bin its first token lands in), built on the exact
    parallel prefix sum. Aggregated per bin for verification."""
    from svoe_spark.functions.text import tokens
    from svoe_spark.operators.curation import pack_sequences

    docs = load_table(spark, "documents", sf_dir)
    t = docs.select("doc_id", F.size(tokens("text")).cast("long").alias("n_tokens"))
    packed = pack_sequences(t, budget=PACK_BUDGET)
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("sum_tokens")
    )


@query(
    "ann_batch_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id, {sql_cosine('e.embedding', 'q.qv')} AS cosine
      FROM embeddings e CROSS JOIN q
    ),
    ranked AS (
      SELECT query_id, vec_id, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
      FROM scored
    )
    SELECT query_id, vec_id, cosine FROM ranked WHERE rk <= 5
    """,
)
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact top-k (one corpus scan for a broadcast query set,
    per-query window ranking) — retrieval-eval / hard-negative-mining
    shape."""
    from svoe_spark.operators.similarity import brute_force_topk_batch

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk_batch(emb, q, k=5)


@query(
    "embedding_neardup_lsh",
    f"""
    WITH b AS (
      SELECT vec_id, embedding, {_lsh_bucket_sql('embedding')} AS bucket
      FROM embeddings
    )
    SELECT a.bucket AS bucket, a.vec_id AS id_a, b.vec_id AS id_b,
           {sql_cosine('a.embedding', 'b.embedding')} AS cosine
    FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {sql_cosine('a.embedding', 'b.embedding')} >= 0.3
    """,
)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup with LSH-bucket blocking — the 100 TB path:
    no explicit label needed, the hyperplane bucket is the blocking
    (and at scale the partition) key, confining the quadratic step to
    bucket-local candidate sets."""
    from svoe_spark.operators.similarity import embedding_neardup_pairs, lsh_bucket

    emb = load_table(spark, "embeddings", sf_dir).withColumn(
        "bucket", lsh_bucket("embedding", EMB_DIM)
    )
    return embedding_neardup_pairs(emb, group_cols=["bucket"], threshold=0.3)


_STRATA = {"src0": 0.25, "src1": 0.5, "src2": 0.0}


@query(
    "stratified_sample_counts",
    f"""
    WITH kept AS (
      SELECT source, doc_id, length(text) AS n_chars
      FROM documents
      WHERE ({_SHUF_KEY_SQL}) % 10000 <
            CASE source WHEN 'src0' THEN 2500 WHEN 'src1' THEN 5000
                        WHEN 'src2' THEN 0 ELSE 10000 END
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM kept GROUP BY source
    """,
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source downsampling (corpus-mix re-weighting):
    md5-threshold keep decision, reproducible under any partitioning
    (sampleBy is not). Aggregated per source for verification."""
    from svoe_spark.operators.curation import stratified_sample

    docs = load_table(spark, "documents", sf_dir)
    kept = stratified_sample(docs, "source", _STRATA)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("sum_chars"),
    )


@query(
    "benchmark_contamination",
    f"""
    WITH th AS (SELECT doc_id, {sql_token_hashes('text')} AS th FROM documents),
    sets AS (SELECT doc_id, list_distinct({_shingle_sql()}) AS s FROM th),
    c AS (SELECT doc_id AS corpus_id, unnest(s) AS sh FROM sets WHERE doc_id % 50 <> 0),
    b AS (SELECT doc_id AS bench_id, unnest(s) AS sh FROM sets WHERE doc_id % 50 = 0)
    SELECT corpus_id, bench_id, count(*) AS n_shared
    FROM c JOIN b USING (sh)
    GROUP BY corpus_id, bench_id
    HAVING count(*) >= 3
    """,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination scan: corpus documents sharing >= 3
    distinct word trigrams with a held-out benchmark subset (every 50th
    doc) — inverted-index join across two corpora, cost proportional to
    SHARED shingles."""
    from svoe_spark.operators.dedup import contamination_pairs

    docs = load_table(spark, "documents", sf_dir)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    return contamination_pairs(corpus, bench, min_shared=3)


@query(
    "text_lang_ngram",
    f"""
    WITH tri AS (
      SELECT doc_id, lang, unnest(list_distinct({sql_char_shingles('text')})) AS sh
      FROM documents
    ),
    counts AS (SELECT lang, sh, count(*) AS n FROM tri GROUP BY lang, sh),
    prof AS (
      SELECT lang, sh FROM (
        SELECT lang, sh, row_number() OVER (PARTITION BY lang ORDER BY n DESC, sh) AS rk
        FROM counts
      ) WHERE rk <= 20
    ),
    doc_tri AS (
      SELECT doc_id, unnest(list_distinct({sql_char_shingles('text')})) AS sh
      FROM documents
    ),
    overlap AS (
      SELECT doc_id, lang, count(*) AS o
      FROM doc_tri JOIN prof USING (sh) GROUP BY doc_id, lang
    )
    SELECT doc_id, lang AS pred_lang, o AS n_profile_trigrams
    FROM (
      SELECT doc_id, lang, o,
             row_number() OVER (PARTITION BY doc_id ORDER BY o DESC, lang) AS rk
      FROM overlap
    ) WHERE rk = 1
    """,
    bench=False,
)
def text_lang_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram-profile language classifier: profiles from the
    labeled table, broadcast-join scoring, per-doc argmax — the n-gram
    upgrade over the stopword heuristic. NOTE: the fixture's lang
    labels are random over one shared English vocabulary, so accuracy
    on THIS data is chance by construction; the gate verifies the
    relational computation (profiles/overlap/argmax) bit-exactly."""
    from svoe_spark.operators.text_analysis import lang_id_ngram

    docs = load_table(spark, "documents", sf_dir)
    return lang_id_ngram(docs, docs)


# ---------------------------------------------------------------------------
# Corpus cleaning (operators/cleaning.py): PII redaction, repetition
# signals, chunk-level dedup, domain mixture weights
# ---------------------------------------------------------------------------

# Deterministic PII-bearing augmentation: the fixture corpus is clean
# word soup, so both engines append the same synthetic spans (presence
# varies by doc_id residue) and the operator must find & redact them.
_PII_AUG_SQL = """
      SELECT doc_id,
             concat_ws(' ', text,
               CASE WHEN doc_id % 3 <> 0 THEN
                 'u' || CAST(doc_id AS VARCHAR) || '@ex'
                     || CAST(doc_id % 5 AS VARCHAR) || '.org' END,
               CASE WHEN doc_id % 2 = 0 THEN
                 CAST(100 + doc_id % 900 AS VARCHAR) || '-555-'
                     || CAST(1000 + doc_id % 9000 AS VARCHAR) END,
               CASE WHEN doc_id % 4 = 0 THEN
                 '192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                     || CAST(doc_id % 254 + 1 AS VARCHAR) END,
               CASE WHEN doc_id % 5 = 0 THEN
                 CAST(100000000 + doc_id AS VARCHAR) END) AS text
      FROM documents
"""


def _pii_aug(df: DataFrame) -> DataFrame:
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    return df.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.col("text"),
            F.when(
                did % 3 != 0,
                F.concat(F.lit("u"), s(did), F.lit("@ex"), s(did % 5), F.lit(".org")),
            ),
            F.when(
                did % 2 == 0,
                F.concat(s(100 + did % 900), F.lit("-555-"), s(1000 + did % 9000)),
            ),
            F.when(
                did % 4 == 0,
                F.concat(F.lit("192.168."), s(did % 256), F.lit("."), s(did % 254 + 1)),
            ),
            F.when(did % 5 == 0, s(100000000 + did)),
        ).alias("text"),
    )


def _pii_oracle() -> str:
    # mirrors the operator: each category counted on the PROGRESSIVELY
    # redacted text, so one span -> exactly one category
    from svoe_spark.operators.cleaning import PII_PATTERNS

    counts = []
    red = "text"
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all({red}, '{pat}')) AS BIGINT) AS n_{name}"
        )
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    counts_sql = ",\n           ".join(counts)
    return f"""
    SELECT doc_id,
           {counts_sql},
           {red} AS redacted
    FROM ({_PII_AUG_SQL})
    """


@query("pii_redact", _pii_oracle())
def pii_redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over a deterministically PII-augmented corpus:
    regex spans (emails, IPv4, phones, long digit IDs) counted then
    replaced, scan-fused with zero shuffle. Patterns are chosen to be
    valid in both Java regex and RE2, which is what makes the redaction
    oracle-checkable string-for-string."""
    from svoe_spark.operators.cleaning import pii_redact

    return pii_redact(_pii_aug(load_table(spark, "documents", sf_dir)))


@query(
    "text_repetition_signals",
    f"""
    WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks FROM documents),
    g AS (
      SELECT doc_id, len(toks) AS n,
             CASE WHEN len(toks) >= 2 THEN list_transform(
                    generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i + 1]) ELSE [] END AS g2,
             CASE WHEN len(toks) >= 3 THEN list_transform(
                    generate_series(1, len(toks) - 2),
                    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
                  ELSE [] END AS g3
      FROM t),
    ex AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    cnt AS (SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY 1, 2),
    tw AS (SELECT doc_id, max(c) AS topc FROM cnt GROUP BY 1)
    SELECT g.doc_id, g.n AS n_tokens,
           CASE WHEN g.n > 0 THEN tw.topc / g.n ELSE 0.0e0 END AS top_word_ratio,
           CASE WHEN len(g.g2) > 0
                THEN (len(g.g2) - len(list_distinct(g.g2))) / len(g.g2)
                ELSE 0.0e0 END AS dup_2gram_ratio,
           CASE WHEN len(g.g3) > 0
                THEN (len(g.g3) - len(list_distinct(g.g3))) / len(g.g3)
                ELSE 0.0e0 END AS dup_3gram_ratio
    FROM g LEFT JOIN tw ON g.doc_id = tw.doc_id
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition heuristics: top-word fraction (explode +
    two-level agg — the skew-free shape for arbitrarily long docs) and
    duplicate 2/3-gram fractions (array-side, zero shuffle)."""
    from svoe_spark.operators.cleaning import repetition_signals

    return repetition_signals(load_table(spark, "documents", sf_dir))


@query(
    "chunk_dedup",
    f"""
    WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks FROM documents),
    e AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t),
    c AS (SELECT doc_id, CAST((i - 1) // 4 AS BIGINT) AS ci,
                 string_agg(toks[i], ' ' ORDER BY i) AS chunk
          FROM e GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, ci) AS rk
          FROM c)
    SELECT doc_id,
           COALESCE(string_agg(chunk, ' ' ORDER BY ci) FILTER (WHERE rk = 1), '')
             AS text_dedup,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(*) FILTER (WHERE rk > 1) AS BIGINT) AS n_removed
    FROM r GROUP BY doc_id
    """,
)
def chunk_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide chunk-level exact dedup (paragraph dedup adapted to
    unstructured text): 4-token chunks, first occurrence corpus-wide
    wins, survivors reassembled in order. Shuffles on chunk text
    (uniform content keys) then doc_id — both skew-free at any scale."""
    from svoe_spark.operators.cleaning import chunk_dedup

    return chunk_dedup(load_table(spark, "documents", sf_dir), width=4)


@query(
    "source_mixture_weights",
    f"""
    WITH per AS (
      SELECT source, count(*) AS n_docs,
             CAST(SUM(len(list_filter(string_split(text, ' '), t -> length(t) > 0))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source)
    SELECT source, n_docs, n_tokens,
           n_tokens / SUM(n_tokens) OVER () AS token_share,
           CASE WHEN n_tokens / SUM(n_tokens) OVER () > 0
                THEN (1.0 / COUNT(*) OVER ()) / (n_tokens / SUM(n_tokens) OVER ())
                ELSE 0.0e0 END AS mixture_weight
    FROM per
    """,
)
def source_mixture_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixture weighting: per-source token shares and the
    uniform-target resampling weights (the bookkeeping step of a
    DoReMi-style mixture). One groupBy over a tiny domain relation."""
    from svoe_spark.operators.cleaning import source_mixture_weights

    return source_mixture_weights(load_table(spark, "documents", sf_dir))


@query(
    "embedding_quantize",
    """
    SELECT vec_id,
           sqrt(list_reduce(
             list_prepend(0.0e0, list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
             (a, b) -> a + b)) AS l2_norm,
           CASE WHEN amax > 0 THEN amax / 127.0 ELSE 0.0e0 END AS q_scale,
           CAST(list_reduce(list_prepend(0, q), (a, b) -> a + b) AS BIGINT) AS q_sum,
           array_to_string(q, ',') AS q_csv
    FROM (
      SELECT vec_id, embedding, amax,
             CASE WHEN amax > 0
                  THEN list_transform(embedding, x ->
                         CAST(floor(CAST(x AS DOUBLE) / (amax / 127.0) + 0.5)
                              AS BIGINT))
                  ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q
      FROM (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))) AS amax
        FROM embeddings))
    """,
)
def embedding_quantize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization with scalar digests (norm,
    scale, sum, csv) — array-side expressions only, zero shuffle.
    floor(x+0.5) instead of round() keeps the result engine-portable."""
    from svoe_spark.operators.similarity import quantize_embeddings

    return quantize_embeddings(load_table(spark, "embeddings", sf_dir))


_DEDUP_CLUSTERS_SQL = f"""
    WITH RECURSIVE {_minhash_sql()},
    vpairs AS (
      SELECT id_a, id_b
      FROM cands
      JOIN sets a ON cands.id_a = a.doc_id
      JOIN sets b ON cands.id_b = b.doc_id
      WHERE len(list_intersect(a.sset, b.sset)) /
            (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset)))
            >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM vpairs
              UNION SELECT id_b, id_a FROM vpairs),
    walk(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, w.r FROM edges e JOIN walk w ON w.id = e.dst),
    comp AS (SELECT id, MIN(r) AS comp FROM walk GROUP BY id),
    lab AS (
      SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
    sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
           FROM lab GROUP BY 1)
    SELECT lab.doc_id, lab.cluster_id, sz.cluster_size,
           lab.doc_id = lab.cluster_id AS is_canonical
    FROM lab JOIN sz USING (cluster_id)
    """


@query(
    "cluster_split_leakproof",
    f"""
    WITH cl AS ({_DEDUP_CLUSTERS_SQL}),
    s AS (
      SELECT doc_id, cluster_id,
             CASE WHEN ({sql_md5_hash("CAST(cluster_id AS VARCHAR)")}) % 100 < 80
                    THEN 'train'
                  WHEN ({sql_md5_hash("CAST(cluster_id AS VARCHAR)")}) % 100 < 90
                    THEN 'valid'
                  ELSE 'test' END AS split
      FROM cl)
    SELECT split, count(*) AS n_docs,
           CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters
    FROM s GROUP BY split
    """,
)
def cluster_split_leakproof_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-proof dataset split (curation.cluster_aware_split):
    near-dup clusters assign whole to one split — the md5 threshold
    keys on the component's canonical id, so no verified pair ever
    spans train/test (the contamination a doc-id split reintroduces;
    Lee et al. 2022). Aggregated per split for verification; the
    zero-cross-split-pairs invariant is pinned in
    tests/test_curation.py."""
    from svoe_spark.operators.curation import cluster_aware_split

    docs = load_table(spark, "documents", sf_dir)
    pairs = _mh_pairs(spark, sf_dir).select("id_a", "id_b")
    assigned = cluster_aware_split(docs, pairs)
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
    )


def _dedup_clusters_impl(
    spark: SparkSession, sf_dir: str, algorithm: str
) -> DataFrame:
    from svoe_spark.operators.graph import dedup_clusters

    docs = load_table(spark, "documents", sf_dir)
    pairs = _mh_pairs(spark, sf_dir).select("id_a", "id_b")
    return dedup_clusters(docs, pairs, algorithm=algorithm)


@query("dedup_clusters", _DEDUP_CLUSTERS_SQL)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: MinHash+LSH verified pairs -> connected
    components (min-label propagation with automatic two-star fallback,
    one shuffle join per round) -> per-doc cluster id / size /
    canonical flag. The transitive-closure step every corpus dedup
    needs between pair generation and the keep/drop decision; oracle =
    DuckDB recursive-CTE reachability over the identical verified pair
    set."""
    return _dedup_clusters_impl(spark, sf_dir, "auto")


@query("dedup_clusters_twostar", _DEDUP_CLUSTERS_SQL, bench=False)
def dedup_clusters_twostar_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering through the alternating large-star/small-star
    algorithm (Kiveris et al., SoCC'14 — O(log^2 n) rounds independent
    of diameter, the scale path for long-chain / skewed-component pair
    graphs); identical recursive-CTE oracle, so the driver hash-checks
    that both algorithms produce the same clustering."""
    return _dedup_clusters_impl(spark, sf_dir, "twostar")


def _corpus_filter_sql(with_trained_logit: bool = False) -> str:
    """Oracle chain shared by corpus_filter / corpus_filter_trained:
    the heuristic-signal CTEs exist ONCE (a tokenization or ratio fix
    can never leave one gate's oracle stale), and the trained variant
    splices in the frozen-logit CTE plus the logit >= 0 conjunct."""
    lg_cte = ""
    lg_join = ""
    lg_col = ""
    lg_sig = ""
    lg_keep = ""
    if with_trained_logit:
        w = ", ".join(f"({n}/{_QC_DEN}.0)" for n in QC_TRAINED_NUM)
        bias = f"({QC_TRAINED_BIAS_NUM}/{_QC_DEN}.0)"
        lg_cte = f"""
    lg AS (
      SELECT doc_id,
             CASE WHEN len(th) > 0
                  THEN {bias} + list_reduce(
                         list_prepend(CAST(0.0 AS DOUBLE),
                           list_transform(th, h -> ([{w}])[(h % {len(QC_TRAINED_NUM)}) + 1])),
                         (a, b) -> a + b) / len(th)
                  ELSE {bias} END AS logit
      FROM (SELECT doc_id, {sql_token_hashes('text')} AS th FROM documents)
    ),"""
        lg_join = "\n             JOIN lg ON g.doc_id = lg.doc_id"
        lg_col = " lg.logit,"
        lg_sig = " logit,"
        lg_keep = " AND logit >= 0.0"
    return f"""
    WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks FROM documents),
    g AS (
      SELECT doc_id, len(toks) AS n,
             CASE WHEN len(toks) >= 2 THEN list_transform(
                    generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i + 1]) ELSE [] END AS g2,
             CASE WHEN len(toks) > 0
                  THEN len(list_distinct(toks)) / len(toks) ELSE 0.0e0 END
               AS distinct_ratio
      FROM t),
    ex AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    cnt AS (SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY 1, 2),
    tw AS (SELECT doc_id, max(c) AS topc FROM cnt GROUP BY 1),{lg_cte}
    sig AS (
      SELECT g.doc_id, g.n, g.distinct_ratio,{lg_col}
             CASE WHEN g.n > 0 THEN tw.topc / g.n ELSE 0.0e0 END AS topr,
             CASE WHEN len(g.g2) > 0
                  THEN (len(g.g2) - len(list_distinct(g.g2))) / len(g.g2)
                  ELSE 0.0e0 END AS dup2
      FROM g LEFT JOIN tw ON g.doc_id = tw.doc_id{lg_join})
    SELECT doc_id, n AS n_tokens, distinct_ratio,
           topr AS top_word_ratio, dup2 AS dup_2gram_ratio,{lg_sig}
           (n >= 20 AND n <= 100000 AND distinct_ratio >= 0.4
            AND topr <= 0.12 AND dup2 <= 0.06{lg_keep}) AS keep
    FROM sig
    """


@query("corpus_filter", _corpus_filter_sql())
def corpus_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed C4/Gopher-style quality gate: length bounds + diversity
    + repetition caps in one zero-shuffle scan, emitting the signals
    and the keep/drop boolean."""
    from svoe_spark.operators.cleaning import corpus_filter

    return corpus_filter(load_table(spark, "documents", sf_dir))


@query(
    "ann_lsh_multiprobe",
    f"""
    WITH b AS (
      SELECT vec_id, embedding, {_lsh_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT embedding AS qv, bucket AS qbucket FROM b WHERE vec_id = 0),
    probes AS (
      SELECT xor(qbucket, m) AS pb, qv
      FROM q, (VALUES {", ".join(f"({m})" for m in [0] + [1 << p for p in range(DEFAULT_PLANES)])}) t(m)
    )
    SELECT vec_id, {sql_cosine('embedding', 'qv')} AS cosine
    FROM b JOIN probes ON b.bucket = probes.pb
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def ann_lsh_multiprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: the query probes its own bucket plus every
    Hamming-distance-1 bucket (one flipped hyperplane) — planes+1
    probes, the standard recall lever; the probe set stays a small
    IN-list of bucket keys (partition-prunable at scale)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return ann_lsh_topk(
        emb, emb.filter(F.col("vec_id") == 0), dim=EMB_DIM, k=10, probe_bits=1
    )


IVF_NPROBE = 4


@query(
    "ann_ivf_multiprobe",
    f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF_K}
    ),
    a AS (
      SELECT e.vec_id, e.embedding, c.cid AS cluster_id
      FROM embeddings e, cents c
      QUALIFY row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY {sql_cosine('e.embedding', 'c.cv')} DESC, c.cid
      ) = 1
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    probe AS (
      SELECT c.cid FROM cents c, q
      QUALIFY row_number() OVER (
        ORDER BY {sql_cosine('qv', 'c.cv')} DESC, c.cid
      ) <= {IVF_NPROBE}
    )
    SELECT a.vec_id, {sql_cosine('a.embedding', 'qv')} AS cosine
    FROM a JOIN probe ON a.cluster_id = probe.cid, q
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def ann_ivf_multiprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with nprobe=4: the query's four nearest coarse clusters
    are scanned instead of one. Same deterministic first-16 codebook as
    `ann_ivf_topk`; only the broadcast query side pays the top-P sort."""
    emb = load_table(spark, "embeddings", sf_dir)
    cents = _ivf_cents(spark, sf_dir)
    return ann_ivf_topk(
        emb, emb.filter(F.col("vec_id") == 0), cents, k=10, nprobe=IVF_NPROBE
    )


from svoe_spark.operators.similarity import (  # noqa: E402
    ivf_train_relational,
    ivf_train_relational_sql,
)

IVF_TRAIN_ITERS = 3


@query(
    "ann_ivf_trained",
    f"""
    WITH {ivf_train_relational_sql('embeddings', 'vec_id', 'embedding',
                                   IVF_K, IVF_TRAIN_ITERS, EMB_DIM)},
    a AS (
      SELECT e.vec_id, e.embedding, c.cid AS cluster_id
      FROM embeddings e, cents c
      QUALIFY row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY {sql_cosine('e.embedding', 'c.cvf')} DESC, c.cid
      ) = 1
    ),
    qq AS (SELECT embedding AS qv2 FROM embeddings WHERE vec_id = 0),
    probe AS (
      SELECT c.cid FROM cents c, qq
      QUALIFY row_number() OVER (
        ORDER BY {sql_cosine('qv2', 'c.cvf')} DESC, c.cid
      ) <= 2
    )
    SELECT a.vec_id, {sql_cosine('a.embedding', 'qv2')} AS cosine
    FROM a JOIN probe ON a.cluster_id = probe.cid, qq
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def ann_ivf_trained_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a TRAINED coarse codebook, nprobe=2. HASH-GREEN
    since round 8 (formerly rows-only): training is the deterministic
    relational Lloyd's (`ivf_train_relational` — hash-seeded init,
    exact-integer assignment/update rounds, fixed iterations), so the
    oracle re-derives the codebook through unrolled CTEs exactly like
    the PageRank family, then replays the shared constant-literal
    cosine probe plan every oracled IVF sibling uses. The stock-MLlib
    trainer (`ivf_train`, KMeans||) remains available and recall-tested
    (tests/test_similarity_train.py) as the non-oracle-able production
    alternative; the relational trainer's per-round cost is one
    shuffle-free corpus scan + a k x dim partial agg — the same
    distributed shape."""
    emb = load_table(spark, "embeddings", sf_dir)
    cents = ivf_train_relational(emb, k=IVF_K, iters=IVF_TRAIN_ITERS)
    return ann_ivf_topk(
        emb, emb.filter(F.col("vec_id") == 0), cents, k=10, nprobe=2
    )


@query(
    "token_rarity",
    f"""
    WITH ex AS (
      SELECT doc_id, i AS pos, toks[i] AS tok
      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
            FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks FROM documents))),
    cnt AS (SELECT tok, count(*) AS c FROM ex GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM cnt),
    scored AS (
      SELECT ex.doc_id, ex.pos, tot.n / cnt.c AS inv,
             CASE WHEN cnt.c <= 2 THEN 1 ELSE 0 END AS rare
      FROM ex JOIN cnt USING (tok), tot)
    SELECT doc_id,
           count(*) AS n_tokens,
           list_reduce(list_prepend(0.0e0, list(inv ORDER BY pos)),
                       (a, b) -> a + b) / count(*) AS mean_inv_prob,
           CAST(SUM(rare) AS BIGINT) AS n_rare_tokens
    FROM scored GROUP BY doc_id
    """,
)
def token_rarity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics rarity scoring: mean inverse unigram
    probability + rare-token counts, folded in document order so the
    float sum is bit-identical on any partitioning and engine (the
    exact-arithmetic stand-in for CCNet's LM perplexity stage)."""
    from svoe_spark.operators.text_analysis import token_rarity

    return token_rarity(load_table(spark, "documents", sf_dir))


@query(
    "normalize_text",
    """
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS text_norm,
           length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                      ' +', ' ', 'g'))) AS n_chars_norm
    FROM documents
    """,
)
def normalize_text_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical pre-dedup normalization: lowercase, punctuation to
    spaces, whitespace collapse, trim — zero-shuffle regexp chain."""
    from svoe_spark.operators.cleaning import normalize_text

    return normalize_text(load_table(spark, "documents", sf_dir))


@query(
    "bigram_model",
    f"""
    WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks FROM documents),
    ex AS (
      SELECT toks[i] AS a, toks[i + 1] AS b
      FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
            FROM t WHERE len(toks) >= 2)),
    bg AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab FROM ex GROUP BY a, b),
    ug AS (SELECT a, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM bg GROUP BY a)
    SELECT bg.a, bg.b, bg.n_ab, ug.n_a, bg.n_ab / ug.n_a AS p_b_given_a
    FROM bg JOIN ug USING (a)
    ORDER BY bg.n_ab DESC, bg.a, bg.b
    LIMIT 50
    """,
)
def bigram_model_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram LM table: top-50 bigrams with exact conditional
    probability — two aggregations + a join, distributed top-k cut."""
    from svoe_spark.operators.text_analysis import bigram_model

    return bigram_model(load_table(spark, "documents", sf_dir), top=50)


# ---------------------------------------------------------------------------
# Round 4: substring-level dedup, semantic dedup, per-source sampling
# ---------------------------------------------------------------------------

NGRAM_SPAN_K = 5


@query(
    "repeated_ngram_spans",
    f"""
    WITH md AS (SELECT doc_id, {sql_md5_tokens('text')} AS md FROM documents),
    th AS (SELECT doc_id, {sql_token_hashes_from_digests('md', 1)} AS h1,
                  {sql_token_hashes_from_digests('md', 16)} AS h2 FROM md),
    gr AS (SELECT doc_id, {sql_kgram_hashes('h1', NGRAM_SPAN_K)} AS g,
                  {sql_kgram_hashes('h2', NGRAM_SPAN_K, 37)} AS g2 FROM th),
    pos AS (
      SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos, g[i] AS gram, g2[i] AS gram2
      FROM (SELECT doc_id, g, g2, unnest(range(1, len(g)+1)) AS i FROM gr)
    ),
    freq AS (SELECT gram, gram2 FROM pos GROUP BY gram, gram2 HAVING count(*) >= 2),
    hits AS (SELECT p.doc_id, p.pos FROM pos p JOIN freq USING (gram, gram2)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       <= {NGRAM_SPAN_K}
                  THEN 0 ELSE 1 END AS new_island
      FROM hits
    ),
    isl2 AS (
      SELECT doc_id, pos,
             SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM isl
    )
    SELECT doc_id,
           min(pos) AS span_start,
           max(pos) + {NGRAM_SPAN_K - 1} AS span_end,
           max(pos) + {NGRAM_SPAN_K} - min(pos) AS span_tokens,
           count(*) AS n_gram_hits
    FROM isl2 GROUP BY doc_id, island
    """,
)
def repeated_ngram_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup spans (Lee et al., ACL 2022): maximal
    token spans covered by corpus-repeated 5-grams — the distributed
    sliding-gram equivalent of suffix-array dedup. One compact-key
    shuffle + per-doc windows; see operators/dedup.py."""
    from svoe_spark.operators.dedup import repeated_ngram_spans

    docs = load_table(spark, "documents", sf_dir)
    return repeated_ngram_spans(docs, k=NGRAM_SPAN_K, min_count=2)


SEMDEDUP_THRESHOLD = 0.3


@query(
    "semantic_dedup",
    f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF_K}
    ),
    a AS (
      SELECT e.vec_id, e.embedding, c.cid AS cluster_id
      FROM embeddings e, cents c
      QUALIFY row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY {sql_cosine('e.embedding', 'c.cv')} DESC, c.cid
      ) = 1
    ),
    p AS (
      SELECT b.vec_id
      FROM a x JOIN a b ON x.cluster_id = b.cluster_id AND x.vec_id < b.vec_id
      WHERE {sql_cosine('x.embedding', 'b.embedding')} >= {SEMDEDUP_THRESHOLD}
      GROUP BY b.vec_id
    )
    SELECT a.vec_id, a.cluster_id, (p.vec_id IS NOT NULL) AS dropped
    FROM a LEFT JOIN p ON a.vec_id = p.vec_id
    """,
)
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster-blocked keep-lowest-id
    semantic dedup over the embedding table; deterministic first-16
    codebook (the trained-KMeans codebook drives the same operator —
    see ann_ivf_trained)."""
    from svoe_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, "embeddings", sf_dir)
    cents = _ivf_cents(spark, sf_dir)
    return semantic_dedup(emb, cents, threshold=SEMDEDUP_THRESHOLD)


PER_SOURCE_K = 5


@query(
    "per_source_topk",
    f"""
    SELECT source, doc_id, rk FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_SHUF_KEY_SQL}, doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= {PER_SOURCE_K}
    """,
)
def per_source_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample (reservoir-style, but
    reproducible under any partitioning): md5-keyed row_number within
    each source. The per-group window is partitioned by the group key —
    no single-task global window."""
    from svoe_spark.operators.curation import per_group_topk

    docs = load_table(spark, "documents", sf_dir)
    return per_group_topk(docs, "source", k=PER_SOURCE_K)


@query(
    "substring_dedup_clean",
    f"""
    WITH md AS (SELECT doc_id, {sql_md5_tokens('text')} AS md FROM documents),
    th AS (SELECT doc_id, {sql_token_hashes_from_digests('md', 1)} AS h1,
                  {sql_token_hashes_from_digests('md', 16)} AS h2 FROM md),
    gr AS (SELECT doc_id, {sql_kgram_hashes('h1', NGRAM_SPAN_K)} AS g,
                  {sql_kgram_hashes('h2', NGRAM_SPAN_K, 37)} AS g2 FROM th),
    pos AS (
      SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos, g[i] AS gram, g2[i] AS gram2
      FROM (SELECT doc_id, g, g2, unnest(range(1, len(g)+1)) AS i FROM gr)
    ),
    freq AS (SELECT gram, gram2 FROM pos GROUP BY gram, gram2 HAVING count(*) >= 2),
    hits AS (SELECT p.doc_id, p.pos FROM pos p JOIN freq USING (gram, gram2)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       <= {NGRAM_SPAN_K}
                  THEN 0 ELSE 1 END AS new_island
      FROM hits
    ),
    isl2 AS (
      SELECT doc_id, pos,
             SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM isl
    ),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + {NGRAM_SPAN_K - 1} AS e
      FROM isl2 GROUP BY doc_id, island
    ),
    sp AS (
      SELECT doc_id, list({{'s': s, 'e': e}}) AS spans FROM spans GROUP BY doc_id
    ),
    toks AS (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
    cut AS (
      SELECT toks.doc_id, t,
             list_filter(t, (x, i) ->
               len(list_filter(COALESCE(spans, []),
                               s -> s.s <= i - 1 AND i - 1 <= s.e)) = 0) AS kept
      FROM toks LEFT JOIN sp ON toks.doc_id = sp.doc_id
    )
    SELECT doc_id,
           -- DuckDB array_to_string([]) is NULL; Spark array_join is ''
           COALESCE(array_to_string(kept, ' '), '') AS clean_text,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(t) - len(kept) AS BIGINT) AS n_tokens_removed
    FROM cut
    """,
)
def substring_dedup_clean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup cleanup: cut every corpus-repeated 5-gram span
    out of the text (the removal half of Lee et al. ACL 2022;
    operators/dedup.py::remove_repeated_spans)."""
    from svoe_spark.operators.dedup import remove_repeated_spans

    docs = load_table(spark, "documents", sf_dir)
    return remove_repeated_spans(docs, k=NGRAM_SPAN_K, min_count=2)


def _qc_weights_sql() -> str:
    from svoe_spark.operators.text_analysis import (
        QC_BUCKETS,
        default_classifier_weights,
    )

    w = default_classifier_weights(QC_BUCKETS)
    return "[" + ", ".join(repr(x) for x in w) + "]"


def _qc_buckets() -> int:
    from svoe_spark.operators.text_analysis import QC_BUCKETS

    return QC_BUCKETS


@query(
    "quality_classifier_scores",
    f"""
    WITH th AS (SELECT doc_id, {sql_token_hashes('text')} AS th FROM documents),
    s AS (
      SELECT doc_id,
             CAST(len(th) AS BIGINT) AS n_tokens,
             CASE WHEN len(th) > 0
                  THEN 0.0 + list_reduce(
                         list_prepend(CAST(0.0 AS DOUBLE),
                           list_transform(th, h -> ({_qc_weights_sql()})[(h % {_qc_buckets()}) + 1])),
                         (a, b) -> a + b) / len(th)
                  ELSE 0.0 END AS logit
      FROM th
    )
    SELECT doc_id, n_tokens, logit, logit >= 0.0 AS keep FROM s
    """,
)
def quality_classifier_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped linear quality classifier: hashed bag-of-words
    mean-pooled dot product, folded in document order (bit-portable —
    no exp), thresholded keep flag (operators/text_analysis.py)."""
    from svoe_spark.operators.text_analysis import quality_classifier

    return quality_classifier(load_table(spark, "documents", sf_dir))


# Frozen TRAINED classifier artifact: text_analysis.
# train_quality_classifier (L2 reg 1e-6, maxIter 200 — nonzero reg
# makes the separable-label optimum unique and the fit layout-stable,
# and this TINY value keeps the 1/n_tokens-scale signal bucket
# separable: held-out AUC 0.98 here vs 0.63 at 1e-4; re-trained
# bit-identical under a 13-partition re-layout) on the sf0.001
# documents with the planted quality label `text NOT LIKE '%dup%'`
# ('dup' is the fixture's duplication marker), then quantize_weights
# to 2^-20 dyadic rationals — stored as integer numerators over 2^20
# so BOTH engines reconstruct the exact double via one exact
# power-of-two division (no decimal literal parsing in the parity
# path at all). Held-out AUC vs default_classifier_weights: 0.98 vs
# 0.45 (tests/test_quality_train.py).
QC_TRAINED_NUM: list[int] = [
    0, 24300105, 0, 9179354, 0, 0, 0, 0, 0, 0, 0, 0, 0, 10289664,
    8344712, 3864555, 0, 0, 0, 1834733, 0, 0, 9456958, 0, 18865481,
    13172472, 0, 0, 0, 0, 0, 6033732, 16621080, 4792860, 0, 0, 0,
    2786980, 13242375, 14370316, 0, 0, 0, 0, 15454056, 9636135, 0,
    8975287, 0, 0, 0, 17472813, 0, 0, 10234571, 0, 1246219,
    -242511030, 0, 0, 6663146, 15673349, 0, 0,
]
QC_TRAINED_BIAS_NUM = -5949932
_QC_DEN = 1 << 20

QC_TRAINED_WEIGHTS: list[float] = [n / _QC_DEN for n in QC_TRAINED_NUM]
QC_TRAINED_BIAS: float = QC_TRAINED_BIAS_NUM / _QC_DEN


@query(
    "quality_classifier_trained",
    f"""
    WITH th AS (SELECT doc_id, {sql_token_hashes('text')} AS th FROM documents),
    s AS (
      SELECT doc_id,
             CAST(len(th) AS BIGINT) AS n_tokens,
             CASE WHEN len(th) > 0
                  THEN ({QC_TRAINED_BIAS_NUM}/{_QC_DEN}.0) + list_reduce(
                         list_prepend(CAST(0.0 AS DOUBLE),
                           list_transform(th, h -> ([{
                             ", ".join(f"({n}/{_QC_DEN}.0)" for n in QC_TRAINED_NUM)
                           }])[(h % {_qc_buckets()}) + 1])),
                         (a, b) -> a + b) / len(th)
                  ELSE ({QC_TRAINED_BIAS_NUM}/{_QC_DEN}.0) END AS logit
      FROM th
    )
    SELECT doc_id, n_tokens, logit, logit >= 0.0 AS keep FROM s
    """,
)
def quality_classifier_trained_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME scoring plumbing as quality_classifier_scores, under
    the TRAINED frozen artifact (train_quality_classifier: SparkML
    logistic fit over the scorer's exact feature algebra, quantized to
    dyadic rationals) — the fastText-shaped filter as product, not
    shape. Weights reach both engines as integer numerators over 2^20,
    so the parity path contains no decimal parsing."""
    from svoe_spark.operators.text_analysis import quality_classifier

    return quality_classifier(
        load_table(spark, "documents", sf_dir),
        weights=QC_TRAINED_WEIGHTS,
        bias=QC_TRAINED_BIAS,
    )


@query("corpus_filter_trained", _corpus_filter_sql(with_trained_logit=True))
def corpus_filter_trained_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation gate with the TRAINED model composed in (VERDICT
    r5 ask 5): heuristic C4/Gopher signals AND the frozen trained
    fastText-shaped logit (QC_TRAINED_WEIGHTS — SparkML logistic fit
    over the scorer's exact feature algebra, dyadic-rational
    quantized) evaluated in the same zero-shuffle scan; `keep` now
    also requires logit >= 0. The stand-in default weights are out of
    the gate path."""
    from svoe_spark.operators.cleaning import corpus_filter

    return corpus_filter(
        load_table(spark, "documents", sf_dir),
        classifier_weights=QC_TRAINED_WEIGHTS,
        classifier_bias=QC_TRAINED_BIAS,
    )


# --------------------------------------------------------------------------
# curation_pagerank_gate: the end-to-end flagship curation composition
# (VERDICT r6 ask 5) — graph + trained classifier + dedup + mixing in
# ONE plan: sources are ranked by personalized PageRank over the
# document-source NEAR-DUP graph (two sources linked when they carry
# near-duplicate documents — random-walk proximity to a trusted
# allowlist, the Common-Crawl domain-curation shape), and a document
# survives iff its source ranks above the gate, the trained quality
# classifier keeps it, and it is its content's exact-dedup canonical;
# survivors get per-language temperature-mixture weights.
# --------------------------------------------------------------------------

_CPG_SEEDS = ("src1", "src3", "src5")  # the trusted allowlist
_CPG_ITERS = 4
_CPG_THRESH = 40 * 10**12  # rank_fp floor = 4% of the walk's mass


def _cpg_sql() -> str:
    """Oracle: each composed stage is a self-contained subquery CTE
    (its own WITH runs inside parentheses, so CTE names never collide
    across stages) — verified near-dup pairs, the shared PageRank core
    chain (queries.py:_pagerank_core_sql) over the source graph, the
    trained-logit corpus filter, exact-dedup canonicals, and the
    per-language mixture tail."""
    from svoe_spark.queries import _pagerank_core_sql

    pairs_sql = f"""WITH {_minhash_sql()}
      SELECT id_a, id_b FROM cands
      JOIN sets a ON cands.id_a = a.doc_id
      JOIN sets b ON cands.id_b = b.doc_id
      WHERE len(list_intersect(a.sset, b.sset)) /
            (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset))) >= 0.5"""
    edges_cte = """
      SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM (
        SELECT da.source AS src, db.source AS dst
        FROM vpairs v JOIN documents da ON v.id_a = da.doc_id
                      JOIN documents db ON v.id_b = db.doc_id
        WHERE da.source != db.source
        UNION ALL
        SELECT db.source AS src, da.source AS dst
        FROM vpairs v JOIN documents da ON v.id_a = da.doc_id
                      JOIN documents db ON v.id_b = db.doc_id
        WHERE da.source != db.source
      ) GROUP BY src, dst"""
    pred = "node IN ({})".format(", ".join(f"'{s}'" for s in _CPG_SEEDS))
    core = _pagerank_core_sql(edges_cte, pred, _CPG_ITERS, weighted=True)
    return f"""
    WITH vpairs AS ({pairs_sql}),
    {core},
    cfx AS ({_corpus_filter_sql(with_trained_logit=True)}),
    keepers AS (
      SELECT min(doc_id) AS doc_id
      FROM (SELECT doc_id, {sql_md5_hash('text')} AS fp, length(text) AS lk
            FROM documents)
      GROUP BY fp, lk
    ),
    gated AS (
      SELECT d.lang, d.text
      FROM documents d
      JOIN r{_CPG_ITERS} p ON d.source = p.node
                          AND p.rank_fp >= {_CPG_THRESH}
      JOIN cfx ON cfx.doc_id = d.doc_id AND cfx.keep
      JOIN keepers k ON d.doc_id = k.doc_id
    ),
    per AS (
      SELECT lang, count(*) AS n_docs,
             CAST(SUM(len(list_filter(string_split(text, ' '),
                                      t -> length(t) > 0))) AS BIGINT)
               AS n_tokens
      FROM gated GROUP BY lang)
    SELECT lang, n_docs, n_tokens,
           n_tokens / SUM(n_tokens) OVER () AS token_share,
           CASE WHEN n_tokens / SUM(n_tokens) OVER () > 0
                THEN (1.0 / COUNT(*) OVER ()) / (n_tokens / SUM(n_tokens) OVER ())
                ELSE 0.0e0 END AS mixture_weight
    FROM per
    """


@query("curation_pagerank_gate", _cpg_sql())
def curation_pagerank_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship curation composition in one plan: personalized
    PageRank over the document-source near-dup graph (trusted seeds
    {src1, src3, src5}; integer fixed-point, weight = cross-source
    near-dup pair count) gates sources at >= 4% of the walk's mass;
    surviving documents must ALSO pass the trained-classifier corpus
    filter and be their content's exact-dedup canonical; the survivors
    are weighted per language for uniform-target temperature mixing.
    Every stage is the already-oracle-checked operator (pagerank,
    corpus_filter, exact_duplicate_groups, source_mixture_weights) —
    this row proves the COMPOSITION, end to end, against one spliced
    oracle. Scale shape: band equi-join pairs (never all-pairs), a
    20-node rank relation broadcast into the gate, one zero-shuffle
    classifier scan, and a tiny per-language aggregate."""
    from svoe_spark.operators.cleaning import (
        corpus_filter,
        source_mixture_weights,
    )
    from svoe_spark.operators.dedup import exact_duplicate_groups
    from svoe_spark.operators.graph import pagerank

    docs = load_table(spark, "documents", sf_dir)
    p = _mh_pairs(spark, sf_dir)
    ds = docs.select("doc_id", "source")
    ab = (
        p.select("id_a", "id_b")
        .join(
            ds.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
                "source", "sa"
            ),
            "id_a",
        )
        .join(
            ds.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "source", "sb"
            ),
            "id_b",
        )
        .where(F.col("sa") != F.col("sb"))
        # materialize the (tiny, pair-cardinality) cross-source pair
        # relation ONCE: it feeds both union branches, and pagerank's
        # setup references its input several more times (weight
        # validation, node set, degree) — each reference would
        # otherwise replay the minhash-pair lineage
        .localCheckpoint()
    )
    edges = (
        ab.select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
        .unionByName(ab.select(F.col("sb").alias("src"), F.col("sa").alias("dst")))
        .withColumn("w", F.lit(1).cast("long"))
    )
    pr = pagerank(
        edges,
        sources=list(_CPG_SEEDS),
        iterations=_CPG_ITERS,
        weight="w",
    )
    trusted = pr.where(F.col("rank_fp") >= _CPG_THRESH).select(
        F.col("node").alias("source")
    )
    # Round 11 — same gated set, one documents pass instead of three
    # (the former shape joined docs ⋈ corpus_filter verdicts ⋈
    # exact_duplicate_groups keep_ids on doc_id: four exchanges and
    # two extra full scans of documents):
    #  - corpus_filter is a row-local scan, so carrying source/lang/
    #    text through it and filtering `keep` IS the doc_id join;
    #  - `keep` depends only on text, so a content group (the
    #    exact-dedup key (md5(text), length(text)) — the
    #    exact_duplicate_groups key, token for token) is kept or
    #    dropped WHOLE, which makes min(doc_id) over the kept group
    #    equal exact_duplicate_groups' keep_id over all documents;
    #  - the trusted-source gate commutes with both (it never touches
    #    the content window: canon was computed over ALL sources
    #    before, so it must stay after the window here).
    cf = corpus_filter(
        docs,
        classifier_weights=QC_TRAINED_WEIGHTS,
        classifier_bias=QC_TRAINED_BIAS,
        passthrough=["source", "lang", "text"],
    )
    from pyspark.sql import Window

    from svoe_spark.functions.text import md5_hash

    wfp = Window.partitionBy(md5_hash("text"), F.length("text"))
    gated = (
        cf.where(F.col("keep"))
        .withColumn("__keep_id", F.min("doc_id").over(wfp))
        .where(F.col("doc_id") == F.col("__keep_id"))
        .join(F.broadcast(trusted), "source")
    )
    return source_mixture_weights(gated, group_col="lang")


IVF2_K1 = 8
IVF2_K2 = 8


@query(
    "semantic_dedup_hier",
    f"""
    WITH coarse AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF2_K1}
    ),
    sub AS (
      SELECT CAST((vec_id - {IVF2_K1}) // {IVF2_K2} AS BIGINT) AS cid,
             CAST((vec_id - {IVF2_K1}) % {IVF2_K2} AS BIGINT) AS sid,
             embedding AS sv
      FROM embeddings
      WHERE vec_id >= {IVF2_K1} AND vec_id < {IVF2_K1 + IVF2_K1 * IVF2_K2}
    ),
    a1 AS (
      SELECT e.vec_id, e.embedding, c.cid
      FROM embeddings e, coarse c
      QUALIFY row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY {sql_cosine('e.embedding', 'c.cv')} DESC, c.cid
      ) = 1
    ),
    a2 AS (
      SELECT a1.vec_id, a1.embedding,
             a1.cid * {IVF2_K2} + s.sid AS cluster_id
      FROM a1 JOIN sub s ON a1.cid = s.cid
      QUALIFY row_number() OVER (
        PARTITION BY a1.vec_id
        ORDER BY {sql_cosine('a1.embedding', 's.sv')} DESC, s.sid
      ) = 1
    ),
    p AS (
      SELECT b.vec_id
      FROM a2 x JOIN a2 b ON x.cluster_id = b.cluster_id AND x.vec_id < b.vec_id
      WHERE {sql_cosine('x.embedding', 'b.embedding')} >= {SEMDEDUP_THRESHOLD}
      GROUP BY b.vec_id
    )
    SELECT a2.vec_id, a2.cluster_id, (p.vec_id IS NOT NULL) AS dropped
    FROM a2 LEFT JOIN p ON a2.vec_id = p.vec_id
    """,
)
def semantic_dedup_hier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the HIERARCHICAL codebook (ivf_assign_2level):
    8x8 = 64 effective cells for 8+8 argmax cost per row — the scale
    path to the few-hundred-per-cluster codebook sizes the SemDeDup
    design wants, where a flat constant-literal argmax caps out.
    Seeded layout: coarse = vectors[0..8), sub[c] = vectors[8+8c..8+8c+8)."""
    from svoe_spark.operators.similarity import (
        ivf_assign_2level,
        semantic_prune,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    seeds = [
        list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < IVF2_K1 + IVF2_K1 * IVF2_K2)
        .orderBy("vec_id")
        .collect()
    ]
    coarse = seeds[:IVF2_K1]
    sub = [
        seeds[IVF2_K1 + c * IVF2_K2 : IVF2_K1 + (c + 1) * IVF2_K2]
        for c in range(IVF2_K1)
    ]
    # persist the assignment: the prune self-join would otherwise embed
    # the k1*k2*dim-literal argmax plan on BOTH join sides plus the
    # output side — analysis/optimization of three copies of that tree
    # dominated the query (9 s -> ~4 s at sf0.1)
    assigned = ivf_assign_2level(emb, coarse, sub).persist()
    out = semantic_prune(assigned, threshold=SEMDEDUP_THRESHOLD)
    out._svoe_persisted = assigned
    return out


@query(
    "bigram_surprise",
    f"""
    WITH t AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
    ex AS (
      SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos, toks[i] AS a, toks[i + 1] AS b
      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
            FROM t WHERE len(toks) >= 2)
    ),
    bg AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab FROM ex GROUP BY a, b),
    ug AS (SELECT a, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM bg GROUP BY a),
    sc AS (
      SELECT doc_id, pos, CAST(ug.n_a AS DOUBLE) / bg.n_ab AS inv
      FROM ex JOIN bg USING (a, b) JOIN ug USING (a)
    ),
    agg AS (
      SELECT doc_id, count(*) AS n_bigrams,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(list_sort(list({{'pos': pos, 'inv': inv}})),
                                s -> s.inv)),
               (x, y) -> x + y) AS s
      FROM sc GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, s / n_bigrams AS mean_inv_cond_prob FROM agg
    """,
)
def bigram_surprise_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean inverse conditional bigram probability per document — the
    transition-level LM filter (exact arithmetic, folded in document
    order; operators/text_analysis.py::bigram_surprise)."""
    from svoe_spark.operators.text_analysis import bigram_surprise

    return bigram_surprise(load_table(spark, "documents", sf_dir))


@query(
    "cluster_balanced_sample",
    f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF_K}
    ),
    a AS (
      SELECT e.vec_id, c.cid AS cluster_id
      FROM embeddings e, cents c
      QUALIFY row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY {sql_cosine('e.embedding', 'c.cv')} DESC, c.cid
      ) = 1
    )
    SELECT cluster_id, vec_id, rk FROM (
      SELECT cluster_id, vec_id,
             row_number() OVER (
               PARTITION BY cluster_id
               ORDER BY {sql_md5_hash("CAST(vec_id AS VARCHAR)")}, vec_id
             ) AS rk
      FROM a
    ) WHERE rk <= 3
    """,
)
def cluster_balanced_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware subsampling: deterministic k-per-embedding-
    cluster sample (ivf_assign blocking + per_group_topk) — the
    cluster-balanced selection step of coverage-preserving corpus
    pruning (cf. SemDeDup's keep-one-per-neighborhood, generalized to
    a quota per semantic cell). Pure composition of existing operators;
    at 100 TB cluster_id is the partition key and each group's window
    sorts locally."""
    from svoe_spark.operators.curation import per_group_topk
    from svoe_spark.operators.similarity import ivf_assign

    emb = load_table(spark, "embeddings", sf_dir)
    cents = _ivf_cents(spark, sf_dir)
    assigned = ivf_assign(emb, cents).select(
        F.col("cluster_id").cast("long").alias("cluster_id"), "vec_id"
    )
    return per_group_topk(assigned, "cluster_id", k=3, id_col="vec_id")


NGRAM_CONTAM_K = 3


@query(
    "contamination_spans",
    f"""
    WITH md AS (SELECT doc_id, {sql_md5_tokens('text')} AS md FROM documents),
    th AS (SELECT doc_id, {sql_token_hashes_from_digests('md', 1)} AS h1,
                  {sql_token_hashes_from_digests('md', 16)} AS h2 FROM md),
    gr AS (SELECT doc_id, {sql_kgram_hashes('h1', NGRAM_CONTAM_K)} AS g,
                  {sql_kgram_hashes('h2', NGRAM_CONTAM_K, 37)} AS g2 FROM th),
    pos AS (
      SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos, g[i] AS gram, g2[i] AS gram2
      FROM (SELECT doc_id, g, g2, unnest(range(1, len(g)+1)) AS i FROM gr)
    ),
    bgrams AS (
      SELECT DISTINCT gram, gram2 FROM pos WHERE doc_id % 50 = 0
    ),
    hits AS (
      SELECT p.doc_id, p.pos FROM pos p
      JOIN bgrams USING (gram, gram2)
      WHERE p.doc_id % 50 <> 0
    ),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       <= {NGRAM_CONTAM_K}
                  THEN 0 ELSE 1 END AS new_island
      FROM hits
    ),
    isl2 AS (
      SELECT doc_id, pos,
             SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM isl
    )
    SELECT doc_id,
           min(pos) AS span_start,
           max(pos) + {NGRAM_CONTAM_K - 1} AS span_end,
           max(pos) + {NGRAM_CONTAM_K} - min(pos) AS span_tokens,
           count(*) AS n_gram_hits
    FROM isl2 GROUP BY doc_id, island
    """,
)
def contamination_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level benchmark decontamination (GPT-3's n-gram collision
    removal, Brown et al. 2020 Appendix C): maximal corpus-doc spans
    whose trigrams all occur in the held-out benchmark subset (every
    50th doc). Feed to remove_repeated_spans(spans=...) to cut the
    contaminated text; `benchmark_contamination` is the whole-doc
    scoring sibling."""
    from svoe_spark.operators.dedup import contamination_spans

    docs = load_table(spark, "documents", sf_dir)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return contamination_spans(corpus, bench, k=NGRAM_CONTAM_K)


BM25_QUERIES = [
    (0, "spark join stream"),
    (1, "customer query vector"),
    (2, "window merge sort"),
]


def _bm25_oracle() -> str:
    from svoe_spark.operators.retrieval import sql_bm25_contrib

    vals = ", ".join(f"({qid}, '{qs}')" for qid, qs in BM25_QUERIES)
    contrib = sql_bm25_contrib("p.tf", "p.df", "p.dlen", "n_docs", "total_len")
    return f"""
    WITH d AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
    stats AS (SELECT count(*) AS n_docs, sum(len(toks)) AS total_len FROM d),
    post AS (
      SELECT term, doc_id, count(*) AS tf, any_value(dlen) AS dlen
      FROM (SELECT doc_id, len(toks) AS dlen, unnest(toks) AS term FROM d)
      GROUP BY term, doc_id
    ),
    pdf AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM post),
    q(query_id, query_text) AS (VALUES {vals}),
    qt AS (
      SELECT CAST(query_id AS BIGINT) AS query_id,
             unnest(list_distinct({sql_tokens('query_text')})) AS term
      FROM q
    ),
    m AS (
      SELECT qt.query_id, p.doc_id, p.term, {contrib} AS contrib
      FROM pdf p JOIN qt USING (term), stats
    ),
    s AS (
      SELECT query_id, doc_id,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(contrib ORDER BY term)),
               (acc, v) -> acc + v) AS score
      FROM m GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score, rank FROM (
      SELECT query_id, doc_id, score,
             row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
      FROM s
    ) WHERE rank <= 10
    """


def _bm25_lex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-keyed shared BM25 top-10 relation (VERDICT r9 ask 2 /
    the _mh_pairs discipline): `bm25_search` and `hybrid_search_rrf`
    both run bm25_topk(docs, BM25_QUERIES, k=10) — the full inverted
    index + postings scoring — so the (30-row) result is computed and
    persisted once per (session, sf_dir) and both queries project from
    it. The operator call is verbatim the former inline one, so the
    lexical ranking (and both oracle hashes) are identical by
    construction."""
    from svoe_spark.operators.retrieval import bm25_topk

    def build():
        docs = load_table(spark, "documents", sf_dir)
        queries = spark.createDataFrame(
            BM25_QUERIES, "query_id long, query_text string"
        )
        return bm25_topk(docs, queries, k=10).persist()

    return _cached_chain(spark, sf_dir, "bm25-lex", build)


@query("bm25_search", _bm25_oracle())
def bm25_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 over the documents corpus for a fixed 3-query
    workload (rational-idf bit-portable form; see
    operators/retrieval.py module docstring). The query side is
    broadcast; the oracle rebuilds the identical inverted index and
    term-sorted fold in DuckDB."""
    out = _bm25_lex(spark, sf_dir)
    return out.select(
        "query_id", "doc_id", "score", F.col("rank").cast("long").alias("rank")
    )


DSIR_B = 512


@query(
    "dsir_importance",
    f"""
    WITH toks AS (SELECT doc_id, lang, {sql_token_hashes('text')} AS th
                  FROM documents),
    tgt AS (
      SELECT h % {DSIR_B} AS b, count(*) AS c
      FROM (SELECT unnest(th) AS h FROM toks WHERE lang = 'en')
      GROUP BY 1
    ),
    raw AS (
      SELECT h % {DSIR_B} AS b, count(*) AS c
      FROM (SELECT unnest(th) AS h FROM toks) GROUP BY 1
    ),
    tot AS (
      SELECT CAST((SELECT sum(c) FROM tgt) AS BIGINT) AS t_total,
             CAST((SELECT sum(c) FROM raw) AS BIGINT) AS r_total
    ),
    rl AS (
      SELECT list(
               CAST((coalesce(t.c, 0) + 1) * (r_total + {DSIR_B}) AS DOUBLE)
               / ((coalesce(rw.c, 0) + 1) * (t_total + {DSIR_B}))
               ORDER BY g.range) AS ratios
      FROM range({DSIR_B}) g
      LEFT JOIN tgt t ON t.b = g.range
      LEFT JOIN raw rw ON rw.b = g.range, tot
    )
    SELECT doc_id, CAST(len(th) AS BIGINT) AS n_tokens,
           CASE WHEN len(th) > 0 THEN
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(th, h -> ratios[(h % {DSIR_B}) + 1])),
               (acc, v) -> acc + v) / len(th)
           ELSE 0.0e0 END AS importance
    FROM toks, rl
    """,
)
def dsir_importance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023) of every document
    toward the English subset as the target distribution — log-free
    mean probability-ratio form (see operators/selection.py). The
    oracle rebuilds the hashed-unigram distributions and the identical
    doc-order fold relationally."""
    from svoe_spark.operators.selection import dsir_importance

    docs = load_table(spark, "documents", sf_dir)
    # target as a PREDICATE over the raw corpus: both distribution
    # estimates ride one tokenize pass (round 11, selection.py) — the
    # counts, ratio table and every score are bit-identical to the
    # filtered-DataFrame form
    return dsir_importance(docs, F.col("lang") == "en", buckets=DSIR_B)


PQ_M_Q = 8
PQ_KSUB_Q = 16
_PQ_D = EMB_DIM // PQ_M_Q


def _sql_sub_dist2(a: str, b: str, d: int = 8) -> str:
    sq = f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {d + 1}), i -> {sq} * {sq})), "
        f"(acc, v) -> acc + v)"
    )


def _pq_prelude() -> str:
    """Shared CTE chain: subspace slices, seeded codebook, encoding."""
    return f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    sub AS (
      SELECT e.vec_id, sp.s,
             list_transform(range(sp.s * {_PQ_D} + 1, sp.s * {_PQ_D} + {_PQ_D + 1}),
                            i -> embedding[i]) AS sv
      FROM e, (SELECT unnest(range(0, {PQ_M_Q})) AS s) sp
    ),
    cb AS (SELECT vec_id AS c, s, sv AS cv FROM sub WHERE vec_id < {PQ_KSUB_Q}),
    enc AS (
      SELECT v.vec_id, v.s, cb.c
      FROM sub v JOIN cb USING (s)
      QUALIFY row_number() OVER (
        PARTITION BY v.vec_id, v.s
        ORDER BY {_sql_sub_dist2('v.sv', 'cb.cv', _PQ_D)}, cb.c) = 1
    )
    """


@query(
    "pq_codes",
    _pq_prelude()
    + """
    SELECT vec_id,
           array_to_string(list(CAST(c AS VARCHAR) ORDER BY s), ',') AS codes_csv
    FROM enc GROUP BY vec_id
    """,
)
def pq_codes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (Jégou et al. 2011) of every
    embedding: 8 subspaces x 16 codes (seeded codebook = subvectors of
    the first 16 vectors), 64 floats -> 8 bytes. Codes serialized to
    CSV for the driver's scalar-only canonicalizer."""
    emb, cbs, coded = _pq_seed_chain(spark, sf_dir)
    return coded.select(
        "vec_id",
        F.array_join(
            F.transform("codes", lambda c: c.cast("string")), ","
        ).alias("codes_csv"),
    )


def _pq_adc_chain() -> str:
    """Flat-PQ oracle chain shared by pq_adc_topk / pq_adc_refined:
    prelude + query subvectors + per-subspace LUT + the ADC fold —
    ends with relation ``adc(vec_id, adc_dist)`` (factored so a tie-
    rule fix can never drift between the two hash-checked oracles)."""
    return (
        _pq_prelude()
        + f""",
    q AS (SELECT s, sv AS qv FROM sub WHERE vec_id = 0),
    lut AS (
      SELECT cb.s, cb.c, {_sql_sub_dist2('qv', 'cb.cv', _PQ_D)} AS qd
      FROM cb JOIN q USING (s)
    ),
    adc AS (
      SELECT enc.vec_id,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(l.qd ORDER BY enc.s)),
               (acc, v) -> acc + v) AS adc_dist
      FROM enc JOIN lut l ON l.s = enc.s AND l.c = enc.c
      GROUP BY enc.vec_id
    )
    """
    )


@query(
    "pq_adc_topk",
    _pq_adc_chain()
    + """
    SELECT vec_id, adc_dist FROM adc ORDER BY adc_dist, vec_id LIMIT 10
    """,
)
def pq_adc_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-10 for query vec_id=0: the query
    stays unquantized, per-subspace distance lookup tables ride as a
    plan literal, each row's distance is m table lookups over its
    8-byte code — the memory-scale ANN path (32x smaller scan than raw
    embeddings). Oracle re-derives codebook, encoding, LUT and the
    subspace-order fold relationally."""
    from svoe_spark.operators.similarity import pq_topk

    emb, cbs, coded = _pq_seed_chain(spark, sf_dir)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    return pq_topk(coded, qv, cbs, k=10)


IVFPQ_NPROBE = 2


# Frozen-artifact cache for the ANN demo-query family (VERDICT r5 ask
# 6): a codebook is a TRAINED artifact — trained once, applied to any
# corpus (the same contract the frozen tokenizer/classifier constants
# already encode) — and every derivation here is deterministic, so
# per-process memoization of (emb, cents, cbs, persisted codes) per
# (kind, sf_dir) is semantics-free. The bench's _topk/_refined pairs
# and the recall90 query stop re-paying the train+encode chain; a
# session change invalidates the entry (persisted data dies with its
# session).
_ANN_CHAIN_CACHE: dict = {}


def _cached_chain(spark: SparkSession, sf_dir: str, kind: str, build):
    key = (kind, sf_dir)
    got = _ANN_CHAIN_CACHE.get(key)
    if got is not None and got[0] is spark:
        return got[1]
    val = build()
    _ANN_CHAIN_CACHE[key] = (spark, val)
    return val


def _ivf_cents(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """The deterministic first-IVF_K coarse codebook, pulled ONCE per
    (session, sf_dir) via Arrow and shared by every IVF consumer
    (round 11): five queries each ran their own
    `filter(vec_id < IVF_K).orderBy(vec_id).collect()` — an eager
    sample+sort job chain plus row-pickled transfer (~0.5-0.9 s per
    call) for the same 16 rows. The pandas sort over exact integer ids
    reproduces the orderBy, and float() of the Arrow float64 values
    yields the identical doubles Row.collect() produced."""

    def build():
        pdf = (
            load_table(spark, "embeddings", sf_dir)
            .where(F.col("vec_id") < IVF_K)
            .select("vec_id", "embedding")
            .toPandas()
            .sort_values("vec_id")
        )
        return [[float(x) for x in v] for v in pdf["embedding"]]

    return _cached_chain(spark, sf_dir, "ivf-cents", build)


def _pq_seed_chain(spark: SparkSession, sf_dir: str):
    """(emb, cbs, persisted flat-PQ codes) at the demo geometry."""
    from svoe_spark.operators.similarity import pq_encode, pq_train

    def build():
        emb = load_table(spark, "embeddings", sf_dir)
        cbs = pq_train(emb, m=PQ_M_Q, ksub=PQ_KSUB_Q, method="seed")
        coded = pq_encode(emb, cbs).persist()
        return emb, cbs, coded

    return _cached_chain(spark, sf_dir, "pq-seed", build)


def _ivfpq_seed_chain(
    spark: SparkSession,
    sf_dir: str,
    m: int = PQ_M_Q,
    ksub: int = PQ_KSUB_Q,
    numpy_encode: bool = True,
):
    """(emb, cents, cbs, persisted IVF-PQ codes) at the given PQ
    geometry. ``numpy_encode`` selects the bit-identical numpy encoder
    (required at production geometry, where the m*ksub-leaf expression
    tree bloats task serialization; round 11 — now the default at the
    query geometry too: measured 1.56/0.61 -> 0.46/0.44 s cold/warm at
    m=8 ksub=16 over sf0.1, all 2000 coded rows verified identical to
    the expression form in-session, on top of the standing
    bit-identity contract in ivfpq_encode_numpy's docstring/tests)."""
    from svoe_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_encode_numpy,
        ivfpq_train,
    )

    def build():
        emb = load_table(spark, "embeddings", sf_dir)
        cents = _ivf_cents(spark, sf_dir)
        cbs = ivfpq_train(emb, cents, m=m, ksub=ksub, method="seed")
        enc = ivfpq_encode_numpy if numpy_encode else ivfpq_encode
        coded = enc(emb, cents, cbs).persist()
        return emb, cents, cbs, coded

    return _cached_chain(spark, sf_dir, f"ivfpq-seed-m{m}k{ksub}", build)


def _ivfpq_chain(
    nprobe: int = IVFPQ_NPROBE,
    m: int = PQ_M_Q,
    ksub: int = PQ_KSUB_Q,
    qids: tuple[int, ...] = (0,),
) -> str:
    """Shared oracle CTE chain for the IVF-PQ queries: assignment,
    residuals, codebooks, encoding, probes, per-cell LUTs, ADC fold —
    ends with relation ``adc(qid, vec_id, adc_dist)``. ``nprobe`` /
    ``m`` / ``ksub`` are the probe count and PQ geometry (the
    recall-0.9 operating-point query widens all three; seeds stay the
    ksub residuals after the coarse block, whatever the size);
    ``qids`` is the QUERY BATCH — every q-side CTE carries ``qid``, so
    the batched search oracles on the same chain (single-query
    callers just never select the constant qid column)."""
    d = EMB_DIM // m
    ids = ", ".join(str(int(i)) for i in qids)
    return f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF_K}
    ),
    a AS (
      SELECT e.vec_id, e.embedding, c.cid AS cluster_id, c.cv
      FROM embeddings e, cents c
      QUALIFY row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY {sql_cosine('e.embedding', 'c.cv')} DESC, c.cid) = 1
    ),
    res AS (
      SELECT vec_id, cluster_id,
             list_transform(range(1, {EMB_DIM + 1}),
                            i -> CAST(embedding[i] AS DOUBLE) - CAST(cv[i] AS DOUBLE)) AS r
      FROM a
    ),
    sub AS (
      SELECT res.vec_id, res.cluster_id, sp.s,
             list_transform(range(sp.s * {d} + 1, sp.s * {d} + {d + 1}),
                            i -> r[i]) AS sv
      FROM res, (SELECT unnest(range(0, {m})) AS s) sp
    ),
    cbr AS (
      SELECT vec_id - {IVF_K} AS c, s, sv AS cv FROM sub
      WHERE vec_id >= {IVF_K} AND vec_id < {IVF_K + ksub}
    ),
    enc AS (
      SELECT v.vec_id, v.cluster_id, v.s, cbr.c
      FROM sub v JOIN cbr USING (s)
      QUALIFY row_number() OVER (
        PARTITION BY v.vec_id, v.s
        ORDER BY {_sql_sub_dist2('v.sv', 'cbr.cv', d)}, cbr.c) = 1
    ),
    q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
          WHERE vec_id IN ({ids})),
    probes AS (
      SELECT q.qid, c.cid AS pcell, c.cv AS pcv FROM cents c, q
      QUALIFY row_number() OVER (
        PARTITION BY q.qid
        ORDER BY {sql_cosine('qv', 'c.cv')} DESC, c.cid) <= {nprobe}
    ),
    qres AS (
      SELECT probes.qid, pcell,
             list_transform(range(1, {EMB_DIM + 1}),
                            i -> CAST(qv[i] AS DOUBLE) - CAST(pcv[i] AS DOUBLE)) AS qr
      FROM probes JOIN q ON probes.qid = q.qid
    ),
    qsub AS (
      SELECT qid, pcell, sp.s,
             list_transform(range(sp.s * {d} + 1, sp.s * {d} + {d + 1}),
                            i -> qr[i]) AS qsv
      FROM qres, (SELECT unnest(range(0, {m})) AS s) sp
    ),
    lut AS (
      SELECT qsub.qid, qsub.pcell, qsub.s, cbr.c,
             {_sql_sub_dist2('qsub.qsv', 'cbr.cv', d)} AS qd
      FROM qsub JOIN cbr USING (s)
    ),
    adc AS (
      SELECT l.qid, enc.vec_id,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(l.qd ORDER BY enc.s)),
               (acc, v) -> acc + v) AS adc_dist
      FROM enc JOIN lut l
        ON l.pcell = enc.cluster_id AND l.s = enc.s AND l.c = enc.c
      GROUP BY l.qid, enc.vec_id
    )
    """


@query(
    "ann_ivfpq_topk",
    _ivfpq_chain()
    + """
    SELECT vec_id, adc_dist FROM adc ORDER BY adc_dist, vec_id LIMIT 10
    """,
)
def ann_ivfpq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (FAISS IVFADC) search, nprobe=2: coarse cells from the
    deterministic first-16 codebook, residual PQ codes (8 subspaces x
    16 codes seeded from the residuals of ids 16-31 — the first 16 ARE
    the centroids, so their residuals are zero), per-probed-cell ADC lookup
    tables as one plan literal. The scan reads only (vec_id,
    cluster_id, 8 codes) inside the 2 probed cells — the compounding
    of partition pruning (IVF) and 32x column compression (PQ) that
    makes ANN viable at 100 TB. Oracle re-derives assignment,
    residuals, codebooks, encoding, probes, per-cell LUTs and the
    subspace-order fold relationally."""
    from svoe_spark.operators.similarity import ann_ivfpq_topk

    emb, cents, cbs, coded = _ivfpq_seed_chain(spark, sf_dir)
    return ann_ivfpq_topk(
        coded,
        emb.filter(F.col("vec_id") == 0),
        cents,
        cbs,
        k=10,
        nprobe=IVFPQ_NPROBE,
    )


REFINE_R = 50


def _refine_tail(r: int = REFINE_R) -> str:
    """Shared oracle tail for the refined ANN queries: top-R shortlist
    off the preceding ``adc`` relation, exact full-dim L2 rescore of
    just those rows, true top-10."""
    return f""",
    short AS (SELECT vec_id FROM adc ORDER BY adc_dist, vec_id LIMIT {r}),
    qfull AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           {_sql_sub_dist2('e.embedding', 'qv', EMB_DIM)} AS exact_dist
    FROM embeddings e JOIN short USING (vec_id) CROSS JOIN qfull
    ORDER BY exact_dist, e.vec_id LIMIT 10
    """


@query("ann_ivfpq_refined", _ivfpq_chain() + _refine_tail())
def ann_ivfpq_refined_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search WITH the exact re-rank (refine) stage — FAISS
    IVFADC+refine (Jégou et al. 2011 §V): ADC produces a top-50
    shortlist from the probed cells, the raw vectors of just those 50
    ids join back (broadcast semi-join), and the final top-10 is by
    EXACT squared-L2 — recall then hinges on shortlist membership, not
    quantization error. Oracle re-derives the whole IVFADC chain plus
    the full-dim exact rescore with the identical fold."""
    from svoe_spark.operators.similarity import ann_ivfpq_topk, refine_topk

    emb, cents, cbs, coded = _ivfpq_seed_chain(spark, sf_dir)
    qdf = emb.filter(F.col("vec_id") == 0)
    short = ann_ivfpq_topk(
        coded, qdf, cents, cbs, k=REFINE_R, nprobe=IVFPQ_NPROBE
    )
    # materialize the R-row shortlist (bounded driver pull, the library
    # convention for tiny relations): as a lazy broadcast side it would
    # re-execute the whole ADC encode fold inside the refine job
    ids = [(int(r["vec_id"]),) for r in short.collect()]
    cand = spark.createDataFrame(ids, "vec_id long")
    return refine_topk(cand, emb, qdf, k=10, metric="l2")


# The measured production operating point (VERDICT r5 ask 1):
# scripts/measure_ivf_recall.py sweeps {seeded, kmeans} coarse x m x
# ksub x nprobe x R against exact L2 truth on 20 unbiased queries;
# cheapest config with recall@10 >= 0.9 is seeded coarse, m=16,
# ksub=256, nprobe=16, R=200 -> recall@10 = 0.995 (full table in
# similarity.refine_topk's docstring). nprobe=16 of 16 is the honest
# number ON THIS FIXTURE: near-uniform synthetic embeddings give a
# 16-cell coarse quantizer no margin to prune (every cell holds true
# neighbors — nprobe=8 caps recall at 0.75 regardless of PQ quality);
# on clustered real embeddings the same sweep picks nprobe < K. The
# PQ geometry is the production one either way: 256 codes/subspace,
# 4-dim subspaces.
RECALL90_M = 16
RECALL90_KSUB = 256
RECALL90_NPROBE = 16
RECALL90_R = 200


@query(
    "ann_ivfpq_recall90",
    _ivfpq_chain(nprobe=RECALL90_NPROBE, m=RECALL90_M, ksub=RECALL90_KSUB)
    + _refine_tail(r=RECALL90_R),
)
def ann_ivfpq_recall90_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + exact refine at the MEASURED recall>=0.9 operating
    point (seeded codebooks: coarse = first 16 vectors, residual PQ
    seeded from the 256 residuals after the coarse block — fully
    oracle-expressible). Encoding AND the ADC scan run the numpy fast
    paths (bit-identical column-by-column left folds; at this geometry
    the expression tree bloats task serialization and the 65k-double
    LUT literal costs seconds of Catalyst parse — measured 7.7 s ->
    4.2 s warm by switching), the R=200 shortlist is exact-rescored.
    Oracle re-derives the whole chain at the same geometry."""
    from svoe_spark.operators.similarity import (
        ann_ivfpq_topk_numpy,
        refine_topk,
    )

    emb, cents, cbs, coded = _ivfpq_seed_chain(
        spark, sf_dir, m=RECALL90_M, ksub=RECALL90_KSUB, numpy_encode=True
    )
    qdf = emb.filter(F.col("vec_id") == 0)
    short = ann_ivfpq_topk_numpy(
        coded, qdf, cents, cbs, k=RECALL90_R, nprobe=RECALL90_NPROBE
    )
    # bounded driver pull, same rationale as ann_ivfpq_refined
    ids = [(int(r["vec_id"]),) for r in short.collect()]
    cand = spark.createDataFrame(ids, "vec_id long")
    return refine_topk(cand, emb, qdf, k=10, metric="l2")


# Query batch for the batched ANN rows: arbitrary but frozen ids —
# disjoint from the coarse seed block (0-15 would make every probe a
# self-cell hit) except 7, which doubles as the "query IS a centroid"
# edge.
ANN_BATCH_QIDS = (7, 25, 42, 101, 333)
_BATCH_IDS_SQL = ", ".join(str(i) for i in ANN_BATCH_QIDS)


@query(
    "ann_ivfpq_batch",
    _ivfpq_chain(qids=ANN_BATCH_QIDS)
    + """
    SELECT qid AS query_id, vec_id, adc_dist FROM adc
    QUALIFY row_number() OVER (
      PARTITION BY qid ORDER BY adc_dist, vec_id) <= 10
    """,
)
def ann_ivfpq_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search for a BATCH of 5 queries in ONE pruned pass —
    the scale-path sibling of ann_batch_topk (retrieval eval and
    mining jobs search batches, not single vectors): probe selection
    for all queries is one Spark job on the shared IVF expression,
    per-(query, cell) LUTs ride the UDF closure, each probed-cell
    chunk emits per-query partial top-ks, and one per-query window
    finishes. Rows bit-identical to running ann_ivfpq_topk per query
    (tested); oracle runs the SAME single-query CTE chain with qid
    carried through every q-side relation."""
    from svoe_spark.operators.similarity import ann_ivfpq_topk_batch

    emb, cents, cbs, coded = _ivfpq_seed_chain(spark, sf_dir)
    queries = emb.filter(F.col("vec_id").isin(list(ANN_BATCH_QIDS))).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_ivfpq_topk_batch(
        coded, queries, cents, cbs, k=10, nprobe=IVFPQ_NPROBE
    )


@query(
    "ann_ivfpq_batch_refined",
    _ivfpq_chain(qids=ANN_BATCH_QIDS)
    + f""",
    short AS (
      SELECT qid, vec_id FROM adc
      QUALIFY row_number() OVER (
        PARTITION BY qid ORDER BY adc_dist, vec_id) <= {REFINE_R}
    ),
    qfull AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
              WHERE vec_id IN ({_BATCH_IDS_SQL}))
    SELECT s.qid AS query_id, e.vec_id,
           {_sql_sub_dist2('e.embedding', 'qv', EMB_DIM)} AS exact_dist
    FROM embeddings e
    JOIN short s ON e.vec_id = s.vec_id
    JOIN qfull ON s.qid = qfull.qid
    QUALIFY row_number() OVER (
      PARTITION BY s.qid ORDER BY exact_dist, e.vec_id) <= 10
    """,
)
def ann_ivfpq_batch_refined_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full batched production shape: per-query ADC top-R
    shortlists from one pruned pass, then refine_topk_batch — a fully
    relational exact re-rank (shortlists broadcast into the raw-vector
    scan, query vectors attach by query_id, one per-query window) —
    no driver round-trip between the stages."""
    from svoe_spark.operators.similarity import (
        ann_ivfpq_topk_batch,
        refine_topk_batch,
    )

    emb, cents, cbs, coded = _ivfpq_seed_chain(spark, sf_dir)
    queries = emb.filter(F.col("vec_id").isin(list(ANN_BATCH_QIDS))).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    short = ann_ivfpq_topk_batch(
        coded, queries, cents, cbs, k=REFINE_R, nprobe=IVFPQ_NPROBE
    )
    return refine_topk_batch(short, emb, queries, k=10, metric="l2")


@query("pq_adc_refined", _pq_adc_chain() + _refine_tail())
def pq_adc_refined_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-PQ ADC shortlist (top-50 over ALL codes, no coarse cells)
    re-ranked exactly — the refine stage isolated from IVF probing, so
    the pair (pq_adc_topk, pq_adc_refined) measures exactly what the
    rescore buys at fixed candidate generation."""
    from svoe_spark.operators.similarity import pq_topk, refine_topk

    emb, cbs, coded = _pq_seed_chain(spark, sf_dir)
    qdf = emb.where(F.col("vec_id") == 0)
    qv = [float(x) for x in qdf.first()["embedding"]]
    short = pq_topk(coded, qv, cbs, k=REFINE_R)
    # bounded driver pull, same rationale as ann_ivfpq_refined
    ids = [(int(r["vec_id"]),) for r in short.collect()]
    cand = spark.createDataFrame(ids, "vec_id long")
    return refine_topk(cand, emb, qdf, k=10, metric="l2")


_IDX_JACC = (
    "len(list_intersect(a.sset, b.sset)) / "
    "(len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset)))"
)


@query(
    "dedup_index_probe",
    f"""
    WITH {_minhash_sql()},
    probe AS (
      SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_old
      FROM bands n JOIN bands o
        ON n.band = o.band AND n.bkey = o.bkey
      WHERE n.doc_id % 5 = 0 AND o.doc_id % 5 <> 0
    )
    SELECT id_new, id_old, {_IDX_JACC} AS jaccard
    FROM probe
    JOIN sets a ON probe.id_new = a.doc_id
    JOIN sets b ON probe.id_old = b.doc_id
    WHERE {_IDX_JACC} >= 0.5
    """,
)
def dedup_index_probe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: docs with id % 5 == 0 play the role of
    today's crawl batch, the rest are the already-indexed corpus. The
    batch's LSH band keys are broadcast against the stored postings
    (the corpus side is never shuffled or re-shingled), candidates are
    verified by exact Jaccard over the stored shingle sets. The oracle
    re-derives postings + sets for both sides from the shared MinHash
    constants and applies the same split."""
    from svoe_spark.operators.dedup_index import index_tables, probe_index

    docs = load_table(spark, "documents", sf_dir)
    old = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)
    bands, sets = index_tables(old, params=_MH)
    return probe_index(new, bands, sets, params=_MH, threshold=0.5)


# Frozen BPE merge table: bpe_train(word_frequencies(documents@sf0.001),
# num_merges=64, top_words=100000) — a tokenizer is a train-once
# artifact applied to any corpus, which is exactly what makes the
# encoding oracle-checkable (the oracle applies the same constant
# merges via a recursive CTE). tests/test_tokenizer.py asserts this
# list is reproduced bit-for-bit from the fixture.
BPE_FIXED_MERGES: list[tuple[str, str]] = [
    ('e', 'r'), ('o', 'r'), ('i', 'n'), ('o', 'w'), ('s', 't'),
    ('l', 'u'), ('a', 'r'), ('p', 'ar'), ('m', 'er'), ('a', 't'),
    ('a', 'n'), ('c', 'an'), ('s', 'can'), ('c', 'o'), ('co', 'lu'),
    ('colu', 'm'), ('colum', 'n'), ('d', 'ow'), ('in', 'dow'),
    ('w', 'indow'), ('d', 'er'), ('or', 'der'), ('or', 't'),
    ('s', 'ort'), ('par', 't'), ('u', 'p'), ('a', 'g'), ('ag', 'g'),
    ('a', 'lu'), ('alu', 'e'), ('v', 'alue'), ('in', 'e'),
    ('l', 'ine'), ('e', 'y'), ('k', 'ey'), ('j', 'o'), ('jo', 'in'),
    ('g', 'e'), ('mer', 'ge'), ('er', 'y'), ('g', 'r'), ('gr', 'o'),
    ('gro', 'up'), ('q', 'u'), ('qu', 'ery'), ('c', 't'),
    ('ct', 'or'), ('e', 'ctor'), ('v', 'ector'), ('a', 's'),
    ('as', 'h'), ('h', 'ash'), ('l', 'ow'), ('s', 'low'),
    ('a', 'm'), ('e', 'am'), ('r', 'eam'), ('st', 'ream'),
    ('f', 'i'), ('fi', 'l'), ('fil', 't'), ('filt', 'er'),
    ('a', 'st'), ('f', 'ast'),
]


def _bpe_sql() -> str:
    from svoe_spark.operators.tokenizer import WORD_RE

    mlist = "[" + ",".join(f"'{a} {b}'" for a, b in BPE_FIXED_MERGES) + "]"
    best = (
        "list_sort(list_filter("
        "list_transform(range(1, len(seq)), i -> "
        f"{{'r': list_position({mlist}, seq[i] || ' ' || seq[i + 1]), 'i': i}}), "
        "x -> x.r IS NOT NULL AND x.r > 0))[1]"
    )
    return f"""
    WITH RECURSIVE words AS (
      SELECT DISTINCT u.w AS word FROM (
        SELECT unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS w
        FROM documents
      ) u
    ),
    enc(word, seq) AS (
      SELECT word, list_transform(range(1, length(word) + 1), i -> word[i])
      FROM words
      UNION ALL
      SELECT word,
             seq[1:(best.i - 1)] || [seq[best.i] || seq[best.i + 1]]
               || seq[(best.i + 2):len(seq)]
      FROM (SELECT word, seq, {best} AS best FROM enc) WHERE best IS NOT NULL
    ),
    done AS (
      SELECT word, seq
      FROM (SELECT word, seq, {best} AS best FROM enc) WHERE best IS NULL
    ),
    d AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{WORD_RE}') AS ws
      FROM documents
    ),
    dw AS (
      SELECT doc_id, u.p AS pos, u.w AS word
      FROM d,
           unnest(list_transform(range(1, len(ws) + 1),
                                 i -> {{'p': i, 'w': ws[i]}})) AS t(u)
    )
    SELECT d.doc_id,
           CAST(coalesce(sum(len(done.seq)), 0) AS BIGINT) AS n_tokens,
           coalesce(string_agg(array_to_string(done.seq, ','), ','
                               ORDER BY dw.pos), '') AS tokens_csv
    FROM d
    LEFT JOIN dw USING (doc_id)
    LEFT JOIN done ON dw.word = done.word
    GROUP BY d.doc_id
    """


# Frozen unigram-LM artifact: unigram_train(word_frequencies(sf0.001
# documents), vocab_size=64, max_piece_len=6, em_iters=4) — a tokenizer
# is a fixed artifact, trained once, applied to any corpus (same
# contract as BPE_FIXED_MERGES above). (piece, integer cost) with cost
# = round(-ln p * 1000); integer costs are what make the Viterbi
# optimum engine-portable (operators/tokenizer.py module docstring).
UNIGRAM_FIXED_PIECES: list[tuple[str, int]] = [
    ('scan', 3377), ('column', 3384), ('window', 3386), ('order', 3387),
    ('sort', 3388), ('part', 3399), ('agg', 3409), ('value', 3413),
    ('line', 3417), ('key', 3418), ('join', 3427), ('merge', 3429),
    ('group', 3430), ('query', 3430), ('a', 3433), ('vector', 3433),
    ('hash', 3441), ('slow', 3444), ('stream', 3446), ('filter', 3448),
    ('fast', 3452), ('batch', 3456), ('spark', 3456), ('the', 3456),
    ('table', 3463), ('small', 3469), ('data', 3471), ('big', 3478),
    ('custom', 3479), ('er', 3479), ('row', 3505), ('dup', 6902),
    ('custo', 18680), ('mer', 18680), ('gg', 20455), ('b', 27631),
    ('c', 27631), ('cu', 27631), ('cus', 27631), ('cust', 27631),
    ('d', 27631), ('e', 27631), ('f', 27631), ('g', 27631),
    ('h', 27631), ('i', 27631), ('j', 27631), ('k', 27631),
    ('l', 27631), ('m', 27631), ('n', 27631), ('o', 27631),
    ('omer', 27631), ('p', 27631), ('q', 27631), ('r', 27631),
    ('s', 27631), ('stomer', 27631), ('t', 27631), ('tomer', 27631),
    ('u', 27631), ('v', 27631), ('w', 27631), ('y', 27631),
]


def _unigram_chain(text_expr: str = "lower(text)") -> str:
    """Shared oracle chain for the unigram queries: per distinct word,
    EXHAUSTIVELY enumerate every segmentation into vocabulary pieces
    (recursive CTE — words are bounded, so the lattice is) and pick
    the Viterbi optimum by the operator's exact rule: min (total_cost,
    piece-length sequence longest-first). Ends with relation
    ``udone(word, cost, csv, n)``; an out-of-vocabulary word falls
    back to its characters at 1e6 per unknown char, mirroring
    ``segment_word_fallback``. ``text_expr`` is the SQL expression the
    words are extracted from — the planted-OOV query swaps in a
    translate() so both engines see identical mutated text."""
    from svoe_spark.operators.tokenizer import WORD_RE

    vals = ",".join(
        f"('{p}', {c}, {len(p)})" for p, c in UNIGRAM_FIXED_PIECES
    )
    return f"""
    WITH RECURSIVE upieces(p, cost, plen) AS (VALUES {vals}),
    uwords AS (
      SELECT DISTINCT u.w AS word FROM (
        SELECT unnest(regexp_extract_all({text_expr}, '{WORD_RE}')) AS w
        FROM documents
      ) u
    ),
    useg(word, pos, cost, neglens, csv) AS (
      SELECT word, 0, CAST(0 AS BIGINT), CAST([] AS BIGINT[]), ''
      FROM uwords
      UNION ALL
      SELECT s.word, s.pos + pc.plen, s.cost + pc.cost,
             list_append(s.neglens, -pc.plen),
             CASE WHEN s.csv = '' THEN pc.p ELSE s.csv || ',' || pc.p END
      FROM useg s JOIN upieces pc
        ON s.pos + pc.plen <= length(s.word)
       AND substring(s.word, s.pos + 1, pc.plen) = pc.p
    ),
    ubest AS (
      SELECT word, cost, csv, CAST(len(neglens) AS BIGINT) AS n
      FROM useg WHERE pos = length(word)
      QUALIFY row_number() OVER (PARTITION BY word
                                 ORDER BY cost, neglens) = 1
    ),
    uchars AS (
      SELECT word, t.i AS i, substring(word, t.i, 1) AS ch
      FROM uwords, unnest(range(1, length(word) + 1)) AS t(i)
    ),
    ufb AS (
      SELECT word, sum(coalesce(pc.cost, 1000000)) AS cost,
             string_agg(ch, ',' ORDER BY i) AS csv,
             count(*) AS n
      FROM uchars LEFT JOIN upieces pc ON pc.p = ch
      GROUP BY word
    ),
    udone AS (
      SELECT w.word,
             coalesce(b.cost, ufb.cost) AS cost,
             coalesce(b.csv, ufb.csv) AS csv,
             coalesce(b.n, ufb.n) AS n
      FROM uwords w
      LEFT JOIN ubest b USING (word)
      JOIN ufb USING (word)
    ),
    ud AS (
      SELECT doc_id, regexp_extract_all({text_expr}, '{WORD_RE}') AS ws
      FROM documents
    ),
    udw AS (
      SELECT doc_id, u.p AS pos, u.w AS word
      FROM ud,
           unnest(list_transform(range(1, len(ws) + 1),
                                 i -> {{'p': i, 'w': ws[i]}})) AS t(u)
    )
    """


@query(
    "unigram_tokens",
    _unigram_chain()
    + """
    SELECT ud.doc_id,
           CAST(coalesce(sum(udone.n), 0) AS BIGINT) AS n_tokens,
           coalesce(string_agg(udone.csv, ',' ORDER BY udw.pos), '')
             AS tokens_csv
    FROM ud
    LEFT JOIN udw USING (doc_id)
    LEFT JOIN udone ON udw.word = udone.word
    GROUP BY ud.doc_id
    """,
)
def unigram_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style, Kudo 2018) Viterbi encoding of
    every document under the frozen 64-piece vocabulary trained by
    distributed-stats + driver EM on the sf0.001 fixture. Spark side:
    Arrow-batched pandas UDF over an integer-cost DP with a
    per-executor word cache. Oracle: exhaustive segmentation
    enumeration per distinct word picks the identical optimum — full
    procedure equivalence, not just counts."""
    from svoe_spark.operators.tokenizer import unigram_encode

    docs = load_table(spark, "documents", sf_dir)
    out = unigram_encode(docs, UNIGRAM_FIXED_PIECES)
    return out.select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("n_tokens"),
        F.array_join("tokens", ",").alias("tokens_csv"),
    )


@query(
    "unigram_scores",
    _unigram_chain()
    + """
    SELECT ud.doc_id,
           CAST(coalesce(sum(udone.cost), 0) AS BIGINT) AS lm_cost,
           CAST(coalesce(sum(udone.n), 0) AS BIGINT) AS n_tokens
    FROM ud
    LEFT JOIN udw USING (doc_id)
    LEFT JOIN udone ON udw.word = udone.word
    GROUP BY ud.doc_id
    """,
)
def unigram_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram-LM encoding cost (negative log-likelihood
    in milli-nats — the total Viterbi path cost): the tokenizer-double-
    duty quality signal — text that tokenizes expensively under an
    in-domain unigram LM is out-of-domain (the same idea as the
    perplexity filters of CCNet/Brown 2020, using the tokenizer's own
    LM instead of a separate KenLM artifact)."""
    from svoe_spark.operators.tokenizer import unigram_encode

    docs = load_table(spark, "documents", sf_dir)
    out = unigram_encode(docs, UNIGRAM_FIXED_PIECES, out_cost="lm_cost")
    return out.select(
        "doc_id",
        F.col("lm_cost"),
        F.size("tokens").cast("bigint").alias("n_tokens"),
    )


@query(
    "unigram_tokens_oov",
    _unigram_chain(text_expr="translate(lower(text), 'kso', 'xz0')")
    + """
    SELECT ud.doc_id,
           CAST(coalesce(sum(udone.cost), 0) AS BIGINT) AS lm_cost,
           CAST(coalesce(sum(udone.n), 0) AS BIGINT) AS n_tokens,
           coalesce(string_agg(udone.csv, ',' ORDER BY udw.pos), '')
             AS tokens_csv
    FROM ud
    LEFT JOIN udw USING (doc_id)
    LEFT JOIN udone ON udw.word = udone.word
    GROUP BY ud.doc_id
    """,
)
def unigram_tokens_oov_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-OOV encoding (VERDICT r5 ask 2): translate k→x, s→z,
    o→0 in every document — 'x', 'z' and '0' are all OUTSIDE the
    frozen 64-piece vocabulary (its chars stop at 'y' and exclude
    digits), so every word containing k/s/o becomes uncoverable and
    must take ``segment_word_fallback``'s character fallback: raw
    chars, in-vocab chars at their trained cost, unknown chars at
    _UNK_COST=1e6 — while k/s/o-free words still Viterbi-segment
    normally. The lm_cost column witnesses the mixed per-char cost
    arithmetic exactly; the oracle's ``ufb`` branch replays the same
    rule in SQL. This is the hash-green proof that dirty real-corpus
    text degrades to priced character pieces, never to NULL tokens."""
    from svoe_spark.operators.tokenizer import unigram_encode

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "text", F.translate(F.lower("text"), "kso", "xz0")
    )
    out = unigram_encode(docs, UNIGRAM_FIXED_PIECES, out_cost="lm_cost")
    return out.select(
        "doc_id",
        F.col("lm_cost"),
        F.size("tokens").cast("bigint").alias("n_tokens"),
        F.array_join("tokens", ",").alias("tokens_csv"),
    )


@query("bpe_tokens", _bpe_sql())
def bpe_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-encode every document under the frozen 64-merge table
    (trained once on the sf0.001 fixture — a tokenizer is a fixed
    artifact applied to new corpora). Spark side: Arrow-batched pandas
    UDF with a per-executor word cache, zero shuffles (the merge loop
    is inherently iterative — the justified-Python case). Oracle:
    a recursive CTE applies the same constant merges (lowest rank,
    leftmost) per distinct word and reassembles documents in word
    order — full procedure equivalence, not just counts."""
    from svoe_spark.operators.tokenizer import bpe_encode

    docs = load_table(spark, "documents", sf_dir)
    out = bpe_encode(docs, BPE_FIXED_MERGES)
    return out.select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("n_tokens"),
        F.array_join("tokens", ",").alias("tokens_csv"),
    )


@query(
    "chunk_freq_dedup",
    f"""
    WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks FROM documents),
    e AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t),
    c AS (SELECT doc_id, CAST((i - 1) // 4 AS BIGINT) AS ci,
                 string_agg(toks[i], ' ' ORDER BY i) AS chunk
          FROM e GROUP BY 1, 2),
    r AS (SELECT *, count(*) OVER (PARTITION BY chunk) AS df FROM c)
    SELECT doc_id,
           COALESCE(string_agg(chunk, ' ' ORDER BY ci) FILTER (WHERE df <= 1), '')
             AS text_clean,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(*) FILTER (WHERE df > 1) AS BIGINT) AS n_removed
    FROM r GROUP BY doc_id
    """,
)
def chunk_freq_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal by chunk document frequency (the RefinedWeb
    line-dedup rule): EVERY copy of a chunk repeated corpus-wide is cut
    (max_df=1), unlike chunk_dedup's keep-first. Same two bounded
    shuffles; the keep rule is a frame-less windowed count on uniform
    content keys."""
    from svoe_spark.operators.cleaning import chunk_freq_dedup

    return chunk_freq_dedup(load_table(spark, "documents", sf_dir), width=4, max_df=1)


@query(
    "hard_negatives_lsh",
    f"""
    WITH b AS (
      SELECT vec_id, label, embedding, {_lsh_bucket_sql('embedding')} AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS anchor_id, n.vec_id AS neg_id,
           {sql_cosine('a.embedding', 'n.embedding')} AS cosine
    FROM b a JOIN b n
      ON a.bucket = n.bucket AND a.label <> n.label
    QUALIFY row_number() OVER (
      PARTITION BY a.vec_id
      ORDER BY {sql_cosine('a.embedding', 'n.embedding')} DESC, n.vec_id) = 1
    """,
)
def hard_negatives_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide hard-negative mining for contrastive training:
    every vector is an anchor; its hardest negative is the
    most-similar OTHER-label vector inside its hyperplane-LSH bucket
    (the blocking that makes all-pairs mining tractable — candidates
    shrink ~2^planes, bucket id is a uniform shuffle key). Top-1 per
    anchor by (cosine desc, neg_id)."""
    from svoe_spark.operators.similarity import hard_negatives_lsh

    emb = load_table(spark, "embeddings", sf_dir)
    return hard_negatives_lsh(emb, dim=EMB_DIM, k=1)


@query(
    "duplication_report",
    f"""
    WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks FROM documents),
    e AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t),
    c AS (SELECT doc_id, CAST((i - 1) // 4 AS BIGINT) AS ci,
                 string_agg(toks[i], ' ' ORDER BY i) AS chunk
          FROM e GROUP BY 1, 2),
    r AS (SELECT *, count(*) OVER (PARTITION BY chunk) AS df FROM c),
    pd AS (
      SELECT doc_id, count(*) AS n_chunks,
             CAST(count(*) FILTER (WHERE df > 1) AS BIGINT) AS n_dup
      FROM r GROUP BY doc_id
    )
    SELECT d.source, count(*) AS n_docs,
           CAST(sum(pd.n_chunks) AS BIGINT) AS n_chunks,
           CAST(sum(pd.n_dup) AS BIGINT) AS n_dup_chunks,
           CAST(sum(pd.n_dup) AS DOUBLE) / CAST(sum(pd.n_chunks) AS DOUBLE)
             AS dup_ratio
    FROM pd JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
)
def duplication_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication health report (what you look at BEFORE
    choosing dedup thresholds): chunk counts, corpus-duplicated chunk
    counts, and the duplication ratio per source. Same two bounded
    shuffles as the chunk-dedup operators; the ratio is one division
    of two exact integers. Docs with zero chunks (empty text) are
    excluded on both engines."""
    from svoe_spark.operators.cleaning import duplication_report

    return duplication_report(load_table(spark, "documents", sf_dir), width=4)


def _hybrid_rrf_oracle() -> str:
    term_l = "coalesce(CAST(1 AS DOUBLE)/(CAST(60 AS DOUBLE) + l.rank), CAST(0 AS DOUBLE))"
    term_d = "coalesce(CAST(1 AS DOUBLE)/(CAST(60 AS DOUBLE) + d.rank), CAST(0 AS DOUBLE))"
    return f"""
    WITH lex AS (SELECT * FROM ({_bm25_oracle()}) bm),
    dense AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {sql_cosine('e.embedding', 'q.embedding')} DESC,
                          e.vec_id) AS rank
        FROM embeddings e,
             (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id IN (0, 1, 2)) q
      ) WHERE rank <= 10
    ),
    f AS (
      SELECT coalesce(l.query_id, d.query_id) AS query_id,
             coalesce(l.doc_id, d.doc_id) AS doc_id,
             {term_l} + {term_d} AS rrf_score
      FROM lex l FULL JOIN dense d
        ON l.query_id = d.query_id AND l.doc_id = d.doc_id
    )
    SELECT query_id, doc_id, rrf_score, CAST(rnk AS BIGINT) AS rank FROM (
      SELECT query_id, doc_id, rrf_score,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY rrf_score DESC, doc_id) AS rnk
      FROM f
    ) WHERE rnk <= 10
    """


@query("hybrid_search_rrf", _hybrid_rrf_oracle())
def hybrid_search_rrf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-10 fused with brute-force
    dense top-10 by reciprocal-rank fusion (rank-only, so the two
    incomparable score scales never touch). The dense query for
    query_id q is the vec_id=q embedding — doc_id and vec_id are
    aligned in the fixtures. Both input lists are k-bounded per query,
    so fusion is a toy-sized full-outer join regardless of corpus
    size; the fused score is a fixed two-term expression tree,
    bit-identical across engines."""
    from pyspark.sql import Window

    from svoe_spark.operators.retrieval import rrf_fuse
    from svoe_spark.operators.similarity import brute_force_topk_batch

    emb = load_table(spark, "embeddings", sf_dir)
    lex = _bm25_lex(spark, sf_dir).select("query_id", "doc_id", "rank")
    qv = emb.where(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dw = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    dense = (
        brute_force_topk_batch(emb, qv, k=10)
        .withColumn("rank", F.row_number().over(dw))
        .select("query_id", F.col("vec_id").alias("doc_id"), "rank")
    )
    return rrf_fuse([lex, dense], k=10)


_AQF_THR = int(0.5 * (1 << 60))
_AQF_KEY = sql_md5_hash("CAST(doc_id AS VARCHAR)")


def _adaptive_filter_oracle() -> str:
    from svoe_spark.operators.profiling import order_statistics_sql

    return f"""
    WITH q0 AS (
      SELECT doc_id, source,
             CASE WHEN len(toks) > 0
                  THEN len(list_filter(toks, t -> t IN ({_SW}))) / len(toks)
                  ELSE 0.0 END AS stop_ratio,
             CASE WHEN len(toks) > 0
                  THEN len(list_distinct(toks)) / len(toks)
                  ELSE 0.0 END AS distinct_ratio
      FROM (SELECT doc_id, source, text, {sql_tokens('text')} AS toks
            FROM documents)
    ),
    qd AS (SELECT doc_id, source,
                  stop_ratio * 0.5 + distinct_ratio * 0.5 AS quality_score
           FROM q0),
    samp AS (SELECT * FROM qd WHERE ({_AQF_KEY}) < {_AQF_THR}),
    {order_statistics_sql('samp', 'quality_score', [0.25],
                          group_expr='source', out='thr')}
    SELECT qd.doc_id, qd.source, qd.quality_score, o.thr AS threshold
    FROM qd JOIN ostat o ON qd.source = o.g
    WHERE qd.quality_score >= o.thr
    """


@query("adaptive_quality_filter", _adaptive_filter_oracle())
def adaptive_quality_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-adaptive quality gate: each source keeps its own top
    75% by quality score — thresholds follow per-source score
    distributions instead of one global cut (web vs books quality
    scales are incomparable). The threshold is an exact order
    statistic over a 50% hash-sample, so the only per-group window
    runs on the sample and the one-row-per-source thresholds relation
    broadcasts into a narrow filter over the full corpus."""
    from svoe_spark.operators.cleaning import adaptive_threshold_filter
    from svoe_spark.operators.text_analysis import quality_score

    docs = load_table(spark, "documents", sf_dir)
    qd = (
        quality_score(docs)
        .select("doc_id", "quality_score")
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    out = adaptive_threshold_filter(
        qd, "quality_score", ["source"], q=0.25, p=0.5, thr_out="threshold"
    )
    return out.select("doc_id", "source", "quality_score", "threshold")


@query(
    "tfidf_keywords_top3",
    f"""
    WITH ex AS (
      SELECT doc_id, unnest(toks) AS term
      FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents)
    ),
    postings AS (
      SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM ex GROUP BY term, doc_id
    ),
    wdf AS (
      SELECT term, doc_id, tf,
             CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
      FROM postings
    )
    SELECT doc_id, term, tf, df,
           CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS score,
           CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id
        ORDER BY CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) DESC, term) AS rn
      FROM wdf
    )
    WHERE rn <= 3
    """,
)
def tfidf_keywords_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 keywords per document by df-normalized term frequency —
    the rational tf-idf variant (score = tf/df, ONE IEEE double
    division, no transcendental log) so ranking AND scores reproduce
    bit-for-bit in any engine. Composes the inverted-index postings;
    the per-doc top-k compiles to WindowGroupLimit (task-local
    pre-limit before the doc exchange)."""
    from svoe_spark.operators.retrieval import tfidf_keywords

    return tfidf_keywords(load_table(spark, "documents", sf_dir), k=3)


@query(
    "contrastive_crops",
    f"""
    WITH base AS (
      SELECT doc_id, toks, len(toks) AS n
      FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents)
      WHERE len(toks) >= 8
    ),
    p AS (
      SELECT doc_id, toks, CAST(n AS INTEGER) AS n_tokens,
             greatest(1, n // 2) AS s
      FROM base
    ),
    st AS (
      SELECT doc_id, toks, n_tokens, s,
             CAST({sql_md5_hash("CAST(doc_id AS VARCHAR) || 'a'")}
                  % (n_tokens - s + 1) + 1 AS INTEGER) AS a_start,
             CAST({sql_md5_hash("CAST(doc_id AS VARCHAR) || 'b'")}
                  % (n_tokens - s + 1) + 1 AS INTEGER) AS b_start
      FROM p
    )
    SELECT doc_id, n_tokens, a_start, b_start,
           array_to_string(list_slice(toks, a_start, a_start + s - 1), ' ')
             AS crop_a,
           array_to_string(list_slice(toks, b_start, b_start + s - 1), ' ')
             AS crop_b
    FROM st
    """,
)
def contrastive_crops_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic independent cropping (Contriever/SimCSE positive
    pairs): two md5-seeded token crops per document, layout-invariant
    and re-saltable per epoch — the positive-pair complement of the
    hard-negative miners. Zero shuffles; the oracle re-derives the
    same draws."""
    from svoe_spark.operators.curation import contrastive_crops

    out = contrastive_crops(load_table(spark, "documents", sf_dir))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "a_start",
        "b_start",
        "crop_a",
        "crop_b",
    )


def _jl_sql() -> str:
    from svoe_spark.operators.similarity import sql_jl_project

    return f"""
    SELECT vec_id,
           {sql_jl_project('embedding', k=8, dim=64)}
    FROM embeddings
    """


@query("embedding_jl_project", _jl_sql())
def embedding_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss 64->8 Rademacher projection of the
    embedding corpus — the distance-preserving sketch that lets
    near-dup blocking and coarse clustering run on 8 doubles/row at
    100 TB, with exact checks only on survivors. Bit-identical
    cross-engine: shared ±1 patterns as plan literals, identical fold
    order, one IEEE multiply by 1/sqrt(k)."""
    from svoe_spark.operators.similarity import jl_project

    emb = load_table(spark, "embeddings", sf_dir)
    return jl_project(emb, k=8, dim=EMB_DIM)


@query(
    "mixed_language_docs",
    f"""
    SELECT doc_id, en_density_a, en_density_b,
           CASE WHEN en_density_a >= 0.05 THEN 'en' ELSE 'other' END AS lang_a,
           CASE WHEN en_density_b >= 0.05 THEN 'en' ELSE 'other' END AS lang_b,
           n_toks >= 2 AND
           (CASE WHEN en_density_a >= 0.05 THEN 'en' ELSE 'other' END)
             <> (CASE WHEN en_density_b >= 0.05 THEN 'en' ELSE 'other' END)
             AS is_mixed
    FROM (
      SELECT doc_id, n_toks,
             CASE WHEN len(a) > 0
                  THEN len(list_filter(a, t -> t IN ({_SW}))) / len(a)
                  ELSE 0.0 END AS en_density_a,
             CASE WHEN len(b) > 0
                  THEN len(list_filter(b, t -> t IN ({_SW}))) / len(b)
                  ELSE 0.0 END AS en_density_b
      FROM (
        SELECT doc_id, len(toks) AS n_toks,
               list_slice(toks, 1, len(toks) // 2) AS a,
               list_slice(toks, len(toks) // 2 + 1, len(toks)) AS b
        FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents)
      )
    )
    """,
)
def mixed_language_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level language-consistency flags (code-switch detector):
    per-half stopword-density lang-ID; a confident whole-document
    label can hide a half-foreign page — per-chunk voting catches it
    (CCNet-style paragraph scoring, halved for the oracle-checkable
    core). Zero shuffles."""
    from svoe_spark.operators.text_analysis import mixed_language_flags

    return mixed_language_flags(load_table(spark, "documents", sf_dir))


@query(
    "top_collocations",
    f"""
    WITH t AS (SELECT {sql_tokens('text')} AS toks FROM documents),
    pairs AS (
      SELECT toks[i] AS a, toks[i + 1] AS b
      FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
            FROM t WHERE len(toks) >= 2)
    ),
    bg AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab FROM pairs GROUP BY a, b),
    na AS (SELECT a, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM bg GROUP BY a),
    nb AS (SELECT b, CAST(SUM(n_ab) AS BIGINT) AS n_b FROM bg GROUP BY b),
    nn AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n_pairs FROM bg)
    SELECT a, b, n_ab, n_a, n_b,
           CAST(n_pairs * n_ab AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS lift
    FROM bg JOIN na USING (a) JOIN nb USING (b) CROSS JOIN nn
    WHERE n_ab >= 5
    ORDER BY lift DESC, a, b
    LIMIT 20
    """,
)
def top_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocations by rational lift (PMI's monotone argument,
    no log — one IEEE division over exact integer products, so ranking
    AND scores hash-match cross-engine). One explode pass, map-side-
    combined pair counts, broadcast marginals, TakeOrdered top-k."""
    from svoe_spark.operators.text_analysis import collocations

    return collocations(load_table(spark, "documents", sf_dir))
