"""Registered queries for the dataset-profiling operators, with
code-generated DuckDB oracles (same determinism contract as
svoe_spark/queries_llm.py: exact integers, or one float op over
exactly-computed operands).

Reference parity note: the reference surfaces dataset metadata through
its catalog tables and API (svoe/featurizer/api.py, data_catalog);
these queries compute the same shape of answers as a single relational
pass, which is the Spark-first form of that capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from svoe_spark.queries import query
from svoe_spark.sources.tables import load_table

_DOC_COLS = [
    # (name, is_string, is_integral)
    ("doc_id", False, True),
    ("text", True, False),
    ("lang", True, False),
    ("source", True, False),
    ("n_chars", False, True),
]


def _profile_sql() -> str:
    parts = []
    for name, is_str, is_int in _DOC_COLS:
        len_sum = (
            f"CAST(sum(length({name})) AS BIGINT)" if is_str else "CAST(NULL AS BIGINT)"
        )
        num_sum = (
            f"CAST(sum({name}) AS BIGINT)" if is_int else "CAST(NULL AS BIGINT)"
        )
        parts.append(
            f"""
    SELECT '{name}' AS col_name,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
           CAST(min({name}) AS VARCHAR) AS min_value,
           CAST(max({name}) AS VARCHAR) AS max_value,
           {len_sum} AS len_sum,
           {num_sum} AS num_sum
    FROM documents"""
        )
    return "\n    UNION ALL\n".join(parts)


@query("dataset_profile", _profile_sql())
def dataset_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profile of the documents corpus (null
    counts, exact distincts, min/max, length and integral sums) — the
    pre-curation sanity scan. ``distinct="exact"`` here so the DuckDB
    oracle hash-matches; the 100 TB default is ``"approx"`` (HLL,
    single scan, no Expand)."""
    from svoe_spark.operators.profiling import profile_columns

    docs = load_table(spark, "documents", sf_dir)
    return profile_columns(docs, [c for c, _, _ in _DOC_COLS], distinct="exact")


_SKEW_TOPK = 5

_SKEW_SQL = f"""
    WITH c AS (
      SELECT coalesce(CAST(event_type AS VARCHAR), '<NULL>') AS k,
             count(*) AS cnt
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
             count(*) AS n_keys,
             CAST(max(cnt) AS BIGINT) AS max_count,
             CAST(min(cnt) AS BIGINT) AS min_count
      FROM c
    ),
    t AS (SELECT k, cnt FROM c ORDER BY cnt DESC, k LIMIT {_SKEW_TOPK}),
    tc AS (
      SELECT string_agg(k || ':' || CAST(cnt AS VARCHAR), ','
                        ORDER BY cnt DESC, k) AS topk_csv
      FROM t
    )
    SELECT n_rows, n_keys, max_count, min_count,
           CAST(max_count AS DOUBLE) / CAST(n_rows AS DOUBLE) AS max_share,
           topk_csv
    FROM s, tc
"""


@query("key_skew_events", _SKEW_SQL)
def key_skew_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew report over events.event_type: the one-shuffle summary
    (n_keys, max/min per-key volume, hottest-key share, top-5 CSV)
    used to decide whether a join/groupBy on this key needs salting."""
    from svoe_spark.operators.profiling import key_skew_report

    events = load_table(spark, "events", sf_dir)
    return key_skew_report(events, "event_type", top_k=_SKEW_TOPK)


_HIST_BINS = 16

_HIST_SQL = f"""
    WITH st AS (
      SELECT min(CAST(value AS DOUBLE)) AS lo, max(CAST(value AS DOUBLE)) AS hi
      FROM events
    ),
    b AS (
      SELECT CAST(CASE WHEN hi = lo THEN 0 ELSE
               least(CAST({_HIST_BINS - 1} AS BIGINT),
                     CAST(floor(((CAST(value AS DOUBLE) - lo)
                                 * CAST({_HIST_BINS} AS DOUBLE))
                                / (hi - lo)) AS BIGINT)) END AS INT) AS bin_id,
             count(*) AS cnt
      FROM events, st
      WHERE value IS NOT NULL
      GROUP BY 1
    ),
    grid AS (
      SELECT CAST(i AS INT) AS bin_id,
             lo + CAST(i AS DOUBLE) * ((hi - lo) / CAST({_HIST_BINS} AS DOUBLE))
               AS bin_lo,
             lo + CAST(i + 1 AS DOUBLE) * ((hi - lo) / CAST({_HIST_BINS} AS DOUBLE))
               AS bin_hi
      FROM range({_HIST_BINS}) t(i), st
    )
    SELECT g.bin_id, g.bin_lo, g.bin_hi,
           CAST(coalesce(b.cnt, 0) AS BIGINT) AS n_rows
    FROM grid g LEFT JOIN b USING (bin_id)
    ORDER BY g.bin_id
"""


@query("value_histogram", _HIST_SQL)
def value_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 16-bin equi-width histogram of events.value.
    Bin edges are pure functions of data min/max; the bin expression
    is the identical IEEE double sequence on both engines, so the
    oracle hash-matches bin ids, edges, and counts."""
    from svoe_spark.operators.profiling import numeric_histogram

    events = load_table(spark, "events", sf_dir)
    return numeric_histogram(events, "value", bins=_HIST_BINS)


from svoe_spark.operators.sketches import CMSParams, cms_sql  # noqa: E402

_CMS = CMSParams(width=256, depth=4)


@query(
    "cms_user_counts",
    f"""
    WITH {cms_sql('events', 'user_id', _CMS)},
    tru AS (SELECT user_id, count(*) AS true_count FROM events GROUP BY user_id)
    SELECT tru.user_id, est.est_count, CAST(tru.true_count AS BIGINT) AS true_count
    FROM est JOIN tru ON est.key = tru.user_id
    """,
)
def cms_user_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch demo at its natural task — per-key frequency
    estimates from a depth x width counter relation that never grows
    with key cardinality. Output pairs every user's CMS estimate with
    its true count (the data exhibits the CMS guarantee est >= true;
    tests assert it). The oracle re-derives the identical counters from
    the shared seeded hash family, so even the sketch's collisions are
    bit-reproduced."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.sketches import cms_build, cms_lookup

    events = load_table(spark, "events", sf_dir)
    sketch = cms_build(events, "user_id", _CMS)
    est = cms_lookup(sketch, events.select("user_id").distinct(), "user_id", _CMS)
    tru = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    return est.join(tru, "user_id").select("user_id", "est_count", "true_count")


from svoe_spark.operators.sketches import bloom_sql  # noqa: E402

# Width sized so the filter still prunes at sf0.1 (~9.5k distinct
# build keys -> fill ~0.69, FP ~0.22); the relation stays <= 32k rows
# of two ints — trivially broadcastable. The build side is the
# HIGH-VALUE order subset: this testdata's every customer has orders
# (no q22 orderless population), so a selective predicate is what
# creates a real absent class to prune.
_BLOOM = CMSParams(width=8192, depth=4)
_BLOOM_MIN_PRICE = 450000


@query(
    "bloom_customer_orders",
    f"""
    WITH {bloom_sql(
        f'(SELECT * FROM orders WHERE o_totalprice > {_BLOOM_MIN_PRICE})',
        'o_custkey', 'customer', 'c_custkey', _BLOOM)},
    tru AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
            WHERE o_totalprice > {_BLOOM_MIN_PRICE})
    SELECT v.key AS c_custkey, v.might_contain,
           (tru.c_custkey IS NOT NULL) AS has_big_order
    FROM verdict v LEFT JOIN tru ON v.key = tru.c_custkey
    """,
)
def bloom_customer_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning at its classic task: a sparse bit-set
    relation built over the custkeys of high-value orders answers
    'might this customer have a big order?' for every customer without
    touching the orders table again — no false negatives (every
    has_big_order customer tests positive — the invariant the oracle
    hash pins), bounded false positives (~fill^depth). The value
    predicate creates both verdict classes at every SF (this fixture
    has no orderless customers)."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.sketches import bloom_build, bloom_filter_keys

    big = load_table(spark, "orders", sf_dir).where(
        F.col("o_totalprice") > _BLOOM_MIN_PRICE
    )
    cust = load_table(spark, "customer", sf_dir)
    bloom = bloom_build(big, "o_custkey", _BLOOM)
    verdict = bloom_filter_keys(
        bloom, cust.select("c_custkey"), "c_custkey", _BLOOM
    )
    tru = big.select(F.col("o_custkey").alias("c_custkey")).distinct()
    return verdict.join(
        tru.withColumn("__h", F.lit(True)), "c_custkey", "left"
    ).select(
        "c_custkey",
        "might_contain",
        F.coalesce(F.col("__h"), F.lit(False)).alias("has_big_order"),
    )


from svoe_spark.operators.sketches import (  # noqa: E402
    HLLParams,
    hll_sql,
    kmv_sql,
)

_KMV_K = 128
_HLL = HLLParams(p=6)


@query(
    "kmv_distinct_daily",
    f"""
    WITH {kmv_sql('events', 'event_id', _KMV_K,
                  group_expr="strftime(ts, '%Y-%m-%d')")},
    tru AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(count(DISTINCT event_id) AS BIGINT) AS true_distinct
            FROM events GROUP BY 1)
    SELECT tru.day, k.est_distinct, tru.true_distinct
    FROM kmv_est k JOIN tru ON k.g = tru.day
    """,
)
def kmv_distinct_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch per day — the mergeable
    cardinality estimator whose ESTIMATE the oracle reproduces
    bit-for-bit (unlike engine HLLs, whose internals are
    implementation-defined — cf. the rows-only approx_distinct_daily).
    Exact below k, (k-1)*2^60/h_k above; integer inputs into one IEEE
    double division. The sketch is <= k bigints per day regardless of
    cardinality, and at sf0.001 (~33 ids/day) the exact branch is the
    one exercised while sf0.01+ exercises the estimator branch."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.sketches import kmv_build, kmv_estimate

    e = load_table(spark, "events", sf_dir).select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_id"
    )
    sk = kmv_build(e, "event_id", k=_KMV_K, group_cols=["day"])
    est = kmv_estimate(sk, k=_KMV_K, group_cols=["day"])
    tru = e.groupBy("day").agg(
        F.count_distinct("event_id").cast("bigint").alias("true_distinct")
    )
    return est.join(tru, "day").select("day", "est_distinct", "true_distinct")


@query(
    "hll_distinct_daily",
    f"""
    WITH {hll_sql('events', 'event_id', _HLL,
                  group_expr="strftime(ts, '%Y-%m-%d')")},
    tru AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(count(DISTINCT event_id) AS BIGINT) AS true_distinct
            FROM events GROUP BY 1)
    SELECT tru.day, h.est_distinct, h.zero_registers, tru.true_distinct
    FROM hll_est h JOIN tru ON h.g = tru.day
    """,
)
def hll_distinct_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog with RELATIONAL registers (bucket -> max leading-zero
    rank) over the shared 60-bit hash — m rows per day however many
    ids, register-wise-max mergeable, and deterministic end-to-end: the
    register-mass sum is exact integer arithmetic and the bias constant
    is one Python-precomputed literal, so the DuckDB oracle reproduces
    the raw estimate bit-for-bit. Raw (uncorrected) estimator, sized so
    the fixtures sit outside the linear-counting regime at sf >= 0.01;
    zero_registers is emitted for driver-side correction at tiny n."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.sketches import hll_build, hll_estimate

    e = load_table(spark, "events", sf_dir).select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_id"
    )
    reg = hll_build(e, "event_id", _HLL, group_cols=["day"])
    est = hll_estimate(reg, _HLL, group_cols=["day"])
    tru = e.groupBy("day").agg(
        F.count_distinct("event_id").cast("bigint").alias("true_distinct")
    )
    return est.join(tru, "day").select(
        "day", "est_distinct", "zero_registers", "true_distinct"
    )


from svoe_spark.functions.text import sql_md5_hash  # noqa: E402
from svoe_spark.operators.profiling import order_statistics_sql  # noqa: E402

_QS = [0.1, 0.5, 0.9, 0.99]
_SAMPLE_P = 0.25
_SAMPLE_THR = int(_SAMPLE_P * (1 << 60))  # exact: 2^58
_EVENT_KEY_SQL = sql_md5_hash("CAST(event_id AS VARCHAR)")


@query(
    "sampled_quantiles_by_type",
    f"""
    WITH samp AS (
      SELECT event_type, value FROM events
      WHERE ({_EVENT_KEY_SQL}) < {_SAMPLE_THR}
    ),
    {order_statistics_sql('samp', 'value', _QS, group_expr='event_type')}
    SELECT g AS event_type, q, value FROM ostat
    """,
)
def sampled_quantiles_by_type_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed quantiles the deterministic way: a mergeable
    hash-sample (membership depends only on the id — sample(A∪B) ==
    sample(A)∪sample(B)) feeds exact type-1 order statistics (k-th
    smallest value, k = floor((n-1)q)+1 — an actual data value, no
    interpolation). Engine-independent end-to-end, hence hash-green —
    unlike percentile_approx, whose sketch is implementation-defined.
    Sample-quantile error converges at ~1/sqrt(pn), and the per-group
    ranked pass is bounded by the sample rate at any corpus size."""
    from svoe_spark.operators.curation import hash_sample
    from svoe_spark.operators.profiling import order_statistics

    e = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "value"
    )
    s = hash_sample(e, id_col="event_id", p=_SAMPLE_P)
    return order_statistics(s, "value", _QS, group_cols=["event_type"])


_DOC_KEY_SQL = sql_md5_hash("CAST(doc_id AS VARCHAR)")


@query(
    "bottom_k_sample_docs",
    f"""
    WITH r AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY ({_DOC_KEY_SQL})) AS rn
      FROM documents
    )
    SELECT source, doc_id, CAST(rn AS BIGINT) AS sample_rank
    FROM r WHERE rn <= 5
    """,
)
def bottom_k_sample_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform 5-doc sample per source via bottom-k-by-hash — the
    reproducible replacement for LIMIT (scan-order biased) and
    sample() (partition-layout-dependent). Same rank<=k plan shape as
    the KMV sketch: map-side WindowGroupLimit before the group
    exchange, so sampling a petabyte group never sorts it."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.curation import bottom_k_sample

    docs = load_table(spark, "documents", sf_dir)
    return bottom_k_sample(
        docs, id_col="doc_id", k=5, group_cols=["source"]
    ).select("source", "doc_id", F.col("sample_rank").cast("long").alias("sample_rank"))


_SRC_KEY_SQL = sql_md5_hash("CAST(source AS VARCHAR)")


@query(
    "grouped_split_sources",
    f"""
    WITH s AS (
      SELECT source,
             CASE WHEN ({_SRC_KEY_SQL}) % 100 < 80 THEN 'train'
                  WHEN ({_SRC_KEY_SQL}) % 100 < 90 THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT source, split, count(*) AS n_docs
    FROM s GROUP BY source, split
    """,
)
def grouped_split_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe splitting: hash the PROVENANCE key (source) rather
    than the document id, so same-source pages — the classic
    train/test contamination vector — can never straddle the split
    boundary. The output is structurally one row per source (the
    no-leakage property; tests assert it); splitting on doc_id instead
    puts ~10% of every source's near-duplicates in eval."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.curation import grouped_split

    docs = load_table(spark, "documents", sf_dir)
    return (
        grouped_split(docs, "source")
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_SNAP_AGG = """
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS cents
  FROM events
  WHERE ts >= TIMESTAMP '{lo}' AND ts < TIMESTAMP '{hi}'{extra}
  GROUP BY 1, 2
"""


@query(
    "snapshot_diff_daily",
    f"""
    WITH old_s AS ({_SNAP_AGG.format(lo='2024-01-01', hi='2024-01-16', extra='')}),
    new_s AS ({_SNAP_AGG.format(lo='2024-01-08', hi='2024-01-23',
                                extra=" AND event_type <> 'click'")})
    SELECT coalesce(o.user_id, n.user_id) AS user_id,
           coalesce(o.day, n.day) AS day,
           CASE WHEN o.day IS NULL THEN 'added'
                WHEN n.day IS NULL THEN 'removed'
                ELSE 'changed' END AS change,
           o.n AS old_n, o.cents AS old_cents,
           n.n AS new_n, n.cents AS new_cents
    FROM old_s o FULL JOIN new_s n
      ON o.user_id = n.user_id AND o.day = n.day
    WHERE o.day IS NULL OR n.day IS NULL
       OR (o.n IS DISTINCT FROM n.n) OR (o.cents IS DISTINCT FROM n.cents)
    """,
)
def snapshot_diff_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What changed between two rollup snapshots: the old snapshot is
    the per-(user, day) daily aggregate over an early ingest window;
    the new one shifts the window AND fixes the aggregation logic
    (v2 excludes 'click' events) — the classic backfill-diff question.
    One full-outer sort-merge join on the key; unchanged keys are
    pruned before anything downstream, so the changeset is sized by
    churn, not by the table. All three change classes occur: early
    days are removed, late days added, overlap days changed wherever
    the logic fix bites."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.diff import snapshot_diff

    e = load_table(spark, "events", sf_dir)
    day = F.to_date("ts").alias("day")
    cents = F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents")
    n = F.count(F.lit(1)).alias("n")

    def snap(lo: str, hi: str, df: DataFrame) -> DataFrame:
        return (
            df.where(
                (F.col("ts") >= F.lit(lo).cast("timestamp"))
                & (F.col("ts") < F.lit(hi).cast("timestamp"))
            )
            .groupBy("user_id", day)
            .agg(n, cents)
        )

    old = snap("2024-01-01", "2024-01-16", e)
    new = snap("2024-01-08", "2024-01-23", e.where(F.col("event_type") != "click"))
    return snapshot_diff(old, new, ["user_id", "day"])


_PPS_K = 50
_DOCKEY = sql_md5_hash("CAST(doc_id AS VARCHAR)")


@query(
    "pps_token_sample",
    f"""
    WITH keyed AS (
      SELECT doc_id, n_chars, ({_DOCKEY}) AS okey FROM documents
    ),
    c AS (
      SELECT doc_id, n_chars,
             CAST(sum(n_chars) OVER (ORDER BY okey) AS BIGINT) AS cum
      FROM keyed
    ),
    t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS W FROM documents)
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           CAST((cum * {_PPS_K}) // W - 1 AS BIGINT) AS pick_no
    FROM c, t
    WHERE (cum * {_PPS_K}) // W > ((cum - n_chars) * {_PPS_K}) // W
    """,
)
def pps_token_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample documents proportional to SIZE (n_chars as the token
    proxy) — the way training mixtures are actually drawn — via
    deterministic systematic PPS: md5-ordered exact prefix sum,
    integer boundary-crossing test, zero transcendental ops, so the
    identical draw reproduces in any engine. The prefix sum is the
    bucket-decomposed global_cumsum (no single-reducer window); the
    scalar total joins in as a broadcast."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.curation import pps_systematic_sample

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    s = pps_systematic_sample(docs, "n_chars", _PPS_K)
    return s.select(
        "doc_id", F.col("n_chars").cast("long").alias("weight"), "pick_no"
    )


from svoe_spark.functions.text import (  # noqa: E402
    sql_token_hashes,
    sql_word_shingles_from_hashes,
)
from svoe_spark.operators.sketches import (  # noqa: E402
    _sql_key_hash,
    kmv_set_ops_sql,
)

_KSO_K = 128
_KSO_REF = "src0"


@query(
    "kmv_vocab_overlap",
    f"""
    WITH th AS (SELECT doc_id, source, {sql_token_hashes('text')} AS th
                FROM documents),
    sh AS (
      SELECT DISTINCT source, unnest({sql_word_shingles_from_hashes('th')}) AS s
      FROM th
    ),
    a_dx AS (SELECT DISTINCT source AS g, {_sql_key_hash('s')} AS h FROM sh),
    a_sk AS (
      SELECT g, h FROM (
        SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
        FROM a_dx
      ) WHERE rn <= {_KSO_K}
    ),
    b_dx AS (SELECT DISTINCT {_sql_key_hash('s')} AS h FROM sh
             WHERE source = '{_KSO_REF}'),
    b_g AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn FROM b_dx
      ) WHERE rn <= {_KSO_K}
    ),
    srcs AS (SELECT DISTINCT source AS g FROM documents),
    b_sk AS (SELECT srcs.g, b_g.h FROM srcs, b_g),
    {kmv_set_ops_sql('a_sk', 'b_sk', _KSO_K, grouped=True)}
    SELECT g AS source, est_union, jaccard, est_intersection
    FROM kso_est
    """,
)
def kmv_vocab_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-vs-corpus similarity from KMV sketches: every source's
    word-trigram shingle set compared against the src0 reference
    corpus — union size, Jaccard, intersection size — without ever
    joining the corpora themselves. The theta-sketch estimator (Beyer
    et al. 2007): the bottom-k of the two sketches' union is a uniform
    sample of the union's distinct hashes; the fraction present in
    both sketches is the Jaccard estimate. Sketches are <= k bigints
    per source, so an S x S source-overlap matrix costs O(S^2 * k)
    after ONE corpus scan — the contamination / mixture-design
    primitive at 100 TB. Self-overlap (src0 vs src0) rides along as
    the jaccard=1.0 sanity row."""
    from pyspark.sql import functions as F

    from svoe_spark.functions.text import token_hashes, word_shingles_from_hashes
    from svoe_spark.operators.sketches import kmv_build, kmv_set_ops
    from svoe_spark.operators.util import spread

    # single-file fixtures arrive as ONE partition; the interpreted
    # HOF shingle fold would serialize on one core (measured 52 s ->
    # ~3 s at sf0.1)
    docs = spread(load_table(spark, "documents", sf_dir))
    # explode(array(...)) is the materialization barrier from
    # dedup._shingle_arrays: composed inline, projection collapse
    # inlines the md5 token-hash transform into EVERY element_at of the
    # shingle lambda — one full md5 pass over the document PER SHINGLE
    # (quadratic; measured 4-7 s for this stage at sf0.1, 0.6-1.5 s
    # with the barrier, identical shingle multiset)
    sh = docs.select(
        "source", F.explode(F.array(token_hashes(F.col("text")))).alias("__th")
    ).select(
        "source",
        F.explode(word_shingles_from_hashes(F.col("__th"))).alias("s"),
    )
    # ONE grouped build over the shingle stream, persisted at sketch
    # size (<= sources x k bigints). The reference sketch is the src0
    # GROUP of the same relation — a group's bottom-k over distinct
    # hashes equals, row for row, the ungrouped bottom-k over the
    # group-filtered input — so the former second full corpus pass
    # (separate ref kmv_build) and the 260k-row shingle persist are
    # gone: the explode is evaluated exactly once, and only sketches
    # are retained (round 10; hash-identical by construction).
    sk_src = kmv_build(sh, "s", k=_KSO_K, group_cols=["source"]).persist()
    ref_sk = sk_src.where(F.col("source") == _KSO_REF).select("h")
    srcs = docs.select("source").distinct()
    sk_ref = srcs.crossJoin(F.broadcast(ref_sk))
    out = kmv_set_ops(sk_src, sk_ref, k=_KSO_K, group_cols=["source"])
    return out.select("source", "est_union", "jaccard", "est_intersection")


# ---------------------------------------------------------------------------
# Data-quality constraint verification (Deequ-style, one aggregate pass)
# ---------------------------------------------------------------------------

def _dq_constraints():
    from svoe_spark.operators import quality_checks as qc

    return [
        qc.completeness("o_custkey"),
        qc.in_set("o_orderstatus", ["F", "O"]),
        qc.bounds("o_totalprice", lo=0.0, hi=300000.0),
        qc.matches("o_orderpriority", "^[1-5]-"),
    ]


_DQ_UNIQUE = ["o_orderkey", "o_custkey"]


def _dq_sql() -> str:
    from svoe_spark.operators import quality_checks as qc

    return (
        qc.run_checks_sql("orders", _dq_constraints(), unique=_DQ_UNIQUE)
        + " UNION ALL "
        + qc.ref_integrity_sql("lineitem", "l_orderkey", "orders", "o_orderkey")
        + " UNION ALL "
        + qc.ref_integrity_sql("orders", "o_custkey", "customer", "c_custkey")
    )


@query("dq_orders_report", _dq_sql())
def dq_orders_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality verification report over the orders fact: four
    row-predicate constraints + two exact-uniqueness checks compiled
    into ONE aggregate scan (Deequ-style, Schelter et al. VLDB 2018),
    plus two referential-integrity probes (child LEFT JOIN distinct
    parent keys). The in_set and bounds rules are deliberately strict
    enough to fail on this data, so the report exercises both
    outcomes with non-zero violation counts. The DuckDB oracle is
    CODE-GENERATED from the same constraint objects the engine
    compiles — one declaration, two dialects."""
    from svoe_spark.operators import quality_checks as qc

    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    report = qc.run_checks(orders, _dq_constraints(), unique=_DQ_UNIQUE)
    report = report.unionByName(
        qc.ref_integrity(li, "l_orderkey", orders, "o_orderkey")
    ).unionByName(qc.ref_integrity(orders, "o_custkey", cust, "c_custkey"))
    return report


# ---------------------------------------------------------------------------
# Priority sampling (weight-sensitive sample + unbiased subset sums)
# ---------------------------------------------------------------------------

_PSAMP_K = 100


def _priority_sample_sql() -> str:
    from svoe_spark.operators.curation import priority_sample_sql

    inner = (
        "(SELECT o_orderkey, CAST(round(o_totalprice*100,0) AS BIGINT)"
        " AS w_c FROM orders)"
    )
    return (
        "WITH "
        + priority_sample_sql(inner, "w_c", _PSAMP_K, "o_orderkey", salt="ps1")
        + " SELECT o_orderkey, w_c, est_w FROM psample"
    )


@query("priority_sample_orders", _priority_sample_sql())
def priority_sample_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling of orders by spend (Duffield-Lund-Thorup): a
    100-row weight-sensitive sample whose est_w column gives unbiased
    subset-sum estimates — ask any downstream predicate of the SAMPLE
    (sum est_w where <filter>) and the expectation equals the true
    filtered spend. The 100 TB sampling primitive when uniform rows
    underrepresent heavy items: one narrow hash projection + a
    distributed partial top-k; no global sort."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.curation import priority_sample

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("w_c"),
    )
    return priority_sample(o, "w_c", _PSAMP_K, "o_orderkey", salt="ps1").select(
        "o_orderkey", "w_c", "est_w"
    )


# ---------------------------------------------------------------------------
# Distribution drift (PSI-style, rational) of doc lengths by provenance
# ---------------------------------------------------------------------------

_DRIFT_BUCKETS = 10


def _drift_oracle() -> str:
    from svoe_spark.operators.profiling import order_statistics_sql

    qs = [i / _DRIFT_BUCKETS for i in range(1, _DRIFT_BUCKETS)]
    ostat = order_statistics_sql(
        "(SELECT * FROM documents WHERE source = 'src0')",
        "n_chars",
        qs,
        out="__cut",
    )
    return f"""
    WITH {ostat},
    cuts AS (SELECT __cut AS cut FROM ostat),
    refb AS (
      SELECT d.doc_id, CAST(count(c.cut) AS BIGINT) AS bucket
      FROM documents d LEFT JOIN cuts c ON c.cut <= d.n_chars
      WHERE d.source = 'src0' AND d.n_chars IS NOT NULL
      GROUP BY d.doc_id),
    curb AS (
      SELECT d.doc_id, CAST(count(c.cut) AS BIGINT) AS bucket
      FROM documents d LEFT JOIN cuts c ON c.cut <= d.n_chars
      WHERE d.source <> 'src0' AND d.n_chars IS NOT NULL
      GROUP BY d.doc_id),
    rc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_ref FROM refb GROUP BY bucket),
    cc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_cur FROM curb GROUP BY bucket),
    j AS (
      SELECT coalesce(rc.bucket, cc.bucket) AS bucket,
             CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
             CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur
      FROM rc FULL JOIN cc ON rc.bucket = cc.bucket),
    t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
                 CAST(sum(n_cur) AS BIGINT) AS tc FROM j)
    SELECT bucket, n_ref, n_cur,
           n_ref / tr AS p,
           n_cur / tc AS q,
           ((n_ref / tr - n_cur / tc) * (n_ref / tr - n_cur / tc))
             / (n_ref / tr + n_cur / tc) AS drift_term
    FROM j CROSS JOIN t
    """


@query("doc_length_drift", _drift_oracle())
def doc_length_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Has the length distribution of the incoming corpus drifted from
    the reference source? Equi-depth deciles of src0's n_chars (exact
    type-1 cut points), both populations bucketed by a collected-
    literal indicator fold (NO shuffle added to either scan), and a
    per-bucket chi-square-style drift term — the rational PSI
    (`profiling.distribution_drift`). Sum drift_term for the scalar
    statistic; per-bucket rows show WHERE the mass moved."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.profiling import distribution_drift

    docs = load_table(spark, "documents", sf_dir)
    ref = docs.where(F.col("source") == "src0")
    cur = docs.where(F.col("source") != "src0")
    return distribution_drift(ref, cur, "n_chars", n_buckets=_DRIFT_BUCKETS)


# ---------------------------------------------------------------------------
# Benford first-digit audit (fraud/data-entry anomaly classic)
# ---------------------------------------------------------------------------

import math as _math

# Benford expectations log10(1 + 1/d) are computed ONCE in Python and
# embedded as identical double literals in BOTH plans — no runtime
# transcendental, so the hash contract holds.
_BENFORD_P = {d: _math.log10(1 + 1 / d) for d in range(1, 10)}


def _benford_oracle() -> str:
    arms = " ".join(
        f"WHEN '{d}' THEN CAST({_BENFORD_P[d]!r} AS DOUBLE)" for d in range(1, 10)
    )
    return f"""
    WITH w AS (
      SELECT substr(CAST(CAST(round(o_totalprice*100,0) AS BIGINT) AS VARCHAR),
                    1, 1) AS digit
      FROM orders
      WHERE o_totalprice > 0
    ),
    c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY digit),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
    SELECT digit, n,
           n / total AS p,
           CASE digit {arms} END AS benford_p,
           n / total - CASE digit {arms} END AS excess
    FROM c CROSS JOIN t
    """


@query("benford_order_values", _benford_oracle())
def benford_order_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit (Benford) audit of order values — the classic
    fabricated-data / unit-mixing detector: observed first-digit
    shares of the integer-cents amount vs log10(1 + 1/d) expectations.
    The digit comes from the BIGINT's string form (identical in any
    engine — no per-row transcendental, no float formatting); the
    expectations are Python-computed literals shared by both plans.
    One narrow projection + a 9-row aggregate."""
    from pyspark.sql import functions as F

    o = load_table(spark, "orders", sf_dir).where(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"), 1, 1
    ).alias("digit")
    c = o.select(digit).groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = c.agg(F.sum("n").cast("long").alias("total"))
    bp = F.lit(None).cast("double")
    for d in range(1, 10):
        bp = F.when(F.col("digit") == str(d), F.lit(_BENFORD_P[d])).otherwise(bp)
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        (F.col("n") / F.col("total")).alias("p"),
        bp.alias("benford_p"),
        (F.col("n") / F.col("total") - bp).alias("excess"),
    )


# ---------------------------------------------------------------------------
# Inequality / concentration: Gini of customer spend, supplier HHI
# ---------------------------------------------------------------------------

def _gini_oracle() -> str:
    from svoe_spark.operators.profiling import gini_sql

    inner = """(
      SELECT c.c_nationkey AS nation, c.c_custkey,
             CAST(sum(CAST(round(o.o_totalprice*100,0) AS BIGINT)) AS BIGINT)
               AS spend_c
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )"""
    return gini_sql(inner, "spend_c", group_cols="nation")


@query("gini_spend_by_nation", _gini_oracle())
def gini_spend_by_nation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How unequal is customer spend within each nation: the exact
    Gini coefficient in its rational form — integer rank-weighted
    sums, ONE division (`profiling.gini` / code-generated twin). The
    inequality summary behind mixture decisions ("is this market a
    few whales or a broad base"), computed per group in one ranked
    pass + one moment aggregate."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.profiling import gini

    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    spend = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nation"), "c_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("spend_c")
        )
    )
    return gini(spend, "spend_c", ["nation"])


def _hhi_oracle() -> str:
    from svoe_spark.operators.profiling import hhi_sql

    inner = """(
      SELECT s.s_nationkey AS nation, l.l_suppkey,
             CAST(sum(CAST(round(l.l_extendedprice*100,0) AS BIGINT)
                      * (100 - CAST(round(l.l_discount*100,0) AS BIGINT)))
                  AS BIGINT) // 10000 AS rev_d
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    )"""
    return hhi_sql(inner, "rev_d", group_cols="nation")


@query("supplier_hhi_by_nation", _hhi_oracle())
def supplier_hhi_by_nation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market concentration of supplier revenue within each nation:
    the exact Herfindahl index, share-squared WITHOUT float shares
    (sum of squared integer revenues over the squared total — one
    division; `profiling.hhi`). Revenue is discounted cents collapsed
    to whole dollars by truncating division — the documented int64
    headroom choice (sum(x)^2 must fit int64). One groupBy, no sort;
    the supplier dim broadcasts."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.profiling import hhi

    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    rev = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("nation"), "l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                * (
                    F.lit(100)
                    - F.round(F.col("l_discount") * 100, 0).cast("long")
                )
            )
            .cast("long")
            .alias("rev_cc")
        )
        .select("nation", "l_suppkey", F.expr("rev_cc DIV 10000").alias("rev_d"))
    )
    return hhi(rev, "rev_d", ["nation"])


from svoe_spark.operators.sketches import (  # noqa: E402
    QSketchParams,
    quantile_sketch_sql,
)

_QSK = QSketchParams(sig_bits=8, scale=100)
_QSK_PCTS = [10, 50, 90, 99]
_QSK_PCT_ROWS = ", ".join(f"({p})" for p in _QSK_PCTS)


@query(
    "approx_quantiles_daily",
    f"""
    WITH {quantile_sketch_sql('events', 'value', _QSK,
                              group_expr="strftime(ts, '%Y-%m-%d')")},
    ps(p) AS (VALUES {_QSK_PCT_ROWS}),
    cum AS (
      SELECT g AS day, qv,
             sum(cnt) OVER (PARTITION BY g ORDER BY qv
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER (PARTITION BY g) AS n
      FROM qs_sketch
    ),
    est AS (
      SELECT day, p, min(qv) / 100.0 AS est_value
      FROM cum CROSS JOIN ps
      WHERE cum >= (n * p + 99) // 100
      GROUP BY day, p
    ),
    r AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(round(value * 100, 0) AS BIGINT) AS c,
             ROW_NUMBER() OVER (PARTITION BY strftime(ts, '%Y-%m-%d')
                                ORDER BY CAST(round(value * 100, 0) AS BIGINT))
               AS rn,
             COUNT(*) OVER (PARTITION BY strftime(ts, '%Y-%m-%d')) AS n
      FROM events WHERE value IS NOT NULL
    ),
    exact AS (
      SELECT day, p, c / 100.0 AS exact_value
      FROM r CROSS JOIN ps
      WHERE rn = (n * p + 99) // 100
    )
    SELECT est.day, est.p, est.est_value, exact.exact_value
    FROM est JOIN exact ON est.day = exact.day AND est.p = exact.p
    """,
)
def approx_quantiles_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p10/p50/p90/p99 of events.value from the MERGEABLE
    log-bucket quantile sketch (operators/sketches.quantile_sketch —
    the HdrHistogram/DDSketch family made integer-exact): one
    range-oblivious pass builds a bounded (day, qv, cnt) relation
    (<= 2^8 buckets per octave regardless of volume; counts add, so
    per-partition/per-day sketches union into wider windows for free),
    then each percentile is the smallest quantized value reaching rank
    ceil(N*p/100) — all-integer rank arithmetic over the tiny sketch.
    exact_value (the row_number == rank row over raw cents — dense
    ranks make the equality filter pick exactly the rank-th value, no
    aggregate needed) rides along so the relative-error contract
    (< 2^(1-sig_bits) = 2^-7 here, plus the cents grid) is
    self-contained; at 100 TB the user runs only the sketch. Unlike
    approx_percentile / percentile_approx, whose KLL-ish internals are
    implementation-defined, every step is exact integer arithmetic the
    DuckDB oracle reproduces bit-for-bit — the bit-length trick is the
    relational HLL's proven-portable conv()/bin() pattern."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from svoe_spark.operators.sketches import (
        quantile_sketch,
        quantile_sketch_estimate,
    )

    e = load_table(spark, "events", sf_dir).select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "value"
    )
    sk = quantile_sketch(e, "value", _QSK, group_cols=["day"])
    est = quantile_sketch_estimate(
        sk, _QSK_PCTS, _QSK, group_cols=["day"], out="est_value"
    )
    exact_src = e.where(F.col("value").isNotNull()).select(
        "day", F.round(F.col("value") * 100, 0).cast("long").alias("__c")
    )
    wr = Window.partitionBy("day").orderBy("__c")
    wn = Window.partitionBy("day")
    r = exact_src.select(
        "day",
        "__c",
        F.row_number().over(wr).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    ps = spark.createDataFrame([(p,) for p in _QSK_PCTS], "p int")
    exact = (
        r.crossJoin(F.broadcast(ps))
        .where(F.col("__rn") == F.expr("(__n * p + 99) div 100"))
        .select("day", "p", (F.col("__c") / 100.0).alias("exact_value"))
    )
    return est.join(exact, ["day", "p"]).select(
        "day", "p", "est_value", "exact_value"
    )
