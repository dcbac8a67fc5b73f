"""Event-sequence analytics queries (funnel / retention / interval
concurrency) with DuckDB oracles.

The funnel oracle is code-generated from the SAME step list as the
Spark plan (events_analytics.funnel_sql), so the two sides cannot
drift; the other oracles restate the relational decomposition directly
— every sum is integer (bit-exact across engines) and every output
column is aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from svoe_spark.operators.events_analytics import (
    funnel,
    funnel_sql,
    interval_concurrency,
    retention_cohorts,
)
from svoe_spark.queries import query
from svoe_spark.sources.tables import load_table

FUNNEL_STEPS = ["view", "click", "purchase"]
FUNNEL_WITHIN = "72h"


@query("funnel_view_click_purchase", funnel_sql(FUNNEL_STEPS, within=FUNNEL_WITHIN))
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel with a 72h conversion horizon anchored at
    the first view. Chained min-agg + user-key equi-joins — no event
    arrays, no window over a user's whole history."""
    return funnel(
        load_table(spark, "events", sf_dir), FUNNEL_STEPS, within=FUNNEL_WITHIN
    )


@query(
    "retention_day_cohorts",
    """
    WITH firsts AS (
      SELECT user_id AS u, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY 1
    ),
    active AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events)
    SELECT cohort_day,
           CAST(datediff('day', cohort_day, d) AS BIGINT) AS offset_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM active JOIN firsts USING (u)
    WHERE datediff('day', cohort_day, d) <= 14
    GROUP BY 1, 2
    """,
)
def retention_day_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-grain retention triangle out to offset 14. Two aggregates +
    one user-key join; offset-0 rows are the cohort sizes."""
    return retention_cohorts(
        load_table(spark, "events", sf_dir), max_offset_days=14
    )


@query(
    "concurrent_open_orders",
    """
    WITH iv AS (
      SELECT o.o_orderpriority AS priority, o.o_orderdate AS s,
             MAX(l.l_shipdate) AS e
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
      HAVING MAX(l.l_shipdate) >= o.o_orderdate
    ),
    deltas AS (
      SELECT priority, s AS ts, 1 AS d FROM iv
      UNION ALL
      SELECT priority, e AS ts, -1 AS d FROM iv
    ),
    net AS (SELECT priority, ts, SUM(d) AS nd FROM deltas GROUP BY 1, 2)
    SELECT priority, ts,
           CAST(SUM(nd) OVER (
             PARTITION BY priority ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS concurrent
    FROM net
    """,
)
def concurrent_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many orders of each priority were open — placed but not yet
    fully shipped, interval [o_orderdate, max l_shipdate) — at every
    boundary instant. Sweep line: net deltas per (priority, instant),
    then a running sum partitioned by priority (5 parallel sweeps, each
    over ~|distinct dates| rows, not |orders|). The synthetic fixture
    ships ~20% of orders BEFORE their order date; those reversed
    intervals are invalid and dropped by the operator (the oracle's
    HAVING mirrors it)."""
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    iv = (
        orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("shipped"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("start"),
            F.col("shipped").alias("end"),
        )
    )
    return interval_concurrency(iv, "start", "end", by="priority")


GAPFILL_STEP_US = 6 * 3600 * 1_000_000


@query(
    "gapfill_linear_6h",
    f"""
    WITH data AS (
      SELECT event_type, ts, MAX(value) AS value FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(ts) AS mn, MAX(ts) AS mx FROM data GROUP BY 1
    ),
    grid AS (
      SELECT event_type,
             UNNEST(generate_series(
               make_timestamp((epoch_us(mn) // {GAPFILL_STEP_US})
                              * {GAPFILL_STEP_US}),
               mx, INTERVAL 6 HOUR)) AS ts
      FROM bounds
    ),
    u AS (
      SELECT event_type, ts, value, 0 AS is_grid FROM data
      UNION ALL
      SELECT event_type, ts, CAST(NULL AS DOUBLE), 1 FROM grid
    ),
    w AS (
      SELECT event_type, ts, is_grid,
        LAST_VALUE(value IGNORE NULLS) OVER win_b AS pv,
        LAST_VALUE(CASE WHEN value IS NOT NULL THEN epoch_us(ts) END
                   IGNORE NULLS) OVER win_b AS pt,
        FIRST_VALUE(value IGNORE NULLS) OVER win_f AS nv,
        FIRST_VALUE(CASE WHEN value IS NOT NULL THEN epoch_us(ts) END
                    IGNORE NULLS) OVER win_f AS nt,
        epoch_us(ts) AS t
      FROM u
      WINDOW
        win_b AS (PARTITION BY event_type ORDER BY ts, is_grid
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        win_f AS (PARTITION BY event_type ORDER BY ts, is_grid
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, ts, pv AS locf,
           CASE WHEN pt = t THEN pv
                ELSE pv + (nv - pv) * (CAST(t - pt AS DOUBLE)
                                       / CAST(nt - pt AS DOUBLE))
           END AS interp
    FROM w WHERE is_grid = 1
    """,
)
def gapfill_linear_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """timescaledb-style time_bucket_gapfill on a 6h grid per
    event_type, with locf AND linear-interpolation fills. Duplicate
    instants are pre-collapsed (MAX) so the window order key is unique;
    the interpolation ratio is int64-microsecond arithmetic cast to
    double, bit-identical across engines."""
    from svoe_spark.operators.resample import resample_interpolate

    data = (
        load_table(spark, "events", sf_dir)
        .groupBy("event_type", "ts")
        .agg(F.max("value").alias("value"))
    )
    return resample_interpolate(
        data, on="ts", by="event_type", every="6h", value_col="value"
    )


def _rolling_corr_oracle() -> str:
    from svoe_spark.operators.quant import pearson_sql
    from svoe_spark.queries import _TICKS_SQL

    # pair-completeness guard mirrors rolling_corr: a row missing
    # either coordinate contributes to no moment
    xg = "CASE WHEN value_c IS NOT NULL AND qty IS NOT NULL THEN value_c END"
    yg = "CASE WHEN value_c IS NOT NULL AND qty IS NOT NULL THEN qty END"
    moments = {
        "n": f"CAST(COUNT({xg}) OVER win AS BIGINT)",
        "sx": f"CAST(SUM({xg}) OVER win AS BIGINT)",
        "sy": f"CAST(SUM({yg}) OVER win AS BIGINT)",
        "sxy": f"CAST(SUM(({xg}) * ({yg})) OVER win AS BIGINT)",
        "sxx": f"CAST(SUM(({xg}) * ({xg})) OVER win AS BIGINT)",
        "syy": f"CAST(SUM(({yg}) * ({yg})) OVER win AS BIGINT)",
    }
    mom_sql = ",\n        ".join(f"{e} AS {a}" for a, e in moments.items())
    return (
        _TICKS_SQL
        + f"""
    , w AS (
      SELECT event_type, ts, event_id,
        {mom_sql}
      FROM ticks
      WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 50 PRECEDING AND CURRENT ROW)
    ),
    c AS (
      SELECT event_type, ts, event_id,
             {pearson_sql("n", "sx", "sy", "sxy", "sxx", "syy")} AS corr_50
      FROM w
    ),
    r AS (
      SELECT event_type, ts, corr_50,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM c
    )
    SELECT event_type, ts, corr_50 FROM r WHERE rn = 1
    """
    )


@query("rolling_corr_price_qty", _rolling_corr_oracle())
def rolling_corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 51-row Pearson correlation between cents price and
    traded quantity per instrument, sampled at the last tick of every
    hour. Exact int64 moments + one fixed double combination — the
    oracle is generated from the same pearson_sql twin."""
    from pyspark.sql import Window

    from svoe_spark.operators.quant import rolling_corr
    from svoe_spark.queries import ticks

    t = ticks(spark, sf_dir)
    c = rolling_corr(
        t,
        "value_c",
        "qty",
        by="event_type",
        order=["ts", "event_id"],
        window_rows=50,
        out="corr_50",
    )
    w = Window.partitionBy(
        "event_type", F.date_trunc("hour", "ts")
    ).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        c.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("event_type", "ts", "corr_50")
    )


def _pairwise_corr_oracle() -> str:
    from svoe_spark.operators.quant import pearson_sql
    from svoe_spark.queries import _TICKS_SQL

    return (
        _TICKS_SQL
        + f"""
    , series AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(SUM(value_c) AS BIGINT) AS v
      FROM ticks GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type AS key_x, b.event_type AS key_y,
             a.v AS vx, b.v AS vy
      FROM series a JOIN series b USING (bucket)
      WHERE a.event_type < b.event_type
        AND a.v IS NOT NULL AND b.v IS NOT NULL
    ),
    m AS (
      SELECT key_x, key_y,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(vx) AS BIGINT) AS sx,
             CAST(SUM(vy) AS BIGINT) AS sy,
             CAST(SUM(vx * vy) AS BIGINT) AS sxy,
             CAST(SUM(vx * vx) AS BIGINT) AS sxx,
             CAST(SUM(vy * vy) AS BIGINT) AS syy
      FROM p GROUP BY 1, 2
    )
    SELECT key_x, key_y, n AS n_buckets,
           {pearson_sql("n", "sx", "sy", "sxy", "sxx", "syy")} AS corr
    FROM m WHERE n >= 2
    """
    )


@query("pairwise_corr_types", _pairwise_corr_oracle())
def pairwise_corr_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrument-correlation panel: Pearson correlation of hourly
    cents-notional between every unordered pair of event types. The
    self-join runs on the tiny (type, hour) panel, never the ticks."""
    from svoe_spark.operators.quant import pairwise_corr
    from svoe_spark.queries import ticks

    t = ticks(spark, sf_dir)
    series = t.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.sum("value_c").alias("v"))
    return pairwise_corr(series, "event_type", "bucket", "v")


def _temperature_oracle() -> str:
    from svoe_spark.functions.text import sql_md5_hash

    key = sql_md5_hash("CAST(doc_id AS VARCHAR)")
    two_60 = float(1 << 60)
    return f"""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1
    ),
    w AS (
      SELECT lang, n,
             CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) AS wt
      FROM counts
    ),
    tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS S FROM w),
    rates AS (
      SELECT lang,
             LEAST(CAST(1.0 AS DOUBLE),
                   CAST(250 AS DOUBLE) * CAST(wt AS DOUBLE)
                   / CAST(S AS DOUBLE) / CAST(n AS DOUBLE)) AS rate
      FROM w CROSS JOIN tot
    )
    SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM documents d JOIN rates r ON r.lang = d.lang
    WHERE ({key}) < CAST(FLOOR(r.rate * {two_60}) AS BIGINT)
    GROUP BY 1
    """


@query("temperature_mixture_langs", _temperature_oracle())
def temperature_mixture_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tau=0.5 temperature rebalancing over the skewed `lang` column
    (the mC4/T5 multilingual mixing rule): small languages are
    up-weighted via exact integer weights floor(sqrt(n)); the draw is
    the layout-invariant md5 threshold, so the oracle reproduces the
    exact kept set."""
    from svoe_spark.operators.curation import temperature_sample

    docs = load_table(spark, "documents", sf_dir)
    kept = temperature_sample(
        docs, source_col="lang", id_col="doc_id", target_n=250, tau=0.5
    )
    return kept.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_kept"))


def _drawdown_oracle() -> str:
    from svoe_spark.queries import _TICKS_SQL

    return (
        _TICKS_SQL
        + """
    , p AS (
      SELECT event_type, value_c,
             MAX(value_c) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM ticks
    )
    SELECT event_type,
           CAST(MAX(peak - value_c) AS BIGINT) AS max_dd,
           MAX(CASE WHEN peak > 0
                    THEN CAST(peak - value_c AS DOUBLE) / CAST(peak AS DOUBLE)
               END) AS max_dd_pct
    FROM p GROUP BY 1
    """
    )


@query("max_drawdown_by_type", _drawdown_oracle())
def max_drawdown_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum peak-to-trough drawdown per instrument over cents
    prices — one keyed WindowExec for the running peak, then
    order-independent max aggregates (no float summation), so the
    doubles are bit-portable."""
    from svoe_spark.operators.quant import max_drawdown
    from svoe_spark.queries import ticks

    t = ticks(spark, sf_dir)
    return max_drawdown(
        t, "value_c", by="event_type", order=["ts", "event_id"]
    )


PURGE_EMBARGO_US = 12 * 3600 * 1_000_000


@query(
    "purged_folds_counts",
    f"""
    WITH b AS (
      SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) + 1 AS hi FROM events
    ),
    folds AS (SELECT UNNEST(generate_series(0, 4)) AS fold),
    fa AS (
      SELECT fold,
             lo + fold * ((hi - lo) // 5) AS fs,
             CASE WHEN fold = 4 THEN hi
                  ELSE lo + (fold + 1) * ((hi - lo) // 5) END AS fe
      FROM folds CROSS JOIN b
    ),
    r AS (
      SELECT CAST(fa.fold AS BIGINT) AS fold,
             CASE WHEN epoch_us(e.ts) >= fs AND epoch_us(e.ts) < fe
                    THEN 'test'
                  WHEN epoch_us(e.ts) >= fs - {PURGE_EMBARGO_US}
                   AND epoch_us(e.ts) < fe + {PURGE_EMBARGO_US}
                    THEN 'purged'
                  ELSE 'train' END AS role
      FROM events e CROSS JOIN fa
    )
    SELECT fold, role, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM r GROUP BY 1, 2
    """,
)
def purged_folds_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged 5-fold time-series CV over the event stream with a 12h
    embargo: per (fold, role) row counts. Fold boundaries are exact
    int64-µs arithmetic, so the assignment is engine-reproducible."""
    from svoe_spark.operators.curation import purged_time_folds

    ev = load_table(spark, "events", sf_dir)
    lab = purged_time_folds(ev, n_folds=5, embargo="12h")
    return lab.groupBy(
        F.col("fold").cast("long").alias("fold"), "role"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))


def _mad_oracle() -> str:
    from svoe_spark.queries import _TICKS_SQL

    return (
        _TICKS_SQL
        + """
    , n1 AS (SELECT event_type, COUNT(*) AS n FROM ticks GROUP BY 1),
    r1 AS (
      SELECT event_type, value_c,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value_c) AS rk
      FROM ticks
    ),
    med AS (
      SELECT r1.event_type, r1.value_c AS med
      FROM r1 JOIN n1 USING (event_type)
      WHERE rk = (n - 1) // 2 + 1
    ),
    d AS (
      SELECT t.event_type, t.event_id, ABS(t.value_c - med.med) AS dev
      FROM ticks t JOIN med USING (event_type)
    ),
    n2 AS (SELECT event_type, COUNT(*) AS n FROM d GROUP BY 1),
    r2 AS (
      SELECT event_type, dev,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev) AS rk
      FROM d
    ),
    mad AS (
      SELECT r2.event_type, r2.dev AS mad
      FROM r2 JOIN n2 USING (event_type)
      WHERE rk = (n - 1) // 2 + 1
    ),
    s AS (
      SELECT d.event_type, d.event_id, d.dev,
             CASE WHEN mad.mad > 0
                  THEN CAST(d.dev AS DOUBLE) / CAST(mad.mad AS DOUBLE)
             END AS score,
             ROW_NUMBER() OVER (
               PARTITION BY d.event_type
               ORDER BY d.dev DESC, d.event_id) AS rn
      FROM d JOIN mad USING (event_type)
    )
    SELECT event_type, event_id, dev, score FROM s WHERE rn <= 20
    """
    )


@query("mad_outlier_top20", _mad_oracle())
def mad_outlier_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier scoring per instrument (exact type-1
    medians -> exact integer deviations -> one portable division),
    keeping the 20 most deviant ticks per type (dev is the integer
    sort key, so the top-k is deterministic).

    Round 11 — ONE ranked pass over the deviations instead of three
    (robust_outliers' MAD rank sort + the top-k window each paid a
    separate event_type exchange+sort over the full tick stream):
    ranked ASCENDING with the MIRRORED tie-break (dev ASC, event_id
    DESC), rank rn maps to the former (dev DESC, event_id ASC) rank as
    n - rn + 1, so `rn >= n - 19` selects the identical 20 rows; the
    MAD is the dev at rank (n-1) div 2 + 1 — rank ties share the
    value, so the tie-break change cannot move it — read back as a
    windowed single-value max over the SAME partitioning (no second
    exchange, no join). Median pass and score division are token-
    identical to robust_outliers."""
    from pyspark.sql import Window

    from svoe_spark.operators.profiling import attach_broadcast, order_statistics
    from svoe_spark.queries import ticks

    t = ticks(spark, sf_dir)
    med = order_statistics(
        t, "value_c", [0.5], ["event_type"], out="__med"
    ).select("event_type", "__med")
    d = attach_broadcast(t, med, ["event_type"]).withColumn(
        "dev", F.abs(F.col("value_c") - F.col("__med"))
    )
    # asc NULLS FIRST (Spark's asc default) is the exact reverse of
    # the former desc NULLS LAST order, so the n-rn+1 rank mapping —
    # and therefore the selected top-20 rows — holds even for NULL
    # deviations (possible only for NULL value_c; none exist in the
    # fixtures, but the mirror must not silently drop them — review
    # r11). The MAD rank offsets by the per-group NULL count so it
    # stays the median of the NON-NULL deviations, exactly
    # order_statistics' domain.
    wr = Window.partitionBy("event_type").orderBy(
        F.col("dev").asc(), F.col("event_id").desc()
    )
    wn = Window.partitionBy("event_type")
    r = d.select(
        "event_type",
        "event_id",
        "dev",
        F.row_number().over(wr).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
        F.count("dev").over(wn).alias("__nn"),
    )
    r = r.withColumn(
        "__mad",
        F.max(
            F.when(
                F.col("__rn")
                == F.expr("(__n - __nn) + ((__nn - 1) div 2 + 1)"),
                F.col("dev"),
            )
        ).over(wn),
    )
    return (
        r.where(F.col("__rn") >= F.col("__n") - 19)
        .select(
            "event_type",
            "event_id",
            "dev",
            F.when(
                F.col("__mad") > 0,
                F.col("dev").cast("double") / F.col("__mad").cast("double"),
            ).alias("score"),
        )
    )


def _candle_oracle() -> str:
    from svoe_spark.queries import _TICKS_SQL

    return (
        _TICKS_SQL
        + """
    , bars AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 hour', ts) AS window_start,
             arg_min(value_c, event_id) AS open_c,
             MAX(value_c) AS high_c,
             MIN(value_c) AS low_c,
             arg_max(value_c, event_id) AS close_c
      FROM ticks GROUP BY 1, 2
    ),
    p AS (
      SELECT bars.*,
             LAG(open_c) OVER w AS po, LAG(close_c) OVER w AS pc
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY window_start)
    ),
    f AS (
      SELECT event_type, window_start, open_c, high_c, low_c, close_c,
             (high_c - low_c > 0
              AND ABS(close_c - open_c) * 100 <= (high_c - low_c) * 10)
               AS is_doji,
             (pc IS NOT NULL AND pc < po AND close_c > open_c
              AND open_c <= pc AND close_c >= po) AS is_bullish_engulfing,
             (pc IS NOT NULL AND pc > po AND close_c < open_c
              AND open_c >= pc AND close_c <= po) AS is_bearish_engulfing
      FROM p
    )
    SELECT * FROM f
    WHERE is_doji OR is_bullish_engulfing OR is_bearish_engulfing
    """
    )


@query("candle_patterns_1h", _candle_oracle())
def candle_patterns_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick pattern flags (doji, bullish/bearish engulfing)
    over hourly integer-cents OHLC bars — all comparisons integer
    (the doji percent test is cross-multiplied, no division), one
    keyed lag window over the tiny bar relation."""
    from svoe_spark.functions.time import bucket_start
    from svoe_spark.operators.quant import candle_patterns
    from svoe_spark.queries import ticks

    t = ticks(spark, sf_dir)
    bars = t.groupBy(
        "event_type", bucket_start("ts", "1h").alias("window_start")
    ).agg(
        F.min_by("value_c", "event_id").alias("open_c"),
        F.max("value_c").alias("high_c"),
        F.min("value_c").alias("low_c"),
        F.max_by("value_c", "event_id").alias("close_c"),
    )
    flagged = candle_patterns(bars)
    return flagged.where(
        F.col("is_doji")
        | F.col("is_bullish_engulfing")
        | F.col("is_bearish_engulfing")
    )


@query(
    "asof_purchase_view_tolerant",
    """
    WITH p AS (
      SELECT event_id, ts, user_id, value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, ts, arg_max(value, event_id) AS last_view_value
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    )
    SELECT p.event_id, p.ts, p.user_id, p.purchase_value,
           CASE WHEN p.ts - v.ts <= INTERVAL 6 HOUR
                THEN v.last_view_value END AS last_view_value
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_purchase_view_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """asof_purchase_view with pd.merge_asof tolerance semantics: the
    latest prior view is only attached when it is at most 6h old —
    the matched instant rides the same union+fill plan as one extra
    column, so the single-shuffle shape is unchanged."""
    from svoe_spark.operators.asof import asof_join

    e = load_table(spark, "events", sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", F.col("value").alias("purchase_value")
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("last_view_value"))
    )
    return asof_join(
        p, v, on="ts", by="user_id",
        right_cols=["last_view_value"], tolerance="6h",
    )


def _rsi_oracle() -> str:
    from svoe_spark.queries import _TICKS_SQL

    return (
        _TICKS_SQL
        + """
    , d AS (
      SELECT event_type, ts, event_id,
             value_c - LAG(value_c) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS df
      FROM ticks
    ),
    w AS (
      SELECT event_type, ts, event_id,
        CAST(SUM(CASE WHEN df IS NOT NULL THEN 1 ELSE 0 END)
             OVER win AS BIGINT) AS nd,
        CAST(SUM(GREATEST(df, 0)) OVER win AS BIGINT) AS g,
        CAST(SUM(GREATEST(-df, 0)) OVER win AS BIGINT) AS l
      FROM d
      WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ),
    c AS (
      SELECT event_type, ts, event_id,
             CASE WHEN nd = 14 AND (g + l) > 0
                  THEN (CAST(100.0 AS DOUBLE) * CAST(g AS DOUBLE))
                       / CAST(g + l AS DOUBLE)
             END AS rsi_14
      FROM w
    ),
    r AS (
      SELECT event_type, ts, rsi_14,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM c
    )
    SELECT event_type, ts, rsi_14 FROM r WHERE rn = 1
    """
    )


@query("rsi_14_hourly", _rsi_oracle())
def rsi_14_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's 14-period RSI per instrument on cents prices, sampled
    at the last tick of every hour. Integer gain/loss trailing sums via
    the cumsum-minus-lag machinery; one double expression on top."""
    from pyspark.sql import Window

    from svoe_spark.operators.quant import rsi
    from svoe_spark.queries import ticks

    t = ticks(spark, sf_dir)
    c = rsi(
        t, "value_c", by="event_type", order=["ts", "event_id"],
        periods=14, out="rsi_14",
    )
    w = Window.partitionBy(
        "event_type", F.date_trunc("hour", "ts")
    ).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        c.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("event_type", "ts", "rsi_14")
    )


def _bollinger_oracle() -> str:
    from svoe_spark.queries import _TICKS_SQL

    mean = "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
    sd = (
        "sqrt(GREATEST(CAST(n * s2 - s * s AS DOUBLE)"
        " / CAST(n * (n - 1) AS DOUBLE), CAST(0.0 AS DOUBLE)))"
    )
    up = f"({mean} + CAST(2.0 AS DOUBLE) * {sd})"
    dn = f"({mean} - CAST(2.0 AS DOUBLE) * {sd})"
    return (
        _TICKS_SQL
        + f"""
    , bars AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 hour', ts) AS window_start,
             arg_max(value_c, event_id) AS close_c
      FROM ticks GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, window_start, close_c,
        CAST(SUM(CASE WHEN close_c IS NOT NULL THEN 1 ELSE 0 END)
             OVER win AS BIGINT) AS n,
        CAST(SUM(close_c) OVER win AS BIGINT) AS s,
        CAST(SUM(close_c * close_c) OVER win AS BIGINT) AS s2
      FROM bars
      WINDOW win AS (PARTITION BY event_type ORDER BY window_start
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, window_start,
           CASE WHEN n = 20 THEN {mean} END AS bb_mid,
           CASE WHEN n = 20 THEN {up} END AS bb_up,
           CASE WHEN n = 20 THEN {dn} END AS bb_dn,
           CASE WHEN n = 20 AND {up} > {dn}
                THEN (CAST(close_c AS DOUBLE) - {dn}) / ({up} - {dn})
           END AS bb_pctb
    FROM w
    """
    )


@query("bollinger_bands_1h", _bollinger_oracle())
def bollinger_bands_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bar Bollinger bands (±2 sample stddev) + %b on hourly cents
    closes per instrument — exact integer moments, fixed double tree."""
    from svoe_spark.functions.time import bucket_start
    from svoe_spark.operators.quant import bollinger
    from svoe_spark.queries import ticks

    t = ticks(spark, sf_dir)
    bars = t.groupBy(
        "event_type", bucket_start("ts", "1h").alias("window_start")
    ).agg(F.max_by("value_c", "event_id").alias("close_c"))
    return bollinger(
        bars, "close_c", by="event_type", order="window_start",
        window_rows=19, width=2.0,
    ).select(
        "event_type", "window_start", "bb_mid", "bb_up", "bb_dn", "bb_pctb"
    )


@query(
    "fuzzy_part_name_pairs",
    """
    WITH n AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)
    SELECT a.p_name AS left_val, b.p_name AS right_val,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance
    FROM n a JOIN n b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: distinct part-name pairs within edit
    distance 2 via q-gram blocking + exact Levenshtein verify — the
    blocking changes cost only, so the brute-force oracle is the exact
    same answer."""
    from svoe_spark.operators.fuzzy import fuzzy_join

    part = load_table(spark, "part", sf_dir)
    return fuzzy_join(part, part, "p_name", "p_name", max_distance=2).where(
        F.col("left_val") < F.col("right_val")
    )


@query(
    "frequent_active_users",
    """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1 HAVING COUNT(*) >= 80
    """,
)
def frequent_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters without shuffling the long tail: a
    broadcast count-min sketch prunes light keys map-side (CMS never
    underestimates, so no heavy key is lost); only candidate rows
    reach the exact count. Result == plain GROUP BY HAVING."""
    from svoe_spark.operators.sketches import frequent_items

    ev = load_table(spark, "events", sf_dir)
    return frequent_items(ev, "user_id", threshold=80)


def _leadlag_oracle() -> str:
    from svoe_spark.operators.quant import pearson_sql
    from svoe_spark.queries import _TICKS_SQL

    return (
        _TICKS_SQL
        + f"""
    , series AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS bucket,
             CAST(SUM(value_c) AS BIGINT) AS v
      FROM ticks GROUP BY 1, 2
    ),
    lagged AS (
      SELECT s.event_type AS key_y, l.lag, s.bucket - l.lag AS bucket,
             s.v AS vy
      FROM series s CROSS JOIN (
        SELECT UNNEST(generate_series(-2, 2)) AS lag) l
    ),
    p AS (
      SELECT a.event_type AS key_x, b.key_y, b.lag,
             a.v AS vx, b.vy
      FROM series a JOIN lagged b USING (bucket)
      WHERE (a.event_type < b.key_y
             OR (a.event_type = b.key_y AND b.lag > 0))
        AND a.v IS NOT NULL AND b.vy IS NOT NULL
    ),
    m AS (
      SELECT key_x, key_y, CAST(lag AS BIGINT) AS lag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(vx) AS BIGINT) AS sx,
             CAST(SUM(vy) AS BIGINT) AS sy,
             CAST(SUM(vx * vy) AS BIGINT) AS sxy,
             CAST(SUM(vx * vx) AS BIGINT) AS sxx,
             CAST(SUM(vy * vy) AS BIGINT) AS syy
      FROM p GROUP BY 1, 2, 3
    )
    SELECT key_x, key_y, lag, n AS n_buckets,
           {pearson_sql("n", "sx", "sy", "sxy", "sxx", "syy")} AS corr
    FROM m WHERE n >= 2
    """
    )


@query("leadlag_corr_types", _leadlag_oracle())
def leadlag_corr_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag correlation screen at lags -2..+2 over hourly
    cents-notional per instrument (self-pairs give the positive-lag
    autocorrelation function). The y side widens the SMALL panel by a
    constant 5x; moments stay exact int64."""
    from svoe_spark.operators.quant import leadlag_corr
    from svoe_spark.queries import ticks

    t = ticks(spark, sf_dir)
    series = t.groupBy(
        "event_type",
        (F.unix_micros("ts") / 3_600_000_000)
        .cast("long")
        .alias("bucket"),
    ).agg(F.sum("value_c").alias("v"))
    out = leadlag_corr(series, "event_type", "bucket", "v", max_lag=2)
    return out.withColumn("lag", F.col("lag").cast("long"))


def _atr_oracle() -> str:
    from svoe_spark.queries import _TICKS_SQL

    return (
        _TICKS_SQL
        + """
    , bars AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 hour', ts) AS window_start,
             MAX(value_c) AS high_c, MIN(value_c) AS low_c,
             arg_max(value_c, event_id) AS close_c
      FROM ticks GROUP BY 1, 2
    ),
    t AS (
      SELECT bars.*, LAG(close_c) OVER w AS pc FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY window_start)
    ),
    tr AS (
      SELECT event_type, window_start,
             GREATEST(high_c - low_c, ABS(high_c - pc), ABS(low_c - pc))
               AS tr
      FROM t
    ),
    s AS (
      SELECT event_type, window_start,
        CAST(SUM(CASE WHEN tr IS NOT NULL THEN 1 ELSE 0 END)
             OVER win AS BIGINT) AS nt,
        CAST(SUM(tr) OVER win AS BIGINT) AS st
      FROM tr
      WINDOW win AS (PARTITION BY event_type ORDER BY window_start
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, window_start,
           CASE WHEN nt = 14
                THEN CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) END AS atr
    FROM s
    """
    )


@query("atr_14_1h", _atr_oracle())
def atr_14_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-bar Average True Range (SMA form) over hourly cents bars per
    instrument — integer true ranges, one exact trailing sum, one
    division."""
    from svoe_spark.functions.time import bucket_start
    from svoe_spark.operators.quant import atr
    from svoe_spark.queries import ticks

    t = ticks(spark, sf_dir)
    bars = t.groupBy(
        "event_type", bucket_start("ts", "1h").alias("window_start")
    ).agg(
        F.max("value_c").alias("high_c"),
        F.min("value_c").alias("low_c"),
        F.max_by("value_c", "event_id").alias("close_c"),
    )
    return atr(bars, by="event_type", periods=14).select(
        "event_type", "window_start", "atr"
    )


def _winsorize_oracle() -> str:
    from svoe_spark.operators.profiling import order_statistics_sql

    return f"""
    WITH
    {order_statistics_sql('documents', 'n_chars', [0.05, 0.95],
                          group_expr='source', out='cut')}
    , wide AS (
      SELECT g AS source,
             MIN(CASE WHEN q = CAST(0.05 AS DOUBLE) THEN cut END) AS lo,
             MIN(CASE WHEN q = CAST(0.95 AS DOUBLE) THEN cut END) AS hi
      FROM ostat GROUP BY 1
    )
    SELECT d.doc_id, d.source, d.n_chars,
           CASE WHEN d.n_chars IS NOT NULL
                THEN LEAST(GREATEST(d.n_chars, w.lo), w.hi) END AS n_chars_w
    FROM documents d
    JOIN wide w ON w.source IS NOT DISTINCT FROM d.source
    """


@query("winsorize_doc_lengths", _winsorize_oracle())
def winsorize_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source [p5, p95] winsorization of document lengths — exact
    type-1 order-statistic cut points broadcast into a narrow clip, so
    every output value is an actual data value."""
    from svoe_spark.operators.cleaning import winsorize

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", "n_chars"
    )
    return winsorize(
        docs, "n_chars", q_low=0.05, q_high=0.95, group_cols=["source"]
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences
# ---------------------------------------------------------------------------

def _transitions_sql() -> str:
    from svoe_spark.operators.events_analytics import transition_matrix_sql

    return transition_matrix_sql(
        "events", tiebreak="event_id", gap_seconds=1800
    )


@query("event_transitions_30m", _transitions_sql())
def event_transitions_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: which
    event type follows which, within a 30-minute activity gap (the
    same session-boundary rule as `session_windows_30m`). One per-user
    lead window + one |states|^2 groupBy; the oracle is code-generated
    from the same operator parameters (events_analytics.
    transition_matrix_sql), so both engines run the identical lead /
    gap / normalization algebra."""
    from svoe_spark.operators.events_analytics import transition_matrix

    e = load_table(spark, "events", sf_dir)
    return transition_matrix(
        e, key="user_id", ts="ts", state="event_type",
        tiebreak="event_id", gap_seconds=1800,
    )


# ---------------------------------------------------------------------------
# Seasonal anomaly detection (hour-of-day robust baseline)
# ---------------------------------------------------------------------------

def _anomaly_oracle() -> str:
    return """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    h2 AS (SELECT *, CAST(extract(hour FROM hour_ts) AS BIGINT) AS hod
           FROM hourly),
    n1 AS (SELECT event_type, hod, count(*) AS n_g FROM h2 GROUP BY 1, 2),
    r1 AS (SELECT event_type, hod, n,
                  row_number() OVER (PARTITION BY event_type, hod ORDER BY n)
                    AS rk
           FROM h2),
    med AS (SELECT r1.event_type, r1.hod, r1.n AS med
            FROM r1 JOIN n1 USING (event_type, hod)
            WHERE rk = (n_g - 1) // 2 + 1),
    d AS (SELECT h2.*, abs(h2.n - med.med) AS dev
          FROM h2 JOIN med USING (event_type, hod)),
    n2 AS (SELECT event_type, hod, count(*) AS n_g FROM d GROUP BY 1, 2),
    r2 AS (SELECT event_type, hod, dev,
                  row_number() OVER (PARTITION BY event_type, hod ORDER BY dev)
                    AS rk
           FROM d),
    mad AS (SELECT r2.event_type, r2.hod, r2.dev AS mad
            FROM r2 JOIN n2 USING (event_type, hod)
            WHERE rk = (n_g - 1) // 2 + 1),
    s AS (SELECT d.event_type, d.hour_ts, d.n, d.dev,
                 CASE WHEN mad.mad > 0
                      THEN CAST(d.dev AS DOUBLE) / CAST(mad.mad AS DOUBLE)
                 END AS score
          FROM d JOIN mad USING (event_type, hod))
    SELECT event_type, hour_ts, n, dev, score
    FROM s
    WHERE score > 3.0 OR (score IS NULL AND dev > 0)
    """


@query("event_hourly_anomalies", _anomaly_oracle())
def event_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly detection on event volume: hourly counts per
    event type, a robust baseline per (type, HOUR-OF-DAY) — the
    seasonal index, so 3am traffic is judged against 3am history, not
    the daily mean — exact type-1 median + MAD (`robust_outliers`),
    and a flag for |count - median| > 3 * MAD. MAD = 0 groups (a
    constant baseline) flag ANY deviation instead of dividing by zero
    (score is NULL there; the predicate treats dev > 0 as anomalous).
    All intermediates are exact integers; the score is one portable
    division. Scale: the scored relation is |types * hours| rows —
    already aggregated — so the two ranked passes run over a tiny
    fraction of the event volume. Round 11: the ranked passes are the
    WINDOWED order statistics (`robust_outliers_windowed`, the
    mad_outlier_top20 mirror) — same values, but the two count-
    aggregate + broadcast-join chains collapse into windows over the
    one (event_type, hod) partitioning the scoring already needs."""
    from svoe_spark.operators.profiling import robust_outliers_windowed

    e = load_table(spark, "events", sf_dir)
    hourly = (
        e.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("hod", F.hour("hour_ts").cast("long"))
    )
    scored = robust_outliers_windowed(hourly, "n", ["event_type", "hod"])
    return scored.where(
        (F.col("score") > 3.0) | (F.col("score").isNull() & (F.col("dev") > 0))
    ).select("event_type", "hour_ts", "n", "dev", "score")


# ---------------------------------------------------------------------------
# CUSUM changepoint alarms on hourly value level
# ---------------------------------------------------------------------------

_CUSUM_H = 8  # alarm threshold, in MAD units


def _cusum_oracle() -> str:
    return f"""
    WITH t AS (SELECT event_type, ts,
                      CAST(round(value*100,0) AS BIGINT) AS v FROM events),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             CAST(sum(v) AS BIGINT) // CAST(count(*) AS BIGINT) AS avg_c
      FROM t GROUP BY 1, 2),
    nn AS (SELECT event_type, count(*) AS n_g FROM hourly GROUP BY 1),
    rr AS (SELECT event_type, avg_c,
                  row_number() OVER (PARTITION BY event_type ORDER BY avg_c)
                    AS rk
           FROM hourly),
    med AS (SELECT rr.event_type, rr.avg_c AS med
            FROM rr JOIN nn USING (event_type)
            WHERE rk = (n_g - 1) // 2 + 1),
    d AS (SELECT h.*, m.med, abs(h.avg_c - m.med) AS dev
          FROM hourly h JOIN med m USING (event_type)),
    r2 AS (SELECT event_type, dev,
                  row_number() OVER (PARTITION BY event_type ORDER BY dev)
                    AS rk
           FROM d),
    mad AS (SELECT r2.event_type, r2.dev AS mad
            FROM r2 JOIN nn USING (event_type)
            WHERE rk = (n_g - 1) // 2 + 1),
    y AS (SELECT d.event_type, d.hour_ts, d.avg_c, d.med, mad.mad,
                 d.avg_c - d.med - mad.mad AS yp,
                 d.avg_c - d.med + mad.mad AS yn
          FROM d JOIN mad USING (event_type)),
    p AS (SELECT *, sum(yp) OVER w AS pp, sum(yn) OVER w AS pn FROM y
          WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    c AS (SELECT *, pp - least(0, min(pp) OVER w) AS c_pos,
                 greatest(0, max(pn) OVER w) - pn AS c_neg FROM p
          WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT event_type, hour_ts, avg_c,
           CAST(c_pos AS BIGINT) AS c_pos, CAST(c_neg AS BIGINT) AS c_neg
    FROM c
    WHERE c_pos > {_CUSUM_H} * mad OR c_neg > {_CUSUM_H} * mad
    """


@query("value_cusum_alarms", _cusum_oracle())
def value_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential changepoint detection (Page's CUSUM) on the hourly
    value level per event type: slack and alarm threshold are
    MAD-scaled (exact type-1 order statistics), so the detector
    self-calibrates per series. The recursion C_t = max(0, C_{t-1} +
    y_t) is computed RELATIONALLY via the prefix-sum identity
    C_t = P_t - min(0, running_min(P)) — one per-key ordered window,
    no iteration (operators/changepoint.py). Integer arithmetic end
    to end; the hourly level uses truncating integer division (values
    are positive, so Spark DIV == DuckDB //). Round 11: median and MAD
    come from `robust_outliers_windowed` — exact same order statistics
    read back as windows over the event_type partitioning the CUSUM
    window needs anyway, replacing two count-aggregate + broadcast-join
    chains (see profiling.py)."""
    from svoe_spark.operators.changepoint import cusum_scores
    from svoe_spark.operators.profiling import robust_outliers_windowed

    e = load_table(spark, "events", sf_dir)
    hourly = (
        e.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        )
        .groupBy("event_type", "hour_ts")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("sv"),
        )
        .withColumn("avg_c", F.expr("sv DIV n"))
        .drop("n", "sv")
    )
    y = robust_outliers_windowed(
        hourly, "avg_c", ["event_type"], out_med="med", out_mad="mad"
    )
    scored = cusum_scores(
        y, "avg_c", on="hour_ts", by=["event_type"],
        baseline_col="med", slack="mad",
    )
    h = F.lit(_CUSUM_H) * F.col("mad")
    return scored.where(
        (F.col("c_pos") > h) | (F.col("c_neg") > h)
    ).select("event_type", "hour_ts", "avg_c", "c_pos", "c_neg")


# ---------------------------------------------------------------------------
# Per-type value trend: closed-form OLS over exact integer moments
# ---------------------------------------------------------------------------

def _trend_oracle() -> str:
    from svoe_spark.operators.quant import ols_sql

    inner = """(
      SELECT event_type,
             CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT)
               AS xh,
             CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT)
               // CAST(count(*) AS BIGINT) AS avg_c
      FROM events GROUP BY 1, 2
    )"""
    return ols_sql(inner, "xh", "avg_c", group_cols="event_type")


@query("value_trend_by_type", _trend_oracle())
def value_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-instrument value trend: closed-form OLS of the hourly value
    level against the epoch-hour index — slope is drift in cents/hour,
    r2 the linearity, both fixed double expressions over ONE groupBy
    of exact integer moments (`quant.ols_fit`; no solver, no second
    pass). The Spark side and the oracle share the code-generated
    expression tree."""
    from svoe_spark.operators.quant import ols_fit

    e = load_table(spark, "events", sf_dir)
    hourly = (
        e.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        )
        .groupBy("event_type", "hour_ts")
        .agg(F.count(F.lit(1)).alias("n_"), F.sum("v").alias("sv"))
        .select(
            "event_type",
            F.expr("unix_micros(hour_ts) DIV 3600000000").alias("xh"),
            F.expr("sv DIV n_").alias("avg_c"),
        )
    )
    return ols_fit(hourly, "xh", "avg_c", by=["event_type"])


# ---------------------------------------------------------------------------
# Dwell time by state (time spent before the next in-session event)
# ---------------------------------------------------------------------------

_DWELL_SQL = """
WITH seq AS (
  SELECT event_type,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dwell_us
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_dwells,
       CAST(sum(dwell_us) AS BIGINT) AS total_dwell_us,
       CAST(sum(dwell_us) AS BIGINT) / CAST(count(*) AS BIGINT)
         AS avg_dwell_us
FROM seq
WHERE dwell_us IS NOT NULL AND dwell_us <= 1800 * 1000000
GROUP BY event_type
"""


@query("event_dwell_30m", _DWELL_SQL)
def event_dwell_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long users sit in each state: per event type, the exact
    integer microseconds until the SAME user's next event, counted
    only within the 30-minute session gap (a dwell that spans a
    session boundary is absence, not engagement). One per-user lead
    window + one groupBy; avg is the single terminal division. The
    engagement-analysis complement of `event_transitions_30m` (which
    counts WHERE users go; this measures HOW LONG leaving takes)."""
    from pyspark.sql import Window

    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    dwell = e.select(
        "event_type",
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
        ).alias("dwell_us"),
    ).where(
        F.col("dwell_us").isNotNull()
        & (F.col("dwell_us") <= F.lit(1800 * 1_000_000))
    )
    return dwell.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_dwells"),
        F.sum("dwell_us").cast("long").alias("total_dwell_us"),
        (F.sum("dwell_us").cast("long") / F.count(F.lit(1)).cast("long")).alias(
            "avg_dwell_us"
        ),
    )


# ---------------------------------------------------------------------------
# Market-basket association rules (brands co-ordered beyond chance)
# ---------------------------------------------------------------------------

_RULES_MIN_SUPPORT = 5


def _rules_oracle() -> str:
    from svoe_spark.operators.basket import association_rules_sql

    inner = (
        "(SELECT l.l_orderkey AS basket, p.p_brand AS item"
        " FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)"
    )
    return (
        "WITH "
        + association_rules_sql(inner, "basket", "item", _RULES_MIN_SUPPORT)
        + """
    SELECT item_a, item_b, n_ab, n_a, n_b, confidence, lift
    FROM rules
    ORDER BY lift DESC, item_a ASC, item_b ASC
    LIMIT 20
    """
    )


@query("brand_association_rules", _rules_oracle())
def brand_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which part brands are ordered TOGETHER beyond chance: the
    level-2 Apriori pass over order baskets (operators/basket.py),
    scored by exact support, one-division confidence, and RATIONAL
    lift (N*n_ab/(n_a*n_b) — PMI's monotone argument without the log,
    the top_collocations precedent). Top-20 by (lift DESC, pair ASC)
    is a total order. The brand dimension rides a broadcast join into
    the lineitem scan."""
    from svoe_spark.operators.basket import association_rules

    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    baskets = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    ).select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
    rules = association_rules(
        baskets, "basket", "item", min_support=_RULES_MIN_SUPPORT
    )
    return rules.orderBy(
        F.col("lift").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    ).limit(20)


# ---------------------------------------------------------------------------
# First/last-touch conversion attribution
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 72 * 3600 * 1_000_000

_ATTR_SQL = f"""
WITH conv AS (
  SELECT user_id, ts AS cts, event_id AS cid FROM events
  WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_type AS channel, ts AS tts, event_id AS tid
  FROM events WHERE event_type IN ('view', 'click')
),
joined AS (
  SELECT c.cid, t.channel, t.tts, t.tid
  FROM conv c JOIN touch t
    ON c.user_id = t.user_id
   AND t.tts < c.cts
   AND epoch_us(c.cts) - epoch_us(t.tts) <= {_ATTR_WINDOW_US}
),
ranked AS (
  SELECT cid, channel,
         row_number() OVER (PARTITION BY cid ORDER BY tts ASC, tid ASC)
           AS rn_first,
         row_number() OVER (PARTITION BY cid ORDER BY tts DESC, tid DESC)
           AS rn_last
  FROM joined
)
SELECT role, channel, CAST(count(*) AS BIGINT) AS n_conversions
FROM (
  SELECT 'first' AS role, channel FROM ranked WHERE rn_first = 1
  UNION ALL
  SELECT 'last' AS role, channel FROM ranked WHERE rn_last = 1
)
GROUP BY role, channel
"""


@query("touch_attribution_72h", _ATTR_SQL)
def touch_attribution_72h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which channel gets credit for a purchase: first-touch and
    last-touch attribution over the 72h pre-conversion window —
    integer conversion counts per (role, channel), fully deterministic
    (the touch pick is a row_number with an event-id tie-break; linear
    multi-touch would sum 1/n floats in arbitrary order, so the exact
    variants are the hashable ones). Scale shape: the conv x touch
    join is user-keyed with a time-band predicate (the interval-join
    discipline); the ranked pass partitions by conversion id."""
    from pyspark.sql import Window

    e = load_table(spark, "events", sf_dir)
    conv = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("cid")
    )
    touch = e.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
    )
    joined = conv.join(
        touch,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("tts") < F.col("cts"))
        & (
            F.unix_micros(F.col("cts")) - F.unix_micros(F.col("tts"))
            <= F.lit(_ATTR_WINDOW_US)
        ),
    )
    wf = Window.partitionBy("cid").orderBy(F.col("tts").asc(), F.col("tid").asc())
    wl = Window.partitionBy("cid").orderBy(F.col("tts").desc(), F.col("tid").desc())
    ranked = joined.select(
        "cid",
        "channel",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
    )
    first = ranked.where(F.col("rn_first") == 1).select(
        F.lit("first").alias("role"), "channel"
    )
    last = ranked.where(F.col("rn_last") == 1).select(
        F.lit("last").alias("role"), "channel"
    )
    return (
        first.unionByName(last)
        .groupBy("role", "channel")
        .agg(F.count(F.lit(1)).cast("long").alias("n_conversions"))
    )


# ---------------------------------------------------------------------------
# Trimmed mean (exact rank-range mean) per instrument
# ---------------------------------------------------------------------------

def _trimmed_oracle() -> str:
    from svoe_spark.queries import _TICKS_SQL

    return (
        _TICKS_SQL
        + """
    , nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
             FROM ticks GROUP BY 1),
    r AS (SELECT event_type, value_c,
                 row_number() OVER (PARTITION BY event_type ORDER BY value_c)
                   AS rk
          FROM ticks),
    b AS (SELECT event_type,
                 CAST(floor((n - 1) * CAST(0.1 AS DOUBLE)) AS BIGINT) + 1
                   AS k_lo,
                 CAST(floor((n - 1) * CAST(0.9 AS DOUBLE)) AS BIGINT) + 1
                   AS k_hi
          FROM nn)
    SELECT r.event_type,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(value_c) AS BIGINT) AS sum_c,
           CAST(sum(value_c) AS BIGINT) / CAST(count(*) AS BIGINT)
             AS trimmed_mean_c
    FROM r JOIN b ON r.event_type = b.event_type
    WHERE rk >= k_lo AND rk <= k_hi
    GROUP BY r.event_type
    """
    )


@query("trimmed_mean_value", _trimmed_oracle())
def trimmed_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean of tick prices per instrument: exact type-1
    rank bounds (the order-statistic machinery), integer sum over the
    kept rank range, ONE terminal division. Rank ties among equal
    values pick an arbitrary ROW but the same value multiset, so the
    sum is deterministic. The robust location estimate between median
    (50% trim) and mean (0%)."""
    from pyspark.sql import Window

    from svoe_spark.queries import ticks

    t = ticks(spark, sf_dir)
    nn = t.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    bounds = nn.select(
        "event_type",
        (F.floor((F.col("n") - 1) * 0.1).cast("long") + 1).alias("k_lo"),
        (F.floor((F.col("n") - 1) * 0.9).cast("long") + 1).alias("k_hi"),
    )
    w = Window.partitionBy("event_type").orderBy("value_c")
    ranked = t.select("event_type", "value_c").withColumn(
        "rk", F.row_number().over(w)
    )
    kept = ranked.join(F.broadcast(bounds), "event_type").where(
        (F.col("rk") >= F.col("k_lo")) & (F.col("rk") <= F.col("k_hi"))
    )
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("value_c").cast("long").alias("sum_c"),
        (F.sum("value_c").cast("long") / F.count(F.lit(1)).cast("long")).alias(
            "trimmed_mean_c"
        ),
    )


# ---------------------------------------------------------------------------
# Top session paths (state trigrams within the session gap)
# ---------------------------------------------------------------------------

_PATHS_SQL = """
WITH seq AS (
  SELECT event_type AS s1,
         lead(event_type) OVER w AS s2,
         lead(event_type, 2) OVER w AS s3,
         epoch_us(ts) AS t1,
         epoch_us(lead(ts) OVER w) AS t2,
         epoch_us(lead(ts, 2) OVER w) AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tri AS (
  SELECT s1, s2, s3 FROM seq
  WHERE s3 IS NOT NULL
    AND t2 - t1 <= 1800 * 1000000
    AND t3 - t2 <= 1800 * 1000000
)
SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
FROM tri GROUP BY s1, s2, s3
ORDER BY n DESC, s1 ASC, s2 ASC, s3 ASC
LIMIT 20
"""


@query("top_session_paths", _PATHS_SQL)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 most-walked 3-step user paths, where every hop stays
    inside the 30-minute session gap — the sequence-mining view one
    level above the transition matrix (which only sees pairs). One
    keyed window computes both leads; the trigram groupBy output is
    |states|^3 rows at most. Total order on (n DESC, path ASC)."""
    from pyspark.sql import Window

    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        F.col("event_type").alias("s1"),
        F.lead("event_type").over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
        F.unix_micros(F.col("ts")).alias("t1"),
        F.unix_micros(F.lead("ts").over(w)).alias("t2"),
        F.unix_micros(F.lead("ts", 2).over(w)).alias("t3"),
    )
    gap = 1800 * 1_000_000
    tri = seq.where(
        F.col("s3").isNotNull()
        & ((F.col("t2") - F.col("t1")) <= gap)
        & ((F.col("t3") - F.col("t2")) <= gap)
    )
    return (
        tri.groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(
            F.col("n").desc(),
            F.col("s1").asc(),
            F.col("s2").asc(),
            F.col("s3").asc(),
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (exact average-tie ranks, integer trick)
# ---------------------------------------------------------------------------

def _spearman_oracle() -> str:
    from svoe_spark.operators.quant import spearman_sql
    from svoe_spark.queries import _TICKS_SQL

    return _TICKS_SQL + spearman_sql(
        "ticks", "value_c", "qty", group_cols="event_type"
    )


@query("spearman_value_qty", _spearman_oracle())
def spearman_value_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between price and traded size per
    instrument — monotone association, robust to the price column's
    heavy tail where Pearson is not. Exact textbook average-tie ranks
    via the DOUBLED-rank trick (2*rank + ties - 1 stays integer;
    Pearson is affine-invariant), so every moment is an exact int64
    and the one final double tree is shared with the Pearson family
    (`quant.spearman_corr` / `spearman_sql`)."""
    from svoe_spark.operators.quant import spearman_corr
    from svoe_spark.queries import ticks

    t = ticks(spark, sf_dir)
    return spearman_corr(t, "value_c", "qty", by=["event_type"])
