"""Dataset profiling for training-data pipelines: one-pass per-column
statistics (the deequ/Great-Expectations "profiler" step), key-skew
reports for shuffle planning, and deterministic equi-width histograms.

Why this lives in the engine: before any 100 TB curation run you
profile the corpus (null rates, distinctness, value ranges, per-key
volume) to pick partition keys, spot skew that would stall a shuffle,
and validate schema assumptions. The reference exposes dataset
metadata through its catalog/apiserver (svoe/featurizer/api.py,
data_catalog table); here profiling is a first-class relational
operator so the same answers come from one Spark pass instead of a
metadata side-channel.

Scale design:
  - ``profile_columns`` is ONE aggregate over the table. With
    ``distinct="approx"`` (the 100 TB default) distinct counts use
    HyperLogLog (``approx_count_distinct``) so the whole profile is a
    single scan + a partial-aggregated single-row reduce — no Expand,
    no second pass. ``distinct="exact"`` uses ``count(DISTINCT col)``
    per column, which Spark plans as an Expand multiplying the scan by
    the number of profiled columns — acceptable at test scale and for
    the DuckDB oracle, documented as the expensive mode.
  - ``key_skew_report`` is one shuffle on the key (partial-aggregated
    counts, so the shuffle carries one row per key per mapper), then a
    single-row reduce plus a TakeOrdered top-k — no global window, no
    collect of the key relation.
  - ``numeric_histogram`` is two aggregate passes (min/max, then the
    binned counts); the bin expression is a pure function of data
    min/max so the histogram is deterministic (no sampling, unlike
    ``repartitionByRange``'s internal sketch).

Determinism contract (shared with the rest of the repo): every value
the DuckDB oracle hash-checks is either exact integer arithmetic or a
SINGLE floating division/multiply of exactly-computed operands —
never an order-dependent float accumulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def _is_string(dt: str) -> bool:
    return dt == "string"


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    distinct: str = "approx",
) -> DataFrame:
    """Per-column profile in one aggregate pass.

    Output (one row per profiled column, in ``cols`` order):
      col_name     column name
      n_rows       total rows (same for every row)
      n_null       NULL count
      n_distinct   distinct non-NULL count (HLL estimate when
                   ``distinct="approx"``, exact when ``"exact"``)
      min_value    CAST(min(col) AS STRING)  (NULL on all-NULL)
      max_value    CAST(max(col) AS STRING)
      len_sum      string columns: sum(length(col)); else NULL
      num_sum      integral columns: sum(col) AS BIGINT; else NULL
                   (float sums are order-dependent across engines, so
                   they are deliberately not profiled here)

    ``distinct="approx"`` keeps the profile a single scan at any
    scale; ``"exact"`` is bit-reproducible (and what the registered
    oracle query uses) at the cost of an Expand of width len(cols).
    """
    if distinct not in ("approx", "exact"):
        raise ValueError(f"distinct must be 'approx' or 'exact', got {distinct!r}")
    dtypes = dict(df.dtypes)
    if cols is None:
        cols = [c for c, _ in df.dtypes]
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        col = F.col(c)
        nd = F.count_distinct(col) if distinct == "exact" else F.approx_count_distinct(col)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("bigint").alias(f"__{c}__nulls"),
            nd.cast("bigint").alias(f"__{c}__nd"),
            F.min(col).cast("string").alias(f"__{c}__min"),
            F.max(col).cast("string").alias(f"__{c}__max"),
        ]
        if _is_string(dtypes[c]):
            aggs.append(F.sum(F.length(col)).cast("bigint").alias(f"__{c}__lsum"))
        if dtypes[c] in _INTEGRAL:
            aggs.append(F.sum(col).cast("bigint").alias(f"__{c}__nsum"))

    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n_rows").alias("n_rows"),
                F.col(f"__{c}__nulls").alias("n_null"),
                F.col(f"__{c}__nd").alias("n_distinct"),
                F.col(f"__{c}__min").alias("min_value"),
                F.col(f"__{c}__max").alias("max_value"),
                (
                    F.col(f"__{c}__lsum")
                    if _is_string(dtypes[c])
                    else F.lit(None).cast("bigint")
                ).alias("len_sum"),
                (
                    F.col(f"__{c}__nsum")
                    if dtypes[c] in _INTEGRAL
                    else F.lit(None).cast("bigint")
                ).alias("num_sum"),
            )
            for c in cols
        ]
    )
    return row.select(F.inline(entries))


def key_skew_report(
    df: DataFrame, key: str, top_k: int = 10
) -> DataFrame:
    """Key-volume skew summary for shuffle planning: would a
    groupBy/join on ``key`` hot-spot one reducer?

    Output is ONE row:
      n_rows, n_keys, max_count, min_count   exact integers
      max_share    max_count / n_rows (one division — deterministic)
      topk_csv     "key:count,..." — top ``top_k`` keys by count desc,
                   key asc (total order, so the CSV is reproducible).
                   NULL keys count as the literal key "<NULL>" so they
                   participate in (and sort within) the report
                   identically across engines

    Scale shape: one partial-aggregated shuffle on ``key`` (the only
    pass over the data), a single-row reduce over the per-key counts,
    and a TakeOrdered top-k — the per-key relation is never collected
    or globally sorted.
    """
    k = F.coalesce(F.col(key).cast("string"), F.lit("<NULL>"))
    counts = df.groupBy(k.alias("__key")).agg(F.count(F.lit(1)).alias("__cnt"))
    summary = counts.agg(
        F.sum("__cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("__cnt").cast("bigint").alias("max_count"),
        F.min("__cnt").cast("bigint").alias("min_count"),
    )
    top = (
        counts.orderBy(F.desc("__cnt"), F.asc("__key"))
        .limit(top_k)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                (-F.col("__cnt")).alias("nc"),
                                F.col("__key").alias("k"),
                                F.col("__cnt").alias("c"),
                            )
                        )
                    ),
                    lambda s: F.concat_ws(":", s["k"], s["c"].cast("string")),
                ),
                ",",
            ).alias("topk_csv")
        )
    )
    return summary.crossJoin(top).select(
        "n_rows",
        "n_keys",
        "max_count",
        "min_count",
        (F.col("max_count").cast("double") / F.col("n_rows").cast("double")).alias(
            "max_share"
        ),
        "topk_csv",
    )


def numeric_histogram(df: DataFrame, col: str, bins: int = 16) -> DataFrame:
    """Deterministic equi-width histogram of a numeric column.

    Bin edges are a pure function of the data min/max (no sampling):
    ``bin = least(bins-1, floor((x - min) * bins / (max - min)))``,
    every arithmetic step a single IEEE double op so the DuckDB oracle
    reproduces the binning bit-exactly. Empty bins are emitted with
    count 0 (the output always has ``bins`` rows when the column is
    non-empty and min < max; a constant column lands in bin 0).

    Two passes: a min/max aggregate (two scalars to the driver — the
    same trade as curation.py's bucket boundaries) and one binned
    count aggregate. NULLs are excluded.
    """
    stats = df.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
    ).first()
    lo, hi = stats["lo"], stats["hi"]
    if lo is None:
        return df.sparkSession.createDataFrame(
            [], "bin_id int, bin_lo double, bin_hi double, n_rows bigint"
        )
    x = F.col(col).cast("double")
    if hi == lo:
        binned = F.lit(0)
    else:
        binned = F.least(
            F.lit(bins - 1),
            F.floor((x - F.lit(lo)) * F.lit(float(bins)) / (F.lit(hi) - F.lit(lo))),
        ).cast("int")
    got = (
        df.where(x.isNotNull())
        .groupBy(binned.alias("bin_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    width = (hi - lo) / float(bins)
    grid = df.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("bin_id"),
        (F.lit(lo) + F.col("id").cast("double") * F.lit(width)).alias("bin_lo"),
        (F.lit(lo) + (F.col("id") + 1).cast("double") * F.lit(width)).alias("bin_hi"),
    )
    return (
        grid.join(got, "bin_id", "left")
        .select(
            "bin_id",
            "bin_lo",
            "bin_hi",
            F.coalesce("n_rows", F.lit(0)).cast("bigint").alias("n_rows"),
        )
        .orderBy("bin_id")
    )


def type1_rank_sql(n_expr: str, q: float) -> str:
    """THE type-1 (lower empirical quantile) target-rank expression
    (Spark SQL dialect): floor((n-1)*q)+1 over a BIGINT count, with
    the DOUBLE literal embedded via repr() so it round-trips exactly.
    Every Spark form (order_statistics' targets, distribution_drift's
    windowed cut read) renders through this helper; the DuckDB twin
    (order_statistics_sql) mirrors the same floor/cast/+1 chain with
    its own CAST(.. AS DOUBLE) literal syntax — change one, change
    both."""
    return f"CAST(floor(({n_expr} - 1) * {float(q)!r}D) AS BIGINT) + 1"


def order_statistics(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    group_cols: list[str] | None = None,
    out: str = "value",
) -> DataFrame:
    """Exact empirical quantiles as ORDER STATISTICS: per group, the
    k-th smallest value with k = floor((n-1)*q) + 1 (type-1 / lower
    empirical quantile — always an actual data value, never an
    interpolation). Engine-independent by construction: integer rank
    selection plus a value copied from the data, with none of the
    interpolation/float-accumulation variance of percentile() or the
    sketch internals of percentile_approx. Ties are safe — row_number
    among equal values is arbitrary, but the k-th smallest VALUE is
    unique.

    NULL values are excluded before ranking (quantiles of the non-null
    domain; engines also disagree on NULL ordering, so including them
    would break cross-engine parity).

    Returns long format: (group..., q, out). Scale shape: one count
    aggregate plus one ranked pass; the target-rank relation is one
    row per (group, q) and broadcast into the rank filter. The ranked
    pass is a per-group window — bounded when the input is (as in the
    intended composition: run it over a ``hash_sample`` of the corpus,
    whose quantiles converge at 1/sqrt(pn); or over per-group data you
    know fits). For exact GLOBAL quantiles over unbounded data compose
    ``curation.global_rank`` + this rank arithmetic instead.
    """
    groups = list(group_cols or [])
    # quantiles are over the NON-NULL domain (the standard semantics):
    # counting NULL rows in n and letting them occupy ranks diverges
    # between engines too — Spark row_number orders NULLS FIRST,
    # DuckDB NULLS LAST, so the k-th "value" would differ
    df = df.where(F.col(value_col).isNotNull())
    counts = df.groupBy(*groups).agg(F.count(F.lit(1)).alias("__n"))
    # one parsed expr for the per-q target structs (the Column loop was
    # ~8 py4j round trips per quantile); named_struct with the same
    # DOUBLE literals (repr round-trips exactly) and the same
    # floor/cast/+1 integer chain is value- and type-identical
    targets = counts.select(
        *groups,
        F.explode(
            F.expr(
                "array("
                + ",".join(
                    f"named_struct('q', {float(q)!r}D, '__rk', "
                    f"{type1_rank_sql('__n', q)})"
                    for q in qs
                )
                + ")"
            )
        ).alias("__t"),
    ).select(*groups, F.col("__t.q").alias("q"), F.col("__t.__rk").alias("__rk"))
    if groups:
        w = Window.partitionBy(*groups).orderBy(value_col)
    else:
        w = Window.partitionBy(F.lit(1)).orderBy(value_col)
    ranked = df.select(*groups, value_col).withColumn(
        "__rn", F.row_number().over(w)
    )
    ranked = ranked.withColumnRenamed("__rn", "__rk")
    if not groups:
        return ranked.join(F.broadcast(targets), ["__rk"]).select(
            "q", F.col(value_col).alias(out)
        )
    # NULL-SAFE group equality — groupBy/window treat NULL as a real
    # group, so a plain equi-join would silently drop its quantiles
    for g in groups:
        targets = targets.withColumnRenamed(g, f"__t_{g}")
    cond = ranked["__rk"] == targets["__rk"]
    for g in groups:
        cond = cond & ranked[g].eqNullSafe(F.col(f"__t_{g}"))
    return ranked.join(F.broadcast(targets), cond).select(
        *[ranked[g] for g in groups], "q", F.col(value_col).alias(out)
    )


def order_statistics_sql(
    table: str,
    value_col: str,
    qs: list[float],
    group_expr: str | None = None,
    out: str = "value",
) -> str:
    """DuckDB CTE chain re-deriving the same type-1 order statistics —
    emits CTE ``ostat`` (g?, q, <out>). group_expr is aliased ``g``."""
    g_sel = f"{group_expr} AS g, " if group_expr else ""
    g_cols = "g, " if group_expr else ""
    g_grp = "GROUP BY g" if group_expr else ""
    g_part = "PARTITION BY g" if group_expr else ""
    # NULL-safe group match, mirroring the operator (groupBy/window
    # treat NULL as a real group)
    g_join = (
        "ON ostat_r.g IS NOT DISTINCT FROM ostat_t.g"
        " AND ostat_r.__rk = ostat_t.__rk"
        if group_expr
        else "USING (__rk)"
    )
    # bare decimal literals parse as DECIMAL in DuckDB (pandas would
    # then coerce differently than Spark's double) — cast explicitly
    q_arms = " UNION ALL ".join(
        f"SELECT CAST({float(q)!r} AS DOUBLE) AS q" for q in qs
    )
    return f"""
    ostat_in AS (SELECT * FROM {table} WHERE {value_col} IS NOT NULL),
    ostat_n AS (SELECT {g_sel}count(*) AS n FROM ostat_in {g_grp}),
    ostat_t AS (SELECT {g_cols}qq.q,
                       CAST(floor((n - 1) * qq.q) AS BIGINT) + 1 AS __rk
                FROM ostat_n CROSS JOIN ({q_arms}) qq),
    ostat_r AS (SELECT {g_sel}{value_col} AS __v,
                       row_number() OVER ({g_part} ORDER BY {value_col})
                         AS __rk
                FROM ostat_in),
    ostat AS (SELECT {"ostat_r.g AS g, " if group_expr else ""}q,
                     __v AS {out}
              FROM ostat_r JOIN ostat_t {g_join})
    """


def attach_broadcast(
    base: DataFrame,
    rel: DataFrame,
    groups: list[str],
    prefix: str = "__r_",
    how: str = "inner",
) -> DataFrame:
    """NULL-SAFE broadcast attach of a small per-group relation onto a
    big one: groupBy/order_statistics treat NULL as a real group, so a
    plain equi-join would silently drop every NULL-group row from a
    row-preserving transform. Shared by robust_outliers and
    cleaning.winsorize so the eqNullSafe invariant lives in one place.

    ``how='left'`` keeps base rows whose group has NO row in ``rel``
    (their attached columns come back NULL) — required when ``rel`` is
    derived from a sample or a NULL-excluding aggregate and the caller
    promises row preservation (ADVICE r4: a group absent from the
    order-statistics relation must not silently lose all its rows).
    """
    if not groups:
        # constant-true join (not crossJoin) so how='left' keeps its
        # row-preservation contract when rel is EMPTY — e.g. an
        # ungrouped caller whose sample drew zero rows must keep the
        # base rows with NULL attached columns, not drop the corpus
        return base.join(F.broadcast(rel), F.lit(True), how)
    for g in groups:
        rel = rel.withColumnRenamed(g, f"{prefix}{g}")
    cond = None
    for g in groups:
        c = base[g].eqNullSafe(F.col(f"{prefix}{g}"))
        cond = c if cond is None else cond & c
    return base.join(F.broadcast(rel), cond, how).drop(
        *[f"{prefix}{g}" for g in groups]
    )


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out_dev: str = "dev",
    out_score: str = "score",
) -> DataFrame:
    """Median/MAD robust outlier scoring per group over an INTEGER
    column: dev = |x - median|, score = dev / MAD where MAD is the
    median absolute deviation — the standard heavy-tail-safe
    alternative to mean/stddev z-scores (one wild value cannot drag
    the threshold). Both medians are exact type-1 order statistics
    (`order_statistics`), so every intermediate is an exact integer
    and the one final division is bit-portable. Rows in groups with
    MAD = 0 (majority-constant groups) get a NULL score rather than
    0/0.

    Scale shape: two ranked passes (the order-statistic plan) + two
    broadcast joins of |groups|-row relations into narrow projections.
    The deviation relation feeds three subtrees and is deliberately
    NOT persisted: it is a narrow projection over the scan, and the
    A/B measurement (sf0.1 ticks, steady-state) ran 1.34 s recomputed
    vs 1.70 s persisted — materializing the wide frame costs more than
    re-deriving it (the repo-wide persist rule: only cache lineage
    that is expensive to replay, e.g. Python stages).
    """
    groups = list(group_cols or [])
    med = order_statistics(df, value_col, [0.5], groups, out="__med").select(
        *groups, "__med"
    )
    dev_df = attach_broadcast(df, med, groups).withColumn(
        out_dev, F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = order_statistics(dev_df, out_dev, [0.5], groups, out="__mad").select(
        *groups, "__mad"
    )
    j2 = attach_broadcast(dev_df, mad, groups)
    return j2.withColumn(
        out_score,
        F.when(
            F.col("__mad") > 0,
            F.col(out_dev).cast("double") / F.col("__mad").cast("double"),
        ),
    ).drop("__med", "__mad")


def robust_outliers_windowed(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out_dev: str = "dev",
    out_score: str = "score",
    out_med: str | None = None,
    out_mad: str | None = None,
) -> DataFrame:
    """`robust_outliers` computed as WINDOWED order statistics over one
    partitioning (guide §2.4 "windows on the same key save a full
    pass"): instead of two count-aggregate + ranked-pass + broadcast-
    join chains (four extra eager jobs and exchanges on a relation the
    caller is about to window by the same keys anyway), rank the rows
    ascending once per statistic and read the median back as a windowed
    single-value max over the SAME partitioning — the mad_outlier_top20
    round-11 rewrite, generalized.

    Exact-mirror contract with `robust_outliers` (pinned by
    tests/test_profiling.py::test_robust_outliers_windowed_matches_joined):

    - ranks ascend with Spark's default NULLS FIRST, so the rank of the
      k-th smallest NON-NULL value is (n - nn) + k; the median rank
      offsets by the per-group NULL count exactly as order_statistics'
      NULL-excluding filter does (k = (nn - 1) div 2 + 1);
    - rank ties among equal values are arbitrary but the k-th smallest
      VALUE is unique — order_statistics' own tie argument;
    - groups with ZERO non-null values are dropped whole — the rows
      robust_outliers loses in its inner med-join;
    - dev is non-null exactly where the value is, so the MAD rank
      reuses the same null offset; the score division is token-
      identical (NULL when MAD = 0).

    ``out_med``/``out_mad`` optionally retain the per-group median/MAD
    as columns (cusum callers feed them as baseline/slack); by default
    they are dropped like robust_outliers' internals.

    Scale shape: one exchange on the group keys, three in-partition
    sorts (value rank, dev rank, none for the stats reads). Use it when
    the input is a per-group aggregate (bounded groups); for raw-volume
    inputs the aggregate+broadcast form spills more gracefully.
    """
    groups = list(group_cols or [])
    part = [F.col(g) for g in groups] if groups else [F.lit(1)]
    wn = Window.partitionBy(*part)
    wv = Window.partitionBy(*part).orderBy(F.col(value_col).asc())
    med_name = out_med or "__med"
    mad_name = out_mad or "__mad"
    d = (
        df.withColumn("__n", F.count(F.lit(1)).over(wn))
        .withColumn("__nn", F.count(value_col).over(wn))
        .withColumn("__rn", F.row_number().over(wv))
    )
    rk = F.expr("(__n - __nn) + ((__nn - 1) div 2 + 1)")
    d = (
        d.withColumn(
            med_name,
            F.max(F.when(F.col("__rn") == rk, F.col(value_col))).over(wn),
        )
        .where(F.col("__nn") > 0)
        .withColumn(out_dev, F.abs(F.col(value_col) - F.col(med_name)))
    )
    wd = Window.partitionBy(*part).orderBy(F.col(out_dev).asc())
    d = d.withColumn("__rnd", F.row_number().over(wd)).withColumn(
        mad_name,
        F.max(F.when(F.col("__rnd") == rk, F.col(out_dev))).over(wn),
    )
    d = d.withColumn(
        out_score,
        F.when(
            F.col(mad_name) > 0,
            F.col(out_dev).cast("double") / F.col(mad_name).cast("double"),
        ),
    ).drop("__n", "__nn", "__rn", "__rnd")
    if out_med is None:
        d = d.drop("__med")
    if out_mad is None:
        d = d.drop("__mad")
    return d


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Distribution drift report between a REFERENCE population and a
    CURRENT one (PSI-style, rational): bucket both sides by the
    reference's exact type-1 quantile cut points (equi-depth in the
    reference), then per observed bucket report

      n_ref, n_cur   exact counts
      p, q           bucket shares (one division each)
      drift_term     (p - q)^2 / (p + q) — the chi-square-style
                     per-bucket contribution; sum the column for a
                     scalar drift statistic. The rational form (no
                     log) keeps values bit-portable cross-engine (the
                     PMI -> rational-lift precedent).

    Cut points are COLLECTED — n_buckets-1 values, bounded by
    construction (the centroid-literal precedent) — and folded into a
    narrow indicator-sum expression, so bucketing adds NO shuffle to
    either scan; only the |buckets|-row count aggregates shuffle.
    Duplicate cut values (heavy ties in the reference) skip bucket ids
    structurally; only observed buckets are emitted. NULL values are
    excluded on both sides (quantiles of the non-null domain).
    """
    if n_buckets < 2:
        raise ValueError("distribution_drift: n_buckets must be >= 2")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    ref_nn = ref.where(F.col(value_col).isNotNull())
    cur_nn = cur.where(F.col(value_col).isNotNull())
    # cut points as ONE ranked pass + ONE aggregate row (round 11, the
    # windowed-order-statistic pattern): rank ascending, count the
    # non-null domain as a window, read each q's type-1 value back as
    # max(case when rn == floor((n-1)*q)+1). The rank expression is
    # token-identical to order_statistics' target (same DOUBLE literal,
    # same floor/cast/+1 chain), values dedup/duplicate exactly as the
    # per-q rows did — the former count-aggregate + broadcast-join +
    # ranked-join chain was ~3 extra jobs per drift call for the same
    # n_buckets-1 doubles.
    wv = Window.partitionBy(F.lit(1)).orderBy(F.col(value_col))
    wn = Window.partitionBy(F.lit(1))
    ranked = ref_nn.select(
        F.col(value_col).alias("__v"),
        F.row_number().over(wv).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    cut_row = ranked.agg(
        *[
            F.max(
                F.when(
                    F.col("__rn") == F.expr(type1_rank_sql("__n", q)),
                    F.col("__v"),
                )
            ).alias(f"__c{i}")
            for i, q in enumerate(qs)
        ]
    ).first()
    cuts = sorted(v for v in cut_row if v is not None)
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + F.when(F.col(value_col) >= F.lit(c), 1).otherwise(0)

    def side_counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(bucket.cast("long").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )

    rc = side_counts(ref_nn, "n_ref")
    cc = side_counts(cur_nn, "n_cur")
    joined = rc.join(cc, "bucket", "full").select(
        "bucket",
        F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
    )
    totals = joined.agg(
        F.sum("n_ref").cast("long").alias("__tr"),
        F.sum("n_cur").cast("long").alias("__tc"),
    )
    # an entirely-empty side leaves its total at 0: shares are
    # undefined (NULL), not a DIVIDE_BY_ZERO (ANSI mode throws)
    p = F.when(F.col("__tr") > 0, F.col("n_ref") / F.col("__tr"))
    q = F.when(F.col("__tc") > 0, F.col("n_cur") / F.col("__tc"))
    return (
        joined.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "n_ref",
            "n_cur",
            p.alias("p"),
            q.alias("q"),
            ((p - q) * (p - q) / (p + q)).alias("drift_term"),
        )
    )


def gini(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out: str = "gini",
) -> DataFrame:
    """Exact Gini coefficient per group over a NON-NEGATIVE INTEGER
    value column — the standard inequality/skew summary (who owns the
    spend / tokens / traffic), computed in the fully rational form

        G = (2 * sum(i * x_(i)) - (n + 1) * sum(x)) / (n * sum(x))

    with x_(i) the ascending sort: numerator and denominator are exact
    int64 sums (a permutation within a tie run leaves sum(i*x)
    unchanged, so ties need no ordering rule), and the result is ONE
    division — bit-portable cross-engine. NULL for groups whose total
    is 0 (all-zero values: inequality undefined).

    Scale shape: one keyed ranked pass (the order-statistic sort) +
    one moment groupBy. Headroom: sum(i * x) < n^2/2 * max(x) must fit
    int64 — ~4e6 rows/group at cent-scale values; past that widen the
    product to decimal(38,0).
    """
    groups = list(group_cols or [])
    df = df.where(F.col(value_col).isNotNull())
    w = Window.partitionBy(*(groups or [F.lit(1)])).orderBy(F.col(value_col))
    ranked = df.select(
        *groups,
        F.col(value_col).alias("__x"),
        F.row_number().over(w).cast("long").alias("__i"),
    )
    agg = ranked.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__x").cast("long").alias("__sx"),
        F.sum(F.col("__i") * F.col("__x")).cast("long").alias("__six"),
    )
    num = F.lit(2) * F.col("__six") - (F.col("__n") + 1) * F.col("__sx")
    den = F.col("__n") * F.col("__sx")
    return agg.select(
        *groups,
        F.col("__n").alias("n"),
        F.col("__sx").alias("total"),
        F.when(den > 0, num / den).alias(out),
    )


def gini_sql(
    table: str,
    value_col: str,
    group_cols: str | None = None,
    out: str = "gini",
) -> str:
    """SQL twin of :func:`gini` (same ranked pass, same integer
    moments, same single division)."""
    g_sel = f"{group_cols}, " if group_cols else ""
    g_grp = f"GROUP BY {group_cols}" if group_cols else ""
    g_part = f"PARTITION BY {group_cols} " if group_cols else ""
    return f"""
    SELECT {g_sel}__n AS n, __sx AS total,
           CASE WHEN __n * __sx > 0
                THEN (2 * __six - (__n + 1) * __sx) / (__n * __sx) END
             AS {out}
    FROM (
      SELECT {g_sel}CAST(count(*) AS BIGINT) AS __n,
             CAST(sum(__x) AS BIGINT) AS __sx,
             CAST(sum(__i * __x) AS BIGINT) AS __six
      FROM (
        SELECT {g_sel}{value_col} AS __x,
               CAST(row_number() OVER ({g_part}ORDER BY {value_col})
                    AS BIGINT) AS __i
        FROM {table}
        WHERE {value_col} IS NOT NULL
      ) {g_grp}
    )
    """


def hhi(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out: str = "hhi",
) -> DataFrame:
    """Exact Herfindahl-Hirschman concentration index per group over a
    NON-NEGATIVE INTEGER value column: HHI = sum(x_i^2) / (sum(x))^2 —
    the share-squared sum without ever materializing float shares
    (whose summation order would be engine-dependent). Both moments
    are exact integers; the result is ONE division. 1.0 = monopoly,
    1/n = perfectly even. NULL when the group total is 0.

    Scale shape: one partial-agg-friendly groupBy — no sort at all.
    Headroom matches the SQL twin exactly: sum(x^2) accumulates in
    decimal(38,0) (the twin uses HUGEINT) and the denominator is the
    DOUBLE product of two exactly-converted int64 totals (the twin
    casts __sx to DOUBLE before multiplying) — no overflow in either
    engine until sum(x) itself exceeds int64.
    """
    groups = list(group_cols or [])
    df = df.where(F.col(value_col).isNotNull())
    x = F.col(value_col)
    agg = df.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(x).cast("long").alias("__sx"),
        F.sum(x.cast("decimal(38,0)") * x).alias("__sxx"),
    )
    return agg.select(
        *groups,
        F.col("__n").alias("n"),
        F.col("__sx").alias("total"),
        F.when(
            F.col("__sx") > 0,
            F.col("__sxx").cast("double")
            / (F.col("__sx").cast("double") * F.col("__sx").cast("double")),
        ).alias(out),
    )


def hhi_sql(
    table: str,
    value_col: str,
    group_cols: str | None = None,
    out: str = "hhi",
) -> str:
    """SQL twin of :func:`hhi`."""
    g_sel = f"{group_cols}, " if group_cols else ""
    g_grp = f"GROUP BY {group_cols}" if group_cols else ""
    return f"""
    SELECT {g_sel}__n AS n, __sx AS total,
           CASE WHEN __sx > 0
                THEN CAST(__sxx AS DOUBLE)
                     / (CAST(__sx AS DOUBLE) * CAST(__sx AS DOUBLE)) END
             AS {out}
    FROM (
      SELECT {g_sel}CAST(count(*) AS BIGINT) AS __n,
             CAST(sum({value_col}) AS BIGINT) AS __sx,
             sum(CAST({value_col} AS HUGEINT) * {value_col}) AS __sxx
      FROM {table}
      WHERE {value_col} IS NOT NULL
      {g_grp}
    )
    """
