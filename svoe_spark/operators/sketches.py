"""Mergeable frequency sketches — count-min (Cormode & Muthukrishnan
2005) expressed relationally, so it is exactly reproducible in any
engine (the DuckDB oracle re-derives the identical counters) and
composes with plain aggregation semantics.

Why a sketch in a 100 TB engine: per-key exact counts over a
high-cardinality key (URLs, shingles, user ids) cost a shuffle whose
state is the key space itself. The CMS relation is ``depth x width``
rows REGARDLESS of key cardinality, built with one partial-aggregated
shuffle on (row, bucket) — bounded, uniform keys — and two sketches
merge by unioning and summing counters (used by the incremental /
per-partition maintenance pattern). Point lookups then read the tiny
sketch (broadcast), never the data.

Guarantees (standard CMS): estimate >= true count (never under), and
with width w, depth d: overestimate <= eps*N with probability
1 - (1/2)^d for eps = e/w. Deterministic here: hash rows use seeded
universal hashes over the md5-based key hash (functions.text.md5_hash,
bit-identical across engines), so the same data always yields the same
counters — which is what makes the sketch oracle-checkable.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from svoe_spark.functions.text import P_HASH, md5_hash, sql_md5_hash


@dataclass(frozen=True)
class CMSParams:
    """depth seeded universal hashes (a*x+b mod P mod width); shared by
    the Spark build, the Spark lookup, and the SQL oracle."""

    width: int = 1024
    depth: int = 4
    seed: int = 7

    def coefficients(self) -> list[tuple[int, int]]:
        rng = random.Random(self.seed)
        return [
            (rng.randrange(1, P_HASH), rng.randrange(0, P_HASH))
            for _ in range(self.depth)
        ]


def _bucket_expr(x: Column, a: int, b: int, width: int) -> Column:
    # x is already < P_HASH, so a*x < P_HASH^2 < 2^60: int64-safe under
    # ANSI mode at every step
    return ((F.lit(a).cast("long") * x + F.lit(b)) % P_HASH) % width


def _sql_bucket(xs: str, a: int, b: int, width: int) -> str:
    return f"(((CAST({a} AS BIGINT) * {xs} + {b}) % {P_HASH}) % {width})"


def _cms_entries(key: str, params: CMSParams) -> Column:
    """array<struct<row,bucket>> of the depth (row, bucket) slots a key
    hashes to — THE hash family, shared by build and lookup so the two
    can never diverge. NULL keys hash under the '<NULL>' sentinel
    (consistent with profiling.key_skew_report)."""
    x = md5_hash(
        F.coalesce(F.col(key).cast("string"), F.lit("<NULL>"))
    ) % P_HASH
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _bucket_expr(x, a, b, params.width).alias("bucket"),
            )
            for i, (a, b) in enumerate(params.coefficients())
        ]
    )


def cms_build(
    df: DataFrame, key: str, params: CMSParams = CMSParams()
) -> DataFrame:
    """(row, bucket, cnt) counters — at most depth*width rows. One
    narrow explode of ``depth`` little structs per input row, one
    partial-aggregated shuffle on the uniform (row, bucket) key."""
    ex = df.select(F.explode(_cms_entries(key, params)).alias("__e")).select(
        F.col("__e.row").alias("row"), F.col("__e.bucket").alias("bucket")
    )
    return ex.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Counter-wise sum of sketches built with the SAME params — the
    mergeability that makes CMS per-partition / per-day maintainable:
    sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("row", "bucket").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key: str,
    params: CMSParams = CMSParams(),
    out: str = "est_count",
) -> DataFrame:
    """Point estimates per DISTINCT key value of ``keys``: min over the
    depth counters each key hashes to. The sketch side is tiny and
    broadcast; a missing counter means no key ever hashed there, i.e.
    count 0. Returns (key, out) with ONE ROW PER DISTINCT KEY — other
    columns of ``keys`` are not carried through (join the result back
    if you need them)."""
    probes = keys.select(
        F.col(key), F.explode(_cms_entries(key, params)).alias("__e")
    ).select(
        F.col(key),
        F.col("__e.row").alias("row"),
        F.col("__e.bucket").alias("bucket"),
    )
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(key).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0)))
        .cast("bigint")
        .alias(out)
    )


def cms_sql(table: str, key: str, params: CMSParams = CMSParams()) -> str:
    """DuckDB CTE chain re-deriving the counters AND the per-distinct-
    key estimates — the oracle for the registered query. Emits CTEs
    ``cms`` (row, bucket, cnt) and ``est`` (key, est_count). The hash
    arms are generated from the SAME CMSParams coefficients as the
    Spark side, applied to the same md5-based key hash."""
    sentinel = "'<NULL>'"
    xs = (
        f"({sql_md5_hash(f'coalesce(CAST({key} AS VARCHAR), {sentinel})')}"
        f" % {P_HASH})"
    )

    def arms(src: str, extra: str) -> str:
        return " UNION ALL ".join(
            f"SELECT {i} AS row, {_sql_bucket('x', a, b, params.width)}"
            f" AS bucket{extra} FROM {src}"
            for i, (a, b) in enumerate(params.coefficients())
        )

    return f"""
    kx AS (SELECT {xs} AS x, {key} AS key FROM {table}),
    kb AS ({arms('kx', '')}),
    cms AS (SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
            FROM kb GROUP BY row, bucket),
    dkx AS (SELECT DISTINCT x, key FROM kx),
    dkb AS ({arms('dkx', ', key')}),
    est AS (
      SELECT dkb.key, CAST(min(coalesce(cms.cnt, 0)) AS BIGINT) AS est_count
      FROM dkb LEFT JOIN cms USING (row, bucket)
      GROUP BY dkb.key
    )
    """


def bloom_build(
    df: DataFrame, key: str, params: CMSParams = CMSParams()
) -> DataFrame:
    """Bloom filter as a relation: the DISTINCT (row, bucket) slots any
    key hashed to — at most depth*width rows of two ints (the set bits,
    stored sparse). Same seeded hash family as the CMS, so build and
    membership probes can never diverge. One partial-aggregated
    distinct; merge two filters with plain union+distinct.

    The classic engine use is JOIN PRUNING: build over the build side's
    join keys, semi-join the probe side's candidate slots against it
    (``bloom_filter_keys``) and skip rows that cannot match — false
    positives only (a key testing positive may still be absent; a key
    testing negative is DEFINITELY absent)."""
    ex = df.select(F.explode(_cms_entries(key, params)).alias("__e")).select(
        F.col("__e.row").alias("row"), F.col("__e.bucket").alias("bucket")
    )
    return ex.distinct()


def bloom_filter_keys(
    bloom: DataFrame,
    keys: DataFrame,
    key: str,
    params: CMSParams = CMSParams(),
    out: str = "might_contain",
) -> DataFrame:
    """Membership verdict per DISTINCT key of ``keys``: true iff ALL
    depth slots are set (the Bloom rule — no false negatives, bounded
    false positives ~ (fill_ratio)^depth). The filter relation is tiny
    and broadcast; returns (key, out)."""
    probes = keys.select(
        F.col(key), F.explode(_cms_entries(key, params)).alias("__e")
    ).select(
        F.col(key),
        F.col("__e.row").alias("row"),
        F.col("__e.bucket").alias("bucket"),
    )
    marked = probes.join(
        F.broadcast(bloom.withColumn("__hit", F.lit(1))),
        ["row", "bucket"],
        "left",
    )
    return marked.groupBy(key).agg(
        (F.count(F.lit(1)) == F.sum(F.coalesce(F.col("__hit"), F.lit(0))))
        .alias(out)
    )


def bloom_sql(
    build_table: str,
    build_key: str,
    probe_table: str,
    probe_key: str,
    params: CMSParams = CMSParams(),
) -> str:
    """DuckDB CTE chain re-deriving the Bloom bit set from
    ``build_table.build_key`` and the per-distinct-probe-key membership
    verdicts — the oracle for the registered query. Emits CTEs
    ``bloom`` (row, bucket) and ``verdict`` (key, might_contain)."""
    sentinel = "'<NULL>'"

    def xs(key: str) -> str:
        return (
            f"({sql_md5_hash(f'coalesce(CAST({key} AS VARCHAR), {sentinel})')}"
            f" % {P_HASH})"
        )

    def arms(src: str, extra: str) -> str:
        return " UNION ALL ".join(
            f"SELECT {i} AS row, {_sql_bucket('x', a, b, params.width)}"
            f" AS bucket{extra} FROM {src}"
            for i, (a, b) in enumerate(params.coefficients())
        )

    return f"""
    bx AS (SELECT {xs(build_key)} AS x FROM {build_table}),
    bb AS ({arms('bx', '')}),
    bloom AS (SELECT DISTINCT row, bucket FROM bb),
    px AS (SELECT DISTINCT {probe_key} AS key, {xs(probe_key)} AS x
           FROM {probe_table}),
    pb AS ({arms('px', ', key')}),
    verdict AS (
      SELECT pb.key,
             count(*) = sum(CASE WHEN bloom.bucket IS NOT NULL
                                 THEN 1 ELSE 0 END) AS might_contain
      FROM pb LEFT JOIN bloom USING (row, bucket)
      GROUP BY pb.key
    )
    """
