"""Market-basket analysis: pairwise association rules (support /
confidence / rational lift) over (basket, item) relations.

The level-2 Apriori pass (Agrawal & Srikant 1994) is all a curation or
merchandising pipeline usually needs — which pairs co-occur beyond
chance — and it is fully relational: one distinct projection, one
self-equi-join on the basket key, two broadcast-joined marginals.
Scores stay in the repo's determinism contract: support counts are
exact integers; confidence is one division; lift uses the RATIONAL
form N * n_ab / (n_a * n_b) — the monotone argument of PMI/log-lift
without the transcendental (the `top_collocations` precedent), so
ranking AND values hash-match across engines.

Scale shape: the pair join shuffles on the basket key; per-basket work
is |items|^2, so a basket with thousands of distinct items needs a cap
(cap_items) — the same skew discipline as the dedup shingle caps. The
marginals are |items|-row relations and broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 1,
    cap_items: int | None = None,
) -> DataFrame:
    """Pairwise rules over distinct (basket, item) memberships: one
    row per unordered item pair {a < b} with

      n_ab        exact co-occurrence basket count (>= min_support)
      n_a, n_b    exact item marginals
      confidence  n_ab / n_a   (P(b | a), for the a->b direction)
      lift        N * n_ab / (n_a * n_b), N = total baskets — > 1 means
                  the pair co-occurs more than independence predicts

    ``cap_items``: drop baskets with more distinct items than the cap
    BEFORE pairing (a degenerate mega-basket contributes |items|^2
    pairs and no signal — the standard skew guard). Determinism: all
    counts exact; confidence and lift are single IEEE operations over
    exactly-converted integers.
    """
    # ONE grouped pass instead of distinct + self-join (round 10, the
    # supplier_cograph_triangles rewrite): collect_set per basket IS
    # the distinct-membership relation, the size() filter IS the
    # cap-items skew guard, and the sorted-array HOF pair expansion IS
    # the a.__i < b.__i self-join — baskets are small by the cap
    # premise, so the interpreted lambda touches |items|^2/2 elements
    # per row. Counts (marginals, totals, co-occurrence) are identical
    # by construction.
    from svoe_spark.operators.util import sorted_pair_expand

    bs = (
        df.select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"))
        .groupBy("__b")
        .agg(
            F.array_sort(F.collect_set("__i")).alias("__ss"),
            # a NULL item still occupied one distinct (basket, item)
            # row in the pre-rewrite sizing — collect_set drops NULLs,
            # so the cap must add it back to stay behavior-identical
            F.max(F.col("__i").isNull()).alias("__has_null"),
        )
    )
    if cap_items is not None:
        bs = bs.where(
            F.size("__ss") + F.col("__has_null").cast("int") <= cap_items
        )
    # NO checkpoint: bs feeds three subtrees of ONE returned plan
    # (n_total, marginals, pairs) that all share the identical grouped
    # Exchange — AQE's ReusedExchange evaluates it once, while a
    # localCheckpoint would execute every upstream stage eagerly at
    # build time (AQE toRdd) and block that reuse (round-11 measurement
    # on triangle_counts: checkpoint was ~1.5x slower end-to-end).
    bs = bs.select("__ss")
    n_total = bs.groupBy().count()
    marg = (
        bs.select(F.explode("__ss").alias("__i"))
        .groupBy("__i")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    pairs = (
        bs.select(F.explode(F.expr(sorted_pair_expand("__ss"))).alias("p"))
        .groupBy(F.col("p.a").alias("item_a"), F.col("p.b").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= min_support)
    )
    ma = F.broadcast(marg.select(F.col("__i").alias("item_a"), F.col("__n").alias("n_a")))
    mb = F.broadcast(marg.select(F.col("__i").alias("item_b"), F.col("__n").alias("n_b")))
    return (
        pairs.join(ma, "item_a")
        .join(mb, "item_b")
        .crossJoin(F.broadcast(n_total.select(F.col("count").alias("__N"))))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            (F.col("n_ab") / F.col("n_a")).alias("confidence"),
            # both products run in DOUBLE: int64 N*n_ab wraps (Spark)
            # or throws (DuckDB) past 2^63 at corpus scale; the double
            # products are exact below 2^53 and IDENTICAL cross-engine
            (
                (F.col("__N").cast("double") * F.col("n_ab"))
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("lift"),
        )
    )


def association_rules_sql(
    table: str,
    basket_col: str,
    item_col: str,
    min_support: int = 1,
) -> str:
    """DuckDB twin of `association_rules` (no cap arm — cap the input
    relation instead when needed); emits CTE chain ending in ``rules``."""
    return f"""
    m AS (SELECT DISTINCT {basket_col} AS b, {item_col} AS i FROM {table}),
    ntot AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM m),
    marg AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY i),
    pairs AS (
      SELECT a.i AS item_a, b.i AS item_b, CAST(count(*) AS BIGINT) AS n_ab
      FROM m a JOIN m b ON a.b = b.b AND a.i < b.i
      GROUP BY item_a, item_b
      HAVING count(*) >= {min_support}
    ),
    rules AS (
      SELECT item_a, item_b, n_ab, ma.n AS n_a, mb.n AS n_b,
             n_ab / ma.n AS confidence,
             (CAST(ntot.n AS DOUBLE) * n_ab) / (CAST(ma.n AS DOUBLE) * mb.n)
               AS lift
      FROM pairs
      JOIN marg ma ON pairs.item_a = ma.i
      JOIN marg mb ON pairs.item_b = mb.i
      CROSS JOIN ntot
    )
    """
