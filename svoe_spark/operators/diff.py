"""Snapshot diff / changeset apply — lake-maintenance primitives.

A training-data lake is rebuilt incrementally: a rollup is recomputed
with fixed logic, a crawl batch lands, a backfill rewrites a date
range. The operational question is always "what actually changed
between snapshot A and snapshot B?" — and its inverse, "replay this
changeset onto A to get B" (the CDC/MERGE pattern).

Reference parity: the reference tracks materialized feature blocks in
its data catalog and decides recompute-vs-reuse by comparing stored
block metadata (svoe/featurizer/storage/data_store_adapter.py,
svoe/featurizer/data_catalog.py); this module is the row-level form of
that comparison, expressed as one relational pass.

Scale shape: ``snapshot_diff`` is ONE full-outer sort-merge join on
the key columns — one shuffle per side, no shuffle at all when both
snapshots are bucketed/co-partitioned by the key (the intended lake
layout for repeatedly-diffed tables). Change classification is a
null-safe column comparison (exact — no digest collisions); unchanged
rows are filtered BEFORE any downstream work, so the changeset
relation is proportional to the churn, not the table. ``apply_changeset``
is one left-anti join plus a union — again key-shuffle-bounded.

Determinism: pure relational — output is a function of the two input
relations only. Keys must be non-null and unique per snapshot (the
usual snapshot contract; assert upstream with a groupBy-count if
unsure).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ADDED = "added"
REMOVED = "removed"
CHANGED = "changed"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    change_col: str = "change",
    payload: bool = True,
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key_cols``.

    Returns one row per key present in either snapshot whose compared
    values differ: (key..., change in {added,removed,changed}[, old_c /
    new_c for every compared column]). Unchanged keys are dropped.
    ``compare_cols`` defaults to every non-key column common to both
    sides. With ``payload=False`` only (key..., change) is returned —
    the narrow form for counting/routing at scale.
    """
    compare = list(
        compare_cols
        if compare_cols is not None
        else [c for c in old.columns if c not in key_cols and c in new.columns]
    )
    o = old.select(
        *key_cols,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare],
    )
    j = o.join(n, key_cols, "full_outer")
    any_diff = reduce(
        lambda a, b: a | b,
        [~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")) for c in compare],
        F.lit(False),
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit(ADDED))
        .when(F.col("__in_new").isNull(), F.lit(REMOVED))
        .otherwise(F.lit(CHANGED))
    )
    out = (
        j.withColumn(change_col, change)
        # presence flags make added/removed "different" already; the
        # any_diff filter only prunes unchanged both-sides rows
        .where(
            F.col("__in_old").isNull() | F.col("__in_new").isNull() | any_diff
        )
        .drop("__in_old", "__in_new")
    )
    if payload:
        return out.select(
            *key_cols,
            change_col,
            *[f"old_{c}" for c in compare],
            *[f"new_{c}" for c in compare],
        )
    return out.select(*key_cols, change_col)


def apply_changeset(
    old: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    change_col: str = "change",
) -> DataFrame:
    """Replay a ``snapshot_diff`` changeset (payload form) onto ``old``,
    reproducing ``new`` exactly: drop removed+changed keys with one
    left-anti join, then union the added+changed rows' new-side
    payload. Round-trip law (tested):

        apply_changeset(old, snapshot_diff(old, new, k), k) == new
    """
    new_cols = [c[len("new_") :] for c in changes.columns if c.startswith("new_")]
    dels = changes.where(
        F.col(change_col).isin(REMOVED, CHANGED)
    ).select(*key_cols)
    ups = changes.where(F.col(change_col).isin(ADDED, CHANGED)).select(
        *key_cols, *[F.col(f"new_{c}").alias(c) for c in new_cols]
    )
    kept = old.join(dels, key_cols, "left_anti").select(*key_cols, *new_cols)
    return kept.unionByName(ups)
