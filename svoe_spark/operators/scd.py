"""Slowly-changing-dimension (SCD type 2) history: compress a change
log into validity intervals, and incrementally merge new change
batches into an existing history.

The lakehouse dimension-maintenance primitive: entity attributes
arrive as point-in-time observations (CDC feeds, snapshot diffs,
event streams); downstream as-of joins need them as non-overlapping
[valid_from, valid_to) intervals with a current flag. The reference
keeps only latest-state metadata in its catalog (no history); SCD2 is
the standard warehouse answer, expressed here as two window passes.

Determinism contract: interval boundaries are picked values (no float
aggregation); run detection is null-safe attribute comparison against
the previous row under an explicit total order (ts + tie column), so
any engine reproduces the exact same intervals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from svoe_spark.operators.sampling import distinct_until_changed


def scd2_compress(
    log: DataFrame,
    key: str,
    attr_cols: list[str],
    ts: str = "ts",
    tie_col: str | None = None,
) -> DataFrame:
    """Collapse a per-key change log into SCD2 validity intervals.

    Returns (key, *attr_cols, valid_from, valid_to, version,
    is_current): one row per RUN of consecutive identical attribute
    tuples in (ts, tie_col) order; ``valid_from`` is the run's first
    observation time, ``valid_to`` the next run's start (NULL on the
    current run), ``version`` the 1-based run index per key.

    Consecutive identical observations are absorbed (re-observing the
    same state extends no history), so the output is idempotent:
    compressing the compressed history (valid_from as ts) is a no-op —
    the property `scd2_merge` relies on.

    Scale shape: one per-key window pass to find run starts
    (`distinct_until_changed`) and one per-key window pass for
    lead/version — both shuffle on the dimension key only; no
    self-joins, no driver state. Skewed keys cost what their own
    change count costs.
    """
    cols = [key, ts] + ([tie_col] if tie_col else []) + list(attr_cols)
    starts = distinct_until_changed(
        log.select(*cols), list(attr_cols), key=key, on=ts, tie_col=tie_col
    )
    order = [F.col(ts)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    out = starts.select(
        key,
        # the run-start's tie value rides along so a merge can
        # re-expand history into a log that sorts EXACTLY as the
        # original observations did (ts alone can tie)
        *([tie_col] if tie_col else []),
        *attr_cols,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    attr_cols: list[str],
    ts: str = "ts",
    tie_col: str | None = None,
) -> DataFrame:
    """Merge a batch of new observations into an existing SCD2 history.

    ``history`` is `scd2_compress` output; ``updates`` is a change log
    (key, ts, [tie_col,] *attr_cols). Only keys PRESENT in the batch
    are touched: their history is re-expanded to a change log
    (valid_from as the observation time), unioned with the batch, and
    recompressed — late/out-of-order observations therefore splice in
    correctly, not just append. Untouched keys pass through unchanged
    (partition-pruned in a partitioned store). Invariant (tested):
    merge(compress(log_a), log_b) == compress(log_a UNION log_b) for
    any split, because compression is idempotent and order-free.

    Scale shape: the batch's key set is typically tiny next to the
    dimension — the semi/anti joins broadcast it; recompression cost
    tracks the touched keys' history, not the whole dimension.
    """
    affected = updates.select(key).distinct()
    cols = (
        [key, F.col("valid_from").alias(ts)]
        + ([tie_col] if tie_col else [])
        + [F.col(c) for c in attr_cols]
    )
    old_log = history.join(F.broadcast(affected), key, "left_semi").select(*cols)
    ucols = [key, ts] + ([tie_col] if tie_col else []) + list(attr_cols)
    merged_log = old_log.unionByName(updates.select(*ucols))
    redone = scd2_compress(merged_log, key, list(attr_cols), ts=ts, tie_col=tie_col)
    untouched = history.join(F.broadcast(affected), key, "left_anti")
    return untouched.unionByName(redone)
