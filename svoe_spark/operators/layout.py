"""Data-lake layout: Z-order (Morton) clustering for multi-column
data-skipping.

Sorting a table by ONE column gives parquet min/max pruning on that
column only; queries filtering on a second dimension read everything.
Interleaving the bits of two (or more) key columns into a Z-value and
range-partitioning + sorting by it bounds EVERY file's extent in ALL
the interleaved dimensions at once — each file covers a small
hyper-rectangle of the key space, so a selective filter on any
interleaved column skips most files via footer statistics alone
(the technique behind Delta/Iceberg OPTIMIZE ZORDER, from Morton
1966). At 100 TB this is the difference between scanning a full
partition and reading a handful of row groups.

Everything here is integer bit arithmetic in plain Spark expressions
(codegen'd, shuffle only for the final range partitioning), with an
ANSI-SQL twin for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank_cols(df: DataFrame, cols: list[str], bits: int) -> list[Column]:
    """Map each column into [0, 2^bits) by min/max scaling — Z-order
    needs comparable bit widths; raw domains (a bigint id vs a price)
    would let one column dominate the interleave. One tiny agg job
    computes the bounds; NULLs map to bucket 0 (they cluster
    together, which is what footer pruning wants)."""
    span = 1 << bits
    bounds = df.agg(
        *[f for c in cols for f in (F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}"))]
    ).first()
    out = []
    for c in cols:
        lo, hi = bounds[f"__lo_{c}"], bounds[f"__hi_{c}"]
        if lo is None or hi is None or hi == lo:
            out.append(F.lit(0).cast("long"))
            continue
        # exact integer scaling by DIVISION — (v - lo) div ceil(range /
        # span) stays in [0, span) and can never overflow int64, unlike
        # the multiply form ((v-lo)*span), which wraps for domains wider
        # than 2^(63-bits) (epoch-micro keys spanning years, sparse
        # surrogate ids)
        rng = int(hi) - int(lo) + 1
        d = max(1, (rng + span - 1) // span)
        expr = F.expr(f"(CAST({c} AS BIGINT) - {int(lo)}L) div {d}L")
        out.append(F.coalesce(expr, F.lit(0)).cast("long"))
    return out


def zvalue(cols: list[Column], bits: int = 16) -> Column:
    """Morton code of pre-bucketed columns (each already in
    [0, 2^bits)): bit i of column j lands at interleaved position
    i * n_cols + j. Unrolled shift/mask expression — whole-stage
    codegen, no UDF; bits * n_cols must stay <= 62 (int64)."""
    n = len(cols)
    if bits * n > 62:
        raise ValueError(f"{bits} bits x {n} cols overflows int64")
    # bit positions never overlap across terms, so + == bitwise-or —
    # and matches the SQL twin's sum term for term
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        for i in range(bits):
            z = z + F.shiftright(c, i).bitwiseAND(
                F.lit(1).cast("long")
            ) * F.lit(1 << (i * n + j)).cast("long")
    return z


def sql_zvalue(cols: list[str], bits: int = 16) -> str:
    """DuckDB twin of `zvalue` over the same pre-bucketed columns."""
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"(({c} >> {i}) & 1) * {1 << (i * n + j)}")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 32,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered by the
    Z-order of ``cols``: bucket each column to ``bits`` bits (one
    bounds agg), compute the Morton code, range-partition by it
    (sampled range exchange — balanced files regardless of skew) and
    sort within partitions so row groups inside each file are tight
    too. Footer min/max stats of every ``cols`` member then bound each
    file in every dimension — `tests/test_layout.py` measures the
    pruning effect directly against a single-column sort."""
    ranked = _rank_cols(df, cols, bits)
    z = df.withColumn("__z", zvalue(ranked, bits))
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
