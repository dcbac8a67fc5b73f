"""Vector math over array<float> embedding columns.

Everything is expressed as fold-left reductions with explicit
double-casting so the reduction order (and therefore the floating
result) is identical in Spark and the SQL oracle. All JVM-side —
no Python UDFs in the hot path; at 100 TB these run inside
whole-stage codegen next to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from svoe_spark.functions import is_ident_path


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# str inputs take a single-parse expr fast path (one py4j round trip
# instead of ~15 Column-building ones; these helpers sit under every
# ANN/embedding query's plan construction). The SQL strings spell the
# identical functions/casts/literals, so the parsed trees — and every
# IEEE operation — match the Column form bit-for-bit.


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE)"
        f" * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Fold-left dot product in double precision."""
    if is_ident_path(a) and is_ident_path(b):
        return F.expr(_dot_sql(a, b))
    prods = F.zip_with(
        _col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_sq(a: Column | str) -> Column:
    return dot(a, a)


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; zero-norm vectors score 0.0 instead of
    dividing by zero (ANSI mode aborts the job on 0/0, and non-ANSI
    NaN sorts ABOVE every number, so an unguarded zero vector would
    top every top-k and pass every threshold)."""
    if is_ident_path(a) and is_ident_path(b):
        den = f"(sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"
        return F.expr(
            f"CASE WHEN {den} != 0.0D THEN {_dot_sql(a, b)} / {den}"
            f" ELSE 0.0D END"
        )
    den = F.sqrt(norm_sq(a)) * F.sqrt(norm_sq(b))
    return F.when(den != 0.0, dot(a, b) / den).otherwise(F.lit(0.0))


def hyperplane_signs(plane: int, dim: int) -> list[int]:
    """Deterministic pseudo-random ±1 pattern for LSH hyperplane
    ``plane`` over ``dim`` components. Pure integer formula shared with
    the SQL oracle generator."""
    return [
        1 if ((plane * 73856093 + d * 19349663) % 7919) % 2 == 0 else -1
        for d in range(dim)
    ]


def signed_projection(v: Column | str, signs: list[int]) -> Column:
    """Fold-left dot of an embedding with a ±1 hyperplane pattern."""
    # one parsed expr: the per-element F.lit loop plus the two HOF
    # lambdas were ~dim+10 py4j round trips per plane
    pat = "array(" + ",".join(str(int(s)) for s in signs) + ")"
    if is_ident_path(v):
        return F.expr(
            f"aggregate(zip_with({v}, {pat}, (x, s) -> CAST(x AS DOUBLE)"
            f" * s), 0.0D, (acc, p) -> acc + p)"
        )
    prods = F.zip_with(_col(v), F.expr(pat), lambda x, s: x.cast("double") * s)
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


# --- SQL (DuckDB) mirrors ---------------------------------------------------


def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a})+1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (acc, v) -> acc + v)"
    )


def sql_cosine(a: str, b: str) -> str:
    den = f"(sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)}))"
    return (
        f"CASE WHEN {den} <> 0.0 THEN {sql_dot(a, b)} / {den} ELSE 0.0e0 END"
    )


def sql_signed_projection(v: str, signs: list[int]) -> str:
    pat = "[" + ", ".join(str(s) for s in signs) + "]"
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({v})+1), "
        f"i -> CAST({v}[i] AS DOUBLE) * ({pat})[i])), (acc, p) -> acc + p)"
    )


def jl_signs(row: int, dim: int) -> list[int]:
    """±1 row of a Johnson-Lindenstrauss Rademacher matrix: md5-derived
    per (row, component), so entries behave as iid coin flips. NOT the
    `hyperplane_signs` LCG pattern — that one is fine for LSH banding
    (only the sign BUCKETS matter) but its linear structure correlates
    across planes and measurably breaks JL distance preservation
    (fixture: 74% of pairs within 3x vs 100% with md5 signs at k=16).
    Python-generated literals, so the Spark plan and the SQL oracle
    share the exact matrix."""
    import hashlib

    return [
        1 if hashlib.md5(f"jl:{row}:{d}".encode()).digest()[0] % 2 == 0 else -1
        for d in range(dim)
    ]
