"""Local mirror of the driver's correctness gate: run a registered
query on Spark AND its DuckDB oracle, sort columns by name, and compare
the full sorted multiset of rows for exact equality.

Floats are compared bit-exactly — the query registry's determinism
contract (svoe_spark/queries.py docstring) is designed to make that
hold; any mismatch is reported with a sample of differing rows.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb
from pyspark.sql import SparkSession

from svoe_spark.all_queries import QUERIES
from svoe_spark.sources.tables import ALL_TABLES


def _canon(v):
    if v is None:
        return ("none",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        return ("nan",) if math.isnan(v) else ("f", v.hex())
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    return ("s", str(v))


def _sort_key(row):
    return tuple(str(x) for x in row)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ALL_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _driver_traps(sdf, con, sql) -> list[str]:
    """Schema-level checks mirroring the driver's pandas canonicalizer,
    which (a) cannot hash complex-typed cells (CORRECTNESS_r03:
    multimodal_byte_features crashed on a list column) and (b) converts
    DuckDB HUGEINT — the result type of sum(BIGINT) — to float64,
    hash-mismatching Spark's int64 even when values are equal
    (CORRECTNESS_r03: 4 queries). Oracles must CAST(sum(..) AS BIGINT)."""
    from pyspark.sql import types as T

    issues = []
    for f in sdf.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            issues.append(f"spark col {f.name!r} complex-typed "
                          f"({f.dataType.simpleString()}) — driver cannot hash it")
    if sql is not None:
        for c, tname, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
            base = tname.split("(")[0].strip().upper()
            if base in ("HUGEINT", "UHUGEINT") or base.startswith("DECIMAL"):
                issues.append(f"oracle col {c!r} is {tname} — pandas converts "
                              "to float64; CAST(... AS BIGINT/DOUBLE) in the SQL")
    return issues


def run_parity(
    spark: SparkSession, name: str, sf_dir: str
) -> tuple[bool, str]:
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    s_cols = sorted(sdf.columns)

    con = duck_connection(sf_dir)
    try:
        traps = _driver_traps(sdf, con, q.sql)
    except Exception:  # noqa: BLE001 — the describe is advisory only
        traps = []
    if traps:
        con.close()
        return False, f"{name}: DRIVER TRAP {traps}"

    s_rows = [tuple(_canon(r[c]) for c in s_cols) for r in sdf.collect()]

    if q.sql is None:
        con.close()
        return True, f"{name}: rows-only ({len(s_rows)} rows)"

    cur = con.execute(q.sql)
    d_cols_raw = [d[0] for d in cur.description]
    d_rows_raw = cur.fetchall()
    con.close()

    if sorted(d_cols_raw) != s_cols:
        return False, f"{name}: SCHEMA mismatch spark={s_cols} duck={sorted(d_cols_raw)}"
    order = [d_cols_raw.index(c) for c in s_cols]
    d_rows = [tuple(_canon(r[i]) for i in order) for r in d_rows_raw]

    if len(s_rows) != len(d_rows):
        return False, f"{name}: ROWCOUNT mismatch spark={len(s_rows)} duck={len(d_rows)}"

    s_sorted = sorted(s_rows, key=_sort_key)
    d_sorted = sorted(d_rows, key=_sort_key)
    if s_sorted == d_sorted:
        return True, f"{name}: OK ({len(s_rows)} rows)"

    diffs = [
        (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
    ][:3]
    return False, f"{name}: VALUE mismatch, e.g. {diffs}"
