"""Audit every registered query for driver-canonicalizer traps.

The grading driver converts both the Spark result and the DuckDB oracle
result to pandas, sorts by all columns, and hashes the values. Two trap
classes observed in CORRECTNESS_r03:

1. complex-typed output columns (array/map/struct): pandas sort_values
   raises ``unhashable type: 'list'`` -> the whole row errors out;
2. DuckDB HUGEINT (``sum(BIGINT)``) / DECIMAL oracle columns: pandas
   converts HUGEINT to float64 while Spark returns int64 -> rows and
   schema match but the value hash differs.

This script checks schemas only (no data collected), so it runs in
seconds at any SF. Run it whenever queries are added or oracles edited:

    python scripts/audit_driver_traps.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from svoe_spark.all_queries import QUERIES
from svoe_spark.testing import duck_connection

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

COMPLEX = (T.ArrayType, T.MapType, T.StructType)

# DuckDB numeric kind -> comparable class. HUGEINT lands in pandas as
# float64 (lossy + dtype-mismatched vs Spark's int64), so it is always
# a trap even when the Spark side is integral.
DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
            "USMALLINT", "UINTEGER", "UBIGINT"}
DUCK_FLOAT = {"FLOAT", "REAL", "DOUBLE"}
DUCK_TRAP = {"HUGEINT", "UHUGEINT"}


def spark_kind(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    return "other"


def duck_kind(tname: str) -> str:
    base = tname.split("(")[0].strip().upper()
    if base in DUCK_INT:
        return "int"
    if base in DUCK_FLOAT:
        return "float"
    if base in DUCK_TRAP or base.startswith("DECIMAL"):
        return "trap:" + base
    if base.endswith("[]") or base.startswith("STRUCT") or base.startswith("MAP"):
        return "complex"
    return "other"


def main() -> int:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(SF_DIR)

    bad = 0
    for name, q in QUERIES.items():
        issues = []
        try:
            sdf = q.fn(spark, SF_DIR)
            s_types = {f.name: f.dataType for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark plan error: {e}")
            bad += 1
            continue
        for c, dt in s_types.items():
            if isinstance(dt, COMPLEX):
                issues.append(f"spark col {c!r} is complex-typed ({dt.simpleString()})")
        if q.sql is not None:
            try:
                desc = con.execute(f"DESCRIBE {q.sql}").fetchall()
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: oracle describe error: {e}")
                bad += 1
                continue
            d_types = {r[0]: r[1] for r in desc}
            for c, tname in d_types.items():
                k = duck_kind(tname)
                if k.startswith("trap") or k == "complex":
                    issues.append(f"oracle col {c!r} is {tname} ({k})")
                elif c in s_types:
                    sk = spark_kind(s_types[c])
                    if {sk, k} == {"int", "float"}:
                        issues.append(
                            f"numeric-kind mismatch on {c!r}: spark "
                            f"{s_types[c].simpleString()} vs duck {tname}"
                        )
        if issues:
            bad += 1
            print(f"TRAP {name}:")
            for i in issues:
                print(f"    {i}")
    con.close()
    print(f"\n{len(QUERIES)} queries audited, {bad} with driver traps")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
