"""Z-order layout: Morton-code correctness and the actual
data-skipping effect — every z-ordered file must be bounded in BOTH
dimensions, unlike a single-column sort."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.layout import _rank_cols, sql_zvalue, zorder_write, zvalue


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "x long, y long"
    )
    out = df.select(zvalue([F.col("x"), F.col("y")], bits=4).alias("z")).collect()
    got = [r["z"] for r in out]
    # x bits at even positions, y bits at odd: z(3,5) =
    # x=0b0011 -> bits 0,2; y=0b0101 -> bits 1,5 -> 1+4+2+32 = 39
    assert got == [0, 1, 2, 39]


def test_zvalue_matches_sql_twin(spark):
    import duckdb

    rows = [(i * 7 % 61, i * 13 % 53) for i in range(200)]
    df = spark.createDataFrame(rows, "x long, y long")
    s = [r["z"] for r in df.select(zvalue([F.col("x"), F.col("y")], 6).alias("z"))
         .orderBy("x", "y").collect()]
    d = [r[0] for r in duckdb.sql(
        "SELECT " + sql_zvalue(["x", "y"], 6) + " AS z FROM (SELECT "
        "unnest($xs) AS x, unnest($ys) AS y) ORDER BY x, y",
        params={"xs": [r[0] for r in rows], "ys": [r[1] for r in rows]},
    ).fetchall()]
    assert s == d


def test_zvalue_overflow_guard():
    with pytest.raises(ValueError):
        zvalue([F.lit(0), F.lit(0), F.lit(0)], bits=21)


def _file_spans(path, cols):
    """Per-file (min, max) for each column from parquet footers —
    what an engine's file-skipping actually reads."""
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.read_metadata(f)
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                    hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
        spans.append({c: (lo[c], hi[c]) for c in cols})
    return spans


def _avg_area(spans, cols, widths):
    tot = 0.0
    for s in spans:
        a = 1.0
        for c in cols:
            lo, hi = s[c]
            a *= (hi - lo + 1) / widths[c]
        tot += a
    return tot / len(spans)


def test_zorder_files_bounded_in_both_dims(spark, tmp_path):
    n = 200_000
    df = spark.range(n).select(
        (F.col("id") % 1000).alias("a"),
        (F.xxhash64("id") % 1000).alias("b"),
        F.col("id").alias("payload"),
    ).select(F.abs("a").alias("a"), F.abs("b").alias("b"), "payload")

    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted_a")
    zorder_write(df, ["a", "b"], zpath, n_files=16, bits=10)
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # the z-order win is NOT the min/max area product (a contiguous
    # Morton range covers ~1/F of the space either way) — it is that
    # EVERY dimension is bounded per file, so a selective filter on
    # the non-sorted column skips files. Count files a point filter
    # on b must read:
    def files_hit(path, col, val):
        return sum(1 for s in _file_spans(path, [col])
                   if s[col][0] <= val <= s[col][1])

    probes = [17, 250, 499, 777, 983]
    z_hits = sum(files_hit(zpath, "b", v) for v in probes)
    s_hits = sum(files_hit(spath, "b", v) for v in probes)
    # a-sorted layout: every file spans all of b -> all 16 read.
    assert s_hits == len(probes) * 16
    # z-order: top interleave bits pin b's high bits per file -> only
    # a bounded subset can contain any b value (boundary files may
    # straddle; allow up to half)
    assert z_hits <= s_hits / 2, (z_hits, s_hits)
    for s in _file_spans(zpath, ["b"]):
        lo, hi = s["b"]
        assert hi - lo + 1 < 1000, "a z-ordered file spans the full b domain"

    # round trip: layout changes nothing about the data
    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert back.agg(F.sum("payload")).first()[0] == n * (n - 1) // 2


def test_rank_cols_degenerate(spark):
    df = spark.createDataFrame([(5, None)], "x long, y long")
    ranked = _rank_cols(df, ["x", "y"], 4)
    got = df.select(*[r.alias(f"r{i}") for i, r in enumerate(ranked)]).first()
    assert (got["r0"], got["r1"]) == (0, 0)  # constant and all-NULL -> bucket 0
