"""Data-quality constraint verification (operators/quality_checks.py):
NULL semantics, uniqueness arithmetic, referential integrity, the
one-pass report shape, and the code-generated SQL twin's agreement
with the Spark pass on a hand-built dirty fixture."""

import duckdb
import pytest
from pyspark.sql import functions as F

from svoe_spark.operators import quality_checks as qc


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, "a", 10.0, "ok-1"),
        (2, "b", -5.0, "ok-2"),
        (3, None, 50.0, "bad"),
        (4, "z", 1000.0, None),
        (4, "a", None, "ok-3"),
    ]
    return spark.createDataFrame(
        rows, "id long, cat string, score double, label string"
    ).persist()


def _report(df, **kw):
    out = qc.run_checks(df, **kw).collect()
    return {r["check_name"]: r.asDict() for r in out}


def test_completeness_counts_nulls(spark, dirty):
    rep = _report(dirty, constraints=[qc.completeness("cat")])
    r = rep["completeness(cat)"]
    assert (r["violations"], r["total"], r["passed"]) == (1, 5, False)
    assert r["pass_rate"] == 4 / 5


def test_in_set_null_and_outside_violate(spark, dirty):
    rep = _report(dirty, constraints=[qc.in_set("cat", ["a", "b"])])
    # NULL and 'z' violate
    assert rep["in_set(cat)"]["violations"] == 2


def test_bounds_null_and_open_ends(spark, dirty):
    rep = _report(
        dirty,
        constraints=[
            qc.bounds("score", lo=0.0, hi=100.0),
            qc.bounds("score", lo=0.0, name="lo_only"),
            qc.bounds("score", hi=100.0, name="hi_only"),
        ],
    )
    # -5 (lo), 1000 (hi), NULL
    assert rep["bounds(score)"]["violations"] == 3
    assert rep["lo_only"]["violations"] == 2  # -5, NULL
    assert rep["hi_only"]["violations"] == 2  # 1000, NULL


def test_matches_and_custom(spark, dirty):
    rep = _report(
        dirty,
        constraints=[
            qc.matches("label", "^ok-[0-9]$"),
            qc.custom(
                "even_id",
                "id",
                lambda: F.col("id") % 2 != 0,
                "(id % 2 <> 0)",
            ),
        ],
    )
    assert rep["matches(label)"]["violations"] == 2  # 'bad', NULL
    assert rep["even_id"]["violations"] == 2  # ids 1, 3


def test_unique_violations_are_excess_rows(spark, dirty):
    rep = _report(dirty, constraints=[], unique=["id", "label"])
    assert rep["unique(id)"]["violations"] == 1  # 5 rows, 4 distinct
    # NULL counts as a row but count(distinct) ignores it: 5 - 4 = 1
    assert rep["unique(label)"]["violations"] == 1


def test_empty_spec_rejected(spark, dirty):
    with pytest.raises(ValueError):
        qc.run_checks(dirty, [])
    with pytest.raises(ValueError):
        qc.in_set("cat", [])
    with pytest.raises(ValueError):
        qc.bounds("score")


def test_ref_integrity_dangling_and_null(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = qc.ref_integrity(child, "fk", parent, "pk").collect()[0]
    # 9 dangles, NULL violates
    assert (row["violations"], row["total"], row["passed"]) == (2, 4, False)
    ok = qc.ref_integrity(
        child.where(F.col("fk").isin(1, 2)), "fk", parent, "pk",
        broadcast_parent=False,
    ).collect()[0]
    assert (ok["violations"], ok["passed"]) == (0, True)


def test_sql_twin_matches_spark_on_dirty_fixture(spark, dirty, tmp_path):
    """The code-generated DuckDB SQL and the compiled Spark pass must
    produce identical report rows on the same data — the same proof
    the registered query relies on, here on a fixture with NULLs in
    every constraint's path."""
    pq = str(tmp_path / "dirty.parquet")
    dirty.coalesce(1).write.mode("overwrite").parquet(pq)
    cons = [
        qc.completeness("cat"),
        qc.in_set("cat", ["a", "b"]),
        qc.bounds("score", lo=0.0, hi=100.0),
        qc.matches("label", "^ok-[0-9]$"),
    ]
    spark_rows = sorted(
        tuple(r) for r in qc.run_checks(dirty, cons, unique=["id"]).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(qc.run_checks_sql("t", cons, unique=["id"])).fetchall()
    )
    con.close()
    assert spark_rows == duck_rows


def test_report_is_single_pass(spark, dirty):
    """All row-predicate constraints must fold into ONE aggregate over
    one scan — the plan has exactly one Aggregate source scan (no
    re-scan per rule)."""
    cons = [
        qc.completeness("cat"),
        qc.bounds("score", lo=0.0),
        qc.matches("label", "^ok"),
    ]
    plan = qc.run_checks(dirty, cons)._jdf.queryExecution().optimizedPlan().toString()
    # one Aggregate node, one source scan (the persisted fixture shows
    # as InMemoryRelation; an unpersisted frame as LogicalRDD)
    assert plan.count("Aggregate") == 1
    assert plan.count("InMemoryRelation") + plan.count("LogicalRDD") == 1


def test_bounds_string_literals_are_sql_escaped(spark, tmp_path):
    """A string bound containing a quote must render as a valid SQL
    literal (repr would emit a double-quoted identifier)."""
    import datetime

    df = spark.createDataFrame([("O'Brien",), ("Adams",)], "name string")
    pq = str(tmp_path / "names.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(pq)
    cons = [qc.bounds("name", lo="O'B")]
    spark_rows = sorted(tuple(r) for r in qc.run_checks(df, cons).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    duck_rows = sorted(
        tuple(r) for r in con.execute(qc.run_checks_sql("t", cons)).fetchall()
    )
    con.close()
    assert spark_rows == duck_rows
    # 'Adams' < "O'B" violates; "O'Brien" passes
    assert spark_rows[0][3] == 1
    with pytest.raises(ValueError, match="custom"):
        qc.bounds("d", lo=datetime.date(2024, 1, 1))
    with pytest.raises(ValueError, match="boolean"):
        qc.in_set("b", [True])


@pytest.mark.heavy  # round-9 quick-tier trim: ptest.py/round-close still run it
def test_run_checks_streaming_complete_equals_batch(spark, tmp_path):
    """The same constraint list compiled over a STREAM (cumulative,
    complete output) must converge to the batch report exactly — the
    DQ layer's Kappa form."""
    import time

    from svoe_spark.sources.tables import load_table
    from svoe_spark.streaming.sinks import run_available_to_memory

    sf_small = "/root/testdata/sf0.001"
    ev = load_table(spark, "events", sf_small).select(
        "user_id", "event_type", "value", "ts"
    ).persist()
    path = str(tmp_path / "dqstream")
    qs = ev.selectExpr(
        "percentile(unix_micros(ts), array(0.5)) AS q"
    ).first()["q"]
    mid = int(qs[0])
    for pred in (f"unix_micros(ts) <= {mid}", f"unix_micros(ts) > {mid}"):
        ev.where(pred).coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)
    cons = [
        qc.completeness("user_id"),
        qc.in_set("event_type", ["view", "click", "purchase", "signup"]),
        qc.bounds("value", lo=0.0, hi=100.0),
    ]
    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    got = sorted(
        tuple(r)
        for r in run_available_to_memory(
            qc.run_checks(stream, cons), output_mode="complete"
        ).collect()
    )
    want = sorted(tuple(r) for r in qc.run_checks(ev, cons).collect())
    ev.unpersist()
    assert got == want
    import pytest

    with pytest.raises(ValueError, match="unique"):
        qc.run_checks(stream, cons, unique=["user_id"])
