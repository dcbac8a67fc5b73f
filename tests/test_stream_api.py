"""Fluent DataStream API: the reference v2 e2e pipelines
(runtime/master/test/test_e2e.py:19-75 — map/keyBy/reduce and join)
rebuilt on the fluent surface."""

import pytest

from pyspark.sql import functions as F

from svoe_spark.api import StreamingContext

pytestmark = pytest.mark.heavy  # multi-minute suite: deselected by the
# default `pytest tests/ -q` tier (pytest.ini); scripts/ptest.py shards and
# the round-close sweep run it



def test_map_keyby_reduce(spark):
    ctx = StreamingContext(spark)
    out = (
        ctx.from_collection(
            [(i, f"k{i % 3}") for i in range(100)], schema="v long, k string"
        )
        .map("k", doubled=F.col("v") * 2)
        .key_by("k")
        .reduce(total=F.sum("doubled"), n=F.count(F.lit(1)))
        .sink_collect()
    )
    got = {r["k"]: (r["total"], r["n"]) for r in out}
    want = {}
    for i in range(100):
        t, n = want.get(f"k{i % 3}", (0, 0))
        want[f"k{i % 3}"] = (t + 2 * i, n + 1)
    assert got == want


def test_flat_map_filter(spark):
    ctx = StreamingContext(spark)
    out = (
        ctx.from_collection([("a b c",), ("d e",)], schema="line string")
        .flat_map(F.split("line", " "), alias="word")
        .filter(F.col("word") != "d")
        .map("word")
        .sink_collect()
    )
    assert sorted(r["word"] for r in out) == ["a", "b", "c", "e"]


def test_map_rows_mixed_schema(spark):
    """map_rows — the Python-lambda compat verb — over a mixed
    string+numeric schema with a NULL in play: rows cross as Arrow
    batches (mapInArrow; zero .rdd in the package), but fn still
    sees one plain-Python dict per row (None for NULL, int not
    numpy.int64) and returns a dict per row."""
    ctx = StreamingContext(spark)

    def fn(rec):
        assert rec["tag"] is None or isinstance(rec["tag"], str)
        assert isinstance(rec["v"], int)
        return {
            "label": f"{rec['tag'] or 'none'}:{rec['v']}",
            "doubled": 2 * rec["v"],
            "ratio": rec["v"] / 4.0,
        }

    out = (
        ctx.from_collection(
            [("a", 1), (None, 2), ("b", 3)], schema="tag string, v long"
        )
        .map_rows(fn, "label string, doubled long, ratio double")
        .sink_collect()
    )
    assert sorted(tuple(r) for r in out) == [
        ("a:1", 2, 0.25),
        ("b:3", 6, 0.75),
        ("none:2", 4, 0.5),
    ]


def test_map_rows_tuple_and_bad_return(spark):
    """ADVICE r9: the legacy rdd.map contract accepted positional
    tuples/Rows — map_rows must zip those with the output schema, and
    a return that is neither dict nor tuple/Row must raise a clear
    TypeError naming the contract (not an opaque Arrow-worker
    AttributeError)."""
    import pytest

    ctx = StreamingContext(spark)
    out = (
        ctx.from_collection([("a", 1), ("b", 2)], schema="tag string, v long")
        .map_rows(lambda rec: (rec["tag"], rec["v"] * 10), "t string, w long")
        .sink_collect()
    )
    assert sorted(tuple(r) for r in out) == [("a", 10), ("b", 20)]

    with pytest.raises(Exception, match="map_rows"):
        (
            ctx.from_collection([("a", 1)], schema="tag string, v long")
            .map_rows(lambda rec: 42, "t string")
            .sink_collect()
        )


def test_map_rows_row_asdict_fidelity(spark):
    """The Row.asDict fidelity contract the .rdd path gave, pinned
    against the two pandas-transport failure modes the round-9 review
    caught: (1) a long column whose batch contains a NULL must still
    deliver exact Python ints (pandas would degrade the batch to
    float64, rounding past 2^53); (2) a genuine NaN double is NOT a
    NULL — fn must see nan for the value and None only for SQL NULL."""
    import math

    ctx = StreamingContext(spark)
    big = (1 << 53) + 1  # not representable in float64

    def fn(rec):
        assert rec["v"] is None or isinstance(rec["v"], int), rec
        return {
            "v_out": rec["v"],
            "kind": (
                "null" if rec["f"] is None
                else "nan" if math.isnan(rec["f"])
                else "num"
            ),
        }

    out = (
        ctx.from_collection(
            [(big, 1.5), (None, None), (3, float("nan"))],
            schema="v long, f double",
        )
        .map_rows(fn, "v_out long, kind string")
        .sink_collect()
    )
    got = {r["kind"]: r["v_out"] for r in out}
    assert got == {"num": big, "null": None, "nan": 3}


def test_keyed_join(spark):
    ctx = StreamingContext(spark)
    left = ctx.from_collection(
        [("a", 1), ("b", 2)], schema="k string, lv long"
    ).key_by("k")
    right = ctx.from_collection(
        [("a", 10.0), ("c", 30.0)], schema="k2 string, rv double"
    ).key_by("k2")
    rows = left.join(right).map("k", "lv", "rv").sink_collect()
    assert [tuple(r) for r in rows] == [("a", 1, 10.0)]


def test_cli_featurizer_and_backtester(tmp_path, spark):
    import json
    import subprocess
    import sys

    import yaml

    cfg = {
        "data_source": {
            "kind": "sine", "start_ts": 0.0, "end_ts": 400.0, "step": 1.0,
            "amplitude": 100.0, "mean": 1000.0, "freq": 0.01,
            "keys": {"symbol": "SYN"},
        },
        "keys": ["symbol"],
        "features": [
            {"name": "mid", "feature_definition": "mid_price",
             "params": {"price_col": "mid_price"}},
        ],
        "label_feature": "mid",
        "label_lookahead": "5s",
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    env_run = lambda *a: subprocess.run(  # noqa: E731
        [sys.executable, "-m", "svoe_spark.cli", *a],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    out = env_run("featurizer", "get-data", str(cfg_path), "--out", str(tmp_path / "fls"))
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["rows"] == 395

    bt = env_run("backtester", "run", str(cfg_path), "--price-col", "mid-mid_price")
    assert bt.returncode == 0, bt.stderr[-2000:]
    res = json.loads(bt.stdout.strip().splitlines()[-1])
    assert len(res) == 1 and res[0]["n_events"] == 395
