"""Fixed-point integer PageRank: differential vs a pure-Python mirror
of the same arithmetic, plus structural sanity (mass conservation,
dangling handling, ranking order)."""

import pytest

from svoe_spark.operators.graph import pagerank

SCALE = 10**15


def _py_pagerank(edges, iterations=10, damping_pct=85, scale=SCALE):
    """Driver-side mirror of operators/graph.py:pagerank — same
    truncating integer arithmetic, same recurrence."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: scale // n for v in nodes}
    teleport = ((100 - damping_pct) * scale) // (100 * n)
    for _ in range(iterations):
        dangling = sum(r[v] for v in nodes if v not in out) // n
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += r[s] // out[s]
        r = {
            v: teleport + (damping_pct * (inc[v] + dangling)) // 100
            for v in nodes
        }
    return r


@pytest.fixture()
def edges():
    # a hub (1 -> everyone), a cycle (2->3->4->2), a dangling sink (5)
    return [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (3, 4), (4, 2), (2, 5)]


def test_matches_python_mirror(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_fp"] for r in pagerank(df, iterations=10).collect()}
    assert got == _py_pagerank(edges, iterations=10)


def test_mass_conserved_within_truncation(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = pagerank(df, iterations=10).collect()
    total = sum(r["rank_fp"] for r in got)
    # each division truncates < 1 unit per node/edge per iteration
    n_divs = 10 * (len(edges) + len(got) + 2)
    assert SCALE - n_divs * 2 <= total <= SCALE


def test_sink_collects_rank(spark):
    # chain 1 -> 2 -> 3: rank must be strictly increasing down the chain
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {r["node"]: r["rank_fp"] for r in pagerank(df, iterations=20).collect()}
    assert got[1] < got[2] < got[3]


def test_duplicate_edges_collapse(spark, edges):
    df = spark.createDataFrame(edges + edges, "src long, dst long")
    got = {r["node"]: r["rank_fp"] for r in pagerank(df, iterations=5).collect()}
    assert got == _py_pagerank(edges, iterations=5)


def test_zero_iterations_uniform(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_fp"] for r in pagerank(df, iterations=0).collect()}
    assert set(got.values()) == {SCALE // 5}
