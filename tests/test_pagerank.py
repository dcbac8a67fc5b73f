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


def _py_ppr(edges, sources, iterations=10, damping_pct=85, scale=SCALE):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    srcs = [v for v in nodes if v in set(sources)]
    ns = len(srcs)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: (scale // ns if v in set(srcs) else 0) for v in nodes}
    teleport = ((100 - damping_pct) * scale) // (100 * ns)
    for _ in range(iterations):
        dangling = sum(r[v] for v in nodes if v not in out) // ns
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += r[s] // out[s]
        r = {
            v: (teleport if v in set(srcs) else 0)
            + (damping_pct * (inc[v] + (dangling if v in set(srcs) else 0))) // 100
            for v in nodes
        }
    return r


def test_personalized_matches_python_mirror(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, iterations=10, sources=[1, 2]).collect()
    }
    assert got == _py_ppr(edges, [1, 2], iterations=10)


def test_personalized_concentrates_near_sources(spark):
    # two disconnected triangles; restart at one of them
    tri1 = [(1, 2), (2, 3), (3, 1)]
    tri2 = [(10, 11), (11, 12), (12, 10)]
    df = spark.createDataFrame(tri1 + tri2, "src long, dst long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, iterations=15, sources=[1]).collect()
    }
    assert min(got[v] for v in (1, 2, 3)) > max(got[v] for v in (10, 11, 12))
    assert got[10] == got[11] == got[12] == 0


def test_sources_dataframe_and_missing_source(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(1,), (2,)], "node long")
    got_df = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, iterations=5, sources=sdf).collect()
    }
    assert got_df == _py_ppr(edges, [1, 2], iterations=5)
    with pytest.raises(ValueError):
        pagerank(df, iterations=5, sources=[999]).collect()


@pytest.mark.heavy  # ~80 materialized rounds (~1 min): sharded tier
def test_until_converged_reaches_fixpoint(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    pr = pagerank(df, until_converged=True, max_iter=200)
    got = {r["node"]: r["rank_fp"] for r in pr.collect()}
    rounds = pr._svoe_pr_rounds
    assert 1 < rounds < 200
    # running the mirror for `rounds` and `rounds+5` gives the same
    # vector: it really is a fixpoint of the integer map
    assert _py_pagerank(edges, iterations=rounds) == _py_pagerank(
        edges, iterations=rounds + 5
    )
    assert got == _py_pagerank(edges, iterations=rounds)


def _py_hits(edges, iterations=5, scale=SCALE):
    from collections import defaultdict

    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    hub = {v: scale // n for v in nodes}
    auth = {v: 0 for v in nodes}

    def half(scores, forward):
        raw = defaultdict(int)
        for s, d in set(edges):
            if forward:
                raw[d] += scores[s]
            else:
                raw[s] += scores[d]
        t = sum(raw.values())
        return {v: ((raw.get(v, 0) * scale) // t if t > 0 else 0) for v in nodes}

    for _ in range(iterations):
        auth = half(hub, True)
        hub = half(auth, False)
    return hub, auth


def test_hits_matches_python_mirror(spark, edges):
    from svoe_spark.operators.graph import hits

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["hub_fp"], r["auth_fp"]) for r in hits(df, iterations=5).collect()}
    hub, auth = _py_hits(edges, iterations=5)
    assert got == {v: (hub[v], auth[v]) for v in hub}


@pytest.mark.heavy  # 26 materialized rounds: sharded tier
def test_hits_until_converged_reaches_fixpoint(spark, edges):
    """Run-to-fixpoint HITS: converges in < max_iter rounds, and the
    fixpoint equals a long fixed-iteration run (integer arithmetic
    reaches an exact stationary vector, so 'long enough' is exact)."""
    from svoe_spark.operators.graph import hits

    df = spark.createDataFrame(edges, "src long, dst long")
    conv = hits(df, until_converged=True, max_iter=60)
    rounds = conv._svoe_hits_rounds
    assert 0 < rounds < 60
    got = {r["node"]: (r["hub_fp"], r["auth_fp"]) for r in conv.collect()}
    fixed = {
        r["node"]: (r["hub_fp"], r["auth_fp"])
        for r in hits(df, iterations=rounds + 5).collect()
    }
    assert got == fixed


def test_hits_bipartite_semantics(spark):
    from svoe_spark.operators.graph import hits

    # hub 1 points at popular authorities {10, 11}; hub 2 only at 10;
    # authority 10 has more in-links than 11
    edges = [(1, 10), (1, 11), (2, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["hub_fp"], r["auth_fp"]) for r in hits(df, iterations=8).collect()}
    assert got[10][1] > got[11][1] > 0  # 10 the stronger authority
    assert got[1][0] > got[2][0] > 0  # 1 the stronger hub
    assert got[10][0] == got[11][0] == 0  # pure sinks: no hub score
    assert got[1][1] == got[2][1] == 0  # pure sources: no authority


def test_bfs_distances_hand_graph(spark):
    from svoe_spark.operators.graph import bfs_distances

    # 1 -> 2 -> 3 -> 4, plus island 9 -> 10
    edges = [(1, 2), (2, 3), (3, 4), (9, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["dist"] for r in bfs_distances(df, [1], max_hops=10).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # island unreachable, absent

    undirected = {
        r["node"]: r["dist"]
        for r in bfs_distances(df, [3], max_hops=10, directed=False).collect()
    }
    assert undirected == {3: 0, 2: 1, 4: 1, 1: 2}

    # early_stop=False runs every budgeted round with no digest jobs;
    # the min recurrence is idempotent past convergence, so results
    # are identical to the early-stopping form
    no_stop = {
        r["node"]: r["dist"]
        for r in bfs_distances(
            df, [3], max_hops=10, directed=False, early_stop=False
        ).collect()
    }
    assert no_stop == undirected


def test_bfs_multi_source_takes_nearest(spark):
    from svoe_spark.operators.graph import bfs_distances

    edges = [(1, 2), (2, 3), (3, 4), (5, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(df, [1, 5], max_hops=10).collect()
    }
    assert got[4] == 1  # via seed 5, not the 3-hop path from 1


def test_bfs_max_hops_truncates(spark):
    from svoe_spark.operators.graph import bfs_distances

    edges = [(i, i + 1) for i in range(1, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["dist"] for r in bfs_distances(df, [1], max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


def _py_wpr(edges_w, iterations=5, damping_pct=85, scale=SCALE):
    nodes = sorted({s for s, _, _ in edges_w} | {d for _, d, _ in edges_w})
    n = len(nodes)
    agg = {}
    for s, d, w in edges_w:
        agg[(s, d)] = agg.get((s, d), 0) + w
    W = {}
    for (s, _), w in agg.items():
        W[s] = W.get(s, 0) + w
    r = {v: scale // n for v in nodes}
    teleport = ((100 - damping_pct) * scale) // (100 * n)
    for _ in range(iterations):
        dangling = sum(r[v] for v in nodes if v not in W) // n
        inc = {v: 0 for v in nodes}
        for (s, d), w in agg.items():
            inc[d] += (r[s] * w) // W[s]
        r = {
            v: teleport + (damping_pct * (inc[v] + dangling)) // 100
            for v in nodes
        }
    return r


def test_weighted_matches_python_mirror(spark):
    edges_w = [
        (1, 2, 10), (1, 3, 1), (2, 3, 5), (3, 1, 2), (1, 2, 4),  # dup pair
        (4, 1, 7),
    ]
    df = spark.createDataFrame(edges_w, "src long, dst long, w long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, iterations=5, weight="w").collect()
    }
    assert got == _py_wpr(edges_w, iterations=5)


def test_weighted_shifts_mass_toward_heavy_edge(spark):
    # same topology, different weights: 1 sends 99% of its walk to 2
    df = spark.createDataFrame(
        [(1, 2, 99), (1, 3, 1)], "src long, dst long, w long"
    )
    got = {r["node"]: r["rank_fp"] for r in pagerank(df, iterations=3, weight="w").collect()}
    # teleport + uniform dangling redistribution floor every node's
    # rank, so the contrast is bounded — but the heavy edge must win
    # clearly, and an UNWEIGHTED run must tie 2 and 3 exactly
    assert got[2] > 1.5 * got[3]
    unw = {r["node"]: r["rank_fp"] for r in pagerank(df.select("src", "dst"), iterations=3).collect()}
    assert unw[2] == unw[3]


@pytest.mark.heavy  # multi-round graph ops (~3 min): sharded tier
def test_broadcast_mode_equals_partitioned_mode(spark, edges):
    """The three physical strategies — driver-resident micro mode (the
    round-10 default on tiny graphs), the round-8 small-graph
    broadcast path (driver_nodes=0 forces it: rank/score vector
    broadcast, no repartitioned edge copies), and the partitioned path
    (broadcast_nodes=0) — are PHYSICAL switches only: results must be
    bit-identical across all three for pagerank (uniform,
    personalized, weighted) and HITS, and across micro vs partitioned
    for BFS (whose broadcast variant was dropped in round 8; micro
    mode replaces it from round 10)."""
    from svoe_spark.operators.graph import bfs_distances, hits

    def rows(df, *cols):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    edf = spark.createDataFrame(edges, "src long, dst long")
    mi = pagerank(edf, iterations=4)  # edge-resident (round-10 default)
    mj = pagerank(edf, iterations=4, driver_edges=0)  # micro spark loop
    br = pagerank(edf, iterations=4, driver_nodes=0)
    pt = pagerank(edf, iterations=4, broadcast_nodes=0)
    assert rows(mi, "node", "rank_fp") == rows(pt, "node", "rank_fp")
    assert rows(mj, "node", "rank_fp") == rows(pt, "node", "rank_fp")
    assert rows(br, "node", "rank_fp") == rows(pt, "node", "rank_fp")

    mi = pagerank(edf, iterations=3, sources=[1], damping_pct=70)
    mj = pagerank(
        edf, iterations=3, sources=[1], damping_pct=70, driver_edges=0
    )
    br = pagerank(
        edf, iterations=3, sources=[1], damping_pct=70, driver_nodes=0
    )
    pt = pagerank(
        edf, iterations=3, sources=[1], damping_pct=70, broadcast_nodes=0
    )
    assert rows(mi, "node", "rank_fp") == rows(pt, "node", "rank_fp")
    assert rows(mj, "node", "rank_fp") == rows(pt, "node", "rank_fp")
    assert rows(br, "node", "rank_fp") == rows(pt, "node", "rank_fp")

    w = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 1), (2, 3, 5), (3, 1, 2)],
        "src long, dst long, w long",
    )
    mi = pagerank(w, iterations=3, weight="w")
    mj = pagerank(w, iterations=3, weight="w", driver_edges=0)
    br = pagerank(w, iterations=3, weight="w", driver_nodes=0)
    pt = pagerank(w, iterations=3, weight="w", broadcast_nodes=0)
    assert rows(mi, "node", "rank_fp") == rows(pt, "node", "rank_fp")
    assert rows(mj, "node", "rank_fp") == rows(pt, "node", "rank_fp")
    assert rows(br, "node", "rank_fp") == rows(pt, "node", "rank_fp")

    mi = hits(edf, iterations=3)
    mj = hits(edf, iterations=3, driver_edges=0)
    br = hits(edf, iterations=3, driver_nodes=0)
    pt = hits(edf, iterations=3, broadcast_nodes=0)
    assert rows(mi, "node", "hub_fp", "auth_fp") == rows(
        pt, "node", "hub_fp", "auth_fp"
    )
    assert rows(mj, "node", "hub_fp", "auth_fp") == rows(
        pt, "node", "hub_fp", "auth_fp"
    )
    assert rows(br, "node", "hub_fp", "auth_fp") == rows(
        pt, "node", "hub_fp", "auth_fp"
    )

    mi = bfs_distances(edf, [1], max_hops=4, directed=False)
    mj = bfs_distances(edf, [1], max_hops=4, directed=False, driver_edges=0)
    pt = bfs_distances(edf, [1], max_hops=4, directed=False, driver_nodes=0)
    assert rows(mi, "node", "dist") == rows(pt, "node", "dist")
    assert rows(mj, "node", "dist") == rows(pt, "node", "dist")


@pytest.mark.heavy  # multi-round graph ops: sharded tier
def test_shared_aux_equals_per_call_setup(spark, edges):
    """GraphAux (round 9): a family of rankings over one edge relation
    can share the prebuilt node set / degrees / decorated edges. The
    shared-aux results must be bit-identical to the per-call setup for
    uniform AND personalized pagerank AND HITS, the aux must survive
    reuse (the operator never releases a caller-supplied aux), and a
    mismatched aux (weighted vs unweighted) must be rejected."""
    from svoe_spark.operators.graph import GraphAux, hits

    def rows(df, *cols):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    edf = spark.createDataFrame(edges, "src long, dst long")
    aux = GraphAux(edf)
    try:
        a = pagerank(edf, iterations=4, aux=aux)
        b = pagerank(edf, iterations=4)
        assert rows(a, "node", "rank_fp") == rows(b, "node", "rank_fp")
        # reuse after a prior call (aux not released by the operator)
        a = pagerank(edf, iterations=3, sources=[1], damping_pct=70, aux=aux)
        b = pagerank(edf, iterations=3, sources=[1], damping_pct=70)
        assert rows(a, "node", "rank_fp") == rows(b, "node", "rank_fp")
        a = hits(edf, iterations=3, aux=aux)
        b = hits(edf, iterations=3)
        assert rows(a, "node", "hub_fp", "auth_fp") == rows(
            b, "node", "hub_fp", "auth_fp"
        )
        with pytest.raises(ValueError, match="aux"):
            pagerank(edf, iterations=2, weight="missing", aux=aux)
        # weighted aux BORROWING the unweighted aux's node relation
        # (round 10): same ranks as a fully per-call weighted setup
        from pyspark.sql import functions as F

        wdf = edf.withColumn("w", F.lit(1).cast("long"))
        waux = GraphAux(wdf, weight="w", reuse_nodes=aux)
        try:
            a = pagerank(wdf, iterations=3, weight="w", aux=waux)
            b = pagerank(wdf, iterations=3, weight="w")
            assert rows(a, "node", "rank_fp") == rows(b, "node", "rank_fp")
        finally:
            waux.unpersist()
        # the borrowed node relation must survive the borrower's
        # release (the unweighted aux still owns it)
        a = pagerank(edf, iterations=2, aux=aux)
        b = pagerank(edf, iterations=2)
        assert rows(a, "node", "rank_fp") == rows(b, "node", "rank_fp")
        # object-identity guard: an aux over a DIFFERENT edge relation
        # (even a value-identical one) must be rejected, not silently
        # rank the aux's graph
        other = spark.createDataFrame(edges, "src long, dst long")
        with pytest.raises(ValueError, match="identity"):
            pagerank(other, iterations=2, aux=aux)
        with pytest.raises(ValueError, match="identity"):
            hits(other, iterations=2, aux=aux)
        # dedup-decision guard (ADVICE r9): an aux built with
        # assume_distinct=False must be rejected by an
        # assume_distinct=True call and vice versa — a silent mismatch
        # would skip (or double) the dedup the call expects
        with pytest.raises(ValueError, match="assume_distinct"):
            pagerank(edf, iterations=2, assume_distinct=True, aux=aux)
        with pytest.raises(ValueError, match="assume_distinct"):
            hits(edf, iterations=2, assume_distinct=True, aux=aux)
    finally:
        aux.unpersist()


def test_null_endpoints_decline_driver_pull(spark):
    """Edges with NULL endpoints must produce the same result through
    every tier: the edge-resident pull declines (Arrow would float64-
    convert the column into NaN labels) and the Spark tiers treat NULL
    as a node value — the pre-round-10 behavior."""
    from svoe_spark.operators.graph import bfs_distances, pagerank

    edf = spark.createDataFrame(
        [(1, 2), (2, 3), (1, None), (3, 1)], "src long, dst long"
    )

    def rows(df, *cols):
        return sorted(
            (tuple(r[c] for c in cols) for r in df.collect()),
            key=repr,
        )

    drv = pagerank(edf, iterations=3)  # pull declines, micro spark loop
    pt = pagerank(edf, iterations=3, broadcast_nodes=0)
    assert rows(drv, "node", "rank_fp") == rows(pt, "node", "rank_fp")

    d1 = bfs_distances(edf, [1], max_hops=3)
    d2 = bfs_distances(edf, [1], max_hops=3, driver_nodes=0)
    assert rows(d1, "node", "dist") == rows(d2, "node", "dist")


def test_mixed_width_endpoints_widened_node_type(spark):
    """int src + long dst (values past 2^31) must widen the output
    node type through the driver-resident tiers — the union-widened
    type, not the src column's."""
    from svoe_spark.operators.graph import bfs_distances, hits, pagerank

    big = 3_000_000_000
    edf = spark.createDataFrame(
        [(1, big), (2, big), (1, 2)],
        "src int, dst long",
    )

    def rows(df, *cols):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    pr = pagerank(edf, iterations=2)
    pt = pagerank(edf, iterations=2, broadcast_nodes=0)
    assert rows(pr, "node", "rank_fp") == rows(pt, "node", "rank_fp")

    h = hits(edf, iterations=2)
    hp = hits(edf, iterations=2, broadcast_nodes=0)
    assert rows(h, "node", "hub_fp", "auth_fp") == rows(
        hp, "node", "hub_fp", "auth_fp"
    )

    d = bfs_distances(edf, [1], max_hops=3)
    dp = bfs_distances(edf, [1], max_hops=3, driver_nodes=0)
    assert rows(d, "node", "dist") == rows(dp, "node", "dist")
    assert {r["node"] for r in d.collect()} == {1, 2, big}


def test_seeded_aux_matches_unseeded(spark, edges):
    """GraphAux/bfs seed_pull (round 10 day 3): decorations derived
    from ONE raw pair pull (np.unique rows = distinct edges, counts =
    multiplicity weights) must be bit-identical to the unseeded
    Spark-side distinct / groupBy-sum paths — for uniform pagerank,
    weighted pagerank, HITS, and the BFS edge tier. Raw pairs carry
    duplicates so the weight derivation is actually exercised."""
    import numpy as np

    from pyspark.sql import functions as F

    from svoe_spark.operators.graph import (
        GraphAux,
        bfs_distances,
        hits,
        pagerank,
    )

    def rows(df, *cols):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    raw = edges + [(1, 2), (2, 3), (1, 2)]  # duplicates -> weights 2-3
    arr = np.unique(np.asarray(raw, dtype="int64"), axis=0)
    counts = np.unique(
        np.asarray(raw, dtype="int64"), axis=0, return_counts=True
    )[1].astype("int64")
    s, d = (
        np.ascontiguousarray(arr[:, 0]),
        np.ascontiguousarray(arr[:, 1]),
    )

    dedf = spark.createDataFrame(sorted(set(raw)), "src long, dst long")
    aux_seeded = GraphAux(
        dedf, assume_distinct=True, seed_pull=(s, d, None),
        seed_edge_count=len(s),
    )
    aux_plain = GraphAux(dedf, assume_distinct=True)
    try:
        a = pagerank(dedf, iterations=4, assume_distinct=True, aux=aux_seeded)
        b = pagerank(dedf, iterations=4, assume_distinct=True, aux=aux_plain)
        assert rows(a, "node", "rank_fp") == rows(b, "node", "rank_fp")
        a = hits(dedf, iterations=3, assume_distinct=True, aux=aux_seeded)
        b = hits(dedf, iterations=3, assume_distinct=True, aux=aux_plain)
        assert rows(a, "node", "hub_fp", "auth_fp") == rows(
            b, "node", "hub_fp", "auth_fp"
        )
    finally:
        aux_seeded.unpersist()
        aux_plain.unpersist()

    wdf = spark.createDataFrame(raw, "src long, dst long").withColumn(
        "w", F.lit(1).cast("long")
    )
    waux_seeded = GraphAux(
        wdf, weight="w", seed_pull=(s, d, counts), seed_edge_count=len(s)
    )
    waux_plain = GraphAux(wdf, weight="w")
    try:
        a = pagerank(wdf, iterations=3, weight="w", aux=waux_seeded)
        b = pagerank(wdf, iterations=3, weight="w", aux=waux_plain)
        assert rows(a, "node", "rank_fp") == rows(b, "node", "rank_fp")
    finally:
        waux_seeded.unpersist()
        waux_plain.unpersist()

    # a seeded weighted aux must still reject non-positive weights
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        GraphAux(
            wdf,
            weight="w",
            seed_pull=(s, d, counts - counts),  # all-zero weights
            seed_edge_count=len(s),
        )

    # BFS edge tier: seeded arrays == its own pull, undirected walk
    a = bfs_distances(
        dedf, [1], max_hops=4, directed=False, assume_distinct=True,
        seed_pull=(s, d), seed_edge_count=len(s),
    )
    b = bfs_distances(
        dedf, [1], max_hops=4, directed=False, assume_distinct=True
    )
    assert rows(a, "node", "dist") == rows(b, "node", "dist")
    # and identical to the pure-Spark tier
    c = bfs_distances(
        dedf, [1], max_hops=4, directed=False, assume_distinct=True,
        driver_nodes=0,
    )
    assert rows(a, "node", "dist") == rows(c, "node", "dist")
