"""connected_components / dedup_clusters semantics on crafted graphs
(the parity suite covers the fixture-scale recursive-CTE oracle)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from svoe_spark.operators.graph import connected_components, dedup_clusters


def _pairs(spark, edges):
    return spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])


def test_cc_two_components_and_chain(spark):
    # component {1,2,3,4} as a chain, component {10,11} as an edge
    comp = {
        r.id: r.comp
        for r in connected_components(
            _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
        ).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


@pytest.mark.heavy  # round-9 quick-tier trim: ptest.py/round-close still run it
def test_cc_long_chain_converges(spark):
    n = 12
    comp = {
        r.id: r.comp
        for r in connected_components(
            _pairs(spark, [(i, i + 1) for i in range(n)])
        ).collect()
    }
    assert set(comp.values()) == {0} and len(comp) == n + 1


def test_cc_edge_order_irrelevant(spark):
    # same component regardless of which side the smaller id is on
    comp = {
        r.id: r.comp
        for r in connected_components(_pairs(spark, [(5, 2), (2, 9)])).collect()
    }
    assert comp == {2: 2, 5: 2, 9: 2}


def test_dedup_clusters_singletons_and_sizes(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(6)])
    out = {
        r.doc_id: r
        for r in dedup_clusters(docs, _pairs(spark, [(0, 1), (1, 2)])).collect()
    }
    assert [out[i].cluster_id for i in range(6)] == [0, 0, 0, 3, 4, 5]
    assert out[0].cluster_size == 3 and out[3].cluster_size == 1
    assert out[0].is_canonical and not out[1].is_canonical
    assert out[5].is_canonical


def test_cc_nonconvergence_raises_in_strict_mode(spark):
    import pytest as _pytest

    # a chain of diameter 6 cannot converge in 2 rounds of min-label
    # propagation: strict mode must refuse a partial labeling.
    # driver_edges=0 pins the RELATIONAL loop — the max_iter guard is
    # its contract; the driver tier always reaches the exact fixpoint.
    edges = _pairs(spark, [(i, i + 1) for i in range(6)])
    with _pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(edges, max_iter=2, driver_edges=0)
    # non-strict mode returns the partial labels with a warning
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = connected_components(
            edges, max_iter=2, strict=False, driver_edges=0
        ).collect()
    assert len(out) == 7
    assert any("fixpoint" in str(x.message) for x in w)


def test_cc_driver_tier_matches_relational(spark):
    # the round-11 edge-resident tier must label bit-identically to
    # both Spark paths, including long chains (pointer jumping) and
    # multi-component graphs
    edges = (
        [(i, i + 1) for i in range(40)]          # long chain
        + [(100, 101), (101, 102), (100, 102)]   # triangle
        + [(200, 201)]
    )
    p = _pairs(spark, edges)
    drv = connected_components(p)
    assert drv._svoe_cc_algorithm == "driver"
    rel = connected_components(p, driver_edges=0, max_iter=50)
    got_d = sorted((r.id, r.comp) for r in drv.collect())
    got_r = sorted((r.id, r.comp) for r in rel.collect())
    assert got_d == got_r
    # string ids must DECLINE the tier (collation stays Spark's)
    sp = spark.createDataFrame(
        [Row(id_a="b", id_b="a"), Row(id_a="b", id_b="c")]
    )
    out = connected_components(sp)
    assert out._svoe_cc_algorithm != "driver"
    assert {r.id: r.comp for r in out.collect()} == {
        "a": "a", "b": "a", "c": "a"
    }


def test_cc_string_ids(spark):
    from pyspark.sql import Row

    pairs = spark.createDataFrame(
        [Row(id_a="docA", id_b="docB"), Row(id_a="docB", id_b="docC")]
    )
    comp = {r.id: r.comp for r in connected_components(pairs).collect()}
    assert comp == {"docA": "docA", "docB": "docA", "docC": "docA"}


def test_twostar_matches_propagation_on_mixed_graph(spark):
    from svoe_spark.operators.graph import connected_components_twostar

    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    prop = {
        r.id: r.comp
        for r in connected_components(
            _pairs(spark, edges), switch_after=None
        ).collect()
    }
    two = {
        r.id: r.comp
        for r in connected_components_twostar(_pairs(spark, edges)).collect()
    }
    assert two == prop


def test_twostar_string_ids(spark):
    from pyspark.sql import Row

    from svoe_spark.operators.graph import connected_components_twostar

    pairs = spark.createDataFrame(
        [Row(id_a="docB", id_b="docC"), Row(id_a="docA", id_b="docB")]
    )
    comp = {r.id: r.comp for r in connected_components_twostar(pairs).collect()}
    assert comp == {"docA": "docA", "docB": "docA", "docC": "docA"}


@pytest.mark.heavy  # round-9 quick-tier trim: ptest.py/round-close still run it
def test_twostar_path_graph_10k_converges(spark):
    """Diameter 9999 — propagation alone would need ~10k rounds; the
    two-star algorithm must converge in O(log^2 n) large/small rounds
    (judge round-2 'Done' criterion)."""
    from svoe_spark.operators.graph import connected_components_twostar

    n = 10_000
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    labels = connected_components_twostar(pairs, max_iter=40)
    agg = labels.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("comp").alias("ncomp"),
        F.max("comp").alias("mx"),
    ).first()
    assert agg["n"] == n and agg["ncomp"] == 1 and agg["mx"] == 0


@pytest.mark.heavy  # round-9 quick-tier trim: ptest.py/round-close still run it
def test_auto_switch_long_chain(spark):
    """A 60-node chain exceeds the default switch_after budget: the
    auto path must hand off to two-star and still return the full,
    correct labeling (not raise, not return a partial one)."""
    comp = {
        r.id: r.comp
        for r in connected_components(
            _pairs(spark, [(i, i + 1) for i in range(60)])
        ).collect()
    }
    assert len(comp) == 61 and set(comp.values()) == {0}


def test_twostar_nonstrict_partial_is_one_row_per_node(spark):
    """Non-converged non-strict two-star must still emit exactly one
    (id, comp) row per node (round-3 ADVICE: un-aggregated centers
    duplicated rows, double-counting docs in dedup_clusters)."""
    import warnings

    from svoe_spark.operators.graph import connected_components_twostar

    edges = _pairs(spark, [(i, i + 1) for i in range(40)])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = connected_components_twostar(
            edges, max_iter=1, strict=False
        ).collect()
    assert any("converge" in str(x.message) for x in w)
    ids = [r.id for r in out]
    assert len(ids) == len(set(ids)) == 41


# ---------------------------------------------------------------------------
# knn_sparsify + triangle_counts
# ---------------------------------------------------------------------------


def _wedges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w long")


def test_knn_sparsify_mutual_drops_one_sided_picks(spark):
    from svoe_spark.operators.graph import knn_sparsify

    # K4 with a pendant node 5 attached weakly to 1: with k=3, node 5
    # picks 1 but 1's top-3 are 2,3,4 -> (1,5) is one-sided
    edges = _wedges(
        spark,
        [(1, 2, 10), (1, 3, 9), (1, 4, 8), (2, 3, 7), (2, 4, 6), (3, 4, 5), (5, 1, 1)],
    )
    mut = sorted(tuple(r) for r in knn_sparsify(edges, k=3).collect())
    assert mut == [(1, 2, 10), (1, 3, 9), (1, 4, 8), (2, 3, 7), (2, 4, 6), (3, 4, 5)]
    any_ = sorted(tuple(r) for r in knn_sparsify(edges, k=3, mutual=False).collect())
    assert (1, 5, 1) in any_ and len(any_) == 7


def test_knn_sparsify_sums_duplicate_orientations(spark):
    from svoe_spark.operators.graph import knn_sparsify

    # the same pair reported in both orientations must merge by sum
    edges = _wedges(spark, [(1, 2, 3), (2, 1, 4), (1, 3, 5)])
    out = sorted(tuple(r) for r in knn_sparsify(edges, k=2).collect())
    assert out == [(1, 2, 7), (1, 3, 5)]


def test_knn_sparsify_rejects_bad_k_and_drops_self_loops(spark):
    import pytest

    from svoe_spark.operators.graph import knn_sparsify

    with pytest.raises(ValueError):
        knn_sparsify(_wedges(spark, [(1, 2, 1)]), k=0)
    out = knn_sparsify(_wedges(spark, [(1, 1, 9), (1, 2, 1)]), k=2).collect()
    assert sorted(tuple(r) for r in out) == [(1, 2, 1)]


def test_triangle_counts_matches_bruteforce(spark):
    """Random-ish 12-node graph: id-oriented wedge enumeration must
    agree with the O(n^3) Python count, per node."""
    import itertools

    from svoe_spark.operators.graph import triangle_counts

    pairs = sorted(
        {(min(a, b), max(a, b)) for a, b in [
            (1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3), (6, 7),
            (7, 8), (8, 6), (1, 4), (2, 4), (9, 10), (5, 1), (11, 12),
        ]}
    )
    adj = set(pairs)
    nodes = sorted({n for p in pairs for n in p})
    want = {n: 0 for n in nodes}
    ntri = 0
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in adj and (y, z) in adj and (x, z) in adj:
            ntri += 1
            want[x] += 1
            want[y] += 1
            want[z] += 1
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {r["node"]: r for r in triangle_counts(df).collect()}
    assert sum(r["triangles"] for r in got.values()) == 3 * ntri
    for n in nodes:
        assert got[n]["triangles"] == want[n], n
    # clustering: deg>=2 nodes get 2T/(d(d-1)); deg<2 nodes get NULL
    deg = {n: sum(1 for p in pairs if n in p) for n in nodes}
    for n in nodes:
        if deg[n] >= 2:
            assert got[n]["clustering"] == 2 * want[n] / (deg[n] * (deg[n] - 1))
        else:
            assert got[n]["clustering"] is None


def test_triangle_counts_driver_tier_matches_relational(spark):
    """The round-11 edge-resident tier (default at this size) must
    equal the relational cascade bit for bit — counts AND the
    clustering double — and string ids must decline the tier."""
    from svoe_spark.operators.graph import triangle_counts

    pairs = sorted(
        {(min(a, b), max(a, b)) for a, b in [
            (1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3), (6, 7),
            (7, 8), (8, 6), (1, 4), (2, 4), (9, 10), (5, 1), (11, 12),
        ]}
    )
    df = spark.createDataFrame(pairs, "a long, b long")
    drv = sorted(tuple(r) for r in triangle_counts(df).collect())
    rel = sorted(
        tuple(r) for r in triangle_counts(df, driver_edges=0).collect()
    )
    assert drv == rel
    sp = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "a string, b string"
    )
    got = {r["node"]: r["triangles"] for r in triangle_counts(sp).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_knn_sparsify_assume_canonical_matches_default(spark):
    """assume_canonical over an already-canonical grouped pair relation
    must equal the canonicalizing path row for row."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.graph import knn_sparsify

    raw = _wedges(
        spark,
        [(1, 2, 3), (1, 3, 5), (2, 3, 1), (1, 4, 5), (2, 4, 2), (3, 4, 9)],
    )
    canon = (
        raw.groupBy("src", "dst").agg(F.sum("w").alias("w"))
    )
    for k in (1, 2, 3):
        lhs = sorted(tuple(r) for r in knn_sparsify(canon, k=k).collect())
        rhs = sorted(
            tuple(r)
            for r in knn_sparsify(canon, k=k, assume_canonical=True).collect()
        )
        assert lhs == rhs, k
