"""Graph utilities for dedup pipelines: connected components over
near-duplicate pair sets.

Pair generators (MinHash/LSH, SimHash, n-gram Jaccard, embedding
cosine) emit edges; an actual dedup decision needs the transitive
closure — if A~B and B~C, {A,B,C} is one duplicate cluster with one
canonical survivor. The reference stops at per-pair content identity
(block content hashes, common/pandas/df_utils.py:163-164); clustering
is the missing last step any corpus-scale dedup needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


#: Micro-graph gate: at or below this node count the iterative
#: operators keep the score/distance vector DRIVER-RESIDENT between
#: rounds (it is exactly the relation broadcast-mode already collects
#: to the driver every round to build each broadcast) — per round ONE
#: Spark job instead of two broadcast builds + a checkpointed
#: window/join chain. 64k nodes x 16 B ~ 1 MB per round-trip, an
#: order of magnitude under the standard broadcast budget. Arithmetic
#: is token-identical (exact integer ops are associative), so results
#: and oracle hashes are unchanged by construction; the broadcast
#: (<= broadcast_nodes) and partitioned (above) strategies are
#: untouched. Pass driver_nodes=0 to force those paths.
DRIVER_NODES_DEFAULT = 65_536
# Edge-resident micro-graph gate (round 10, second pass): at or below
# this many canonical edges the edge list ITSELF is pulled to the
# driver (Arrow transfer, gated by a fully-parallel count probe) and
# the whole iteration loop runs in-process — zero jobs per round
# instead of one. 4M (src, dst[, w]) int64 rows is ~64-96 MB of numpy
# on the driver — the same order as a standard broadcast budget; the
# arithmetic is the same exact-integer recurrence, so results are
# bit-identical (pinned by the tier-equality tests).
DRIVER_EDGES_DEFAULT = 4_000_000


def _probe_pull(df: DataFrame, max_rows: int):
    """THE probe-and-pull step shared by the driver-resident tiers
    (review r11: three hand-rolled copies had subtly different
    unpersist wiring): persist the relation so the count probe and the
    Arrow pull evaluate the (possibly expensive) lineage once, pull
    when the count fits, and on the over-gate path LEAVE the cache in
    place — the relational fallback reads the same relation (often
    more than once: both union directions, four wedge subtrees), so
    the probe pass is its first evaluation, not a wasted one (the
    module's persisted-edges pattern; MEMORY_AND_DISK spills rather
    than evicting compute). Returns (pdf, persisted_df); pdf is None
    over the gate. The caller owns unpersisting `persisted_df` —
    immediately after a successful pull, or never on the fallback
    path (the cache dies with the plan references / session)."""
    probed = df.persist(StorageLevel.MEMORY_AND_DISK)
    if probed.count() <= max_rows:
        pdf = probed.toPandas()
        return pdf, probed
    return None, probed


def _node_type(e: DataFrame, src: str = "src", dst: str = "dst"):
    """The UNION-WIDENED node type of an edge relation — e.g. int src
    + long dst widens to long. Pure schema analysis, no job; the
    driver-resident tiers must declare this type (not the src
    column's) or a mixed-width graph fails Arrow conversion on
    output."""
    return (
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst).alias("node")))
        .schema[0]
        .dataType
    )


def _label_codes(labels):
    """Vectorized label -> position mapper for the micro-mode node
    list: numeric labels ride a sorted searchsorted (587k-edge
    endpoint arrays map in ~ms vs seconds for a per-value dict walk);
    non-numeric labels fall back to the dict. Labels are the distinct
    node set, so every queried endpoint is present by construction."""
    import numpy as np

    lab_arr = np.asarray(labels)
    if np.issubdtype(lab_arr.dtype, np.number):
        order = np.argsort(lab_arr, kind="stable")
        srt = lab_arr[order]

        def code(vals):
            return order[np.searchsorted(srt, np.asarray(vals))]

    else:
        pos = {v: i for i, v in enumerate(labels)}

        def code(vals):
            return np.fromiter(
                (pos[v] for v in vals), dtype="int64", count=len(vals)
            )

    return code


def _digest(df: DataFrame, *cols: str):
    """Content digest of a relation: decimal(38,0) sum of per-row
    hashes. One cheap scalar aggregation; id-type-agnostic (string doc
    ids are legal — a numeric cast would crash under ANSI or, worse,
    return NULL and fake convergence); decimal(38) so the hash sum
    cannot overflow int64. Run against a lazily-localCheckpointed
    relation this is ALSO the materializing action — one job per round
    covers both lineage truncation and the convergence check."""
    row = df.agg(
        F.sum(F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(38,0)")).alias("s")
    ).first()
    return row["s"]


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    strict: bool = True,
    switch_after: int = 5,
    driver_edges: int | None = None,  # None -> DRIVER_EDGES_DEFAULT
) -> DataFrame:
    """Connected components with automatic algorithm selection:
    min-label propagation for the common low-diameter case, switching
    to alternating large-star/small-star when propagation hasn't
    converged after ``switch_after`` rounds. Returns (id, comp) for
    every node appearing in ``pairs`` (isolated ids never appear —
    callers union singletons back, see `dedup_clusters`); ``comp`` is
    the smallest member of the node's component.

    Min-label propagation: every node starts labeled with itself; each
    round every node takes the minimum label among itself and its
    neighbors; fixpoint = each component labeled by its smallest
    member. Each round is one shuffle join (edges x labels) plus a
    min-aggregation — narrow keys, no skew beyond the graph's own
    degree distribution. Rounds needed = graph diameter. Near-dup
    clusters are low-diameter by construction (LSH buckets create
    near-cliques), so this converges in a handful of rounds and never
    triggers the switch; long chains (diameter > switch_after) restart
    on the two-star variant, which converges in O(log^2 n) rounds
    regardless of diameter (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14). ``switch_after=None`` disables
    the switch (plain propagation up to ``max_iter``).

    Lineage is truncated per round with a lazy localCheckpoint whose
    materializing action IS the convergence digest — one job per round
    (the eager-checkpoint + separate digest form ran two).

    ``driver_edges`` (round 11, the bfs_distances edge-resident
    precedent): when the pair count is at or under this bound (one
    fully-parallel count probe) and the ids are integral and non-NULL,
    the edge list is pulled once via Arrow and the whole labeling runs
    in-process — vectorized min-label propagation with pointer jumping
    (O(log n) numpy passes, exact integer mins), ZERO Spark jobs per
    round. The fixpoint of min-propagation labels every node with its
    component's smallest member — the identical contract of both Spark
    paths — so the labeling is equal row for row. Pass 0 to force the
    relational loops."""
    if driver_edges is None:
        driver_edges = DRIVER_EDGES_DEFAULT
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    pdf = None
    if driver_edges > 0:
        pdf, e = _probe_pull(e, driver_edges)
    if pdf is not None:
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        f = e.schema.fields
        s_a = pdf["src"].to_numpy()
        d_a = pdf["dst"].to_numpy()
        # integral dtypes only: a float dtype means NULL endpoints
        # (Arrow NaN-converts null-bearing integral columns) or float
        # ids; strings arrive as object. Both fall back to the Spark
        # paths, whose NULL/collation semantics stay authoritative.
        if (
            s_a.dtype.kind in "iu"
            and d_a.dtype.kind in "iu"
            and f[0].dataType == f[1].dataType
        ):
            uniq, inv = np.unique(
                np.concatenate([s_a, d_a]), return_inverse=True
            )
            n_nodes = len(uniq)
            sc, dc = inv[: len(s_a)], inv[len(s_a):]
            lab = np.arange(n_nodes, dtype="int64")
            rounds_run = 0
            while True:
                rounds_run += 1
                l2 = lab.copy()
                # one propagation round (both edge directions), then a
                # pointer-jump (label of my label): the jump is what
                # makes long chains converge in O(log n) passes. Labels
                # are node CODES; np.unique sorts ascending, so the
                # min over codes IS the min over ids.
                np.minimum.at(l2, sc, lab[dc])
                np.minimum.at(l2, dc, lab[sc])
                l2 = np.minimum(l2, l2[l2])
                if np.array_equal(l2, lab):
                    break
                lab = l2
            out = pairs.sparkSession.createDataFrame(
                pd.DataFrame({"id": uniq, "comp": uniq[lab]}),
                schema=T.StructType(
                    [
                        T.StructField("id", f[0].dataType),
                        T.StructField("comp", f[0].dataType),
                    ]
                ),
            )
            out._svoe_cc_rounds = rounds_run
            out._svoe_cc_algorithm = "driver"
            e.unpersist()  # labels live in numpy now
            return out
    # over the gate or non-integral ids: e stays persisted — the
    # relational union below reads it TWICE (both directions), so the
    # probe pass was its first evaluation, not a wasted one
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = edges.select("src").distinct().select(
        F.col("src").alias("id"), F.col("src").alias("comp")
    )
    # per-node labels only ever decrease (numeric or lexicographic min),
    # so the labeling as a multiset changes every non-converged round —
    # digest equality = fixpoint.
    rounds = max_iter if switch_after is None else min(switch_after, max_iter)
    prev_sum = None
    converged = False
    rounds_run = 0
    for _ in range(rounds):
        rounds_run += 1
        prop = edges.join(labels, edges["dst"] == labels["id"]).select(
            edges["src"].alias("id"), "comp"
        )
        labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        cur = _digest(labels, "id", "comp")
        if cur is None or cur == prev_sum:  # None = empty graph
            converged = True
            break
        prev_sum = cur
    if not converged and switch_after is not None and switch_after < max_iter:
        # diameter exceeds the propagation budget — restart on the
        # logarithmic-round algorithm using the still-persisted edges;
        # unpersist in finally so a strict non-convergence raise does
        # not leak the MEMORY_AND_DISK edge set in long-lived sessions
        try:
            out = _two_star(edges, max_iter=max_iter, strict=strict)
        finally:
            edges.unpersist()
        out._svoe_cc_rounds = rounds_run + out._svoe_cc_rounds
        out._svoe_cc_algorithm = "propagation+twostar"
        return out
    edges.unpersist()
    if not converged:
        # a silently-partial labeling would split true clusters and let
        # duplicates survive the dedup decision downstream
        msg = (
            f"connected_components did not reach fixpoint in {max_iter} "
            "rounds (graph diameter exceeds max_iter — e.g. a long "
            "near-dup chain). Raise max_iter, or pass strict=False to "
            "accept the partial labeling."
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning)
    labels._svoe_cc_rounds = rounds_run
    labels._svoe_cc_algorithm = "propagation"
    return labels


def connected_components_twostar(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 40,
    strict: bool = True,
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    rounds (Kiveris et al., SoCC'14): O(log^2 n) rounds independent of
    graph diameter, the scale path for adversarial chains and huge
    skewed components. Same (id, comp) contract as
    `connected_components`."""
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        out = _two_star(edges, max_iter=max_iter, strict=strict)
    finally:
        edges.unpersist()
    return out


def _two_star(edges: DataFrame, max_iter: int, strict: bool) -> DataFrame:
    """Alternating large-star/small-star over a symmetrized, distinct
    edge set until the edge relation reaches a fixpoint (a star per
    component centered at its minimum node), then read labels off the
    stars. ``edges`` must have columns (src, dst), both directions.

    Each star round is one aggregation (per-node min over neighbors and
    self) plus one join back to the edges — the same shuffle shape as a
    propagation round, but the relabeling contracts long chains
    geometrically instead of one hop per round.

    large-star(u): connect every neighbor v > u to m(u) = min(N(u)+u).
    small-star(u): connect every neighbor v <= u, and u itself, to m(u).
    (Formulation from the paper; both preserve connectivity, and the
    composition strictly shrinks the potential unless at fixpoint.)"""
    nodes = edges.select(F.col("src").alias("id")).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _digest(nodes, "id")  # materialize before edges mutate

    def star(ed: DataFrame, large: bool) -> DataFrame:
        mins = ed.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        j = ed.join(mins, "src")
        cond = F.col("dst") > F.col("src") if large else F.col("dst") <= F.col("src")
        new = j.where(cond).select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        if not large:
            # small-star also links u itself to m(u)
            new = new.unionByName(
                mins.select(F.col("src"), F.col("m").alias("dst"))
            )
        # drop self-loops, re-symmetrize, dedup: keeps the relation a
        # simple undirected graph and bounds growth
        new = new.where(F.col("src") != F.col("dst"))
        return (
            new.unionByName(
                new.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .distinct()
            .localCheckpoint(eager=False)
        )

    prev_sum = object()
    converged = False
    rounds_run = 0
    cur_edges = edges
    for _ in range(max_iter):
        rounds_run += 1
        cur_edges = star(star(cur_edges, large=True), large=False)
        cur = _digest(cur_edges, "src", "dst")
        if cur == prev_sum:
            converged = True
            break
        prev_sum = cur
    if not converged:
        msg = (
            f"two-star connected components did not converge in {max_iter} "
            "large/small rounds — raise max_iter or pass strict=False."
        )
        if strict:
            nodes.unpersist()
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning)
    # at fixpoint every component is a star centered at its min node:
    # non-center nodes appear as (v, center) with center < v; centers
    # (and isolated-by-contraction nodes) label themselves. The min-agg
    # is a fixpoint no-op, but with strict=False and no convergence a
    # node can still have several smaller neighbors — without it the
    # left join would emit duplicate (id, comp) rows and downstream
    # dedup_clusters would double-count docs instead of returning the
    # one-row-per-node partial labeling the warning promises.
    centers = (
        cur_edges.where(F.col("dst") < F.col("src"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("comp"))
    )
    labels = (
        nodes.join(centers, "id", "left")
        .select("id", F.coalesce("comp", "id").alias("comp"))
        .localCheckpoint(eager=False)
    )
    _digest(labels, "id", "comp")
    nodes.unpersist()
    labels._svoe_cc_rounds = rounds_run
    labels._svoe_cc_algorithm = "twostar"
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    algorithm: str = "auto",
) -> DataFrame:
    """Assign every document a duplicate-cluster id (the smallest doc
    id in its component; singletons cluster with themselves) plus the
    cluster size and a canonical flag — the keep/drop decision of a
    near-dedup pipeline is then `filter(is_canonical)`.

    ``algorithm``: 'auto' (min-label propagation, two-star fallback) or
    'twostar' (straight to the logarithmic-round algorithm — right when
    the pair graph is known to have long chains or huge components)."""
    if algorithm == "twostar":
        comp = connected_components_twostar(pairs)
    elif algorithm == "auto":
        comp = connected_components(pairs)
    else:
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    lab = (
        docs.select(id_col)
        .join(comp, docs[id_col] == comp["id"], "left")
        .select(
            docs[id_col],
            F.coalesce(comp["comp"], docs[id_col]).alias("cluster_id"),
        )
    )
    sz = lab.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return lab.join(sz, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
    )


class GraphAux:
    """Prebuilt, persisted graph-side relations shared across rankings
    over the SAME edge relation — the decoration every ranking repeats
    (edge canonicalization/dedup, node set union-distinct + count,
    out-degrees, static dangling flag, degree-pre-joined edges). A
    family of queries ranking one graph (uniform + personalized
    PageRank + HITS over a shared cached edge relation) pays this
    setup once instead of per call: pass the SAME GraphAux as ``aux``
    to `pagerank` / `hits`. Construction is token-for-token the
    operators' own former inline setup, so results (and oracle
    hashes) are identical by construction.

    Lifecycle: the caller owns the persisted relations — call
    ``unpersist()`` when the family is done (operators never release
    a caller-supplied aux; a per-call internally-built one is released
    as before). ``e_deg`` is built lazily on first access (HITS never
    needs it)."""

    def __init__(
        self,
        edges: DataFrame,
        src: str = "src",
        dst: str = "dst",
        weight: str | None = None,
        assume_distinct: bool = False,
        broadcast_nodes: int = 500_000,
        reuse_nodes: "GraphAux | None" = None,
        driver_edges: int = None,  # None -> DRIVER_EDGES_DEFAULT
        seed_pull: tuple | None = None,
        seed_edge_count: int | None = None,
    ):
        # identity of the INPUT relation (and its column mapping): the
        # operators verify a caller-supplied aux was built over the
        # very edges object they were handed — an aux over a different
        # relation would silently rank the wrong graph
        self.edges_ref = edges
        self.src = src
        self.dst = dst
        self.weight = weight
        self.assume_distinct = assume_distinct
        self.broadcast_nodes = broadcast_nodes
        if weight is None:
            # assume_distinct: skip the dedup shuffle when the caller
            # guarantees distinct (src, dst) — e.g. a shared
            # pre-distincted cached edge relation feeding several
            # rankings
            e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            if not assume_distinct:
                e = e.distinct()
        else:
            e = (
                edges.select(
                    F.col(src).alias("src"),
                    F.col(dst).alias("dst"),
                    F.col(weight).cast("long").alias("w"),
                )
                .groupBy("src", "dst")
                .agg(F.sum("w").alias("w"))
            )
        self.e = e.persist(StorageLevel.MEMORY_AND_DISK)
        self._e_deg: DataFrame | None = None
        self._m: int | None = None
        self._edge_pull: dict[int, tuple | None] = {}
        self._drv = None  # (labels, outdeg_v, dangling_v) when pulled
        self._nodes_base: DataFrame | None = None
        self._nodes_owned = False
        if reuse_nodes is not None and (reuse_nodes.src, reuse_nodes.dst) != (
            src,
            dst,
        ):
            raise ValueError(
                "GraphAux(reuse_nodes=...): column mapping differs"
            )

        # Edge-resident decoration (round 10): when the canonical edge
        # count fits the driver gate, ONE count + ONE Arrow pull replace
        # the whole Spark-side decoration — node set, out-degrees,
        # dangling flags, n, and the weighted-input validation all
        # derive from the pulled arrays (exact int64 sums, identical
        # values by construction). The DataFrame forms (nodes_base,
        # deg) stay available lazily for the broadcast/partitioned
        # tiers; above the gate the original build runs unchanged.
        if driver_edges is None:
            driver_edges = DRIVER_EDGES_DEFAULT
        pulled = None
        if driver_edges > 0:
            if (
                seed_pull is not None
                and seed_edge_count is not None
                and seed_edge_count <= driver_edges
            ):
                # Caller-provided canonical edge arrays (src, dst,
                # w|None) — e.g. ONE raw pair pull serving the distinct
                # AND the w-summed decorations driver-side (np.unique
                # rows + counts reproduce the Spark distinct / groupBy
                # sums exactly: integer, order-free). The caller
                # guarantees the arrays ARE the canonical form of
                # ``edges`` (the assume_distinct-style contract); the
                # weighted validation below still runs on the arrays.
                if weight is not None:
                    import numpy as np

                    w_arr = seed_pull[2]
                    # (w != w) catches NaN — how a NULL summed weight
                    # arrives through a pandas/Arrow pull as float64 —
                    # mirroring edge_pull's isna() check exactly
                    wv = None if w_arr is None else np.asarray(w_arr)
                    if wv is None or bool(
                        ((wv != wv) | (wv <= 0)).any()
                    ):
                        self.e.unpersist()
                        raise ValueError(
                            "pagerank weights must be positive integers;"
                            " found a (src, dst) pair whose summed"
                            " weight is NULL or <= 0"
                        )
                self._m = int(seed_edge_count)
                self._edge_pull[driver_edges] = seed_pull
                pulled = seed_pull
            else:
                try:
                    pulled = self.edge_pull(driver_edges)
                except ValueError:
                    self.e.unpersist()
                    raise
        if weight is not None and pulled is None:
            # NULL/zero/negative summed weights would make
            # '(rank*w) div W' silently drop mass in Spark and raise
            # div-by-zero in the SQL twin; fractional inputs would
            # truncate silently through the long cast — reject all of
            # them up front (one fully-parallel filtered count over the
            # persisted edges; limit(1).count() would degrade into the
            # CollectLimit sequential scale-up ramp in the happy path)
            bad = self.e.where(
                F.col("w").isNull() | (F.col("w") <= 0)
            ).count()
            if bad:
                self.e.unpersist()
                raise ValueError(
                    "pagerank weights must be positive integers; found a "
                    "(src, dst) pair whose summed weight is NULL or <= 0"
                )
        deg_agg = (
            F.count(F.lit(1)).alias("outdeg")
            if weight is None
            else F.sum("w").alias("outdeg")
        )
        self.deg = self.e.groupBy("src").agg(deg_agg)
        if pulled is not None:
            import numpy as np

            labels = np.unique(np.concatenate([pulled[0], pulled[1]]))
            outdeg_v = np.zeros(len(labels), dtype="int64")
            if len(labels):
                si = _label_codes(labels)(pulled[0])
                np.add.at(
                    outdeg_v, si, 1 if weight is None else pulled[2]
                )
            self._drv = (labels, outdeg_v, outdeg_v == 0)
            self.n = int(len(labels))
        elif reuse_nodes is not None:
            # Borrow another aux's persisted node relation — valid
            # ONLY when the caller can PROVE both auxes decorate the
            # same (src, dst) pair set (e.g. the weighted w-summed
            # form vs the distinct form of one pair relation: weights
            # change degrees, never the node set or the dangling
            # flag). The borrower never unpersists what it borrowed.
            self._nodes_base = reuse_nodes.nodes_base
            self.n = reuse_nodes.n
        else:
            # The dangling-node test (no out-edges) is static —
            # precompute it as a node flag instead of an anti-join
            # against deg every round.
            self._nodes_base = (
                self.e.select(F.col("src").alias("node"))
                .union(self.e.select(F.col("dst").alias("node")))
                .distinct()
                .join(
                    self.deg.select(
                        F.col("src").alias("node"),
                        F.lit(True).alias("__has_out"),
                    ),
                    "node",
                    "left",
                )
                .select("node", F.col("__has_out").isNull().alias("__dangling"))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            self.n = self._nodes_base.count()
            self._nodes_owned = True
        self.small = self.n <= broadcast_nodes

    @property
    def nodes_base(self) -> DataFrame:
        """(node, __dangling) relation. Under the edge-resident
        decoration it is built lazily as a LOCAL relation from the
        driver arrays (no shuffle) — only the broadcast/partitioned
        tiers ever evaluate it."""
        if self._nodes_base is None:
            import pandas as pd
            from pyspark.sql import types as T

            labels, _, dangling = self._drv
            self._nodes_base = self.e.sparkSession.createDataFrame(
                pd.DataFrame({"node": labels, "__dangling": dangling}),
                schema=T.StructType(
                    [
                        T.StructField(
                            "node", _node_type(self.e), True
                        ),
                        T.StructField("__dangling", T.BooleanType()),
                    ]
                ),
            )
        return self._nodes_base

    def edge_pull(self, max_edges: int):
        """Bounded driver pull of the canonical edge relation for the
        edge-resident micro tier: numpy arrays (src, dst, w|None) when
        the edge count is <= ``max_edges``, else None. The probe is
        one fully-parallel count over the persisted edges (memoized),
        and the result is memoized per threshold so a shared aux pays
        the pull once for its whole query family."""
        if max_edges in self._edge_pull:
            return self._edge_pull[max_edges]
        # an already-pulled edge list satisfies any threshold the count
        # also fits — never pull twice for different gates
        if self._m is not None and self._m <= max_edges:
            for v in self._edge_pull.values():
                if v is not None:
                    self._edge_pull[max_edges] = v
                    return v
        # count-then-collect, NOT limit(max+1).collect(): an unreached
        # CollectLimit runs the scale-up ramp (1, 4, 16, ... partitions
        # as sequential jobs) over the whole relation — the count is
        # one fully-parallel job over the persisted edges and the
        # collect only happens once the bound is proven
        if self._m is None:
            self._m = self.e.count()
        if self._m > max_edges:
            out = None
            self._edge_pull[max_edges] = out
            return out
        # Arrow transfer, not collect(): a Row-object collect of ~1M
        # edges costs seconds in deserialization alone; toPandas rides
        # the session's Arrow path and lands directly in numpy arrays
        pdf = self.e.toPandas()
        if bool(pdf["src"].isna().any()) or bool(pdf["dst"].isna().any()):
            # NULL endpoints: Arrow converts a null-bearing integral
            # column to float64 (NaN labels, silent > 2^53 precision
            # loss) — only the Spark tiers handle NULL as a node value,
            # so the pull declines and every caller falls through
            out = None
        elif self.weight is None:
            out = (pdf["src"].to_numpy(), pdf["dst"].to_numpy(), None)
        else:
            w_raw = pdf["w"]
            if bool(w_raw.isna().any()) or bool((w_raw <= 0).any()):
                # same contract as the Spark-side validation in
                # __init__ — the pull is the validation pass here
                raise ValueError(
                    "pagerank weights must be positive integers; found "
                    "a (src, dst) pair whose summed weight is NULL or "
                    "<= 0"
                )
            out = (
                pdf["src"].to_numpy(),
                pdf["dst"].to_numpy(),
                w_raw.to_numpy().astype("int64", copy=False),
            )
        self._edge_pull[max_edges] = out
        return out

    @property
    def e_deg(self) -> DataFrame:
        """Out-degrees pre-joined into the edge relation ONCE; the
        persisted copy is hash-partitioned by src (the join's output
        partitioning), so every round's (edges x ranks) join elides
        the edge-side exchange — only the small rank vector is
        (re)partitioned, and even that exchange is elided when the
        previous round's output partitioning (node) survives the
        localCheckpoint. Small-graph mode broadcasts the degree side
        instead: no exchange at all, the cached copy keeps e's
        partitioning."""
        if self._e_deg is None:
            self._e_deg = self.e.join(
                F.broadcast(self.deg) if self.small else self.deg, "src"
            ).persist(StorageLevel.MEMORY_AND_DISK)
        return self._e_deg

    def unpersist(self) -> None:
        self.e.unpersist()
        if self._nodes_owned:
            self._nodes_base.unpersist()
        if self._e_deg is not None:
            self._e_deg.unpersist()


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping_pct: int = 85,
    scale: int = 10**15,
    sources: list | DataFrame | None = None,
    until_converged: bool = False,
    max_iter: int = 100,
    weight: str | None = None,
    assume_distinct: bool = False,
    broadcast_nodes: int = 500_000,
    aux: "GraphAux | None" = None,
    driver_nodes: int = DRIVER_NODES_DEFAULT,
    driver_edges: int = DRIVER_EDGES_DEFAULT,
) -> DataFrame:
    """Fixed-point integer PageRank over a directed edge list — uniform
    or personalized, fixed-iteration or run-to-fixpoint.

    Returns (node, rank_fp) for every node appearing in ``edges``,
    where ``rank_fp`` is the PageRank mass scaled by ``scale`` and
    truncated to int64 at every division. The fixed-point formulation
    is deliberate: float PageRank sums per-edge contributions, and a
    distributed double sum is ordering-dependent — results would vary
    run to run and engine to engine. Integer sums are exact and
    associative, so the result is bit-stable on any partitioning and
    reproducible in plain ANSI SQL (the oracle unrolls the same
    iterations). The truncation drops at most 1/scale of mass per
    division; with scale=1e15 the ranking is unaffected for any
    realistic graph (ranks agree with float PageRank to ~9 decimals).

    Semantics per iteration (all integer arithmetic, `div` =
    truncating division; S = restart set, N or |S| its size):

        teleport(v) = v in S ? ((100-damping_pct)*scale) div (100*|S|) : 0
        dangling(v) = v in S ? (sum rank over outdeg-0 nodes) div |S| : 0
        rank'(v)    = teleport(v)
                      + (damping_pct * (sum_{u->v} rank(u) div outdeg(u)
                                        + dangling(v))) div 100

    ``sources`` (personalized PageRank, Page et al. 1999 §6 /
    Haveliwala 2002): restrict restart AND dangling redistribution to
    a seed set (list of ids or a one-column DataFrame) — the
    seed-expansion primitive for corpus curation: rank domains by
    random-walk proximity to a trusted allowlist. ``sources=None`` is
    classic uniform PageRank.

    ``weight``: an edge-weight column — a node's rank then splits
    across its out-edges proportionally (contribution = (rank * w) div
    W_u, W_u the node's total out-weight; the product runs in
    decimal(38,0) since rank * w overflows int64 past w ~ 9e3, and the
    truncating decimal `div` matches DuckDB's HUGEINT `//`). Duplicate
    (src, dst) rows pre-aggregate by summed weight; ``weight=None`` is
    the classic unweighted walk over DISTINCT edges.

    ``until_converged=True``: iterate until the integer rank vector
    reaches its EXACT fixpoint (fixed-point arithmetic converges
    exactly, not asymptotically — successive vectors are compared by
    content digest, one cheap agg per round), bounded by ``max_iter``;
    ``iterations`` is ignored in this mode. Each round then
    materializes eagerly (digest is an action) — same discipline as
    `connected_components`.

    Scale design: each iteration is one (edges x ranks) equi-join on
    ``src`` (narrow key, partition-parallel), one groupBy(dst) integer
    sum with map-side partial aggregation, and one scalar aggregate for
    the dangling mass (broadcast back as a 1-row cross join — never a
    driver collect of node data). Lineage is truncated per round with a
    lazy localCheckpoint. The static relations are shuffled ONCE, not
    per round: out-degrees are pre-joined into the persisted edge
    relation (hash-partitioned by ``src``, so every round's join elides
    the edge-side exchange — only the rank vector moves), the dangling
    test is a precomputed node flag (no per-round anti-join), and the
    rank vector re-enters each round already partitioned by ``node``
    (localCheckpoint preserves output partitioning) — per round exactly
    ONE shuffle: the contribution groupBy(dst). Overflow headroom:
    damping_pct * (in_sum + dangling) <= 100 * scale = 1e17 < int64.

    ``driver_nodes``: MICRO-GRAPH driver-resident mode (round 10) —
    at or under this node count (default 64k, see
    DRIVER_NODES_DEFAULT) the rank vector additionally stays on the
    driver between rounds: broadcast mode already collects it to the
    driver every round to build the round's broadcast, so holding it
    there removes the second driver round-trip (the contribution
    broadcast), the per-round global window, and the per-round
    localCheckpoint — each round is exactly ONE job: the (edges x
    broadcast ranks) contribution aggregate, collected bounded by the
    gate (<= driver_nodes rows). The per-node update (teleport +
    damping + dangling redistribution) applies the IDENTICAL integer
    expressions in int64 numpy (all values non-negative and <=
    100*scale = 1e17, so `//` == truncating div, no overflow); edges
    never leave the executors. Results and oracle hashes are
    unchanged by construction — pinned by
    test_broadcast_mode_equals_partitioned_mode. Pass 0 to force the
    broadcast/partitioned strategies.

    ``driver_edges``: EDGE-RESIDENT micro tier (round 10, second
    pass) — inside micro mode, when the canonical edge count is also
    at or under this bound (default DRIVER_EDGES_DEFAULT = 4M, probed
    boundedly and memoized on the aux), the edge list is pulled to the
    driver once and every round runs fully in-process: ZERO jobs per
    round. Unweighted rounds use int64 numpy (`np.add.at` is exact
    integer addition; per-node in-sums are bounded by the total mass
    ~ scale, far under int64); weighted rounds vectorize to int64 when
    scale * max(w) provably fits, exact Python ints otherwise — the
    decimal(38,0) engine arithmetic either way. Edges with NULL
    endpoints decline the pull (the Spark tiers treat NULL as a node
    value). Pass 0 to keep the one-job-per-round micro loop.

    ``broadcast_nodes``: SMALL-GRAPH broadcast mode — when the node
    count (already materialized for the teleport constants) is at or
    under this threshold, per-round shuffles of the graph are pure
    fixed latency, so rounds run as broadcast hash joins instead: the
    rank vector (and each round's tiny contribution relation) is
    broadcast, the degree pre-join is broadcast (no repartitioned edge
    copy is materialized), and only the contribution groupBy shuffles.
    The dangling total additionally FOLDS into the round's one action
    as a global-window conditional sum over the (<= broadcast_nodes-
    row) rank relation — no separate per-round scalar-total broadcast
    job; the partitioned path keeps the two-aggregate form (a global
    window would single-task a large rank vector). Arithmetic is
    untouched — results (and oracle hashes) are identical by
    construction; this is a physical-strategy switch only. At the
    500k default the broadcast rank vector is ~10 MB — the standard
    executor broadcast budget; pass 0 to force the partitioned path.

    The reference has no graph operator; this serves the web-corpus
    curation story (rank domains/hosts by link structure before
    sampling training data, as in Common-Crawl-derived pipelines).
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    if not (0 <= damping_pct <= 100):
        raise ValueError("damping_pct must be in [0, 100]")
    owned = aux is None
    if owned:
        aux = GraphAux(
            edges, src=src, dst=dst, weight=weight,
            assume_distinct=assume_distinct,
            broadcast_nodes=broadcast_nodes,
            driver_edges=driver_edges,
        )
    elif (
        aux.edges_ref is not edges
        or (aux.src, aux.dst) != (src, dst)
        or aux.weight != weight
        or aux.broadcast_nodes != broadcast_nodes
        # an aux built with assume_distinct=True silently skips the
        # dedup a per-call assume_distinct=False build would perform —
        # the dedup decision must match (weighted auxes always
        # pre-aggregate, so the flag is moot there)
        or (weight is None and aux.assume_distinct != assume_distinct)
    ):
        raise ValueError(
            "pagerank: aux was built over a different edge relation "
            "(object identity), column mapping, weight column, "
            "assume_distinct decision, or broadcast_nodes threshold "
            "than this call requests"
        )
    n = aux.n
    if n == 0:
        if owned:
            aux.unpersist()
        return aux.nodes_base.select(
            F.col("node"), F.lit(0).cast("long").alias("rank_fp")
        )
    small = aux.small
    micro = small and n <= driver_nodes
    # Fully driver-resident decoration (round 10): in micro mode, when
    # the aux pulled its edges, the seed flags too derive driver-side —
    # no nodes DataFrame, no __is_src count job, no per-call persist.
    pull = (
        aux.edge_pull(driver_edges) if (micro and driver_edges > 0) else None
    )
    drv = aux._drv if pull is not None else None
    release_nodes = False
    nodes = None
    if drv is not None:
        import numpy as np

        if sources is None:
            is_src_v = np.ones(n, dtype=bool)
        elif isinstance(sources, DataFrame):
            svals = (
                sources.select(F.col(sources.columns[0]).alias("node"))
                .distinct()
                .toPandas()["node"]
                .to_numpy()
            )
            is_src_v = np.isin(drv[0], svals)
        else:
            is_src_v = np.isin(drv[0], np.asarray(list(sources)))
        ns = int(is_src_v.sum())
    else:
        if sources is None:
            is_src = F.lit(True)
            nodes = aux.nodes_base.withColumn("__is_src", is_src)
        elif isinstance(sources, DataFrame):
            s = sources.select(
                F.col(sources.columns[0]).alias("node")
            ).distinct()
            nodes = aux.nodes_base.join(
                F.broadcast(s.withColumn("__is_src", F.lit(True))),
                "node",
                "left",
            ).withColumn("__is_src", F.coalesce("__is_src", F.lit(False)))
        else:
            nodes = aux.nodes_base.withColumn(
                "__is_src", F.col("node").isin(list(sources))
            )
        # canonical column order; for literal/None sources, nodes is a
        # narrow projection over the PERSISTED nodes_base, so per-round
        # reads hit cache and keep its partitioning
        nodes = nodes.select("node", "__is_src", "__dangling")
        if isinstance(sources, DataFrame):
            # a DataFrame seed set adds a join whose seed subtree
            # (distinct + broadcast build) would otherwise re-evaluate
            # on EVERY round's read — persist the decorated node
            # relation for this call (released below on every exit
            # path)
            nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
            release_nodes = True
    # micro mode defers the degree-pre-joined edge copy: unweighted
    # micro never needs it (the degree division folds driver-side per
    # node) and weighted micro only needs it on the spark fallback
    # path (edge-resident rounds never touch it) — it is accessed
    # lazily via aux.e_deg there, so the build/persist is skipped
    # whenever no round actually joins it
    e_deg = aux.e_deg if not micro else None
    if drv is None:
        ns = n if sources is None else nodes.where("__is_src").count()
    if ns == 0:
        if release_nodes:
            nodes.unpersist()
        if owned:
            aux.unpersist()
        raise ValueError("no source node appears in the graph")
    teleport = ((100 - damping_pct) * scale) // (100 * ns)
    if nodes is not None:
        init = F.when(F.col("__is_src"), F.lit(scale // ns)).otherwise(
            F.lit(0)
        )
        ranks = nodes.select(
            "node", "__is_src", "__dangling", init.cast("long").alias("rank_fp")
        )

    new_rank = F.expr(
        f"(CASE WHEN __is_src THEN {teleport}L ELSE 0L END)"
        f" + ({damping_pct}L * (coalesce(in_sum, 0L)"
        f" + (CASE WHEN __is_src THEN d_each ELSE 0L END)))"
        f" div 100"
    ).cast("long")
    share = (
        "rank_fp div outdeg"
        if weight is None
        else "CAST((CAST(rank_fp AS DECIMAL(38,0)) * w) div outdeg AS BIGINT)"
    )

    if micro:
        # micro-graph mode: driver-resident rank vector (see docstring)
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        spark_s = aux.e.sparkSession
        if drv is not None:
            # decoration already driver-resident: no collect at all
            labels, dangling_v = drv[0], drv[2]
            pos = None  # spark fallbacks never run when drv is set
            node_field = T.StructField(
                "node", _node_type(aux.e), True
            )
        else:
            node_rows = nodes.collect()  # bounded: n <= driver_nodes
            labels = [r["node"] for r in node_rows]
            pos = {v: i for i, v in enumerate(labels)}
            is_src_v = np.array([bool(r["__is_src"]) for r in node_rows])
            dangling_v = np.array([bool(r["__dangling"]) for r in node_rows])
            node_field = nodes.schema["node"]
        ranks_v = np.where(is_src_v, scale // ns, 0).astype("int64")
        out_schema = T.StructType(
            [node_field, T.StructField("rank_fp", T.LongType())]
        )

        def _rank_df(vec) -> DataFrame:
            return spark_s.createDataFrame(
                pd.DataFrame({"node": labels, "rank_fp": vec}),
                schema=out_schema,
            )

        if weight is None:
            # the unweighted per-edge share `rank_fp div outdeg` is a
            # per-SOURCE-node constant c_u — compute it driver-side
            # from the (bounded, <= n-row) degree relation and ship
            # ONLY (node, c): the degree-pre-joined e_deg copy is
            # never built, and each round joins the raw cached edge
            # relation against a narrower broadcast. Per-edge values
            # identical, so the executor-side integer sum is too.
            if drv is not None:
                outdeg_v = drv[1]
            else:
                outdeg = {
                    r["src"]: int(r["outdeg"]) for r in aux.deg.collect()
                }
                outdeg_v = np.array(
                    [outdeg.get(v, 0) for v in labels], dtype="int64"
                )
            has_out = outdeg_v > 0
            if pull is not None:
                # edge-resident tier: the per-dst integer sum of the
                # identical per-edge shares, in-process — np.add.at is
                # exact int64 addition and each in-sum is bounded by
                # the total mass (~ scale), so no overflow is possible
                code = _label_codes(labels)
                src_i = code(pull[0])
                dst_i = code(pull[1])

                def _in_sum(vec):
                    c = np.zeros(n, dtype="int64")
                    np.floor_divide(vec, outdeg_v, out=c, where=has_out)
                    s = np.zeros(n, dtype="int64")
                    np.add.at(s, dst_i, c[src_i])
                    return s
            else:
                out_labels = [v for v, h in zip(labels, has_out) if h]
                c_schema = T.StructType(
                    [node_field, T.StructField("c", T.LongType())]
                )

                def _in_sum(vec):
                    c_df = spark_s.createDataFrame(
                        pd.DataFrame(
                            {
                                "node": out_labels,
                                "c": vec[has_out] // outdeg_v[has_out],
                            }
                        ),
                        schema=c_schema,
                    )
                    rows = (
                        aux.e.join(
                            F.broadcast(c_df), aux.e["src"] == c_df["node"]
                        )
                        .groupBy(F.col("dst").alias("node"))
                        .agg(F.sum("c").alias("in_sum"))
                        .collect()  # bounded: one row per in-linked node <= n
                    )
                    s = np.zeros(n, dtype="int64")
                    for r in rows:
                        # a NULL node never receives its in-sum in the
                        # Spark tiers (the output join on "node" misses
                        # NULL keys) — mirror that here for tier parity
                        if r["node"] is not None:
                            s[pos[r["node"]]] = r["in_sum"]
                    return s
        elif pull is not None:
            # edge-resident weighted tier: each share (rank * w) div W.
            # Every rank is bounded by the total mass, which the
            # truncating integer recurrence keeps <= scale by induction
            # (teleport total <= (100-d)%*scale, distributed shares sum
            # to <= the distributing rank) — so when scale * max(w)
            # provably fits int64, the whole round is vectorized int64
            # numpy (floor-div on non-negatives == SQL truncating div);
            # otherwise exact Python ints reproduce the decimal(38,0)
            # engine arithmetic.
            code = _label_codes(labels)
            src_i = code(pull[0])
            dst_i = code(pull[1])
            w_arr = pull[2]
            if drv is not None:
                W_by_node = drv[1]
            else:
                W_by_node = np.zeros(n, dtype="int64")
                for r in aux.deg.collect():  # bounded: <= n rows
                    W_by_node[pos[r["src"]]] = int(r["outdeg"])
            W_e = W_by_node[src_i]
            w_max = int(w_arr.max()) if len(w_arr) else 0
            if scale * w_max <= 2**63 - 1:

                def _in_sum(vec):
                    c = (vec[src_i] * w_arr) // W_e
                    s = np.zeros(n, dtype="int64")
                    np.add.at(s, dst_i, c)
                    return s

            else:
                ew = [
                    (int(si), int(di), int(w_), int(W_))
                    for si, di, w_, W_ in zip(src_i, dst_i, w_arr, W_e)
                ]

                def _in_sum(vec):
                    s = [0] * n
                    for si, di, w_, W_u in ew:
                        s[di] += (int(vec[si]) * w_) // W_u
                    return np.array(s, dtype="int64")
        else:

            def _in_sum(vec):
                e_deg = aux.e_deg  # lazy: built on first fallback round
                rank_df = _rank_df(vec)
                rows = (
                    e_deg.join(
                        F.broadcast(rank_df), e_deg["src"] == rank_df["node"]
                    )
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum(F.expr(share)).alias("in_sum"))
                    .collect()  # bounded: one row per in-linked node <= n
                )
                s = np.zeros(n, dtype="int64")
                for r in rows:
                    # NULL node: see the unweighted fallback above
                    if r["node"] is not None:
                        s[pos[r["node"]]] = r["in_sum"]
                return s

        def _round_micro(vec):
            in_sum = _in_sum(vec)
            # same integer expressions as new_rank, element-wise: all
            # terms non-negative, damping_pct*(in_sum+d_each) <=
            # 100*scale = 1e17 < int64, numpy // == truncating div
            d_each = int(vec[dangling_v].sum()) // ns
            add = in_sum + np.where(is_src_v, d_each, 0)
            return (
                np.where(is_src_v, teleport, 0) + (damping_pct * add) // 100
            ).astype("int64")

        rounds = 0
        if until_converged:
            # exact integer fixpoint — direct vector comparison is the
            # digest check without the digest job
            for rounds in range(1, max_iter + 1):
                new_v = _round_micro(ranks_v)
                stop = bool(np.array_equal(new_v, ranks_v))
                ranks_v = new_v
                if stop:
                    break
        else:
            rounds = iterations
            for _ in range(iterations):
                ranks_v = _round_micro(ranks_v)
        out = _rank_df(ranks_v)
        out._svoe_pr_rounds = rounds
        if release_nodes:
            nodes.unpersist()
        if owned:
            aux.unpersist()
        return out

    def _round(ranks: DataFrame) -> DataFrame:
        rank_rel = ranks.select("node", "rank_fp")
        contrib = (
            e_deg.join(
                F.broadcast(rank_rel) if small else rank_rel,
                e_deg["src"] == F.col("node"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr(share)).alias("in_sum"))
        )
        if small:
            # fold the dangling total into the round's one action: a
            # global window over the (cached, <= broadcast_nodes-row)
            # rank relation computes d_each in the SAME pass that
            # feeds the output join — no separate scalar-total
            # broadcast job per round. ranks carries every node, so it
            # replaces nodes as the join base; the single-partition
            # window exchange is bounded by the small-mode gate. Same
            # integer expression -> bit-identical ranks.
            rk = ranks.withColumn(
                "d_each",
                F.expr(
                    f"coalesce(sum(CASE WHEN __dangling THEN rank_fp END)"
                    f" OVER (), 0L) div {ns}"
                ),
            )
            return (
                rk.join(F.broadcast(contrib), "node", "left")
                .select(
                    "node", "__is_src", "__dangling",
                    new_rank.alias("rank_fp"),
                )
                .localCheckpoint(eager=False)
            )
        dangling = ranks.where(F.col("__dangling")).agg(
            F.expr(f"coalesce(sum(rank_fp), 0L) div {ns}").alias("d_each")
        )
        return (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "__is_src",
                "__dangling",
                new_rank.alias("rank_fp"),
            )
            .localCheckpoint(eager=False)
        )

    rounds = 0
    if until_converged:
        # fixed-point arithmetic reaches an exact fixpoint in practice
        # (the damped map is a contraction; truncation can in theory
        # cycle with period > 1, which the digest would not detect —
        # max_iter bounds that pathological case)
        prev_digest = _digest(ranks, "node", "rank_fp")
        for rounds in range(1, max_iter + 1):
            ranks = _round(ranks)
            d = _digest(ranks, "node", "rank_fp")  # also materializes
            if d == prev_digest:
                break
            prev_digest = d
    else:
        rounds = iterations  # fixed mode runs exactly this many
        for _ in range(iterations):
            ranks = _round(ranks)
        # Materialize the final (lazily local-checkpointed) round before
        # releasing the inputs its lineage still needs; localCheckpoint
        # both stores the result and truncates the N-round plan.
        ranks.count()
    out = ranks.drop("__is_src", "__dangling")
    out._svoe_pr_rounds = rounds
    if release_nodes:
        nodes.unpersist()
    if owned:
        aux.unpersist()
    return out


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    scale: int = 10**15,
    assume_distinct: bool = False,
    until_converged: bool = False,
    max_iter: int = 100,
    broadcast_nodes: int = 500_000,
    aux: "GraphAux | None" = None,
    driver_nodes: int = DRIVER_NODES_DEFAULT,
    driver_edges: int = DRIVER_EDGES_DEFAULT,
) -> DataFrame:
    """Fixed-point integer HITS (Kleinberg 1999): mutually-recursive
    hub and authority scores over a directed edge list — the natural
    ranking for BIPARTITE link structures (a supplier is a good hub if
    it serves high-authority customers, and vice versa) where
    PageRank's random surfer is less meaningful.

    Returns (node, hub_fp, auth_fp), both scaled so each score vector
    sums to ~``scale``. Per iteration (the L1-normalized power method):

        auth_raw(v) = sum_{u->v} hub(u)          -- exact decimal sum
        auth(v)     = (auth_raw(v) * scale) div sum(auth_raw)
        hub_raw(u)  = sum_{u->v} auth(v)
        hub(u)      = (hub_raw(u) * scale) div sum(hub_raw)

    All arithmetic is exact: the raw sums accumulate in decimal(38,0)
    (per-node raw <= scale * max_degree, far under 1e38; int64 would
    overflow at degree ~9e3), and the rescale is one truncating
    integral division — Spark's decimal `div` and DuckDB's HUGEINT
    `//` produce identical quotients, so the oracle unrolls the same
    recurrence and hash-matches. L1 normalization (not the textbook
    L2) keeps the arithmetic rational; the FIXED POINT of the power
    method is identical up to scaling (eigenvectors of E^T E don't
    care which norm rescales them), and every engine reproduces the
    same integer trajectory.

    ``until_converged=True``: iterate until both integer score vectors
    reach their EXACT fixpoint (content digests compared per full
    iteration — the digest action doubles as the round's
    materialization), bounded by ``max_iter``; ``iterations`` is then
    ignored. The round count is exposed as ``_svoe_hits_rounds``.

    Scale shape: each iteration is two edge-relation equi-joins + two
    map-side-combined decimal sums + two scalar totals (folded into
    the half-step's own relation in broadcast mode, separate broadcast
    aggregates in partitioned mode — see below).
    Large graphs persist the edge relation TWICE — one copy
    hash-partitioned by src, one by dst — so each half-step's join
    elides the edge-side exchange and only the score vector moves
    (which itself re-enters partitioned by node, so per half-step
    exactly ONE shuffle: the contribution groupBy); the undecorated
    edge relation is released once the copies and the node set are
    materialized (one cached copy per partitioning, not three).
    ``broadcast_nodes``: at or below this node count (known before any
    copy is built) the repartitioned copies are pure fixed latency —
    rounds run as broadcast hash joins over the single cached edge
    relation (score vector and per-round contribution relation
    broadcast), identical arithmetic and hashes by construction; pass
    0 to force the partitioned path. ``driver_nodes`` (round 10): at
    or below this count the score vectors additionally stay
    driver-resident between half-steps — one job per half-step, exact
    Python-int L1 rescale, identical trajectories (see
    DRIVER_NODES_DEFAULT); pass 0 to force the DataFrame loop. In this mode the L1 total also
    FOLDS into the contribution relation as a global-window sum (round
    9): the separate scalar-total broadcast re-evaluated the whole
    unpersisted edge-join subtree, so each half-step paid the join
    twice; the partitioned path keeps the two-aggregate form (a global
    window would single-task a large score vector). Lineage truncated
    per half-step with lazy localCheckpoints. (A round-8 experiment
    folding the L1 total into the contribution AGGREGATE via rollup +
    checkpoint looked free but made run-to-fixpoint exponentially
    slower per round — the checkpoint/rollup interaction defeats
    per-round lineage truncation; the window fold rides a projection
    instead and leaves the aggregate alone — fixpoint tests pin it.)
    ``driver_edges`` (round 10, second pass): inside micro mode, when
    the edge count is also at or under this bound (bounded probe,
    memoized on the aux), the edge list is pulled once and every
    half-step runs in-process — zero jobs per round, exact integer
    sums (int64 numpy when scale * max_degree provably fits, exact
    Python ints otherwise), identical trajectories; pass 0 to keep
    the one-job-per-half-step loop.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    owned = aux is None
    if owned:
        aux = GraphAux(
            edges, src=src, dst=dst,
            assume_distinct=assume_distinct,
            broadcast_nodes=broadcast_nodes,
            driver_edges=driver_edges,
        )
    elif (
        aux.edges_ref is not edges
        or (aux.src, aux.dst) != (src, dst)
        or aux.weight is not None
        or aux.broadcast_nodes != broadcast_nodes
        # same dedup-decision guard as pagerank's (ADVICE r9)
        or aux.assume_distinct != assume_distinct
    ):
        raise ValueError(
            "hits: aux must be unweighted, built over this very edge "
            "relation (object identity) and column mapping, with the "
            "same assume_distinct decision and broadcast_nodes "
            "threshold as this call"
        )
    e = aux.e
    n = aux.n
    if n == 0:
        if owned:
            aux.unpersist()
        return aux.nodes_base.select(
            "node",
            F.lit(0).cast("long").alias("hub_fp"),
            F.lit(0).cast("long").alias("auth_fp"),
        )
    small = aux.small
    if small and n <= driver_nodes:
        # micro-graph mode: driver-resident hub/auth vectors — the
        # pagerank discipline (see DRIVER_NODES_DEFAULT): per
        # half-step ONE job (edges x broadcast scores -> decimal
        # contribution aggregate, collected bounded by the gate); the
        # L1 rescale runs in exact arbitrary-precision Python ints
        # (raw * scale overflows int64 but the decimal(38,0) engine
        # path never rounded either), token-identical to `rescale`.
        import pandas as pd
        from pyspark.sql import types as T

        spark_s = e.sparkSession
        pull = aux.edge_pull(driver_edges) if driver_edges > 0 else None
        if pull is not None and aux._drv is not None:
            # decoration already driver-resident: no collect at all
            labels = aux._drv[0]
            pos = None  # spark fallback never runs when pull is set
        else:
            # narrow projection over the PERSISTED node relation —
            # (__dangling is pagerank-only decoration)
            labels = [
                r["node"] for r in aux.nodes_base.select("node").collect()
            ]
            pos = {v: i for i, v in enumerate(labels)}
        node_field = T.StructField(
            "node", _node_type(e), True
        )

        def _score_df(vec, col: str) -> DataFrame:
            return spark_s.createDataFrame(
                pd.DataFrame({"node": labels, col: vec}),
                schema=T.StructType(
                    [node_field, T.StructField(col, T.LongType())]
                ),
            )

        if pull is not None:
            # edge-resident tier: the raw decimal sums are plain sums
            # of non-negative scores (each <= scale after rescale), so
            # a per-node raw is bounded by scale * degree — when that
            # provably fits int64, np.add.at (exact integer addition)
            # runs the half-step; otherwise exact Python ints do. The
            # L1 total and the rescale always run in Python ints
            # (raw * scale overflows int64, exactly as the
            # decimal(38,0) engine path anticipated).
            import numpy as np

            code = _label_codes(labels)
            src_i = code(pull[0])
            dst_i = code(pull[1])
            max_deg = 0
            if len(src_i):
                max_deg = int(
                    max(
                        np.bincount(src_i, minlength=n).max(),
                        np.bincount(dst_i, minlength=n).max(),
                    )
                )
            int64_safe = max_deg * scale <= 2**63 - 1
            idx = {"src": src_i, "dst": dst_i}

            def _half_micro(vec, score_col: str, join_on: str, group_as: str):
                frm, to = idx[join_on], idx[group_as]
                if int64_safe:
                    v_np = np.asarray(vec, dtype="int64")
                    raw_np = np.zeros(n, dtype="int64")
                    np.add.at(raw_np, to, v_np[frm])
                    raw = [int(x) for x in raw_np]
                else:
                    raw = [0] * n
                    for a, b in zip(frm, to):
                        raw[b] += vec[a]
                t = sum(raw)
                if t <= 0:
                    return [0] * n
                # (raw * scale) div t on non-negative ints: // == div
                return [(v * scale) // t for v in raw]

        else:

            def _half_micro(vec, score_col: str, join_on: str, group_as: str):
                sdf = _score_df(vec, score_col)
                rows = (
                    e.join(F.broadcast(sdf), e[join_on] == sdf["node"])
                    .groupBy(F.col(group_as).alias("node"))
                    .agg(
                        F.sum(
                            F.col(score_col).cast("decimal(38,0)")
                        ).alias("__raw")
                    )
                    .collect()  # bounded: one row per contributed node <= n
                )
                raw = [0] * n
                for r in rows:
                    # NULL node: the Spark tiers' join on "node" misses
                    # NULL keys — mirror that for tier parity
                    if r["node"] is None:
                        continue
                    raw[pos[r["node"]]] = int(r["__raw"])
                t = sum(raw)
                if t <= 0:
                    return [0] * n
                # (raw * scale) div t on non-negative ints: // == div
                return [(v * scale) // t for v in raw]

        hub_v = [scale // n] * n
        auth_v = [0] * n
        rounds = 0
        if until_converged:
            for rounds in range(1, max_iter + 1):
                auth_new = _half_micro(hub_v, "hub_fp", "src", "dst")
                hub_new = _half_micro(auth_new, "auth_fp", "dst", "src")
                stop = hub_new == hub_v and auth_new == auth_v
                hub_v, auth_v = hub_new, auth_new
                if stop:
                    break
        else:
            rounds = iterations
            for _ in range(iterations):
                auth_v = _half_micro(hub_v, "hub_fp", "src", "dst")
                hub_v = _half_micro(auth_v, "auth_fp", "dst", "src")
        out = spark_s.createDataFrame(
            pd.DataFrame(
                {"node": labels, "hub_fp": hub_v, "auth_fp": auth_v}
            ),
            schema=T.StructType(
                [
                    node_field,
                    T.StructField("hub_fp", T.LongType()),
                    T.StructField("auth_fp", T.LongType()),
                ]
            ),
        )
        out._svoe_hits_rounds = rounds
        if owned:
            aux.unpersist()
        return out
    # narrow projection over the node relation — per-round reads hit
    # cache (__dangling is pagerank-only decoration)
    nodes = aux.nodes_base.select("node")
    if small:
        e_by = {"src": e, "dst": e}
    else:
        e_by = {
            "src": e.repartition("src").persist(StorageLevel.MEMORY_AND_DISK),
            "dst": e.repartition("dst").persist(StorageLevel.MEMORY_AND_DISK),
        }
        # materialize the partitioned copies, then release the
        # undecorated relation (nodes is already materialized by the
        # aux count) — one cached copy per partitioning, not three; a
        # caller-supplied aux keeps its own e alive for its other users
        e_by["src"].count()
        e_by["dst"].count()
        if owned:
            e.unpersist()
    hub = nodes.select("node", F.lit(scale // n).cast("long").alias("hub_fp"))
    auth = nodes.select("node", F.lit(0).cast("long").alias("auth_fp"))

    rescale = (
        f"CAST(CASE WHEN __t > 0 THEN "
        f"(coalesce(__raw, CAST(0 AS DECIMAL(38,0))) * {scale}) div __t "
        f"ELSE 0 END AS BIGINT)"
    )

    def _half(scores: DataFrame, score_col: str, join_on: str, group_as: str, out: str) -> DataFrame:
        eb = e_by[join_on]
        raw = (
            eb.join(
                F.broadcast(scores) if small else scores,
                eb[join_on] == scores["node"],
            )
            .groupBy(F.col(group_as).alias("node"))
            .agg(
                F.sum(F.col(score_col).cast("decimal(38,0)")).alias("__raw")
            )
        )
        if small:
            # fold the L1 total into the raw relation itself: a global
            # window over the (<= broadcast_nodes-row) aggregate adds
            # __t in the same pass, so the half-step broadcasts ONE
            # relation and the edge-join subtree is evaluated once —
            # the separate `total` broadcast re-evaluated the whole
            # unpersisted edge join per half-step. A node absent from
            # raw has NULL __t after the left join, but its __raw is
            # NULL too, so the rescale is 0 either way (WHEN NULL > 0
            # falls to ELSE 0; the fold is bit-identical). This is NOT
            # the round-8 rollup pathology (that folded a total into
            # the per-round AGGREGATE under run-to-fixpoint
            # checkpoints); the window rides a single projection.
            rawt = raw.withColumn(
                "__t", F.expr("sum(__raw) OVER ()")
            )
            return (
                nodes.join(F.broadcast(rawt), "node", "left")
                .select("node", F.expr(rescale).alias(out))
                .localCheckpoint(eager=False)
            )
        total = raw.agg(F.sum("__raw").alias("__t"))
        return (
            nodes.join(raw, "node", "left")
            .crossJoin(F.broadcast(total))
            .select("node", F.expr(rescale).alias(out))
            .localCheckpoint(eager=False)
        )

    rounds = 0
    if until_converged:
        # the integer power method reaches an EXACT fixpoint (same
        # argument as pagerank's until_converged: the digest action
        # doubles as the per-round materialization; max_iter bounds the
        # theoretical truncation-cycle pathology the digest can't see)
        prev = _digest(hub, "node", "hub_fp") + _digest(auth, "node", "auth_fp")
        for rounds in range(1, max_iter + 1):
            auth = _half(hub, "hub_fp", "src", "dst", "auth_fp")
            hub = _half(auth, "auth_fp", "dst", "src", "hub_fp")
            d = _digest(hub, "node", "hub_fp") + _digest(auth, "node", "auth_fp")
            if d == prev:
                break
            prev = d
    else:
        rounds = iterations  # fixed mode runs exactly this many
        for _ in range(iterations):
            auth = _half(hub, "hub_fp", "src", "dst", "auth_fp")
            hub = _half(auth, "auth_fp", "dst", "src", "hub_fp")
    out = (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.coalesce("hub_fp", F.lit(0)).cast("long").alias("hub_fp"),
            F.coalesce("auth_fp", F.lit(0)).cast("long").alias("auth_fp"),
        )
        .localCheckpoint(eager=False)
    )
    # materialize (and truncate lineage) before releasing the inputs;
    # no extra persist — the localCheckpoint IS the cached copy, and it
    # does not outlive its references the way a leaked .persist() would
    out.count()
    out._svoe_hits_rounds = rounds
    if not small:
        e_by["src"].unpersist()
        e_by["dst"].unpersist()
    if owned:
        aux.unpersist()  # no-op on the already-released e in large mode
    return out


def bfs_distances(
    edges: DataFrame,
    sources: list | DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 10,
    directed: bool = True,
    early_stop: bool = True,
    assume_distinct: bool = False,
    driver_nodes: int = DRIVER_NODES_DEFAULT,
    driver_edges: int = DRIVER_EDGES_DEFAULT,
    seed_pull: tuple | None = None,
    seed_edge_count: int | None = None,
) -> DataFrame:
    """Multi-source BFS: the hop distance from the nearest seed to
    every reachable node (nodes beyond ``max_hops`` or unreachable are
    absent). The third member of the graph family next to connected
    components (membership) and PageRank/HITS (continuous rank):
    curation pipelines use hop distance from a trusted seed set as a
    hard cutoff where PPR gives a soft score.

    Each round relaxes the frontier by one hop: candidates =
    edges x dist (equi-join on src, narrow key), new dist = min of old
    and candidate+1 (exact integer min — order-free), per-round lazy
    localCheckpoint, early stop when a round's digest equals the
    previous (BFS monotonically converges; max_hops bounds the loop).
    ``early_stop=False`` skips the per-round digest jobs and runs
    exactly ``max_hops`` rounds as ONE lazily-cascaded action — the
    cheaper form when the hop budget is small and fixed (the min
    recurrence is idempotent past convergence, so results are
    identical). ``directed=False`` walks both edge directions (the
    union is built once, before the loop). The persisted edge relation
    is hash-partitioned by ``src`` once, so every round's frontier
    join elides the edge-side exchange — only the (node, dist) vector
    moves, and it re-enters each round already partitioned by
    ``node``.

    ``driver_nodes`` (round 10): at or below this node count (probed
    by the same job that pulls the node set, bounded by
    limit(driver_nodes+1)) the distance map stays DRIVER-RESIDENT —
    one job per hop (edges x broadcast distances -> per-target min),
    no repartitioned edge copy, no checkpoint chain, and convergence
    detection for free (see DRIVER_NODES_DEFAULT). Exact integer
    min-relax, so distances are identical to the relational loop's;
    pass 0 to force it. ``driver_edges``: when the (directed) edge
    count, doubled for undirected walks, is at or under this bound
    (one fully-parallel count probe) AND the resulting node set fits
    ``driver_nodes``, the edge list is pulled once via Arrow and the
    whole BFS — node set, seeds, CSR relaxation — runs in-process:
    zero Spark jobs per hop, identical distance map; pass 0 to keep
    the per-hop Spark loops.
    """
    if not isinstance(sources, DataFrame) and not sources:
        raise ValueError("bfs_distances: sources is empty")
    e0 = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))

    # Edge-resident tier (round 10): when the DIRECTED edge count is
    # bounded (one fully-parallel count — typically over the caller's
    # already-persisted relation), the edge list is pulled once via
    # Arrow and EVERYTHING — undirected mirror, node set, seed
    # filtering, the whole relaxation — runs driver-side in numpy:
    # zero Spark-side union/distinct/persist, zero jobs per hop.
    # Duplicate edges cannot change a min-relax (BFS visits are
    # idempotent), so assume_distinct is irrelevant here. Unweighted
    # frontier BFS reaches each node first at its minimum hop count,
    # the same exact integer recurrence as the relational min-relax,
    # so the distance map is identical.
    if driver_edges > 0 and driver_nodes > 0:
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        s_a = d_a = None
        if seed_pull is not None and seed_edge_count is not None:
            # caller-provided canonical DIRECTED edge arrays (e.g. the
            # shared GraphAux's one Arrow pull) — same contract as
            # assume_distinct: the arrays must be the canonical
            # distinct form of ``edges``. Skips the count probe and
            # the second pull of an already-pulled relation.
            if int(seed_edge_count) * (1 if directed else 2) <= driver_edges:
                s_a = np.asarray(seed_pull[0])
                d_a = np.asarray(seed_pull[1])
                if (
                    s_a.dtype.kind == "f" or d_a.dtype.kind == "f"
                ) and (
                    bool(np.isnan(s_a).any()) or bool(np.isnan(d_a).any())
                ):
                    # NaN labels = NULL endpoints through an Arrow
                    # pull — decline the tier exactly like the
                    # unseeded branch's isna() check below
                    s_a = d_a = None
        else:
            m0 = e0.count()
            if m0 * (1 if directed else 2) <= driver_edges:
                pdf = e0.toPandas()
                if bool(pdf["src"].isna().any()) or bool(
                    pdf["dst"].isna().any()
                ):
                    # NULL endpoints: Arrow float64-converts a
                    # null-bearing integral column (NaN labels);
                    # decline the tier — the Spark paths treat NULL as
                    # a node value (see edge_pull)
                    pass
                else:
                    s_a = pdf["src"].to_numpy()
                    d_a = pdf["dst"].to_numpy()
        if s_a is not None:
            uniq, inv = np.unique(
                np.concatenate([s_a, d_a]), return_inverse=True
            )
            n_nodes = len(uniq)
            if n_nodes == 0:
                raise ValueError(
                    "bfs_distances: no source node appears in the graph"
                )
            if n_nodes <= driver_nodes:
                # split at len(s_a), NOT the earlier count: e0 is
                # unpersisted, so the count and the pull are separate
                # evaluations — a nondeterministic upstream could make
                # them disagree and silently mix src/dst codes
                sc, dc = inv[: len(s_a)], inv[len(s_a):]
                if not directed:
                    sc, dc = (
                        np.concatenate([sc, dc]),
                        np.concatenate([dc, sc]),
                    )
                if isinstance(sources, DataFrame):
                    seed_vals = (
                        sources.select(
                            F.col(sources.columns[0]).alias("node")
                        )
                        .distinct()
                        .toPandas()["node"]
                        .to_numpy()
                    )
                else:
                    seed_vals = np.asarray(list(sources))
                ins = np.searchsorted(uniq, seed_vals)
                ins_c = np.minimum(ins, n_nodes - 1)
                seed_codes = np.unique(ins_c[uniq[ins_c] == seed_vals])
                if seed_codes.size == 0:
                    raise ValueError(
                        "bfs_distances: no source node appears in the graph"
                    )
                # CSR adjacency: edges sorted by source code
                order = np.argsort(sc, kind="stable")
                dc_s = dc[order]
                indptr = np.searchsorted(
                    sc[order], np.arange(n_nodes + 1)
                )
                dist = np.full(n_nodes, -1, dtype="int64")
                dist[seed_codes] = 0
                frontier = seed_codes
                for hop in range(1, max_hops + 1):
                    if frontier.size == 0:
                        break
                    starts = indptr[frontier]
                    counts = indptr[frontier + 1] - starts
                    nz = counts > 0
                    st, ct = starts[nz], counts[nz]
                    total = int(ct.sum())
                    if total == 0:
                        break
                    offs = np.repeat(st, ct) + (
                        np.arange(total)
                        - np.repeat(np.cumsum(ct) - ct, ct)
                    )
                    nbr = dc_s[offs]
                    new = np.unique(nbr[dist[nbr] < 0])
                    dist[new] = hop
                    frontier = new
                reached = dist >= 0
                return e0.sparkSession.createDataFrame(
                    pd.DataFrame(
                        {
                            "node": uniq[reached],
                            "dist": dist[reached].astype("int32"),
                        }
                    ),
                    schema=T.StructType(
                        [
                            T.StructField(
                                "node", _node_type(e0), True
                            ),
                            T.StructField("dist", T.IntegerType()),
                        ]
                    ),
                )

    e = e0
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # assume_distinct also vouches for the undirected union: the caller
    # must guarantee no reciprocal pair appears on both sides (e.g.
    # bipartite node id spaces)
    if not assume_distinct:
        e = e.distinct()
    # persist WITHOUT repartitioning yet: the micro-mode gate probe
    # needs the node set first, and micro mode never needs the
    # repartitioned copy (its per-round joins broadcast the distance
    # vector; edges stay where they are)
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    )
    # count-then-collect, NOT limit(driver_nodes+1).collect(): an
    # unreached CollectLimit runs the scale-up ramp (1, 4, 16, ...
    # partitions as sequential jobs) over the whole distinct — the
    # count is one fully-parallel job and the bounded collect only
    # happens once the gate is proven
    nd = nodes.distinct()
    n_nodes = nd.count()
    node_probe = nd.collect() if n_nodes <= driver_nodes else []
    if n_nodes <= driver_nodes:
        # micro-graph mode: driver-resident distance map — the
        # pagerank discipline (see DRIVER_NODES_DEFAULT). Per hop ONE
        # job: edges x broadcast(dist) -> per-target min, collected
        # bounded by the node count; the min-relax merge is exact
        # integer arithmetic, so the trajectory is identical to the
        # relational loop. The relax is monotone and idempotent: once
        # a round changes nothing, no later round can, so stopping
        # there is result-identical even with early_stop=False (the
        # per-round digest jobs the flag used to buy are free here).
        import pandas as pd
        from pyspark.sql import types as T

        spark_s = e.sparkSession
        node_set = {r["node"] for r in node_probe}
        node_field = T.StructField(
            "node", _node_type(e), nullable=True
        )
        if isinstance(sources, DataFrame):
            seed_rows = (
                sources.select(F.col(sources.columns[0]).alias("node"))
                .distinct()
                .join(nodes.distinct(), "node", "left_semi")
                .collect()  # bounded: semi-join against <= driver_nodes nodes
            )
            seed_vals = {r["node"] for r in seed_rows}
        else:
            seed_vals = {v for v in sources if v in node_set}
        if not seed_vals:
            e.unpersist()
            raise ValueError(
                "bfs_distances: no source node appears in the graph"
            )
        dist: dict = {v: 0 for v in sorted(seed_vals, key=repr)}

        def _dist_df(d: dict) -> DataFrame:
            items = list(d.items())
            return spark_s.createDataFrame(
                pd.DataFrame(
                    {
                        "node": [k for k, _ in items],
                        "dist": [v for _, v in items],
                    }
                ),
                schema=T.StructType(
                    [node_field, T.StructField("dist", T.IntegerType())]
                ),
            )

        # classic frontier relaxation: only nodes whose distance CHANGED
        # last round can produce a smaller candidate this round (an
        # unchanged node's candidates were already min-merged when it
        # last changed), so each round ships only the frontier — the
        # distance map is identical to relaxing the full map every hop.
        # (The edge-resident tier is hoisted above the Spark-side
        # union/persist entirely; this loop runs only when the edge
        # count exceeds driver_edges or the tier is disabled.)
        frontier = dict(dist)
        for _ in range(max_hops):
            ddf = _dist_df(frontier)
            rows = (
                e.join(F.broadcast(ddf), e["src"] == ddf["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg((F.min("dist") + 1).cast("int").alias("dist"))
                .collect()  # bounded: one row per reached node <= n
            )
            frontier = {}
            for r in rows:
                v, d = r["node"], r["dist"]
                if v not in dist or d < dist[v]:
                    dist[v] = d
                    frontier[v] = d
            if not frontier:
                break
        e.unpersist()
        return _dist_df(dist)
    er = e.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    if isinstance(sources, DataFrame):
        seeds = sources.select(F.col(sources.columns[0]).alias("node")).distinct()
    else:
        seeds = (
            e.sparkSession.createDataFrame(
                [(v,) for v in sources], ["node"]
            ).distinct()
        )
    # a seed absent from the graph is not "reachable at distance 0" —
    # restrict to nodes that actually appear, and fail loudly when
    # nothing remains (matching pagerank's sources contract)
    seeds = seeds.join(nodes.distinct(), "node", "left_semi")
    dist = seeds.select("node", F.lit(0).cast("int").alias("dist"))
    prev_digest = _digest(dist, "node", "dist") if early_stop else None
    if dist.limit(1).count() == 0:
        er.unpersist()
        e.unpersist()
        raise ValueError("bfs_distances: no source node appears in the graph")
    for _ in range(max_hops):
        cand = (
            er.join(dist, er["src"] == dist["node"])
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").cast("int").alias("dist"))
            .localCheckpoint(eager=False)
        )
        if early_stop:
            d = _digest(dist, "node", "dist")  # materializes the round
            if d == prev_digest:
                break
            prev_digest = d
    if not early_stop:
        # one cascaded materialization before releasing the edges the
        # lazy checkpoints' lineage still needs
        dist.count()
    er.unpersist()
    e.unpersist()
    return dist


def knn_sparsify(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
    mutual: bool = True,
    assume_canonical: bool = False,
) -> DataFrame:
    """Sparsify a weighted graph to each node's top-k strongest
    neighbors — the standard pre-step that makes triangle / community
    work tractable at scale by CONSTRUCTION (every surviving node has
    degree <= k, so downstream wedge counts are bounded by N*k^2
    regardless of how dense the raw co-occurrence graph is).

    Input is one row per undirected pair in EITHER orientation (or
    both); weights for duplicate (src,dst) rows are summed first. Per
    node, neighbors rank by (weight DESC, neighbor ASC) — fully
    deterministic. ``mutual=True`` keeps a pair only when each node is
    in the other's top-k (the k-NN graph's symmetric core, sparser and
    robust to hubs); ``False`` keeps a pair when either endpoint picks
    it. Output: canonical undirected edges (a < b), one row per pair,
    with the summed weight.

    Scale shape: one pair aggregation (shuffle on the pair key), one
    per-node top-k window (shuffle on node — bounded output k rows per
    node), one self-join on the reversed pair for mutuality. No step
    is quadratic in degree.

    ``assume_canonical``: the caller asserts the input is ALREADY one
    row per undirected pair with ``src < dst`` (e.g. the output of a
    sorted-pair co-occurrence aggregation). Skips the canonicalize +
    re-aggregate exchange — Catalyst cannot prove least/greatest are
    identities on ordered pairs, so without the flag the input pays a
    second full shuffle on the same key. Caller's contract, like
    GraphAux.assume_distinct.
    """
    if k < 1:
        raise ValueError("knn_sparsify: k must be >= 1")
    if assume_canonical:
        pairs = edges.select(
            F.col(src).alias("a"), F.col(dst).alias("b"), F.col(w).alias("w")
        )
    else:
        lo = F.least(F.col(src), F.col(dst))
        hi = F.greatest(F.col(src), F.col(dst))
        pairs = (
            edges.where(F.col(src) != F.col(dst))
            .select(lo.alias("a"), hi.alias("b"), F.col(w).alias("w"))
            .groupBy("a", "b")
            .agg(F.sum("w").alias("w"))
        )
    directed = pairs.select(
        F.col("a").alias("u"), F.col("b").alias("v"), "w"
    ).union(pairs.select(F.col("b").alias("u"), F.col("a").alias("v"), "w"))
    rn = F.row_number().over(
        Window.partitionBy("u").orderBy(F.col("w").desc(), F.col("v").asc())
    )
    top = directed.withColumn("__rn", rn).where(F.col("__rn") <= k).drop("__rn")
    fwd = top.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"), "w"
    )
    if mutual:
        # a pair survives iff BOTH orientations picked it: it appears
        # twice under the canonical key
        return (
            fwd.groupBy("a", "b", "w")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") == 2)
            .drop("__n")
        )
    return fwd.distinct()


DRIVER_TRI_EDGES_DEFAULT = 65_536


def triangle_counts(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    driver_edges: int | None = None,  # None -> DRIVER_TRI_EDGES_DEFAULT
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient over
    an undirected simple graph given as canonical edges (a < b, one
    row per pair).

    Enumeration is ORIENTED by node id: every triangle x<y<z is found
    exactly once as wedge (x,y),(x,z) closed by edge (y,z) — two
    equi-joins, no double counting, no post-hoc dedup. Id-orientation
    makes wedge work sum(deg_low^2); when callers feed a
    ``knn_sparsify`` output, degree <= k bounds it by N*k^2. For
    unbounded-degree graphs the classic refinement is degree-ordering
    (orient toward the higher-degree endpoint — Suri & Vassilvitskii,
    WWW 2011); id-orientation keeps the SQL twin line-for-line
    identical, which is what the oracle check proves.

    Clustering coefficient = 2*T / (deg*(deg-1)) — ONE float division
    over exact integers, NULL when deg < 2 (undefined, not zero).
    Nodes with no triangles still report (their coefficient is 0.0
    when deg >= 2).
    """
    # NO checkpoint: the edge relation feeds four subtrees of ONE
    # returned plan (deg, both wedge sides, the closing join), and the
    # distinct's Exchange is identical under each — AQE's
    # ReusedExchange evaluates it once. A localCheckpoint here would be
    # WORSE on both axes: under AQE even eager=False runs every
    # upstream stage at BUILD time (toRdd materializes the stage DAG),
    # and the checkpointed RDD blocks exchange reuse for the final
    # stage re-optimization. Measured round 11: 8.2 s -> 5.5 s cold for
    # the supplier co-graph query, bit-identical rows.
    #
    # Edge-resident tier (round 11, the connected_components/BFS
    # precedent): at or under ``driver_edges`` distinct canonical
    # edges with integral non-NULL ids, one fully-parallel count probe
    # + one Arrow pull replace the whole relational cascade (distinct,
    # degree agg, two wedge joins, triangle agg, final join — each a
    # fixed-latency AQE stage job even when the sparsified graph is a
    # few thousand rows). Per-edge neighbor-set intersection in C
    # (set &) enumerates each x<y<z triangle once; counts are exact
    # ints and the clustering division is the same long/long -> double
    # IEEE op the SQL form performs. The default gate is deliberately
    # LOWER than DRIVER_EDGES_DEFAULT: intersection work is
    # sum(min(deg)) per edge, so a dense 65k-edge worst case stays
    # well under a second while knn-sparsified inputs (deg <= k) are
    # microseconds. Pass 0 to force the relational plan.
    if driver_edges is None:
        driver_edges = DRIVER_TRI_EDGES_DEFAULT
    e = edges.select(F.col(a).alias("a"), F.col(b).alias("b")).distinct()
    pdf = None
    if driver_edges > 0:
        pdf, e = _probe_pull(e, driver_edges)
    if pdf is not None:
        import pandas as pd
        from pyspark.sql import types as T

        f = e.schema.fields
        aa, bb = pdf["a"].to_numpy(), pdf["b"].to_numpy()
        # integral dtypes only (a float dtype means NULL endpoints or
        # float ids — fall back; see connected_components)
        if (
            aa.dtype.kind in "iu"
            and bb.dtype.kind in "iu"
            and f[0].dataType == f[1].dataType
        ):
            nbrs: dict[int, set[int]] = {}
            for y, z in zip(aa.tolist(), bb.tolist()):
                nbrs.setdefault(y, set()).add(z)
                nbrs.setdefault(z, set()).add(y)
            tri = {n: 0 for n in nbrs}
            for y, z in zip(aa.tolist(), bb.tolist()):
                lo, hi = (y, z) if y < z else (z, y)
                for x in nbrs[lo] & nbrs[hi]:
                    if x < lo:
                        tri[x] += 1
                        tri[lo] += 1
                        tri[hi] += 1
            rows = []
            for n in nbrs:
                d, t = len(nbrs[n]), tri[n]
                rows.append(
                    (n, d, t, (t * 2) / (d * (d - 1)) if d >= 2 else None)
                )
            out_schema = T.StructType(
                [
                    T.StructField("node", f[0].dataType),
                    T.StructField("deg", T.LongType()),
                    T.StructField("triangles", T.LongType()),
                    T.StructField("clustering", T.DoubleType()),
                ]
            )
            out = edges.sparkSession.createDataFrame(
                pd.DataFrame(
                    {
                        "node": pd.Series([r[0] for r in rows]),
                        "deg": pd.Series(
                            [r[1] for r in rows], dtype="int64"
                        ),
                        "triangles": pd.Series(
                            [r[2] for r in rows], dtype="int64"
                        ),
                        # object dtype so deg<2 rows stay None -> SQL
                        # NULL on BOTH the Arrow and the row-based
                        # createDataFrame paths (a float64 column turns
                        # None into NaN, which only Arrow maps to null)
                        "clustering": pd.Series(
                            [r[3] for r in rows], dtype="object"
                        ),
                    }
                ),
                schema=out_schema,
            )
            e.unpersist()  # counts live in python now
            return out
    # over the gate or non-integral ids: e stays persisted — the
    # relational cascade reads it FOUR times (degrees, both wedge
    # sides, the closing join), so the probe pass was its first
    # evaluation, not a wasted one
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = e1.join(e2, "x").where(F.col("y") < F.col("z"))
    tri = wedges.join(
        e.select(F.col("a").alias("y"), F.col("b").alias("z")), ["y", "z"]
    )
    per_node = (
        tri.select(F.col("x").alias("node"))
        .union(tri.select(F.col("y").alias("node")))
        .union(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    out = (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
        )
        .withColumn(
            "clustering",
            F.when(
                F.col("deg") >= 2,
                (F.col("triangles") * 2) / (F.col("deg") * (F.col("deg") - 1)),
            ),
        )
    )
    return out
