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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    strict: bool = True,
) -> DataFrame:
    """Connected components by iterative min-label propagation:
    every node starts labeled with itself; each round every node takes
    the minimum label among itself and its neighbors; fixpoint = each
    component labeled by its smallest member. Returns (id, comp) for
    every node appearing in ``pairs`` (isolated ids never appear —
    callers union singletons back, see `dedup_clusters`).

    Scale shape: each round is one shuffle join (edges x labels) plus a
    min-aggregation — all narrow keys, no skew beyond the graph's own
    degree distribution. Rounds needed = graph diameter, and near-dup
    clusters are low-diameter by construction (LSH buckets create
    near-cliques), so convergence is a handful of rounds; `max_iter`
    bounds adversarial chains. Lineage is truncated per round with an
    eager localCheckpoint (the standard Spark iterative-algorithm
    pattern — without it the plan doubles every round). For graphs with
    huge skewed components, the alternating large-star/small-star
    variant halves round count; the propagation core is the same join.
    """
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = edges.select("src").distinct().select(
        F.col("src").alias("id"), F.col("src").alias("comp")
    )
    # convergence check: per-node labels only ever decrease (numeric or
    # lexicographic min), so the LABELING as a multiset changes every
    # non-converged round — compare a content digest: sum of per-row
    # (id, comp) hashes. One cheap scalar aggregation per round instead
    # of a labels-vs-labels join; id-type-agnostic (string doc ids are
    # legal — a numeric cast would crash under ANSI or, worse, return
    # NULL and fake convergence); decimal(38) so the hash sum cannot
    # overflow int64.
    def label_sum(lb):
        row = lb.agg(
            F.sum(
                F.xxhash64(F.col("id"), F.col("comp")).cast("decimal(38,0)")
            ).alias("s")
        ).first()
        return row["s"]

    prev_sum = None
    converged = False
    for _ in range(max_iter):
        prop = edges.join(labels, edges["dst"] == labels["id"]).select(
            edges["src"].alias("id"), "comp"
        )
        labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        cur = label_sum(labels)
        if cur is None or cur == prev_sum:  # None = empty graph
            converged = True
            break
        prev_sum = cur
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
    return labels


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Assign every document a duplicate-cluster id (the smallest doc
    id in its component; singletons cluster with themselves) plus the
    cluster size and a canonical flag — the keep/drop decision of a
    near-dedup pipeline is then `filter(is_canonical)`."""
    comp = connected_components(pairs)
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
