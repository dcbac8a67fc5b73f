"""Reproducible ANN recall measurement cited in similarity.py and the
README.

Section 1 (legacy, cited by ivf_train's docstring): recall@10 of
euclidean- vs cosine-trained coarse codebooks at nprobe 1 and 2, on
unbiased queries (vec_id 100-119 — disjoint from any seed set;
evaluating on the codebook's own vectors inflates recall, see
tests/test_similarity_train.py).

Section 2 (VERDICT r5 ask 1): the OPERATING-POINT SWEEP — IVF-PQ +
exact refine, nprobe x {1,2,4,8,16} x shortlist R x {50,200,1000},
with BOTH the seeded coarse codebook (first-16 vectors, the
oracle-expressible default) and an MLlib-KMeans-trained one, L2
ground truth (the metric ADC approximates). The refined top-10 of a
shortlist depends only on shortlist MEMBERSHIP, so the sweep takes
one ADC ranking per (coarse, query, nprobe) from the real Spark
operator and evaluates every R as a prefix — and cross-checks one
configuration against a live `refine_topk` run to pin the numpy
evaluation to the operator. Prints one JSON line per (coarse, nprobe,
R) plus a chosen operating point: the cheapest config with recall@10
>= 0.9, minimizing nprobe first (the probed-cell scan is
corpus-proportional at 100 TB; the R-row exact rescore is constant
work), then R.

    python scripts/measure_ivf_recall.py   # ~6 min at sf0.1
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

NPROBES = (1, 2, 4, 8, 16)
RS = (50, 200, 400, 1000)
QIDS = list(range(100, 120))


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from svoe_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF_DIR)
    legacy_coarse_section(spark, emb)
    operating_point_sweep(spark, emb)


def legacy_coarse_section(spark, emb) -> None:
    from svoe_spark.operators.similarity import (
        ann_ivf_topk,
        brute_force_topk_batch,
        ivf_train,
    )

    queries = emb.filter(
        (F.col("vec_id") >= QIDS[0]) & (F.col("vec_id") <= QIDS[-1])
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    exact: dict[int, set] = {}
    for r in brute_force_topk_batch(emb, queries, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(cents, nprobe):
        hit = tot = 0
        for qid, want in exact.items():
            got = {
                r["vec_id"]
                for r in ann_ivf_topk(
                    emb,
                    emb.filter(F.col("vec_id") == qid),
                    cents,
                    k=10,
                    nprobe=nprobe,
                ).collect()
            }
            hit += len(got & want)
            tot += len(want)
        return hit / tot

    for dm in ("euclidean", "cosine"):
        cents = ivf_train(emb, k=16, seed=42, max_iter=10, distance_measure=dm)
        for nprobe in (1, 2):
            print(f"{dm} nprobe={nprobe} recall@10={recall(cents, nprobe):.3f}")


def operating_point_sweep(spark, emb) -> None:
    from svoe_spark.operators.similarity import (
        _ivfpq_probe_luts as _probe_luts,
        ann_ivfpq_topk,
        ivf_train,
        ivfpq_encode,
        ivfpq_encode_numpy,
        ivfpq_train,
        refine_topk,
    )
    from svoe_spark.queries_llm import IVF_K, PQ_KSUB_Q, PQ_M_Q

    # driver-side exact L2 (the 2000 x 64 fixture is driver-sized;
    # float tie collisions are measure-zero on random floats, so the
    # numpy refined top-10 equals refine_topk's — cross-checked below)
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    id_pos = {int(i): p for p, i in enumerate(ids)}

    def exact_top(qid: int, within: list[int] | None, k: int) -> list[int]:
        q = V[id_pos[qid]]
        cand = ids if within is None else np.array(within)
        pos = (
            np.arange(len(ids))
            if within is None
            else np.array([id_pos[int(c)] for c in within])
        )
        d2 = ((V[pos] - q) ** 2).sum(axis=1)
        order = np.lexsort((cand, d2))
        return [int(cand[i]) for i in order[:k]]

    truths = {qid: set(exact_top(qid, None, 10)) for qid in QIDS}

    seeded = [
        list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < IVF_K).orderBy("vec_id").collect()
    ]
    # cosine EXPLICITLY: ivf_assign routes queries by cosine, so the
    # trained codebook must match the routing metric (the legacy
    # section above is where euclidean- vs cosine-trained compare)
    trained = ivf_train(
        emb, k=IVF_K, seed=42, max_iter=10, distance_measure="cosine"
    )
    results = []
    # (coarse codebook, PQ subspaces m, PQ codes-per-subspace ksub):
    # ksub is the lever the r5 table never moved — with 16 codes per
    # 8-dim subspace on near-uniform embeddings, quantization error
    # (not cell probing) caps recall; production FAISS uses ksub=256.
    configs = [
        ("seeded", seeded, "seed", PQ_M_Q, PQ_KSUB_Q),
        ("seeded", seeded, "seed", PQ_M_Q, 64),
        ("seeded", seeded, "seed", PQ_M_Q, 256),
        ("seeded", seeded, "seed", 16, 256),
        ("kmeans", trained, "kmeans", PQ_M_Q, PQ_KSUB_Q),
        ("kmeans", trained, "kmeans", PQ_M_Q, 256),
    ]
    for coarse, cents, method, m, ksub in configs:
        cbs = ivfpq_train(emb, cents, m=m, ksub=ksub, method=method, seed=42)
        # numpy encode: bit-identical to the expression path (left-fold
        # accumulation order) and avoids the m*ksub-leaf expression
        # tree, which OOMs task serialization at m=16, ksub=256
        coded = ivfpq_encode_numpy(emb, cents, cbs).persist()
        coded.count()
        # true per-cell candidate counts (len(ranked) saturates at the
        # k cap and would underreport the scan cost being minimized)
        cell_sizes = {
            r["cluster_id"]: r["count"]
            for r in coded.groupBy("cluster_id").count().collect()
        }
        hits = {(n, r): 0 for n in NPROBES for r in RS}
        scanned = {n: 0 for n in NPROBES}
        for qid in QIDS:
            qdf = emb.filter(F.col("vec_id") == qid)
            for nprobe in NPROBES:
                cells, _ = _probe_luts(
                    qdf, cents, cbs, nprobe, "embedding"
                )
                scanned[nprobe] += sum(cell_sizes.get(c, 0) for c in cells)
                ranked = [
                    int(r["vec_id"])
                    for r in ann_ivfpq_topk(
                        coded, qdf, cents, cbs, k=max(RS), nprobe=nprobe
                    ).collect()
                ]
                for R in RS:
                    ref10 = set(exact_top(qid, ranked[:R], 10))
                    hits[(nprobe, R)] += len(ref10 & truths[qid])
        coded.unpersist()
        for nprobe in NPROBES:
            for R in RS:
                results.append(
                    {
                        "coarse": coarse,
                        "m": m,
                        "ksub": ksub,
                        "nprobe": nprobe,
                        "R": R,
                        "recall@10": hits[(nprobe, R)] / (10 * len(QIDS)),
                        "avg_candidates_scanned": scanned[nprobe] / len(QIDS),
                    }
                )
                print(json.dumps(results[-1]))

    # cross-check the numpy refine against the live operator once
    qid, nprobe, R = QIDS[0], 8, 200
    cbs = ivfpq_train(emb, seeded, m=PQ_M_Q, ksub=PQ_KSUB_Q, method="seed")
    coded = ivfpq_encode(emb, seeded, cbs)
    qdf = emb.filter(F.col("vec_id") == qid)
    short = ann_ivfpq_topk(coded, qdf, seeded, cbs, k=R, nprobe=nprobe)
    cand = spark.createDataFrame(
        [(int(r["vec_id"]),) for r in short.collect()], "vec_id long"
    )
    got = [r["vec_id"] for r in refine_topk(cand, emb, qdf, k=10).collect()]
    ranked = [
        int(r["vec_id"])
        for r in ann_ivfpq_topk(
            coded, qdf, seeded, cbs, k=max(RS), nprobe=nprobe
        ).collect()
    ]
    want = exact_top(qid, ranked[:R], 10)
    assert got == want, (got, want)
    print(f"cross-check refine_topk == numpy refine (qid={qid}): OK")

    # operating point: recall >= 0.9, min nprobe then min R (scan
    # cost beats rescore cost at corpus scale)
    ok = [r for r in results if r["coarse"] == "seeded" and r["recall@10"] >= 0.9]
    ok.sort(key=lambda r: (r["nprobe"], r["R"]))
    if ok:
        print("OPERATING_POINT " + json.dumps(ok[0]))
    else:
        print("OPERATING_POINT none reached 0.9")


if __name__ == "__main__":
    main()
