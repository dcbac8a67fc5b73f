"""Reproducible IVF recall measurement cited in ivf_train's docstring
and README: recall@10 of euclidean- vs cosine-trained codebooks at
nprobe 1 and 2, on unbiased queries (vec_id 100-119 — disjoint from
any seed set; evaluating on the codebook's own vectors inflates recall,
see tests/test_similarity_train.py).

    python scripts/measure_ivf_recall.py   # ~4 min at sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from svoe_spark.operators.similarity import (
        ann_ivf_topk,
        brute_force_topk_batch,
        ivf_train,
    )
    from svoe_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 120)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
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

    ivfpq_refine_section(spark, emb)


def ivfpq_refine_section(spark, emb) -> None:
    """IVFADC vs IVFADC+refine recall@10 (L2 ground truth — the metric
    ADC approximates). Refined recall depends only on shortlist
    membership (R, nprobe), not quantization error, so it must
    dominate plain ADC at every operating point — the measured table
    cited in similarity.refine_topk's docstring and README."""
    from pyspark.sql import functions as F

    from svoe_spark.operators.similarity import (
        ann_ivfpq_topk,
        ivf_train,
        ivfpq_encode,
        ivfpq_train,
        refine_topk,
    )

    cents = ivf_train(emb, k=16, seed=42, max_iter=10,
                      distance_measure="euclidean")
    cbs = ivfpq_train(emb, cents, m=8, ksub=16, method="kmeans", seed=42)
    coded = ivfpq_encode(emb, cents, cbs).persist()

    def l2_truth(qv):
        d2 = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(float(x)) for x in qv]),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        top = emb.select("vec_id", d2.alias("d2")).orderBy("d2", "vec_id")
        return {r["vec_id"] for r in top.limit(10).collect()}

    qids = list(range(100, 120))
    truths = {}
    for qid in qids:
        qv = [
            float(x)
            for x in emb.where(F.col("vec_id") == qid).first()["embedding"]
        ]
        truths[qid] = l2_truth(qv)

    spark_s = emb.sparkSession
    for nprobe in (1, 2, 4):
        adc_hits = 0
        ref_hits = {50: 0, 200: 0}
        for qid in qids:
            qdf = emb.where(F.col("vec_id") == qid)
            # ONE ADC ranking per (query, nprobe): k=10 and both
            # shortlists are prefixes of the R=200 ranking
            ranked = [
                r["vec_id"]
                for r in ann_ivfpq_topk(
                    coded, qdf, cents, cbs, k=200, nprobe=nprobe
                ).collect()
            ]
            adc_hits += len(set(ranked[:10]) & truths[qid])
            for r_size in (50, 200):
                cand = spark_s.createDataFrame(
                    [(int(i),) for i in ranked[:r_size]], "vec_id long"
                )
                ref = {
                    x["vec_id"]
                    for x in refine_topk(cand, emb, qdf, k=10).collect()
                }
                ref_hits[r_size] += len(ref & truths[qid])
        tot = 10 * len(qids)
        print(
            f"ivfpq nprobe={nprobe} adc recall@10={adc_hits / tot:.3f} "
            f"refined R=50: {ref_hits[50] / tot:.3f} "
            f"R=200: {ref_hits[200] / tot:.3f}"
        )
    coded.unpersist()


if __name__ == "__main__":
    main()
