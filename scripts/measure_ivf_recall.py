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


if __name__ == "__main__":
    main()
