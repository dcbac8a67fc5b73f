#!/usr/bin/env python
"""End-to-end training-data curation pipeline over the documents table:

    quality filter -> exact dedup -> MinHash near-dup removal ->
    stratified source re-weighting -> hash train/valid/test split ->
    deterministic epoch shuffle -> sequence packing

Every stage is one of the library's partition-parallel operators; the
whole pipeline is deterministic (re-running it, or re-partitioning the
input, yields byte-identical outputs). Prints one JSON line of
per-stage counts.

    python examples/llm_curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from svoe_spark.functions.text import tokens  # noqa: E402
from svoe_spark.operators.curation import (  # noqa: E402
    deterministic_shuffle,
    hash_split,
    pack_sequences,
    stratified_sample,
)
from svoe_spark.operators.dedup import (  # noqa: E402
    drop_exact_duplicates,
    minhash_dedup_pairs,
)
from svoe_spark.operators.text_analysis import quality_score  # noqa: E402
from svoe_spark.session import get_spark  # noqa: E402
from svoe_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("llm_curation_pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, "documents", sf_dir)
    stages: dict[str, int] = {"input": docs.count()}

    # 1. quality floor: enough tokens, not too repetitive
    q = quality_score(docs).filter(
        (F.col("n_tokens") >= 5) & (F.col("distinct_ratio") >= 0.3)
    )
    docs = docs.join(q.select("doc_id"), "doc_id", "left_semi")
    stages["quality_filtered"] = docs.count()

    # 2. exact dedup (hash groupBy, lowest id survives)
    docs = drop_exact_duplicates(docs)
    stages["exact_deduped"] = docs.count()

    # 3. near-dup removal: drop the higher id of each MinHash-verified pair
    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    docs = docs.join(losers, "doc_id", "left_anti")
    stages["neardup_removed"] = docs.count()

    # 3b. benchmark decontamination: drop docs overlapping the held-out
    # eval subset (stand-in: every 50th doc) by >= 3 shared trigrams
    from svoe_spark.operators.dedup import decontaminate

    bench = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") % 50 == 0)
    docs = decontaminate(docs.filter(F.col("doc_id") % 50 != 0), bench, min_shared=3)
    stages["decontaminated"] = docs.count()

    # 4. corpus-mix re-weighting (downsample two sources, drop one)
    docs = stratified_sample(docs, "source", {"src0": 0.5, "src1": 0.25, "src2": 0.0})
    stages["stratified"] = docs.count()

    # 5. deterministic split + epoch shuffle + packing of the train split
    docs = hash_split(docs)
    train = docs.filter(F.col("split") == "train")
    stages["train_split"] = train.count()

    train = deterministic_shuffle(train, salt="epoch0")
    sized = train.select(
        "doc_id",
        "shuffle_rank",
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(sized, id_col="shuffle_rank", budget=2048)
    bins = packed.groupBy("bin_id").agg(F.sum("n_tokens").alias("tok"))
    stages["train_bins_2048tok"] = bins.count()

    print(json.dumps(stages))


if __name__ == "__main__":
    main()
