#!/usr/bin/env python
"""End-to-end training-data curation pipeline over the documents table:

    PII redaction -> composed quality gate -> exact dedup ->
    chunk-level dedup -> MinHash near-dup clustering (canonical
    survivors) -> benchmark decontamination -> stratified source
    re-weighting -> hash train/valid/test split -> deterministic
    epoch shuffle -> sequence packing

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

    # 0. PII redaction (zero-shuffle rewrite of the text column)
    from svoe_spark.operators.cleaning import corpus_filter, pii_redact

    red = pii_redact(docs)
    docs = docs.drop("text").join(
        red.select("doc_id", F.col("redacted").alias("text")), "doc_id"
    )
    stages["pii_redacted"] = docs.count()

    # 0b. PageRank-ranked domain gate (the queries_llm
    # `curation_pagerank_gate` stage, run here at pipeline head):
    # personalized PageRank from a trusted seed allowlist over the
    # document-source NEAR-DUP graph — sources random-walk-close to
    # the allowlist stay, the rest are cut before any per-document
    # work. The rank relation is domain-cardinality (tiny), so the
    # gate itself is one broadcast semi-join.
    from svoe_spark.operators.graph import pagerank
    from svoe_spark.queries_llm import _CPG_ITERS, _CPG_SEEDS, _CPG_THRESH

    prs = minhash_dedup_pairs(docs, threshold=0.5).select("id_a", "id_b")
    dsrc = docs.select("doc_id", "source")
    ab = (
        prs.join(dsrc.toDF("id_a", "sa"), "id_a")
        .join(dsrc.toDF("id_b", "sb"), "id_b")
        .where(F.col("sa") != F.col("sb"))
    )
    edges = (
        ab.select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
        .unionByName(ab.select(F.col("sb").alias("src"), F.col("sa").alias("dst")))
        .withColumn("w", F.lit(1).cast("long"))
    )
    pr = pagerank(edges, sources=list(_CPG_SEEDS), iterations=_CPG_ITERS, weight="w")
    trusted = pr.where(F.col("rank_fp") >= _CPG_THRESH).select(
        F.col("node").alias("source")
    )
    # checkpoint the gated snapshot: every downstream stage in this
    # demo re-evaluates the cumulative lineage per .count(); cutting
    # it here (a few hundred surviving rows) keeps the pipeline's
    # wall-clock linear in its stage count instead of quadratic
    docs = docs.join(F.broadcast(trusted), "source", "left_semi").localCheckpoint()
    stages["domain_gated"] = docs.count()

    # 1. composed quality gate — heuristic signals (length + diversity
    # + repetition caps) AND the TRAINED model gate in ONE zero-shuffle
    # scan: corpus_filter folds the frozen trained logistic weights
    # (train_quality_classifier -> quantize_weights, the same constants
    # the corpus_filter_trained oracle replays) inline, so the
    # model-based cut costs no extra pass over the corpus
    from svoe_spark.queries_llm import QC_TRAINED_BIAS, QC_TRAINED_WEIGHTS

    keep = corpus_filter(docs, min_tokens=5, min_distinct_ratio=0.3,
                         max_top_word_ratio=0.5, max_dup_2gram_ratio=0.5,
                         classifier_weights=QC_TRAINED_WEIGHTS,
                         classifier_bias=QC_TRAINED_BIAS)
    docs = docs.join(keep.filter("keep").select("doc_id"), "doc_id", "left_semi")
    stages["quality_filtered"] = docs.count()

    # 1b'. unigram-LM cost filter (CCNet-style perplexity gate using
    # the tokenizer's own LM): drop the most out-of-domain tail by
    # per-token encoding cost under the frozen unigram artifact
    from svoe_spark.operators.tokenizer import unigram_encode
    from svoe_spark.queries_llm import UNIGRAM_FIXED_PIECES

    ug = unigram_encode(docs, UNIGRAM_FIXED_PIECES, out_cost="lm_cost")
    ug = ug.where(
        (F.size("tokens") > 0)
        & (F.col("lm_cost") / F.size("tokens") < 25_000)  # milli-nats/token
    )
    docs = docs.join(ug.select("doc_id"), "doc_id", "left_semi")
    stages["lm_cost_filtered"] = docs.count()

    # 1c. substring-level dedup: cut corpus-repeated 5-gram spans out
    # of the surviving texts (suffix-array-style boilerplate removal)
    from svoe_spark.operators.dedup import remove_repeated_spans

    cleaned = remove_repeated_spans(docs, k=5, min_count=4)
    docs = docs.drop("text").join(
        cleaned.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
    ).filter(F.length("text") > 0)
    stages["substring_cleaned"] = docs.count()

    # 2. exact dedup (hash groupBy, lowest id survives)
    docs = drop_exact_duplicates(docs)
    stages["exact_deduped"] = docs.count()

    # 2b. near-dup CLUSTERING: MinHash-verified pairs -> connected
    # components -> keep each cluster's canonical (smallest-id) doc
    from svoe_spark.operators.graph import dedup_clusters

    pairs = minhash_dedup_pairs(docs, threshold=0.5).select("id_a", "id_b")
    clusters = dedup_clusters(docs, pairs)
    docs = docs.join(
        clusters.filter("is_canonical").select("doc_id"), "doc_id", "left_semi"
    )
    stages["neardup_canonical"] = docs.count()

    # 3. chunk-level dedup: rewrite texts with corpus-wide first-
    # occurrence chunks. Rewrite-only: a doc whose every chunk was seen
    # before keeps an empty text (left join + coalesce) rather than
    # silently vanishing from the corpus — emptied docs are then
    # dropped EXPLICITLY, as their own counted stage.
    from svoe_spark.operators.cleaning import chunk_dedup

    cd = chunk_dedup(docs, width=4)
    docs = docs.drop("text").join(
        cd.select("doc_id", F.col("text_dedup").alias("text")), "doc_id", "left"
    ).withColumn("text", F.coalesce("text", F.lit("")))
    stages["chunk_deduped"] = docs.count()
    # second lineage cut: the dedup/rewrite block above is the most
    # expensive subtree to replay per downstream action
    docs = docs.filter(F.length("text") > 0).localCheckpoint()
    stages["nonempty_after_chunk_dedup"] = docs.count()

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

    # 6. round-6 corpus analysis + training-pair legs over the survivors
    from svoe_spark.operators.curation import contrastive_crops
    from svoe_spark.operators.retrieval import tfidf_keywords
    from svoe_spark.operators.text_analysis import (
        collocations,
        mixed_language_flags,
    )

    stages["mixed_language_docs"] = (
        mixed_language_flags(train).where(F.col("is_mixed")).count()
    )
    stages["keyword_rows_top3"] = tfidf_keywords(train, k=3).count()
    stages["collocations_min5"] = collocations(train, min_count=5, k=20).count()
    stages["contrastive_pairs"] = contrastive_crops(train).count()

    # corpus monitoring: the data contract (one aggregate pass) and
    # provenance drift (is the surviving mix length-shifted vs the
    # reference source?) — the round-6c operational layer applied to
    # the curated corpus
    from svoe_spark.operators import quality_checks as qc
    from svoe_spark.operators.profiling import distribution_drift

    contract = qc.run_checks(
        docs,
        [
            qc.completeness("text"),
            qc.completeness("source"),
            qc.bounds("n_chars", lo=1),
        ],
        unique=["doc_id"],
    )
    stages["contract_failures"] = contract.where(~F.col("passed")).count()
    drift = distribution_drift(
        docs.where(F.col("source") == "src0"),
        docs.where(F.col("source") != "src0"),
        "n_chars",
        n_buckets=10,
    )
    stages["drift_buckets"] = drift.count()

    print(json.dumps(stages))


if __name__ == "__main__":
    main()
