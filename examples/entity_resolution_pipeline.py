#!/usr/bin/env python
"""End-to-end entity-resolution pipeline over the part catalog:

    name normalization -> fuzzy (edit-distance) candidate pairs via
    q-gram blocking -> transitive closure (connected components) ->
    canonical-survivor pick -> a golden-record relation + an SCD2
    history of which raw record mapped to which entity over time

The classic master-data problem, composed entirely from the library's
partition-parallel operators: blocking changes COST, never the answer
(every candidate pair is verified with the exact Levenshtein
distance); clustering is the same integer-fixpoint CC the dedup layer
uses; the survivor pick is a deterministic arg-min. Prints one JSON
line of per-stage counts.

    python examples/entity_resolution_pipeline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from svoe_spark.operators.fuzzy import fuzzy_join  # noqa: E402
from svoe_spark.operators.graph import dedup_clusters  # noqa: E402
from svoe_spark.operators.scd import scd2_compress  # noqa: E402
from svoe_spark.session import get_spark  # noqa: E402
from svoe_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("entity_resolution_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, int] = {}

    # raw "records": part names, lightly normalized (case/whitespace —
    # the cheap deterministic cleanups BEFORE the expensive fuzzy pass)
    parts = load_table(spark, "part", sf_dir).select(
        "p_partkey",
        F.regexp_replace(F.trim(F.lower(F.col("p_name"))), r"\s+", " ").alias(
            "name"
        ),
    ).persist()
    out["records"] = parts.count()

    # candidate pairs within edit distance 2: q-gram count-filter
    # blocking + exact Levenshtein verify over DISTINCT names
    # distance 1: the synthetic catalog's names are combinations of a
    # tiny color vocabulary, so distance-2 closure chains nearly the
    # whole catalog into one entity — real ER tunes the radius to the
    # name entropy
    pairs_v = fuzzy_join(parts, parts, "name", "name", max_distance=1)
    name_ids = parts.select(F.col("name"), F.col("p_partkey"))
    pairs = (
        pairs_v.where(F.col("left_val") < F.col("right_val"))
        .join(name_ids.withColumnRenamed("p_partkey", "id_a"),
              F.col("left_val") == F.col("name"))
        .drop("name")
        .join(name_ids.withColumnRenamed("p_partkey", "id_b"),
              F.col("right_val") == F.col("name"))
        .select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    )
    # fuzzy_join works on DISTINCT values, so records whose normalized
    # names are EXACTLY equal produce no cross-id pair above — add the
    # same-name id pairs (the most basic ER merge) explicitly
    na, nb = name_ids.alias("na"), name_ids.alias("nb")
    exact_pairs = na.join(
        nb,
        (F.col("na.name") == F.col("nb.name"))
        & (F.col("na.p_partkey") < F.col("nb.p_partkey")),
    ).select(
        F.col("na.p_partkey").alias("a"), F.col("nb.p_partkey").alias("b")
    )
    pairs = pairs.unionByName(exact_pairs).distinct()
    out["candidate_pairs"] = pairs.count()

    # transitive closure -> entity ids + canonical survivor per entity
    clustered = dedup_clusters(
        parts.select(F.col("p_partkey").alias("doc_id"), "name"),
        pairs.select(F.col("a").alias("id_a"), F.col("b").alias("id_b")),
    ).persist()
    out["entities"] = clustered.select("cluster_id").distinct().count()
    golden = clustered.where(F.col("is_canonical"))
    out["golden_records"] = golden.count()
    out["merged_away"] = out["records"] - out["golden_records"]

    # entity-membership history: replay the mapping as a change log
    # (observation time = a synthetic ingest stamp) and compress to
    # SCD2 validity intervals — "which entity did record X belong to,
    # as of T" is then one as-of lookup
    log = clustered.select(
        F.col("doc_id").alias("key"),
        F.timestamp_micros(F.col("doc_id") * 1000).alias("ts"),
        F.col("doc_id").alias("tie"),
        F.col("cluster_id").cast("string").alias("state"),
    )
    hist = scd2_compress(log, "key", ["state"], ts="ts", tie_col="tie")
    out["history_rows"] = hist.count()

    parts.unpersist()
    clustered.unpersist()
    print(json.dumps(out))
    assert out["golden_records"] <= out["records"]
    assert out["entities"] == out["golden_records"]


if __name__ == "__main__":
    main()
