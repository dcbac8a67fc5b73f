"""Incremental near-duplicate index: dedup a NEW batch of documents
against an already-indexed corpus without rescanning the corpus text.

The batch operators in operators/dedup.py answer "which pairs inside
this corpus are near-duplicates"; a production crawl pipeline asks a
different question every day: "which of TODAY's documents duplicate
anything already ingested". Recomputing the corpus-wide LSH join per
batch would rescan 100 TB per day. This module persists the two
derived relations the probe actually needs —

  bands: (band, bkey, id)      the LSH postings, partitioned by band
  sets:  (id, sset)            distinct hashed shingles, for exact
                               Jaccard verification of candidates

— and answers a probe by (1) computing the new batch's signatures and
band keys (one narrow pass over the BATCH only), (2) joining the
stored postings against the BROADCAST batch keys (the index side is
never shuffled; with the parquet layout partitioned by band the scan
is also partition-pruned), and (3) verifying the candidate pairs by
true Jaccard against the stored sets (a join that moves only
candidate-sized data). The surviving documents' postings/sets are then
APPENDED, so the index grows by one batch per day — the standard
inverted-index maintenance loop, expressed relationally.

Verification modes: ``verify="sets"`` (exact Jaccard over stored
shingle sets — what the DuckDB oracle checks); ``verify="signature"``
(the fraction of agreeing minhash components — an unbiased Jaccard
estimator needing only the K-int signature, for deployments that skip
the sets table: storage drops from O(total shingles) to O(K) per doc
at the cost of probabilistic verification).

Hash/shingle/band constants are shared with operators/dedup.py
(MinHashParams), so an index built here agrees bit-for-bit with the
batch LSH queries.

Reference parity: the reference dedups at ingest time via content
hashes in its data catalog (svoe/featurizer/sql/models.py data keys);
near-dup indexing generalizes that to similarity-level identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from svoe_spark.operators.dedup import (
    MinHashParams,
    _band_pairs,
    _shingle_arrays,
    minhash_signature,
)


def index_tables(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    params: MinHashParams = MinHashParams(),
) -> tuple[DataFrame, DataFrame]:
    """Derive (bands, sets) for a document batch in ONE narrow pass
    (signature + distinct-shingle set from the same shingle array; the
    bands explode is a Generate, not a union — the batch is scanned
    once)."""
    sig = minhash_signature(docs, text, id_col, params, with_sets=True)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"m{b * params.rows + r}")
                        for r in range(params.rows)
                    ],
                ).alias("bkey"),
            )
            for b in range(params.bands)
        ]
    )
    bands = sig.select(F.col(id_col), F.explode(band_structs).alias("__b")).select(
        F.col("__b.band").alias("band"),
        F.col("__b.bkey").alias("bkey"),
        F.col(id_col),
    )
    sets = sig.select(F.col(id_col), F.col("__set").alias("sset"))
    return bands, sets


def write_index(
    docs: DataFrame,
    path: str,
    text: str = "text",
    id_col: str = "doc_id",
    params: MinHashParams = MinHashParams(),
    mode: str = "overwrite",
) -> None:
    """Materialize the index at ``path`` (``bands/`` parquet
    partitioned by band — a probe for one band key reads one
    partition's row groups; ``sets/`` plain parquet). ``mode="append"``
    is the incremental maintenance step — call it with each day's
    surviving batch."""
    bands, sets = index_tables(docs, text, id_col, params)
    bands.write.mode(mode).partitionBy("band").parquet(f"{path}/bands")
    sets.write.mode(mode).parquet(f"{path}/sets")


def append_index(
    docs: DataFrame,
    path: str,
    text: str = "text",
    id_col: str = "doc_id",
    params: MinHashParams = MinHashParams(),
) -> None:
    write_index(docs, path, text, id_col, params, mode="append")


def read_index(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    return (
        spark.read.parquet(f"{path}/bands"),
        spark.read.parquet(f"{path}/sets"),
    )


def probe_index(
    new_docs: DataFrame,
    index_bands: DataFrame,
    index_sets: DataFrame | None,
    text: str = "text",
    id_col: str = "doc_id",
    params: MinHashParams = MinHashParams(),
    threshold: float = 0.5,
    verify: str = "sets",
    broadcast_batch: bool = True,
) -> DataFrame:
    """(id_new, id_old, jaccard) for every new document colliding with
    an indexed one in >= 1 LSH band and passing verification.

    Scale shape: the batch's bands/sets are derived in one narrow pass
    and BROADCAST (a daily batch is small next to the corpus index);
    the index side is a partition-prunable scan that is filtered by the
    broadcast hash join — the 100 TB side never shuffles. Verification
    joins the stored sets only against candidate ids (candidate-sized
    shuffle). Set ``broadcast_batch=False`` for a backfill-sized batch
    to fall back to a sort-merge join on (band, bkey).

    ``verify="signature"`` needs no sets table (pass None): the
    ``jaccard`` column is the fraction of AGREEING BANDS
    (bands_agree / bands — a band agrees iff all its ``rows`` minhash
    components agree, so this is a step-quantized estimate of
    Jaccard^rows collision probability, granularity 1/bands). Coarser
    than exact verification, but the index shrinks from O(total
    shingles) to O(K ints) per document; threshold then applies to
    that fraction."""
    if verify not in ("sets", "signature"):
        raise ValueError(f"verify must be 'sets' or 'signature', got {verify!r}")
    if verify == "sets" and index_sets is None:
        raise ValueError("verify='sets' requires the index sets table")
    new_bands, new_sets = index_tables(new_docs, text, id_col, params)
    nb = new_bands.select(
        "band", "bkey", F.col(id_col).alias("id_new")
    )
    if broadcast_batch:
        nb = F.broadcast(nb)
    hits = index_bands.select(
        "band", "bkey", F.col(id_col).alias("id_old")
    ).join(nb, ["band", "bkey"])
    if verify == "signature":
        agree = hits.groupBy("id_new", "id_old").agg(
            (F.count_distinct("band") / F.lit(float(params.bands))).alias(
                "jaccard"
            )
        )
        return agree.filter(F.col("jaccard") >= threshold)
    cands = hits.select("id_new", "id_old").distinct()
    j = cands.join(
        new_sets.select(F.col(id_col).alias("id_new"), F.col("sset").alias("sa")),
        "id_new",
    ).join(
        index_sets.select(F.col(id_col).alias("id_old"), F.col("sset").alias("sb")),
        "id_old",
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    return j.select(
        "id_new", "id_old", (inter / union).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def dedup_against_index(
    new_docs: DataFrame,
    index_bands: DataFrame,
    index_sets: DataFrame | None,
    text: str = "text",
    id_col: str = "doc_id",
    params: MinHashParams = MinHashParams(),
    threshold: float = 0.5,
    within_batch: bool = True,
    broadcast_batch: bool = True,
) -> DataFrame:
    """The new documents that SURVIVE incremental dedup: no verified
    match in the index, and (``within_batch=True``) not a verified
    duplicate of a lower-id survivor inside the batch itself (the
    keep-lowest-id rule of the batch dedup operators). The survivors
    are what ``append_index`` should ingest."""
    dup_vs_index = probe_index(
        new_docs, index_bands, index_sets, text, id_col, params,
        threshold, "sets" if index_sets is not None else "signature",
        broadcast_batch,
    ).select(F.col("id_new").alias(id_col)).distinct()
    kept = new_docs.join(dup_vs_index, id_col, "left_anti")
    if not within_batch:
        return kept
    sig = minhash_signature(kept, text, id_col, params, with_sets=True).persist()
    cands = _band_pairs(sig, id_col, params)
    sets = sig.select(F.col(id_col), "__set")
    verified = (
        cands.join(
            sets.withColumnRenamed(id_col, "id_a").withColumnRenamed("__set", "sa"),
            "id_a",
        )
        .join(
            sets.withColumnRenamed(id_col, "id_b").withColumnRenamed("__set", "sb"),
            "id_b",
        )
        .filter(
            (
                F.size(F.array_intersect("sa", "sb"))
                / (
                    F.size("sa")
                    + F.size("sb")
                    - F.size(F.array_intersect("sa", "sb"))
                )
            )
            >= threshold
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    out = kept.join(verified, id_col, "left_anti")
    out._svoe_persisted = sig
    return out
