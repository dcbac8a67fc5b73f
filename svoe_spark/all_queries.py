"""Import every query-registering module and re-export the registry.

Import THIS (not svoe_spark.queries) anywhere the full registry is
needed — decorator registration only happens on module import.

Registry ORDER matters: the correctness driver hash-checks the FIRST
50 entries only. Rounds 1-2 driver-verified the relational core
(q1..supplier_balance_ranks, 50 green rows in CORRECTNESS_r01/r02);
round 3 rotated the never-driver-checked tail — the entire LLM-data
layer plus the post-50 relational queries — into the window (45 of 50
hash-green in CORRECTNESS_r03; the 5 non-green had driver-
canonicalizer traps, fixed since). Round 4 fronts (a) those 5 fixed
queries so their repair is driver-witnessed, (b) the new round-4
queries, then (c) refills with the relational core in its r2 order —
every query in the registry now has at least one hash-green driver
row, and the window rotates toward whatever is least recently
checked (README "Registry order" section).
"""

import svoe_spark.queries  # noqa: F401
import svoe_spark.queries_analytics  # noqa: F401
import svoe_spark.queries_llm  # noqa: F401
import svoe_spark.queries_profile  # noqa: F401
from svoe_spark.queries import QUERIES  # noqa: F401

# Names to surface into the driver's 50-entry window, in check order.
# Round 7 (VERDICT r6 ask 2): (a) the new round-7 composition plus the
# 4 round-6c statistics queries that have never had a driver row
# (judge-green at sf0.01, but a fresh hash row guards regressions),
# (b) the 44 queries whose newest driver row is CORRECTNESS_r03 — the
# dedup / text / ANN-LSH families — in their r3 check order,
# (c) refill with the least-recently-checked remainder (r4 order).
# Names beyond slot 50 overflow to the next round's rotation; compute
# the actual split with driver_window() below (a helper for
# maintainers and the verify harness — nothing prints it
# automatically) instead of hard-coding counts in comments.
_DRIVER_PRIORITY = [
    # (a) never driver-checked.
    "curation_pagerank_gate",
    "cluster_split_leakproof",
    "top_session_paths",
    "spearman_value_qty",
    "gini_spend_by_nation",
    "supplier_hhi_by_nation",
    # (b) newest driver row is round 3, in r3 order (3 rows-only by
    # design: approx_distinct_daily, backtest_param_grid,
    # ann_ivf_trained).
    "live_book_features",
    "median_order_value",
    "approx_distinct_daily",
    "q2_min_cost_supplier",
    "q11_valuable_parts",
    "q20_part_promotion_suppliers",
    "q21_waiting_supplier",
    "distinct_until_changed_events",
    "asof_multi_feature",
    "pivot_priority_by_year",
    "backtest_param_grid",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_simhash",
    "text_token_stats",
    "text_quality",
    "text_lang_id",
    "multimodal_frame_sample",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_neardup",
    "dataset_shuffle_rank",
    "ann_batch_topk",
    "embedding_neardup_lsh",
    "benchmark_contamination",
    "text_lang_ngram",
    "pii_redact",
    "text_repetition_signals",
    "chunk_dedup",
    "source_mixture_weights",
    "embedding_quantize",
    "dedup_clusters",
    "dedup_clusters_twostar",
    "corpus_filter",
    "ann_lsh_multiprobe",
    "ann_ivf_multiprobe",
    "ann_ivf_trained",
    "token_rarity",
    "normalize_text",
    "bigram_model",
]

# (c) refill: least-recently-checked remainder, CORRECTNESS_r04 order.
_PRIORITY_EXTRA = [
    "dataset_hash_split",
    "stratified_sample_counts",
    "sequence_packing",
]


DRIVER_WINDOW_SLOTS = 50


def driver_window() -> tuple[list[str], list[str]]:
    """Return (inside, overflow): the registry names that land in the
    driver's 50-entry hash-check window this round vs those that
    rotate to the next round. Computed from the live registry so the
    split is never hard-coded wrong."""
    names = list(QUERIES)
    return names[:DRIVER_WINDOW_SLOTS], names[DRIVER_WINDOW_SLOTS:]


def _rotate() -> None:
    front = [n for n in _DRIVER_PRIORITY + _PRIORITY_EXTRA if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    ordered = {n: QUERIES[n] for n in front + rest}
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate()
