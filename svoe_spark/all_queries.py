"""Import every query-registering module and re-export the registry.

Import THIS (not svoe_spark.queries) anywhere the full registry is
needed — decorator registration only happens on module import.

Registry ORDER matters: the correctness driver hash-checks the FIRST
50 entries only. Rounds 1-2 driver-verified the relational core
(q1..supplier_balance_ranks, 50 green rows in CORRECTNESS_r01/r02);
round 3 rotates the never-driver-checked tail — the entire LLM-data
layer plus the post-50 relational queries — to the FRONT so the
window finally hash-checks them. The previously-green rows rotate
out; their twice-green history is the documented justification
(README "Registry order" section).
"""

import svoe_spark.queries  # noqa: F401
import svoe_spark.queries_llm  # noqa: F401
from svoe_spark.queries import QUERIES  # noqa: F401

# Names to surface into the driver's 50-entry window, in check order.
# First: the 45 queries with no driver row in any prior round
# (CORRECTNESS_r01/r02), then any round-3 additions appended by
# _PRIORITY_EXTRA below. Everything else keeps its original relative
# order after these.
_DRIVER_PRIORITY = [
    # LLM-data layer (queries_llm.py) — zero driver rows through r2.
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_simhash",
    "dedup_clusters",
    "chunk_dedup",
    "benchmark_contamination",
    "text_token_stats",
    "text_quality",
    "text_lang_id",
    "text_lang_ngram",
    "text_repetition_signals",
    "token_rarity",
    "normalize_text",
    "bigram_model",
    "pii_redact",
    "corpus_filter",
    "doc_fingerprint",
    "multimodal_byte_features",
    "multimodal_frame_sample",
    "ann_cosine_topk",
    "ann_batch_topk",
    "ann_lsh_topk",
    "ann_lsh_multiprobe",
    "ann_ivf_topk",
    "ann_ivf_multiprobe",
    "embedding_neardup",
    "embedding_neardup_lsh",
    "embedding_quantize",
    "dataset_shuffle_rank",
    "dataset_hash_split",
    "stratified_sample_counts",
    "sequence_packing",
    "source_mixture_weights",
    # Post-50 relational tail (queries.py) — also never driver-checked.
    "median_order_value",
    "approx_distinct_daily",
    "q2_min_cost_supplier",
    "q11_valuable_parts",
    "q20_part_promotion_suppliers",
    "q21_waiting_supplier",
    "distinct_until_changed_events",
    "asof_multi_feature",
    "unpivot_lineitem_measures",
    "pivot_priority_by_year",
]

# Round-3 additions that should also land inside the window (appended
# as they are registered; keep this list short — 50 - 45 = 5 slots).
_PRIORITY_EXTRA = [
    "ann_ivf_trained",
    "backtest_param_grid",
    "dedup_clusters_twostar",
    "live_book_features",
]


def _rotate() -> None:
    front = [n for n in _DRIVER_PRIORITY + _PRIORITY_EXTRA if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    ordered = {n: QUERIES[n] for n in front + rest}
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate()
