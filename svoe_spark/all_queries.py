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
# Round 9 (VERDICT r8 ask 1): LEAD with the four round-8 repairs whose
# driver witness is still outstanding (the formerly rows-only trio +
# the never-driver-checked streaming as-of row — all judge-green
# bit-exact in the r8 session), then refill with the 50 queries whose
# newest driver row is CORRECTNESS_r05, in their r5 check order. After
# the r8 rotation the staleness histogram was exactly 50/50/50/50
# across r5..r8, so this pushes the floor to r6. 4 + 50 = 54 names;
# the last four overflow to the round-10 rotation — compute the actual
# split with driver_window() below (a helper for maintainers and the
# verify harness — nothing prints it automatically) instead of
# hard-coding counts in comments.
_DRIVER_PRIORITY = [
    "approx_distinct_daily",
    "backtest_param_grid",
    "ann_ivf_trained",
    "asof_nearest_stream_events",
    "mad_outlier_top20",
    "candle_patterns_1h",
    "asof_purchase_view_tolerant",
    "rsi_14_hourly",
    "bollinger_bands_1h",
    "fuzzy_part_name_pairs",
    "frequent_active_users",
    "leadlag_corr_types",
    "atr_14_1h",
    "winsorize_doc_lengths",
    "ann_ivfpq_refined",
    "pq_adc_refined",
    "unigram_tokens",
    "unigram_scores",
    "quality_classifier_trained",
    "backtest_grid_cents",
    "q1_pricing_summary",
    "revenue_by_nation",
    "order_priority_count",
    "top_customers_per_nation",
    "part_type_rollup",
    "customer_order_stats",
    "set_ops_order_keys",
    "ohlcv_1m",
    "volatility_1h",
    "tvi_1h",
    "pct_change_1h",
    "asof_purchase_view",
    "asof_purchase_view_bucketed",
    "lookahead_label_1h",
    "sample_last_1m",
    "every_nth_10",
    "token_frequencies",
    "composite_events_by_minute",
    "combine_latest_vector",
    "running_reduce_user",
    "orders_shipped_within_30d",
    "events_content_dedup",
    "sql_frontend_revenue",
    "q6_forecast_revenue",
    "q12_shipmode_priority",
    "q14_promo_share",
    "big_spenders_vs_nation",
    "top_returned_customers",
    "session_windows_30m",
    "orderbook_snapshots",
    "orderbook_snapshots_cryptofeed",
    "local_extrema",
    "ewma_final_by_type",
    "ewma_trend_by_type",
]

# Queue for names that should lead the NEXT round's window: the
# round-9 addition (mergeable log-bucket quantile sketch) has never
# been driver-checked — it fronts the r10 window together with the
# four r5-stale overflow names above it.
_PRIORITY_EXTRA: list[str] = ["approx_quantiles_daily"]


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
