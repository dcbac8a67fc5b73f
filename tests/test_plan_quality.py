"""Physical-plan quality gates: the properties that make these queries
survive a 100 TB scale-up, asserted on the actual Catalyst plans so a
regression (a lost pushdown, a broadcast that degrades to sort-merge, a
partial aggregation that disappears) fails CI rather than shipping.

These mirror the brief's checklist: filters reach the parquet scan,
scans prune columns, small dims broadcast, aggregates combine map-side,
and expression pipelines stay inside whole-stage codegen.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from svoe_spark.all_queries import QUERIES

pytestmark = pytest.mark.heavy  # multi-minute suite: deselected by the
# default `pytest tests/ -q` tier (pytest.ini); scripts/ptest.py shards and
# the round-close sweep run it



def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark, sf_mid):
    cache: dict[str, str] = {}

    def get(name: str) -> str:
        if name not in cache:
            cache[name] = plan_of(QUERIES[name].fn(spark, sf_mid))
        return cache[name]

    return get


def test_q6_filters_push_to_parquet_scan(plans):
    p = plans("q6_forecast_revenue")
    pushed = [l for l in p.splitlines() if "PushedFilters" in l]
    assert pushed, p
    line = pushed[0]
    # every predicate of the WHERE clause reaches the reader
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.03)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in line, line


def test_q6_scan_prunes_columns(plans):
    p = plans("q6_forecast_revenue")
    schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    # 4 needed columns only; the wide rest of lineitem is never read
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in schema, schema
    for col in ("l_orderkey", "l_partkey", "l_returnflag", "l_linestatus"):
        assert col not in schema, schema


def test_dim_joins_broadcast_not_sort_merge(plans):
    # part (q14), customer (q3): small dims must broadcast — a
    # sort-merge join here would shuffle the 100 TB fact side
    for q in ("q14_promo_share", "q3_shipping_priority"):
        p = plans(q)
        assert "BroadcastHashJoin" in p, q
        assert "SortMergeJoin" not in p, q


def test_q18_semi_join_is_broadcast(plans):
    p = plans("q18_large_volume_customers")
    assert "BroadcastHashJoin LeftSemi" in p, p


def test_aggregates_have_map_side_partial(plans):
    # partial_ aggregate = map-side combine before the shuffle; without
    # it every input row crosses the network
    for q in ("q1_pricing_summary", "ohlcv_1m", "dedup_exact", "q6_forecast_revenue"):
        assert "partial_" in plans(q), q


def test_ohlcv_single_shuffle(plans):
    # tumbling-window agg needs exactly one exchange (hash by window
    # key); the second Exchange in the plan is AQE's final coalesce read
    p = plans("ohlcv_1m")
    assert p.count("Exchange hashpartitioning") <= 1, p


def test_scans_stay_in_codegen(spark, sf_mid):
    # expression pipelines run inside whole-stage codegen spans; AQE
    # only annotates codegen ids in the FINAL plan, so execute first
    for q in ("q1_pricing_summary", "q6_forecast_revenue", "tvi_1h"):
        df = QUERIES[q].fn(spark, sf_mid)
        df.collect()
        p = plan_of(df)
        assert "isFinalPlan=true" in p and "codegen id" in p, q


def test_tpch_batch2_joins_broadcast_not_sort_merge(plans):
    # nation/part/customer dims in the second TPC-H batch must all
    # broadcast; the fact side never shuffles for a dim lookup
    for q in (
        "q7_volume_shipping",
        "q9_product_profit",
        "q10_returned_item",
        "q16_supplier_count",
    ):
        p = plans(q)
        assert "BroadcastHashJoin" in p, q
        assert "SortMergeJoin" not in p, q


def test_q22_anti_join_is_broadcast(plans):
    # NOT EXISTS compiles to a broadcast left-anti, not a shuffle
    p = plans("q22_global_sales_opportunity")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p


def test_q13_outer_join_preserves_build_side(plans):
    # LEFT OUTER must stay an outer hash join (zero-order customers
    # survive); the two-level aggregation keeps map-side partials
    p = plans("q13_order_distribution")
    assert "LeftOuter" in p, p
    assert "partial_count" in p, p


def test_events_scan_prunes_for_projection(spark, sf_mid):
    from svoe_spark.sources.tables import load_table

    df = load_table(spark, "events", sf_mid).select("event_type", "value")
    schema = [l for l in plan_of(df).splitlines() if "ReadSchema" in l][0]
    assert "props" not in schema and "user_id" not in schema, schema


def test_q2_semi_filter_before_window_shuffle(plans):
    # the part-subset semi join must broadcast and sit BELOW the
    # row_number exchange, so the window shuffle carries the pruned
    # fact subset, not all of lineitem
    p = plans("q2_min_cost_supplier")
    assert "BroadcastHashJoin" in p and "LeftSemi" in p, p
    assert "SortMergeJoin" not in p, p


def test_q11_global_scalar_is_broadcast(plans):
    # the HAVING-vs-global-total compare must be a broadcast nested
    # loop of ONE row, never a shuffle of the grouped set to a single
    # partition
    p = plans("q11_valuable_parts")
    assert "BroadcastNestedLoopJoin" in p, p
    assert "partial_sum" in p, p


def test_q20_fact_scanned_once(plans):
    # the nested semi-join chain touches lineitem exactly once, with
    # the date filter pushed to the reader
    p = plans("q20_part_promotion_suppliers")
    assert p.count("lineitem.parquet") == 1, p
    pushed = [l for l in p.splitlines() if "PushedFilters" in l and "l_shipdate" in l]
    assert pushed, p


def test_q21_single_fact_shuffle(plans):
    # the EXISTS/NOT-EXISTS rewrite must keep exactly one wide
    # shuffle of the fact join (hash by l_orderkey) — the whole point
    # of the aggregation rewrite; supplier lookup stays broadcast
    p = plans("q21_waiting_supplier")
    assert p.count("lineitem.parquet") == 1, p
    assert "BroadcastHashJoin" in p, p


def test_shingle_arrays_materialize_token_hashes_once(spark, sf_mid):
    # the explode barrier must keep exactly ONE md5 evaluation site in
    # the optimized plan; if projection collapse ever inlines the
    # token-hash array into the per-element shingle accesses, md5 shows
    # up once per element_at (quadratic per-document work)
    from svoe_spark.operators.dedup import _shingle_arrays
    from svoe_spark.sources.tables import load_table

    df = load_table(spark, "documents", sf_mid)
    plan = _shingle_arrays(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("md5") == 1, plan


def test_minhash_signature_is_shuffle_free(spark, sf_mid):
    # signatures must derive inside the scan stage: no Exchange beyond
    # the deliberate spread() round-robin of the single local file
    from svoe_spark.operators.dedup import minhash_signature
    from svoe_spark.sources.tables import load_table

    df = load_table(spark, "documents", sf_mid)
    p = minhash_signature(df)._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1 and "roundrobin" in p.lower(), p


def test_curation_rank_has_no_single_task_window(spark, sf_mid):
    # the global rank must never contain a partition-less window sort
    # (Spark plans those as Exchange SinglePartition)
    from svoe_spark.operators.curation import deterministic_shuffle
    from svoe_spark.sources.tables import load_table

    df = load_table(spark, "documents", sf_mid).select("doc_id")
    p = deterministic_shuffle(df)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in p, p


def test_repetition_signals_is_single_scan_stage(plans):
    # everything array-side: the only Exchange allowed is the
    # round-robin spread of the single-partition fixture file — no
    # hash shuffle, no join in the plan
    p = plans("text_repetition_signals")
    assert "hashpartitioning" not in p, p
    assert "Join" not in p, p


def test_pii_redact_zero_shuffle_and_column_pruning(plans):
    p = plans("pii_redact")
    assert "hashpartitioning" not in p, p
    # only doc_id + text are read from the documents scan
    schema = [l for l in p.splitlines() if "ReadSchema" in l]
    assert schema and "lang" not in schema[0] and "source" not in schema[0], p


def test_chunk_dedup_shuffles_are_bounded(plans):
    # exactly the two semantic shuffles (chunk text, then doc id) plus
    # the round-robin spread — anything more is a plan regression
    p = plans("chunk_dedup")
    n_hash = p.count("hashpartitioning")
    assert 1 <= n_hash <= 3, f"unexpected shuffle count {n_hash}\n{p}"


def test_quantize_embeddings_zero_shuffle(plans):
    # no hash shuffle and no join — the only Exchange allowed is the
    # round-robin spread of the single-partition fixture file
    p = plans("embedding_quantize")
    assert "hashpartitioning" not in p, p
    assert "Join" not in p, p


def test_quality_classifier_zero_shuffle_and_pruned_scan(plans):
    # hashed-BoW fold runs inside the scan: no hash shuffle, no join,
    # and only doc_id + text read from the documents table
    p = plans("quality_classifier_scores")
    assert "hashpartitioning" not in p, p
    assert "Join" not in p, p
    schema = [l for l in p.splitlines() if "ReadSchema" in l]
    assert schema and "lang" not in schema[0] and "source" not in schema[0], p


def test_repeated_ngram_spans_single_gram_shuffle(plans):
    # one hash shuffle on the gram key (the window), one on the doc key
    # (per-doc islands + span agg may share); no join in the plan —
    # the groupBy+self-join formulation this replaced had both
    p = plans("repeated_ngram_spans")
    assert "Join" not in p, p
    n_hash = p.count("hashpartitioning")
    assert 1 <= n_hash <= 3, f"unexpected shuffle count {n_hash}\n{p}"


def test_semantic_dedup_assignment_is_shuffle_free(spark, sf_mid):
    # the argmax cluster assignment must stay a projection: no
    # exchange, no join before the pair step
    from pyspark.sql import functions as F

    from svoe_spark.operators.similarity import ivf_assign, ivf_assign_2level
    from svoe_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_mid)
    cents = [
        list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    p = plan_of(ivf_assign(emb, cents))
    assert "hashpartitioning" not in p and "Join" not in p, p
    sub = [cents for _ in range(4)]
    p2 = plan_of(ivf_assign_2level(emb, cents, sub))
    assert "hashpartitioning" not in p2 and "Join" not in p2, p2


def test_rollup_1h_two_partial_aggregations(plans):
    # ticks -> 1m bars -> 1h bars: exactly two hash shuffles, each with
    # a map-side partial aggregate before it
    p = plans("ohlcv_1h_rollup")
    n_hash = p.count("hashpartitioning")
    assert n_hash == 2, f"unexpected shuffle count {n_hash}\n{p}"
    assert "partial_" in p.lower() or "HashAggregate" in p, p


def test_rollup_store_refresh_read_prunes_to_touched_days(
    spark, sf_small, tmp_path
):
    # the store's OWN incremental read path (RollupStore._read_days,
    # the one refresh() merges against) must carry a day partition
    # filter — asserting a hand-built read here would keep passing even
    # if refresh regressed to a full scan
    from pyspark.sql import functions as F

    from svoe_spark.operators.rollup import RollupStore
    from svoe_spark.queries import ticks

    t = ticks(spark, sf_small)
    store = RollupStore(spark, str(tmp_path / "bars"))
    store.refresh(t)
    days = [
        r["d"]
        for r in t.select(F.to_date("ts").alias("d")).distinct().limit(1).collect()
    ]
    p = plan_of(store._read_days(days))
    pf = [l for l in p.splitlines() if "PartitionFilters" in l]
    assert pf and "day" in pf[0] and "PartitionFilters: []" not in pf[0], p


def test_per_source_topk_window_partitioned_by_group(plans):
    # the rank window must be partitioned by source — a SinglePartition
    # exchange here would serialize the corpus through one task
    p = plans("per_source_topk")
    assert "SinglePartition" not in p, p


def test_temperature_sample_broadcast_rates(spark):
    from svoe_spark.operators.curation import temperature_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 5}") for i in range(200)], "doc_id long, source string"
    )
    plan = (
        temperature_sample(df, target_n=50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the per-source rate relation reaches the corpus as a broadcast
    # hash join — never a shuffled join of the big side
    assert "BroadcastHashJoin" in plan


def test_frequent_items_filters_are_broadcast(spark):
    from svoe_spark.operators.sketches import CMSParams, frequent_items

    df = spark.createDataFrame([(f"k{i % 9}",) for i in range(300)], "k string")
    plan = (
        frequent_items(df, "k", 30, params=CMSParams())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # each depth filter is a broadcast hash join (map-side, no shuffle
    # of the data side before the final exact count)
    assert plan.count("BroadcastHashJoin") >= 4


def test_funnel_no_cartesian_product(spark):
    import datetime as dt

    from svoe_spark.operators.events_analytics import funnel

    df = spark.createDataFrame(
        [(1, "view", dt.datetime(2024, 1, 1)), (1, "click", dt.datetime(2024, 1, 2))],
        "user_id long, event_type string, ts timestamp",
    )
    plan = (
        funnel(df, ["view", "click"], within="1d")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_unigram_encode_zero_shuffle_and_pruned_scan(plans):
    # Viterbi encode is a pure projection (pandas UDF inside the scan):
    # no shuffle, no join; only doc_id + text read
    p = plans("unigram_tokens")
    assert "hashpartitioning" not in p, p
    assert "Join" not in p, p
    schema = [l for l in p.splitlines() if "ReadSchema" in l]
    assert schema and "lang" not in schema[0] and "source" not in schema[0], p


def test_trained_classifier_plan_matches_default_classifier(plans):
    # the trained artifact must not change the plan shape: still
    # zero-shuffle, join-free, pruned scan
    p = plans("quality_classifier_trained")
    assert "hashpartitioning" not in p, p
    assert "Join" not in p, p


def test_refined_ann_is_broadcast_and_take_ordered(plans):
    # the refine stage: candidate ids BROADCAST into the vector scan
    # (never a shuffled join) and the final top-k is a TakeOrdered
    p = plans("ann_ivfpq_refined")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert "TakeOrderedAndProject" in p, p


def test_priority_sample_is_partial_topk_not_global_sort(spark, sf_mid):
    """The k+1 shortlist must come from TakeOrderedAndProject
    (per-partition heaps + one merge) — a global Sort or a
    single-partition Window here would serialize 100 TB through one
    task. The registered query localCheckpoints the shortlist (its
    plan shows Scan ExistingRDD), so inspect the un-materialized
    operator shape. Formatted-plan node headings are '(n) NodeName'."""
    import re

    from pyspark.sql import functions as F

    from svoe_spark.operators.curation import priority_sample
    from svoe_spark.sources.tables import load_table

    o = load_table(spark, "orders", sf_mid).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("w_c"),
    )
    p = plan_of(
        priority_sample(
            o, "w_c", 100, "o_orderkey", salt="ps1",
            materialize_shortlist=False,
        )
    )
    assert re.search(r"\(\d+\) TakeOrderedAndProject", p), p
    assert "CartesianProduct" not in p
    # the tau threshold joins in as a broadcast of a 1-row relation
    assert re.search(r"\(\d+\) BroadcastExchange", p), p
    # no full Sort node anywhere (TakeOrdered is not a Sort)
    assert not re.search(r"\(\d+\) Sort\b", p), p


def test_transition_and_dwell_windows_are_keyed(plans):
    """The lead windows must be PARTITIONED by the user key (parallel
    across users) — an unpartitioned window would sort the whole event
    stream in one task."""
    for name in ("event_transitions_30m", "event_dwell_30m"):
        p = plans(name)
        wlines = [l for l in p.splitlines() if "windowspecdefinition" in l]
        assert wlines, (name, p)
        leads = [l for l in wlines if "lead(" in l]
        assert leads and all("user_id" in l for l in leads), (name, wlines)
        assert "CartesianProduct" not in p


def test_cusum_single_keyed_window_pass(plans):
    """All four CUSUM window aggregates (both prefix sums, running
    min/max) must share ONE keyed sort: every score-stage
    windowspecdefinition carries the identical (event_type, hour_ts
    ASC) spec (same-spec adjacent Window nodes reuse one exchange +
    sort), and the plan's total Sort count stays at the four ranked
    order-statistic passes plus the single score sort."""
    import re

    p = plans("value_cusum_alarms")
    assert "CartesianProduct" not in p
    score_specs = {
        re.sub(r"#\d+L?", "", l.split("windowspecdefinition", 1)[1][:80])
        for l in p.splitlines()
        if "windowspecdefinition" in l and "hour_ts" in l
    }
    assert len(score_specs) == 1, score_specs
    n_sorts = len(re.findall(r"\(\d+\) Sort\b", p))
    assert n_sorts <= 5, (n_sorts, p)


def test_dq_report_single_aggregate_scan(plans):
    """The whole constraint list compiles to ONE aggregate over one
    scan of orders (plus the two ref-integrity sides), never a
    scan-per-rule. Scan identity comes from the Location lines of the
    formatted plan (the table name never appears on the 'Scan
    parquet' heading itself)."""
    p = plans("dq_orders_report")
    locs = [l for l in p.splitlines() if "orders.parquet" in l]
    assert 1 <= len(locs) <= 3, (len(locs), locs)


def test_lloyd_assign_stage_is_shuffle_free(spark, sf_mid):
    """ivf_train_relational's per-round relation (_lloyd_round_sums):
    the argmin assign stage must be a pure projection riding the scan
    — the plan's ONLY Exchange is the k-row partial-agg merge ABOVE
    the argmin projection, so each training round is one corpus scan
    however large the corpus (VERDICT r8 ask 4's plan gate)."""
    from pyspark.sql import functions as F

    from svoe_spark.functions.text import md5_hash
    from svoe_spark.operators.similarity import (
        _ivf_quant,
        _lloyd_round_sums,
        ivf_train_relational,
    )
    from svoe_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_mid)
    q = emb.select(
        F.col("vec_id").alias("__id"),
        _ivf_quant("embedding").alias("qv"),
        md5_hash(F.col("vec_id").cast("string")).alias("__h"),
    )
    dim = len(emb.select("embedding").first()["embedding"])
    cents = [[0] * dim for _ in range(4)]
    import re

    p = plan_of(_lloyd_round_sums(q, cents, dim))
    # exactly one Exchange NODE (the formatted plan repeats each node
    # heading in the detail section): the final merge of the k partial
    # rows
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    # and it is the agg merge (hash on cid), not a scan-side shuffle
    assert "hashpartitioning(cid" in p, p
    # the argmin projection + partial aggregate sit BELOW it: the
    # partial HashAggregate appears before the Exchange in execution
    # order (formatted plans list operators leaves-first per subtree)
    lines = p.splitlines()
    first_exchange = next(i for i, l in enumerate(lines) if "Exchange" in l)
    below = "\n".join(lines[first_exchange:])
    assert "array_min" in below, p  # argmin rides the scan stage
    # end-to-end: the trainer still converges on the real fixture
    cents = ivf_train_relational(emb, k=4, iters=1)
    assert len(cents) == 4 and len(cents[0]) == dim
