"""Differential tests for dataset-curation operators: the parallel
bucket-prefix decomposition must equal the single-reducer global-window
formulation exactly (the same differential pattern as the as-of join
suite — distributed result vs sequential oracle)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from svoe_spark.operators.curation import (
    deterministic_shuffle,
    global_cumsum,
    global_rank,
    hash_split,
    pack_sequences,
)


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    from svoe_spark.functions.text import tokens
    from svoe_spark.sources.tables import load_table

    d = load_table(spark, "documents", sf_small)
    return d.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    ).persist()


@pytest.fixture(scope="module")
def docs_full(spark, sf_small):
    from svoe_spark.sources.tables import load_table

    # yield + unpersist: a cached load_table relation substitutes into
    # other modules' plans (shared session) and breaks plan-shape gates
    d = load_table(spark, "documents", sf_small).persist()
    yield d
    d.unpersist()


def test_global_cumsum_equals_single_reducer(spark, docs):
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    expected = {
        r["doc_id"]: r["c"]
        for r in docs.withColumn("c", F.sum("n_tokens").over(w)).collect()
    }
    got = {
        r["doc_id"]: r["cumsum"]
        for r in global_cumsum(docs, "doc_id", "n_tokens", buckets=7).collect()
    }
    assert got == expected


def test_global_rank_is_exact_permutation(spark, docs):
    ranked = global_rank(docs, "doc_id", buckets=5).collect()
    n = len(ranked)
    assert sorted(r["rank"] for r in ranked) == list(range(n))
    # rank order must equal key order
    by_key = sorted(ranked, key=lambda r: r["doc_id"])
    assert [r["rank"] for r in by_key] == list(range(n))


def test_deterministic_shuffle_stable_and_salted(spark, docs):
    a = {r["doc_id"]: r["shuffle_rank"] for r in deterministic_shuffle(docs).collect()}
    b = {r["doc_id"]: r["shuffle_rank"] for r in deterministic_shuffle(docs).collect()}
    assert a == b  # reproducible across runs
    c = {
        r["doc_id"]: r["shuffle_rank"]
        for r in deterministic_shuffle(docs, salt="epoch1").collect()
    }
    assert c != a  # a different salt is a different permutation
    assert sorted(c.values()) == sorted(a.values())


def test_hash_split_partition_invariant(spark, docs):
    base = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    reparted = {
        r["doc_id"]: r["split"] for r in hash_split(docs.repartition(13)).collect()
    }
    assert base == reparted
    fracs = {s: list(base.values()).count(s) / len(base) for s in set(base.values())}
    assert fracs["train"] == pytest.approx(0.8, abs=0.1)


def test_pack_sequences_bins_respect_budget(spark, docs):
    budget = 256
    packed = pack_sequences(docs, budget=budget).collect()
    rows = sorted(packed, key=lambda r: r["doc_id"])
    # replay sequentially: bin must equal floor(tokens_before / budget)
    before = 0
    for r in rows:
        assert r["bin_id"] == before // budget
        before += r["n_tokens"]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@pytest.mark.heavy  # r10 trim: 11 s property case; round-close sweep runs it
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(10**9), max_value=10**9),  # key
            st.integers(min_value=-1000, max_value=1000),      # value (negatives too)
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    buckets=st.integers(min_value=1, max_value=9),
)
def test_global_cumsum_property(spark, rows, buckets):
    """Random unique keys (any sign, any spread) and values: the
    bucket-prefix decomposition must equal the sequential cumsum."""
    import pandas as pd

    from svoe_spark.operators.curation import global_cumsum

    pdf = pd.DataFrame(rows, columns=["k", "v"]).sort_values("k")
    expected = dict(zip(pdf["k"], pdf["v"].cumsum()))
    df = spark.createDataFrame(pdf)
    got = {
        r["k"]: r["cumsum"]
        for r in global_cumsum(df, "k", "v", buckets=buckets).collect()
    }
    assert got == expected


def test_global_cumsum_all_null_bucket(spark):
    """A bucket whose values are all NULL must not break the driver-side
    prefix build (SUM over an all-NULL group returns NULL)."""
    from svoe_spark.operators.curation import global_cumsum

    rows = [(k, 1 if not 10 <= k < 20 else None) for k in range(30)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cumsum"]
        for r in global_cumsum(df, "k", "v", buckets=3).collect()
    }
    # running sum ignoring NULLs: 1..10 for k<10, stays 10 through the
    # NULL bucket (NULL rows carry the running value), resumes after
    assert got[9] == 10
    assert got[29] == 20
    assert got[25] == 16


def test_per_group_topk_bound_and_deterministic(spark):
    from svoe_spark.operators.curation import per_group_topk

    df = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    out = per_group_topk(df, "source", k=4).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append((r["rk"], r["doc_id"]))
    assert set(by_src) == {"src0", "src1", "src2"}
    for s, rows in by_src.items():
        assert sorted(rk for rk, _ in rows) == [1, 2, 3, 4], s
    # identical selection under different partitioning and row order
    out2 = per_group_topk(
        df.orderBy(F.desc("doc_id")).repartition(13), "source", k=4
    ).collect()
    assert {(r["source"], r["doc_id"], r["rk"]) for r in out} == {
        (r["source"], r["doc_id"], r["rk"]) for r in out2
    }
    # different salt -> (almost surely) different sample
    out3 = per_group_topk(df, "source", k=4, salt="epoch1").collect()
    assert {(r["source"], r["doc_id"]) for r in out3} != {
        (r["source"], r["doc_id"]) for r in out
    }


def test_hash_sample_is_mergeable_and_layout_invariant(spark, docs_full):
    from svoe_spark.operators.curation import hash_sample

    whole = {
        r["doc_id"]
        for r in hash_sample(docs_full, p=0.3).select("doc_id").collect()
    }
    # sample(A) ∪ sample(B) == sample(A ∪ B): membership is id-only
    a = hash_sample(docs_full.where(F.col("doc_id") % 2 == 0), p=0.3)
    b = hash_sample(docs_full.where(F.col("doc_id") % 2 == 1), p=0.3)
    parts = {r["doc_id"] for r in a.unionByName(b).select("doc_id").collect()}
    assert parts == whole
    # repartitioning does not change membership
    re = {
        r["doc_id"]
        for r in hash_sample(docs_full.repartition(13), p=0.3)
        .select("doc_id")
        .collect()
    }
    assert re == whole
    n = docs_full.count()
    assert 0.15 * n < len(whole) < 0.45 * n  # ~Binomial(n, .3)


def test_bottom_k_sample_uniform_and_deterministic(spark, docs_full):
    from svoe_spark.operators.curation import bottom_k_sample

    s1 = bottom_k_sample(docs_full, k=7, group_cols=["source"])
    rows = s1.groupBy("source").count().collect()
    assert all(r["count"] <= 7 for r in rows)
    # deterministic: same draw twice; different under a new salt
    ids = lambda df: sorted(r["doc_id"] for r in df.select("doc_id").collect())
    assert ids(s1) == ids(
        bottom_k_sample(docs_full, k=7, group_cols=["source"])
    )
    assert ids(s1) != ids(
        bottom_k_sample(docs_full, k=7, group_cols=["source"], salt="epoch2")
    )
    # global (ungrouped) form: exactly k rows, ranked 1..k
    g = bottom_k_sample(docs_full, k=9).collect()
    assert sorted(r["sample_rank"] for r in g) == list(range(1, 10))


def test_grouped_split_never_leaks(spark, docs_full):
    from svoe_spark.operators.curation import grouped_split

    per_source = (
        grouped_split(docs_full, "source")
        .groupBy("source")
        .agg(F.count_distinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_source)  # no straddling


def test_order_statistics_match_numpy(spark, docs_full):
    import numpy as np

    from svoe_spark.operators.profiling import order_statistics

    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = {
        (r["source"], r["q"]): r["value"]
        for r in order_statistics(
            docs_full.select("source", F.length("text").alias("v")),
            "v",
            qs,
            group_cols=["source"],
        ).collect()
    }
    pdf = docs_full.select("source", F.length("text").alias("v")).toPandas()
    for src, grp in pdf.groupby("source"):
        vals = np.sort(grp["v"].to_numpy())
        for q in qs:
            k = int(np.floor((len(vals) - 1) * q))  # type-1 lower quantile
            assert got[(src, q)] == vals[k], (src, q)


def test_order_statistics_global_no_group(spark, docs_full):
    from svoe_spark.operators.profiling import order_statistics

    got = order_statistics(
        docs_full.select(F.length("text").alias("v")), "v", [0.5]
    ).collect()
    assert len(got) == 1
    vals = sorted(
        r["v"] for r in docs_full.select(F.length("text").alias("v")).collect()
    )
    assert got[0]["value"] == vals[(len(vals) - 1) // 2]


def test_pps_sample_exact_k_and_deterministic(spark, docs_full):
    from svoe_spark.operators.curation import pps_systematic_sample

    d = docs_full.select("doc_id", "n_chars")
    s = pps_systematic_sample(d, "n_chars", 20)
    got = sorted(r["doc_id"] for r in s.collect())
    # no doc holds > W/20 of the mass in this corpus -> exactly k rows
    assert len(got) == 20
    # layout-invariant: same draw after repartitioning
    re = pps_systematic_sample(d.repartition(17), "n_chars", 20)
    assert sorted(r["doc_id"] for r in re.collect()) == got
    # a different salt is a fresh draw
    alt = pps_systematic_sample(d, "n_chars", 20, salt="epoch2")
    assert sorted(r["doc_id"] for r in alt.collect()) != got


def test_pps_sample_heavy_row_certainty_zero_never(spark):
    from svoe_spark.operators.curation import pps_systematic_sample

    rows = [(1, 1000)] + [(i, 1) for i in range(2, 42)] + [(99, 0)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r["doc_id"] for r in pps_systematic_sample(df, "w", 5).collect()}
    assert 1 in got      # w > W/k -> certainty selection, exactly once
    assert 99 not in got  # zero weight is never selected
    assert len(got) <= 5


@pytest.mark.heavy  # round-9 quick-tier trim: ptest.py/round-close still run it
def test_pps_sample_inclusion_proportional_to_weight(spark):
    import collections

    from svoe_spark.operators.curation import pps_systematic_sample

    rows = [(i, 10 if i % 10 == 0 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long").persist()
    hits = collections.Counter()
    for salt in ("a", "b", "c", "d", "e", "f", "g", "h"):
        for r in pps_systematic_sample(df, "w", 20, salt=salt).collect():
            hits[r["doc_id"] % 10 == 0] += 1
    df.unpersist()
    # heavy rows are 10x likelier per row: 20 heavy vs 180 light rows
    # carry 200 vs 180 weight -> roughly equal total hits
    assert 0.5 < hits[True] / hits[False] < 2.0


def test_temperature_sample_rebalances(spark):
    from svoe_spark.operators.curation import temperature_sample

    # 900 'big' docs vs 100 'small': natural mix 9:1, tau=0.5 weights
    # 30:10 -> small is up-weighted 3x relative to natural
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = temperature_sample(df, target_n=400, tau=0.5).groupBy("source").count()
    got = {r["source"]: r["count"] for r in kept.collect()}
    # expected: big 400*(30/40) = 300, small 400*(10/40) = 100 (rate 1.0
    # -> all 100 small docs kept with certainty)
    assert got["small"] == 100
    assert 240 <= got["big"] <= 360  # binomial around 300


def test_temperature_sample_tau_extremes_and_validation(spark):
    import pytest

    from svoe_spark.operators.curation import temperature_sample

    rows = [(i, "a" if i < 600 else "b") for i in range(800)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # tau=1: natural distribution -> same rate everywhere
    kept1 = temperature_sample(df, target_n=200, tau=1.0)
    # tau=0: uniform target -> equal EXPECTED counts per source
    kept0 = temperature_sample(df, target_n=200, tau=0.0)
    g1 = {r["source"]: r["count"] for r in kept1.groupBy("source").count().collect()}
    g0 = {r["source"]: r["count"] for r in kept0.groupBy("source").count().collect()}
    assert g1["a"] > g1["b"]  # natural 3:1 mix preserved
    assert abs(g0["a"] - g0["b"]) < 60  # both expect 100
    with pytest.raises(ValueError):
        temperature_sample(df, tau=0.7)


def test_temperature_sample_layout_invariant(spark):
    from svoe_spark.operators.curation import temperature_sample

    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = {r["doc_id"] for r in temperature_sample(df, target_n=100).collect()}
    b = {
        r["doc_id"]
        for r in temperature_sample(df.repartition(7), target_n=100).collect()
    }
    assert a == b


def test_pps_systematic_sample_zero_total_weight(spark):
    """ADVICE r4: W=0 (all rows zero-weight) must select nothing, not
    raise DIVIDE_BY_ZERO under ANSI mode."""
    from svoe_spark.operators.curation import pps_systematic_sample

    df = spark.createDataFrame(
        [(i, 0) for i in range(10)], "doc_id long, n_chars long"
    )
    assert pps_systematic_sample(df, "n_chars", 5).count() == 0
    empty = df.where("doc_id < 0")
    assert pps_systematic_sample(empty, "n_chars", 5).count() == 0


# ---------------------------------------------------------------------------
# priority_sample
# ---------------------------------------------------------------------------


def _weighted(spark, n=500, heavy=3):
    from pyspark.sql import functions as F

    # a few very heavy items among a light population
    df = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") < heavy, F.lit(100000))
        .otherwise(F.lit(10) + F.col("id") % 7)
        .cast("long")
        .alias("w"),
    )
    return df


def test_priority_sample_size_threshold_and_heavy_items(spark):
    from svoe_spark.operators.curation import priority_sample

    df = _weighted(spark)
    out = priority_sample(df, "w", 50, "id", salt="t").collect()
    assert len(out) == 50
    ids = {r["id"] for r in out}
    # heavy items are (near-)certain picks: q = w/u >= w
    assert {0, 1, 2} <= ids
    # est_w = max(w, tau) >= w, and equals w for the heavy rows
    for r in out:
        assert r["est_w"] >= r["w"]
    heavy = [r for r in out if r["id"] < 3]
    assert all(r["est_w"] == r["w"] for r in heavy)


def test_priority_sample_subset_sum_estimator_is_calibrated(spark):
    """sum(est_w) over the sample estimates the true total; with k=100
    of 500 skewed rows the realized error should be small (fixed salt
    -> deterministic check, bound chosen ~3x the observed error)."""
    from svoe_spark.operators.curation import priority_sample

    df = _weighted(spark).persist()
    true_total = df.groupBy().sum("w").collect()[0][0]
    out = priority_sample(df, "w", 100, "id", salt="est")
    est_total = sum(r["est_w"] for r in out.collect())
    assert abs(est_total - true_total) / true_total < 0.15


def test_priority_sample_degenerate_and_validation(spark):
    import pytest
    from pyspark.sql import functions as F

    from svoe_spark.operators.curation import priority_sample

    small = _weighted(spark, n=5, heavy=0)
    out = priority_sample(small, "w", 10, "id").collect()
    assert len(out) == 5 and all(r["est_w"] == r["w"] for r in out)
    with pytest.raises(ValueError):
        priority_sample(small, "w", 0, "id")
    # batch inputs are guarded by an eager limit-1 pre-scan (round 8:
    # the folded assert_true proved foldable-away in constant-NULL
    # union branches — see test_priority_sample_validates_rows_outside
    # _the_sample), so the raise happens at operator-call time
    bad = small.withColumn("w", F.col("w") - F.lit(100))
    with pytest.raises(Exception, match="positive non-NULL"):
        priority_sample(bad, "w", 2, "id").collect()
    # opt-out skips the per-row check entirely: bad rows just drop out
    assert priority_sample(bad, "w", 2, "id", validate=False).count() <= 2


def test_priority_sample_resalts(spark):
    from svoe_spark.operators.curation import priority_sample

    df = _weighted(spark).persist()
    a = {r["id"] for r in priority_sample(df, "w", 50, "id", salt="a").collect()}
    b = {r["id"] for r in priority_sample(df, "w", 50, "id", salt="b").collect()}
    a2 = {r["id"] for r in priority_sample(df, "w", 50, "id", salt="a").collect()}
    assert a == a2
    assert a != b


def test_priority_sample_rejects_null_weights_and_ids(spark):
    import pytest
    from pyspark.sql import functions as F

    from svoe_spark.operators.curation import priority_sample

    df = _weighted(spark, n=10, heavy=0)
    with_null_w = df.withColumn(
        "w", F.when(F.col("id") == 5, None).otherwise(F.col("w"))
    )
    with pytest.raises(Exception, match="positive non-NULL"):
        priority_sample(with_null_w, "w", 3, "id").collect()
    with_null_id = df.withColumn(
        "id", F.when(F.col("id") == 5, None).otherwise(F.col("id"))
    )
    with pytest.raises(Exception, match="non-NULL"):
        priority_sample(with_null_id, "w", 3, "id").collect()


# ---------------------------------------------------------------------------
# cluster_aware_split
# ---------------------------------------------------------------------------


@pytest.mark.heavy  # round-10 quick-tier trim (slowest cases -> sharded tier)
def test_cluster_aware_split_never_splits_a_near_dup_pair(spark, sf_small):
    """The leakage invariant: every verified near-dup pair lands in ONE
    split (the whole point of keying the hash on the cluster id) — and
    the same data split by doc id DOES scatter at least one cluster,
    proving the invariant is doing work on this corpus."""
    from svoe_spark.operators.curation import cluster_aware_split, hash_split
    from svoe_spark.operators.dedup import minhash_dedup_pairs
    from svoe_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_small)
    p = minhash_dedup_pairs(docs)
    pairs = p.select("id_a", "id_b").persist()
    assert pairs.count() > 0  # the corpus has planted near-dups

    assigned = cluster_aware_split(docs, pairs)
    sp = assigned.select("doc_id", "split", "cluster_id")
    cross = (
        pairs.join(sp.toDF("id_a", "sa", "ca"), "id_a")
        .join(sp.toDF("id_b", "sb", "cb"), "id_b")
        .where(F.col("sa") != F.col("sb"))
        .count()
    )
    assert cross == 0
    # fractions roughly honored and all three splits present
    counts = {r["split"]: r["n"] for r in
              assigned.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert counts["train"] > counts["valid"] and counts["train"] > counts["test"]

    # negative control: a doc-id hash split scatters some cluster
    naive = hash_split(sp.select("doc_id", "cluster_id"))
    leaks = (
        naive.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert leaks > 0
    if hasattr(p, "_svoe_persisted"):
        p._svoe_persisted.unpersist()
    pairs.unpersist()


def test_priority_sample_validates_rows_outside_the_sample(spark):
    """Pins the folded-validation contract (operators/curation.py): the
    per-row assert_true rides the __q projection, which the TakeOrdered
    full scan evaluates for EVERY input row — so a bad row must raise
    even when its priority could never reach the top-k sample. If a
    plan change ever lets non-sampled rows skip the projection, this
    fails. Round-8 postscript: the fold WAS foldable away — a union
    branch with a constant-NULL weight made the WHEN all-NULL and
    SimplifyConditionals discarded the assert — so the batch path now
    uses the eager limit-1 pre-scan and this test pins THAT."""
    import pytest
    from pyspark.sql import functions as F

    from svoe_spark.operators.curation import priority_sample

    # 50 huge-weight rows dominate the k=3 sample; one planted NULL
    # weight sits far outside any plausible top-k
    good = spark.range(50).select(
        F.col("id"), (F.lit(10**9) + F.col("id")).alias("w")
    )
    bad = spark.range(50, 51).select(
        F.col("id"), F.lit(None).cast("long").alias("w")
    )
    df = good.unionByName(bad)
    with pytest.raises(Exception, match="positive non-NULL"):
        priority_sample(df, "w", 3, "id").collect()
