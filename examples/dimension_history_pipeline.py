#!/usr/bin/env python
"""Point-in-time-correct feature engineering over dimension history:

    CDC replay -> SCD2Store (bucket-incremental dimension history)
    -> point-in-time state at each label instant (backward as-of)
    -> next-state label (forward as-of) + nearest-state diagnostic
    -> Z-order rewrite of the fact table for multi-column skipping

The ML-leakage story: training features must reflect what was KNOWN
at each label's event time, not the dimension's current state. The
SCD2 history answers "what was this user's state at time t" exactly;
the backward as-of join pulls it per label row without interval-join
explosion, the forward direction builds the label itself, and the
whole path is deterministic. Prints one JSON line of per-stage counts.

    python examples/dimension_history_pipeline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from svoe_spark.operators.asof import asof_join, asof_join_nearest  # noqa: E402
from svoe_spark.operators.layout import zorder_write  # noqa: E402
from svoe_spark.operators.scd import SCD2Store, scd2_to_log  # noqa: E402
from svoe_spark.session import get_spark  # noqa: E402
from svoe_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("dimension_history_pipeline", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir}
    work = tempfile.mkdtemp(prefix="dim_history_")

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )

    # 1. CDC replay into the dimension store: two "days" of updates,
    # the second merged incrementally (touches only its keys' buckets)
    cut = ev.selectExpr("percentile(unix_micros(ts), 0.5) AS m").first()["m"]
    store = SCD2Store(
        spark,
        os.path.join(work, "user_state_dim"),
        key="user_id",
        attr_cols=["event_type"],
        ts="ts",
        tie_col="event_id",
        n_buckets=8,
    )
    store.apply_batch(ev.where(F.unix_micros("ts") <= cut), batch_id=0)
    touched = store.refresh(
        ev.where(F.unix_micros("ts") > cut), batch_id=1
    )
    out["buckets_rewritten_by_batch2"] = len(touched)
    hist = store.read()
    out["history_intervals"] = hist.count()
    out["current_rows"] = store.current().count()

    # 2. Point-in-time features: for each purchase, the user's state
    # as of the purchase instant (backward as-of over the history's
    # change log — leakage-free by construction)
    labels = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", F.col("value").alias("purchase_value")
    )
    state_log = scd2_to_log(
        hist, "user_id", ["event_type"], ts="ts", tie_col="event_id"
    ).select("user_id", "ts", F.col("event_type").alias("state_at_label"))
    pit = asof_join(
        labels, state_log, on="ts", by="user_id", right_cols=["state_at_label"]
    )
    out["labels_with_pit_state"] = pit.where(
        F.col("state_at_label").isNotNull()
    ).count()

    # 3. Forward as-of: the user's NEXT observed state (a lookahead
    # label), and nearest-state diagnostic for sanity dashboards
    nxt = asof_join(
        labels,
        state_log.select("user_id", "ts", F.col("state_at_label").alias("next_state")),
        on="ts",
        by="user_id",
        right_cols=["next_state"],
        direction="forward",
    )
    out["labels_with_next_state"] = nxt.where(
        F.col("next_state").isNotNull()
    ).count()
    near = asof_join_nearest(
        labels,
        state_log.select("user_id", "ts", F.col("state_at_label").alias("near_state")),
        on="ts",
        by="user_id",
        right_cols=["near_state"],
        tolerance="7d",
    )
    out["labels_with_near_state_7d"] = near.where(
        F.col("near_state").isNotNull()
    ).count()

    # 4. Lake layout: Z-order the fact table on (user_id, value cents)
    # so point-in-time backfills filtering on EITHER column skip files
    facts = ev.select(
        "event_id",
        "ts",
        F.col("user_id").cast("long").alias("user_id"),
        F.round(F.col("value") * 100, 0).cast("long").alias("value_c"),
    )
    zpath = os.path.join(work, "facts_zorder")
    zorder_write(facts, ["user_id", "value_c"], zpath, n_files=8, bits=10)
    out["zorder_files"] = len(
        [f for f in os.listdir(zpath) if f.startswith("part-")]
    )
    out["zorder_rows"] = spark.read.parquet(zpath).count()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
