#!/usr/bin/env python
"""End-to-end operational-monitoring pipeline over the event stream:

    declared data-quality contract (one-aggregate-pass verification +
    referential integrity) -> hour-of-day robust seasonal anomaly
    flags -> MAD-calibrated CUSUM changepoint alarms on the hourly
    value level -> Markov transition matrix of user flows (with the
    lowest-probability observed transitions as the anomalous-path
    report)

This is the "is the pipeline healthy" composition: contract violations
catch schema/ingest breakage, seasonal outliers catch single bad
hours, CUSUM catches sustained drifts that no single hour triggers,
and the transition tail surfaces never-seen user paths. Every stage is
a partition-parallel relational plan over exact integers (one float
division at each report edge), so re-running yields byte-identical
outputs. Prints one JSON line of per-stage counts.

    python examples/ops_monitoring_pipeline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from svoe_spark.operators import quality_checks as qc  # noqa: E402
from svoe_spark.operators.changepoint import cusum_scores  # noqa: E402
from svoe_spark.operators.events_analytics import transition_matrix  # noqa: E402
from svoe_spark.operators.profiling import (  # noqa: E402
    attach_broadcast,
    order_statistics,
    robust_outliers,
)
from svoe_spark.session import get_spark  # noqa: E402
from svoe_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ops_monitoring_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, int] = {}

    e = load_table(spark, "events", sf_dir).persist()
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)

    # 1. the data contract: one aggregate pass + one integrity probe
    report = qc.run_checks(
        e,
        [
            qc.completeness("user_id"),
            qc.in_set(
                "event_type", ["view", "click", "purchase", "signup", "error"]
            ),
            qc.bounds("value", lo=0.0),
            qc.matches("props", r"^\{"),
        ],
        unique=["event_id"],
    ).unionByName(qc.ref_integrity(orders, "o_custkey", customer, "c_custkey"))
    failed = report.where(~F.col("passed"))
    out["dq_checks"] = report.count()
    out["dq_failed"] = failed.count()

    # 2. seasonal anomalies: hourly volume vs the same hour-of-day
    hourly = (
        e.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sv"),
        )
        .withColumn("hod", F.hour("hour_ts").cast("long"))
        .withColumn("avg_c", F.expr("sv DIV n"))
        .persist()
    )
    seasonal = robust_outliers(hourly, "n", ["event_type", "hod"]).where(
        (F.col("score") > 3.0) | (F.col("score").isNull() & (F.col("dev") > 0))
    )
    out["seasonal_anomalies"] = seasonal.count()

    # 3. CUSUM drift alarms on the hourly value level (MAD-calibrated)
    med = order_statistics(
        hourly, "avg_c", [0.5], ["event_type"], out="med"
    ).select("event_type", "med")
    d = attach_broadcast(hourly, med, ["event_type"]).withColumn(
        "dev2", F.abs(F.col("avg_c") - F.col("med"))
    )
    mad = order_statistics(
        d, "dev2", [0.5], ["event_type"], out="mad"
    ).select("event_type", "mad")
    scored = cusum_scores(
        attach_broadcast(d, mad, ["event_type"]),
        "avg_c",
        on="hour_ts",
        by=["event_type"],
        baseline_col="med",
        slack="mad",
    )
    h = F.lit(8) * F.col("mad")
    alarms = scored.where((F.col("c_pos") > h) | (F.col("c_neg") > h))
    out["cusum_alarms"] = alarms.count()

    # 4. behavioral flows: the transition matrix and its rare tail
    trans = transition_matrix(
        e, tiebreak="event_id", gap_seconds=1800
    ).persist()
    out["transitions"] = trans.count()
    rare = trans.orderBy(F.col("p").asc(), "from_state", "to_state").limit(5)
    out["rare_paths"] = rare.count()

    print(json.dumps(out))
    assert out["dq_checks"] == 6 and out["transitions"] > 0


if __name__ == "__main__":
    main()
