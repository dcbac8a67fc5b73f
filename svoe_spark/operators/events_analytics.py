"""Event-sequence analytics: ordered funnels, retention cohorts, and
interval concurrency (sweep-line).

The reference's event layer stops at composite per-window grouping
(featurizer/features/*, data_catalog); a product pipeline over the same
event stream also asks ORDER-dependent questions — "how many users did
A then B then C", "how many of Monday's new users came back on day 7",
"how many orders were open at once". These are classic warehouse ops,
expressed here Spark-first so every stage is a keyed shuffle, never a
driver loop or a single-reducer window.

Scale shapes
  * funnel: one filtered min-agg per step, chained by an equi-join on
    the user key — k-1 co-partitioned joins on shrinking relations
    (each step keeps only converted users). No per-user event arrays
    are materialized, so a user with millions of events costs the same
    as one with ten; AQE reuses the user-key partitioning end to end.
  * retention: two aggregates joined on the user key; the final
    (cohort, offset) rollup is a partial-agg-friendly groupBy.
  * interval concurrency: the sweep line is per-key net-delta rows
    (one groupBy) + a running sum over a window PARTITIONED by the
    sweep key — parallel across keys. For a single global sweep or one
    hot key, feed the net-delta rows to curation.global_cumsum (bucket
    decomposition, no single-task window) using the unique composite
    key it requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: a user converts through step i when an
    event of type ``steps[i]`` exists STRICTLY AFTER their step-(i-1)
    conversion instant (first-touch anchoring: step 0 uses the user's
    earliest step-0 event). Returns one row per step:
    (step_index, step_name, n_users), n_users non-increasing.

    ``within``: optional total-window duration ("7d") — later steps
    must land within that horizon of the step-0 instant, the usual
    product-analytics definition.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    horizon = None
    if within is not None:
        from svoe_spark.functions.time import duration_to_seconds

        horizon = int(duration_to_seconds(within))

    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    )
    reached = (
        ev.where(F.col("__t") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("__m"))
    )
    if horizon is not None:
        reached = reached.withColumn(
            "__dl", F.col("__m") + F.expr(f"INTERVAL {horizon} SECOND")
        )
    counts = [reached]
    for step in steps[1:]:
        nxt = ev.where(F.col("__t") == step).join(
            reached.select(
                "__u", F.col("__m").alias("__prev"), *(
                    ["__dl"] if horizon is not None else []
                )
            ),
            "__u",
        )
        nxt = nxt.where(F.col("__ts") > F.col("__prev"))
        if horizon is not None:
            nxt = nxt.where(F.col("__ts") <= F.col("__dl"))
        # __dl is functionally dependent on __u (anchored at step 0),
        # so grouping by both carries the deadline through without a
        # re-join per step
        keys = ["__u", "__dl"] if horizon is not None else ["__u"]
        reached = nxt.groupBy(*keys).agg(F.min("__ts").alias("__m"))
        counts.append(reached)

    out = None
    for i, (step, rel) in enumerate(zip(steps, counts)):
        row = rel.agg(
            F.lit(i).alias("step_index"),
            F.lit(step).alias("step_name"),
            F.count("*").cast("long").alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def funnel_sql(
    steps: list[str],
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str | None = None,
) -> str:
    """The DuckDB oracle for :func:`funnel` — the same CTE chain, built
    from the same step list so the two can never drift."""
    horizon = None
    if within is not None:
        from svoe_spark.functions.time import duration_to_seconds

        horizon = int(duration_to_seconds(within))
    steps = [s.replace("'", "''") for s in steps]  # SQL-literal escape
    ctes = [
        f"s0 AS (SELECT {user_col} AS u, MIN({ts_col}) AS m FROM {table} "
        f"WHERE {type_col} = '{steps[0]}' GROUP BY 1)"
    ]
    for i, step in enumerate(steps[1:], start=1):
        deadline = (
            f" AND e.{ts_col} <= s0.m + INTERVAL {horizon} SECOND"
            if horizon is not None
            else ""
        )
        anchor_join = (
            f" JOIN s0 ON s0.u = e.{user_col}" if horizon is not None else ""
        )
        ctes.append(
            f"s{i} AS (SELECT e.{user_col} AS u, MIN(e.{ts_col}) AS m "
            f"FROM {table} e JOIN s{i - 1} p ON p.u = e.{user_col}"
            f"{anchor_join} "
            f"WHERE e.{type_col} = '{step}' AND e.{ts_col} > p.m{deadline} "
            f"GROUP BY 1)"
        )
    selects = [
        f"SELECT {i} AS step_index, '{s}' AS step_name, "
        f"COUNT(*)::BIGINT AS n_users FROM s{i}"
        for i, s in enumerate(steps)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int | None = None,
) -> DataFrame:
    """Classic day-grain retention triangle: cohort a user by their
    first-activity day, then count distinct users active again at each
    day offset. Returns (cohort_day: date, offset_days: long,
    n_users: long); offset 0 is the cohort size.

    Two aggregates and one co-partitioned join on the user key; the
    rollup's distinct is over (cohort, offset, user) — already unique
    after the inner distinct — so the plan is partial-agg friendly.
    """
    day = F.to_date(ts_col)
    firsts = events.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(day).alias("cohort_day")
    )
    active = events.select(
        F.col(user_col).alias("__u"), day.alias("__d")
    ).distinct()
    joined = active.join(firsts, "__u").withColumn(
        "offset_days", F.datediff("__d", "cohort_day").cast("long")
    )
    if max_offset_days is not None:
        joined = joined.where(F.col("offset_days") <= max_offset_days)
    return joined.groupBy("cohort_day", "offset_days").agg(
        F.count("*").cast("long").alias("n_users")
    )


def interval_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    by: list[str] | str | None = None,
    out: str = "concurrent",
) -> DataFrame:
    """Sweep-line concurrency over half-open intervals [start, end):
    for every distinct boundary instant (per ``by`` key) the number of
    intervals covering it. Returns the key columns + (ts, ``out``).

    Plan: unpivot each interval to (+1 at start, -1 at end), NET the
    deltas per (key, instant) — making the window order key unique —
    then one running sum over a window partitioned by the sweep key.
    Ends collapse against starts at the same instant before the scan,
    which is exactly the half-open convention. Rows with a NULL start
    or end are dropped (an unbounded interval has no finite sweep),
    and so are REVERSED intervals (end < start) — a reversed row would
    place its -1 before its +1 and silently push the running count
    negative. Empty intervals (end == start) net to zero and are kept.

    Parallel across keys; for ONE global key the net-delta relation is
    already collapsed to distinct instants (usually ≪ rows), and
    `curation.global_cumsum` over epoch seconds is the no-single-task
    fallback.
    """
    if isinstance(by, str):
        by = [by]
    by = by or []
    iv = intervals.where(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) >= F.col(start_col))
    )
    deltas = iv.select(
        *by, F.col(start_col).alias("ts"), F.lit(1).alias("__d")
    ).unionByName(
        iv.select(*by, F.col(end_col).alias("ts"), F.lit(-1).alias("__d"))
    )
    net = deltas.groupBy(*by, "ts").agg(F.sum("__d").alias("__nd"))
    w = (
        Window.partitionBy(*by)
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return net.select(
        *by,
        "ts",
        F.sum("__nd").over(w).cast("long").alias(out),
    )


def transition_matrix(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    state: str = "event_type",
    tiebreak: str | None = None,
    gap_seconds: int | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: for each consecutive pair of events of the same key
    (ordered by ``ts`` then ``tiebreak``), count the (from_state,
    to_state) transition; ``p`` is the row-normalized probability
    (count / all transitions leaving from_state). ``gap_seconds``
    bounds the pair: a successor later than the gap starts a new
    journey instead of a transition (the session-boundary semantics of
    `session_windows_30m`, without materializing session ids).

    The path-analysis primitive behind "what do users do after X":
    next-step prediction baselines, anomalous-flow detection, and
    Markov-chain attribution all start from this relation.

    Scale shape: ONE per-key ordered window (lead) over the event scan
    — parallel across keys, no driver state — then a groupBy on the
    (from, to) pair whose output is |states|^2 rows; the row
    normalizer is a window over that tiny relation. Determinism: the
    (ts, tiebreak) order must be total per key (pass the event's
    unique id; ties on a bare timestamp would make `lead` ambiguous),
    and n / row_total is ONE float division over exact integers.
    """
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    nxt = df.select(
        F.col(state).alias("from_state"),
        F.lead(F.col(state)).over(w).alias("to_state"),
        F.col(ts).alias("__ts"),
        F.lead(F.col(ts)).over(w).alias("__nts"),
    ).where(F.col("to_state").isNotNull())
    if gap_seconds is not None:
        nxt = nxt.where(
            F.unix_micros(F.col("__nts")) - F.unix_micros(F.col("__ts"))
            <= int(gap_seconds) * 1_000_000
        )
    counts = nxt.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    row_total = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n",
        (F.col("n") / F.sum("n").over(row_total)).alias("p"),
    )


def transition_matrix_sql(
    table: str = "events",
    key: str = "user_id",
    ts: str = "ts",
    state: str = "event_type",
    tiebreak: str | None = None,
    gap_seconds: int | None = None,
) -> str:
    """DuckDB twin of `transition_matrix` — same lead window, same gap
    bound in epoch microseconds, same one-division normalization."""
    order = f"{ts}" + (f", {tiebreak}" if tiebreak else "")
    gap_pred = (
        f"AND epoch_us(__nts) - epoch_us({ts}) <= {int(gap_seconds)} * 1000000"
        if gap_seconds is not None
        else ""
    )
    return f"""
    WITH seq AS (
      SELECT {state} AS from_state,
             lead({state}) OVER (PARTITION BY {key} ORDER BY {order}) AS to_state,
             {ts},
             lead({ts}) OVER (PARTITION BY {key} ORDER BY {order}) AS __nts
      FROM {table}
    ),
    trans AS (
      SELECT from_state, to_state FROM seq
      WHERE to_state IS NOT NULL {gap_pred}
    ),
    counts AS (
      SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
      FROM trans GROUP BY from_state, to_state
    )
    SELECT from_state, to_state, n,
           n / sum(n) OVER (PARTITION BY from_state) AS p
    FROM counts
    """
