"""Property-based differential test for order-book reconstruction:
random update streams (all op types, colliding prices, pre-snapshot
noise) through BOTH distributed engines vs an independent brute-force
dict simulator written directly from the reference semantics
(l2_snapshot_fd/utils.py:21-89) — no shared code with `_Book`."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

from svoe_spark.operators.orderbook import (
    reconstruct_book,
    reconstruct_book_bucketed,
)

pytestmark = pytest.mark.heavy  # round-9 quick-tier trim: the
# hypothesis differential suite runs via scripts/ptest.py and the
# round-close sweep

BASE = dt.datetime(2024, 1, 1)

# tiny domains force collisions: few prices, few sizes, mixed sides
op_strategy = st.tuples(
    st.sampled_from(["SNAPSHOT", "FULL", "ADD", "SET", "SUB"]),
    st.lists(
        st.tuples(
            st.sampled_from(["bid", "ask"]),
            st.sampled_from([99.0, 100.0, 101.0]),
            st.sampled_from([0.0, 1.0, 2.0, 5.0]),
        ),
        min_size=1,
        max_size=3,
    ),
)
stream_strategy = st.lists(op_strategy, min_size=1, max_size=25)


def _simulate(stream, depth):
    """Independent simulator: plain dicts, reference semantics."""
    book = {"bid": {}, "ask": {}}
    started = False
    inc = 0
    out = []
    for i, (ut, orders) in enumerate(stream):
        if ut == "SNAPSHOT":
            book = {"bid": {}, "ask": {}}
            for side, price, size in orders:
                book[side][price] = size
            started = True
        elif ut == "FULL":
            # cryptofeed full event: reset, then each order through the
            # SET logic (size 0 on the fresh book -> inconsistency)
            book = {"bid": {}, "ask": {}}
            started = True
            for side, price, size in orders:
                if size == 0.0:
                    if price in book[side]:
                        del book[side][price]
                    else:
                        inc += 1
                else:
                    book[side][price] = size
        elif not started:
            continue
        else:
            for side, price, size in orders:
                if ut == "ADD":
                    book[side][price] = book[side].get(price, 0.0) + size
                elif ut == "SET":
                    if size == 0.0:
                        if price in book[side]:
                            del book[side][price]
                        else:
                            inc += 1
                    else:
                        book[side][price] = size
                elif ut == "SUB":
                    if price not in book[side]:
                        inc += 1
                        continue
                    left = book[side][price] - size
                    if left <= 0.0:
                        del book[side][price]
                    else:
                        book[side][price] = left
        bids = sorted(book["bid"], reverse=True)[:depth]
        asks = sorted(book["ask"])[:depth]
        out.append(
            (
                i,
                bids[0] if bids else None,
                asks[0] if asks else None,
                len(bids),
                len(asks),
                inc,
            )
        )
    return out


def _run_engine(spark, fn, stream, depth, **kw):
    rows = [
        (
            "K",
            BASE + dt.timedelta(seconds=i),
            i,
            ut,
            [{"side": s, "price": p, "size": z} for s, p, z in orders],
        )
        for i, (ut, orders) in enumerate(stream)
    ]
    df = spark.createDataFrame(
        rows,
        "symbol string, ts timestamp, event_id long, update_type string, "
        "orders array<struct<side:string,price:double,size:double>>",
    )
    got = fn(df, depth=depth, seq_col="event_id", **kw).collect()
    return sorted(
        (
            int((r["ts"] - BASE).total_seconds()),
            r["bids"][0]["price"] if r["bids"] else None,
            r["asks"][0]["price"] if r["asks"] else None,
            len(r["bids"]),
            len(r["asks"]),
            r["inconsistencies"],
        )
        for r in got
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stream=stream_strategy)
def test_engines_match_brute_force_simulator(spark, stream):
    depth = 2
    want = _simulate(stream, depth)
    assert _run_engine(spark, reconstruct_book, stream, depth) == want
    # bucketed engine requires positive ADD sizes; zero-size ADDs in
    # the random stream are legal for the sequential engine but
    # rejected by the bucketed invariant check — filter those runs
    if all(
        z > 0
        for ut, orders in stream
        for _, _, z in orders
        if ut == "ADD"
    ):
        got_b = _run_engine(
            spark, reconstruct_book_bucketed, stream, depth, bucket=5.0
        )
        assert got_b == want
