"""Live-ingest leg of the Kappa property (S6): a TCP NDJSON feed (the
sandbox stand-in for the reference's cryptofeed websocket emitter,
cryptofeed_event_emitter.py:21-80) consumed by the socket source,
parsed/normalized, reconstructed, and featurized must equal the batch
replay of the same event log, row for row."""

import time

import pytest
from pyspark.sql import functions as F

from svoe_spark.operators.orderbook import (
    cryptofeed_updates,
    reconstruct_book,
    reconstruct_book_stream,
    synthetic_cryptofeed_updates,
)
from svoe_spark.sources.tables import load_table
from svoe_spark.streaming.live import (
    NdjsonFeed,
    book_feature_stream,
    parse_book_messages,
    socket_book_updates,
)


def _messages(updates_df):
    rows = updates_df.orderBy("ts", "symbol").collect()
    return [
        {
            "symbol": r["symbol"],
            "ts": r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f"),
            "delta": r["delta"],
            "orders": [o.asDict() for o in r["orders"]],
        }
        for r in rows
    ]


def _key(r):
    return (r["symbol"], r["ts"])


def test_live_socket_book_features_equal_batch(spark, sf_small):
    events = load_table(spark, "events", sf_small)
    # a few hot symbols keep the message count test-sized while still
    # exercising state across many micro-batches
    events = events.withColumn(
        "user_id", F.pmod(F.col("user_id"), F.lit(5))
    )
    raw = synthetic_cryptofeed_updates(events)
    msgs = _messages(raw)
    assert len(msgs) > 500

    feed = NdjsonFeed(msgs + [{"not": "a book message"}])
    name = "live_book_mem"
    try:
        snaps = reconstruct_book_stream(
            socket_book_updates(spark, feed.host, feed.port), depth=10
        )
        q = (
            book_feature_stream(snaps)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        want = {
            _key(r): r.asDict()
            for r in book_feature_stream(
                reconstruct_book(cryptofeed_updates(raw), depth=10)
            ).collect()
        }
        deadline = time.time() + 120
        try:
            while time.time() < deadline:
                if spark.table(name).count() >= len(want):
                    break
                time.sleep(1.0)
            got = {_key(r): r.asDict() for r in spark.table(name).collect()}
        finally:
            q.stop()
    finally:
        feed.close()

    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        for col in (
            "best_bid",
            "best_ask",
            "mid_price",
            "spread",
            "bid_depth",
            "ask_depth",
            "inconsistencies",
        ):
            assert g[col] == w[col], (k, col)


def test_one_sided_book_yields_null_features(spark):
    """A FULL message carrying only bids (a legal live-feed state) must
    produce NULL best_ask/mid/spread, not an ANSI
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT crash (round-3 ADVICE, live.py)."""
    lines = spark.createDataFrame(
        [
            ('{"symbol":"S","ts":"2024-01-01 00:00:00.000001","delta":false,'
             '"orders":[{"side":"bid","price":1.0,"size":2.0}]}',),
        ],
        "value string",
    )
    snaps = reconstruct_book(parse_book_messages(lines), depth=10)
    out = book_feature_stream(snaps).collect()
    assert len(out) == 1
    r = out[0]
    assert r["best_bid"] == pytest.approx(1.0)
    assert r["best_ask"] is None
    assert r["mid_price"] is None
    assert r["spread"] is None
    assert r["bid_depth"] == 1 and r["ask_depth"] == 0


def test_parse_book_messages_drops_garbage(spark):
    lines = spark.createDataFrame(
        [
            ('{"symbol":"S","ts":"2024-01-01 00:00:00.000001","delta":false,'
             '"orders":[{"side":"bid","price":1.0,"size":2.0}]}',),
            ("this is not json",),
            ('{"no_symbol": true}',),
        ],
        "value string",
    )
    out = parse_book_messages(lines).collect()
    assert len(out) == 1
    r = out[0]
    assert r["symbol"] == "S" and r["update_type"] == "FULL"
    assert r["orders"][0]["price"] == pytest.approx(1.0)
