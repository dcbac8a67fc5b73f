"""Live feed ingest: a sandbox-realizable stand-in for the reference's
exchange-websocket emitter.

The reference binds cryptofeed websocket callbacks and pushes each
normalized book/trade event into its streaming graph
(cryptofeed_event_emitter.py:21-80, 34-74). A real exchange connection
is a network client outside what a sandbox can exercise, but the
engine-side seam is exactly a line-oriented message feed — so the
stand-in is a TCP NDJSON server (`serve_ndjson`, the "exchange") plus
Spark's socket source (`socket_book_updates`, the "connector"), which
parses each JSON message into the cryptofeed update dialect and
normalizes it with the same `cryptofeed_updates` relational rename the
offline path uses. From there the pipeline is byte-identical to
replay: `reconstruct_book_stream` -> feature projection -> any sink —
the Kappa property (T6) extended to the live leg.

Message format (one JSON object per line, mirroring the reference's
callback payload):

    {"symbol": "BTC-USD", "ts": "2024-01-01 00:00:00.123456",
     "delta": true,
     "orders": [{"side": "bid", "price": 100.0, "size": 2.0}]}

delta=false means "this is the full book" (reset then set), exactly
the cryptofeed flag (l2_snapshot_fd/utils.py:66-89).

Scale shape: the socket source is a single-receiver dev/test source;
at production scale the identical parse/normalize lineage runs off
`readStream.format("kafka")` (value = the same NDJSON bytes) with
partition-per-symbol parallel ingest — `parse_book_messages` takes any
DataFrame with a string `value` column, so the swap is one line.
"""

from __future__ import annotations

import json
import socket
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from svoe_spark.operators.orderbook import cryptofeed_updates

MESSAGE_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("ts", TimestampType()),
        StructField("delta", BooleanType()),
        StructField(
            "orders",
            ArrayType(
                StructType(
                    [
                        StructField("side", StringType()),
                        StructField("price", DoubleType()),
                        StructField("size", DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


class NdjsonFeed:
    """Tiny threaded TCP server that plays a list of JSON-serializable
    dicts as NDJSON to every client that connects — the in-sandbox
    "exchange". The connection stays open after the last line (Spark's
    socket source treats EOF as source failure mid-query); call
    ``close()`` when the streaming query is done."""

    def __init__(self, messages, host: str = "127.0.0.1"):
        self._messages = messages
        self._srv = socket.create_server((host, 0))
        self.host, self.port = self._srv.getsockname()
        self._stop = threading.Event()
        self._conns: list[socket.socket] = []
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        self._srv.settimeout(0.2)
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except TimeoutError:
                continue
            except OSError:
                break
            self._conns.append(conn)
            try:
                payload = "".join(
                    json.dumps(m, default=str) + "\n" for m in self._messages
                )
                conn.sendall(payload.encode())
                # leave the connection open; close() tears it down
            except OSError:
                pass

    def close(self) -> None:
        self._stop.set()
        for c in self._conns:
            try:
                c.close()
            except OSError:
                pass
        try:
            self._srv.close()
        except OSError:
            pass
        self._thread.join(timeout=2)


def parse_book_messages(lines: DataFrame) -> DataFrame:
    """Parse a string ``value`` column of NDJSON book messages into the
    canonical update stream: from_json against MESSAGE_SCHEMA, drop
    malformed lines (from_json yields null structs — an exchange feed
    always carries occasional garbage), then the FULL/SET dialect
    normalization. Pure column expressions — no Python in the path."""
    parsed = (
        lines.select(F.from_json("value", MESSAGE_SCHEMA).alias("m"))
        .where(F.col("m").isNotNull() & F.col("m.symbol").isNotNull())
        .select("m.symbol", "m.ts", "m.delta", "m.orders")
    )
    return cryptofeed_updates(parsed)


def socket_book_updates(
    spark: SparkSession, host: str, port: int
) -> DataFrame:
    """readStream socket -> parsed canonical L2 update stream. Feed the
    result to `reconstruct_book_stream` exactly like a replay stream."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return parse_book_messages(raw)


def book_feature_stream(
    snapshots: DataFrame,
) -> DataFrame:
    """Top-of-book feature projection over a (streaming or batch)
    snapshot relation: best bid/ask, mid price, spread, depth — the
    scalars the reference's mid-price/spread FDs read off the book
    (A7). Works identically on both legs, so stream==batch equality is
    testable row-for-row.

    A one-sided book is a legal live-feed state (full-book message with
    one side, or deltas deleting the last level); under Spark 4's ANSI
    mode a plain element_at(.., 1) would throw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT on the empty side and kill the
    streaming query, so the lookups use try_element_at and the derived
    scalars go NULL instead."""
    best_bid = F.try_element_at("bids", F.lit(1))["price"]
    best_ask = F.try_element_at("asks", F.lit(1))["price"]
    return snapshots.select(
        "symbol",
        "ts",
        best_bid.alias("best_bid"),
        best_ask.alias("best_ask"),
        ((best_bid + best_ask) / F.lit(2.0)).alias("mid_price"),
        (best_ask - best_bid).alias("spread"),
        F.size("bids").alias("bid_depth"),
        F.size("asks").alias("ask_depth"),
        "inconsistencies",
    )
