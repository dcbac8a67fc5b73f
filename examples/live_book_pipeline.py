#!/usr/bin/env python
"""Live ingest end-to-end (S6): an in-process TCP NDJSON "exchange"
feed -> socket readStream -> cryptofeed-dialect parse/normalize ->
stateful order-book reconstruction -> top-of-book feature stream ->
day-partitioned parquet block sink — the reference's
websocket->book->features online path (cryptofeed_event_emitter.py:
21-80) with every engine-side stage identical to the offline replay
leg (the Kappa property).

    python examples/live_book_pipeline.py [sf_dir] [out_dir]

Prints one JSON line: messages served, snapshots written, and the
stream-vs-batch feature equality verdict on a sample instant.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from svoe_spark.operators.orderbook import (  # noqa: E402
    cryptofeed_updates,
    reconstruct_book,
    reconstruct_book_stream,
    synthetic_cryptofeed_updates,
)
from svoe_spark.session import get_spark  # noqa: E402
from svoe_spark.sources.tables import load_table  # noqa: E402
from svoe_spark.streaming.live import (  # noqa: E402
    NdjsonFeed,
    book_feature_stream,
    socket_book_updates,
)
from svoe_spark.streaming.sinks import write_parquet_blocks  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="live_book_")
    spark = get_spark("live_book_pipeline")

    events = load_table(spark, "events", sf_dir).withColumn(
        "user_id", F.pmod(F.col("user_id"), F.lit(5))
    )
    raw = synthetic_cryptofeed_updates(events)
    msgs = [
        {
            "symbol": r["symbol"],
            "ts": r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f"),
            "delta": r["delta"],
            "orders": [o.asDict() for o in r["orders"]],
        }
        for r in raw.orderBy("ts", "symbol").collect()
    ]

    batch = book_feature_stream(reconstruct_book(cryptofeed_updates(raw), depth=10))
    # pre-snapshot deltas are skipped by the started gate on BOTH legs,
    # so the batch row count is the stream's completion target
    expected = batch.count()

    feed = NdjsonFeed(msgs)
    try:
        features = book_feature_stream(
            reconstruct_book_stream(
                socket_book_updates(spark, feed.host, feed.port), depth=10
            )
        )
        q = write_parquet_blocks(
            features,
            path=os.path.join(out_dir, "blocks"),
            checkpoint=os.path.join(out_dir, "ckpt"),
            trigger={"processingTime": "500 milliseconds"},
        )
        deadline = time.time() + 180
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(os.path.join(out_dir, "blocks")).count()
            except Exception:  # noqa: BLE001 — sink dir not created yet
                n = 0
            if n >= expected:
                break
            time.sleep(1.0)
        q.stop()
    finally:
        feed.close()

    written = spark.read.parquet(os.path.join(out_dir, "blocks"))
    sample_ts = batch.agg(F.max("ts")).first()[0]
    s = {
        (r["symbol"]): (r["mid_price"], r["spread"])
        for r in written.where(F.col("ts") == sample_ts).collect()
    }
    b = {
        (r["symbol"]): (r["mid_price"], r["spread"])
        for r in batch.where(F.col("ts") == sample_ts).collect()
    }
    print(
        json.dumps(
            {
                "messages_served": len(msgs),
                "snapshots_written": written.count(),
                "stream_equals_batch_at_sample_instant": s == b,
                "out_dir": out_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
