"""Time helpers: duration-string parsing and epoch/bucket column math.

The reference accepts duration strings like '1m'/'5s'/'100ms'
(reference: svoe/common/time/utils.py:12-17) and aligns tumbling buckets
to UTC midnight (svoe/common/time/utils.py:40-51). We keep the same
string surface but do all arithmetic on Spark TimestampType / epoch
doubles so Catalyst can push everything into codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_DUR_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(ms|s|m|h|d)\s*$")
_UNIT_SECONDS = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}


def duration_to_seconds(dur: str | int | float) -> float:
    """'1m' -> 60.0, '100ms' -> 0.1, 5 -> 5.0."""
    if isinstance(dur, (int, float)):
        return float(dur)
    m = _DUR_RE.match(dur)
    if not m:
        raise ValueError(f"unparseable duration: {dur!r}")
    return float(m.group(1)) * _UNIT_SECONDS[m.group(2)]


def duration_to_interval_string(dur: str | int | float) -> str:
    """Duration for Spark's window()/watermark APIs, e.g. '60 seconds'."""
    secs = duration_to_seconds(dur)
    if secs == int(secs):
        return f"{int(secs)} seconds"
    ms = round(secs * 1000)
    return f"{ms} milliseconds"


def epoch_seconds(ts: Column | str) -> Column:
    """Timestamp -> epoch seconds as DOUBLE (micro precision).

    Used as the numeric ORDER BY for range-frame windows; a timestamp at
    micro precision fits a double exactly (< 2^53).

    TIMESTAMP_NTZ inputs (parquet isAdjustedToUTC=false) are routed
    through a TIMESTAMP cast first — Spark refuses NTZ->double directly;
    with the session tz pinned to UTC the two types have identical epoch
    values, so this is exact.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return c.cast("timestamp").cast("double")


def bucket_start(ts: Column | str, dur: str | int | float) -> Column:
    """UTC-midnight-aligned tumbling-bucket start for a timestamp.

    Same alignment as the reference's get_sampling_bucket_ts
    (svoe/common/time/utils.py:40-51): bucket k covers
    [k*dur, (k+1)*dur) anchored at the unix epoch (== UTC midnight).
    Returns a TimestampType column.
    """
    secs = duration_to_seconds(dur)
    e = epoch_seconds(ts)
    return (F.floor(e / secs) * secs).cast("timestamp")
