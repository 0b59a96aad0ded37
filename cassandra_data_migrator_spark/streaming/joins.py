"""Stream-stream interval join — the continuous-ingest twin of
operators/interval.interval_join_bucketed (SURVEY.md §2b range join;
attribution/conversion windows over a live event feed).

Spark-first shape: Structured Streaming supports stream-stream inner joins
NATIVELY when the join condition carries (a) an equi-key and (b) an
event-time range bound on watermarked columns — exactly the interval-join
semantics. So unlike the batch operator (which must bucketize to avoid a
theta-join), the streaming twin is a thin declarative composition: Spark's
state store buffers each side, the range condition tells it how long a row
can still find matches, and the watermark evicts state past
``left.ts + window + delay``. State is bounded by (arrival rate × window +
delay), not by stream length — the property that keeps this runnable
forever at 100 TB/day.

Batch/stream equivalence is pinned by tests/test_streaming_joins.py: an
availableNow drain over the events fixture produces exactly the batch
operator's match set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts_col: str,
    right_ts_col: str,
    window_us: int,
    right_value_cols: list[str],
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Matched pairs: left.* plus ``rv_<name>`` / ``rv_ts`` for every right
    row with right.ts in (left.ts, left.ts + window_us], same key — the
    batch operator's contract, inner semantics, over two (possibly
    identical) streams.

    Both sides get an event-time TIMESTAMP column + watermark; the join
    condition's time-range bounds are what lets Spark GC join state.
    """
    if window_us <= 0:
        raise ValueError("window_us must be positive")
    l = left.withColumn(
        "__l_evt", F.timestamp_micros(F.col(left_ts_col))
    ).withWatermark("__l_evt", watermark_delay)
    r = (
        right.select(
            *[F.col(c).alias(f"__rk_{c}") for c in key_cols],
            F.col(right_ts_col).alias("rv_ts"),
            *[F.col(c).alias(f"rv_{c}") for c in right_value_cols],
        )
        .withColumn("__r_evt", F.timestamp_micros(F.col("rv_ts")))
        .withWatermark("__r_evt", watermark_delay)
    )
    key_eq = [F.col(k) == F.col(f"__rk_{k}") for k in key_cols]
    time_range = (F.col("__r_evt") > F.col("__l_evt")) & (
        F.col("__r_evt")
        <= F.col("__l_evt") + F.expr(f"INTERVAL {window_us} MICROSECOND")
    )
    cond = time_range
    for e in key_eq:
        cond = cond & e
    return (
        l.join(r, cond, "inner")
        .drop("__l_evt", "__r_evt", *[f"__rk_{k}" for k in key_cols])
    )


def streaming_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """Stream-static ENRICHMENT join — the other join a live pipeline runs
    on every micro-batch: the unbounded fact stream joined to a bounded
    dimension (user profile, domain reputation, model weights). The static
    side is re-planned per micro-batch (so a dim refresh is picked up) and
    broadcast by the optimizer under AQE's size estimate — the stream side
    NEVER shuffles and carries no join state (unlike stream-stream joins,
    nothing must be buffered: every stream row can match immediately).
    Left join: a fact with no dim row survives with NULL attributes — an
    enrichment join that silently drops unmatched facts corrupts counts.
    Batch==stream parity pinned by tests/test_streaming_joins.py."""
    return events.join(F.broadcast(dim), key, "left")
