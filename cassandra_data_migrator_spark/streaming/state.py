"""Streaming per-key latest-state maintenance — custom stateful operator via
``applyInPandasWithState``.

The continuous-ingest twin of queries.latest_event: consuming an event
firehose, keep one row of state per key (the (ts, event_id)-max event seen so
far) and emit it whenever it advances. Out-of-order arrivals — an older event
landing in a later micro-batch — are compared against state and dropped, so
the emitted trail for a key is monotone in (ts, event_id) and the LAST
emission equals the batch argmax over everything ingested.

State is one fixed-width row per key: bounded by key cardinality, not event
volume, and uniform across shards. Pair with a state TTL for keys that go
quiet forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LATEST_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

LATEST_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def streaming_latest_state(events_stream: DataFrame) -> DataFrame:
    """Emit the per-user latest event whenever it advances; suppress stale
    and out-of-order arrivals. Deterministic (ts_us, event_id) ordering —
    identical tiebreak to the batch operator.

    The state function is a CLOSURE (shipped by value via cloudpickle), so
    Python workers never import this package."""

    def _advance_latest(key, pdfs, state: GroupState):
        import pandas as pd

        cur = state.get if state.exists else None  # (ts_us, event_id, type, value)
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            top = pdf.sort_values(["ts_us", "event_id"]).iloc[-1]
            cand = (int(top["ts_us"]), int(top["event_id"]), top["event_type"], float(top["value"]))
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        if best is None:
            return
        if cur is not None and (best[0], best[1]) <= (cur[0], cur[1]):
            return  # everything in this batch is stale for this key
        state.update(best)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_id": [best[1]],
                "ts_us": [best[0]],
                "event_type": [best[2]],
                "value": [best[3]],
            }
        )

    return events_stream.select(
        "user_id", "event_id", "ts_us", "event_type", "value"
    ).groupBy("user_id").applyInPandasWithState(
        _advance_latest,
        outputStructType=LATEST_OUTPUT_SCHEMA,
        stateStructType=LATEST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
