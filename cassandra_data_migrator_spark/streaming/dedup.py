"""Streaming exact dedup — custom stateful operator via
``applyInPandasWithState`` (the prompt's pattern for operators Structured
Streaming lacks natively).

Keyed by content hash; state = 'seen'. The first arrival of each hash is
emitted, later arrivals (same batch or any later micro-batch) are dropped.
This is the continuous-ingest twin of operators/dedup.dedup_exact: a
training-data pipeline consuming a document firehose emits each unique
document exactly once, with state bounded by the hash keyspace (pair with a
state TTL in production for unbounded streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("content_hash", StringType()),
        StructField("doc_id", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("seen", IntegerType())])


def streaming_dedup_exact(docs_stream: DataFrame, text_col: str = "text") -> DataFrame:
    """(content_hash, doc_id of first occurrence) — exactly one output row per
    distinct hash across the whole stream. Within a batch the smallest doc_id
    wins (deterministic, mirroring batch keep-first).

    The state function is a CLOSURE, not a module-level function: cloudpickle
    then ships it by value, so Python workers do not need this package on
    their import path (the driver may run from anywhere)."""

    def _emit_first_unseen(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            # hash already emitted in an earlier micro-batch: drop everything
            for _ in pdfs:
                pass
            return
        best = None
        for pdf in pdfs:
            m = pdf["doc_id"].min()
            best = m if best is None else min(best, m)
        state.update((1,))
        yield pd.DataFrame({"content_hash": [key[0]], "doc_id": [int(best)]})

    hashed = docs_stream.select(
        F.md5(F.col(text_col)).alias("content_hash"), F.col("doc_id")
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _emit_first_unseen,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
