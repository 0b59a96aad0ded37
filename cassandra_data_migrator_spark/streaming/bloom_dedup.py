"""Streaming dedup with BOUNDED state — bloom-filter shards via
``applyInPandasWithState``.

``streaming/dedup.py`` keeps one state row per distinct content hash:
exact, but state grows with the number of distinct documents ever seen —
on an unbounded firehose that is an unbounded state store. The production
trade (accepted by every large-scale ingest dedup, e.g. CCNet-style
pipelines) is a fixed-size approximate member set: a bloom filter never
forgets a key it admitted (no false negatives ⇒ every true duplicate is
dropped, across batches, forever) and pays a small false-positive rate
(a novel document occasionally dropped as a presumed dup — harmless for
training-data curation; size ``m_bits`` to budget it).

Sharding: streaming state lives per GROUP, so the filter is split into
``num_shards`` independent bloom shards keyed by a hash of the content
hash — the grouped shuffle spreads load across executors, each shard's
state is one fixed-size packed word array, and TOTAL state is exactly
``num_shards * m_bits / 8`` bytes no matter how many documents flow
(e.g. 64 shards x 2^20 bits = 8 MiB, forever).

Determinism: positions derive from md5 of the content hash + seed (pure
stdlib — the state fn is a self-contained closure; workers never import
this package), rows probe in doc_id order within a batch, so the
keep-first winner matches the batch operator's min-doc_id rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
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

# fp-accounting mode: one row per (shard, micro-batch) — the operator's
# loss contract made observable. A bloom false positive drops a NOVEL
# document forever; the expected probability of that, for the NEXT probe,
# is fill_ratio**k (all k positions already set), computable exactly from
# the state. DoubleType fields are exact: bits_set/m_bits is a ratio of
# small ints.
FP_STATS_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("batch_rows", LongType()),
        StructField("batch_admitted", LongType()),
        StructField("bits_set", LongType()),
        StructField("fill_ratio", DoubleType()),
        StructField("expected_fp_rate", DoubleType()),
    ]
)

# 63 usable bits per signed-long word: bit 63 would wrap a signed
# LongType state column negative mid-roundtrip, so positions pack
# mod-63 and the sign bit is never touched.
STATE_SCHEMA = StructType([StructField("words", ArrayType(LongType()))])
WORD_BITS = 63

NUM_SHARDS = 64
SHARD_BITS = 1 << 20  # per-shard filter size: 128 KiB -> 8 MiB total state
NUM_HASHES = 5


def streaming_dedup_bloom(
    docs_stream: DataFrame,
    text_col: str = "text",
    num_shards: int = NUM_SHARDS,
    m_bits: int = SHARD_BITS,
    k: int = NUM_HASHES,
    emit: str = "admissions",
) -> DataFrame:
    """(content_hash, doc_id of first admission) — at most one output row
    per distinct hash across the whole stream (bloom no-false-negative
    law), with a fixed-size state store. A false positive silently drops
    a novel hash; size ``m_bits`` for the expected per-shard cardinality
    (defaults carry ~50k keys/shard at <1% fp).

    ``emit="fp_stats"`` switches the output to the operator's LOSS
    ACCOUNTING: one row per (shard, micro-batch) with the shard's exact
    bit fill ratio and the expected false-positive probability for the
    next probe, fill_ratio**k — a bloom fp drops a NON-duplicate forever,
    so the rate must be observable, not folklore. Identical admit/state
    logic either way (same words, same positions, same keep-first)."""

    if emit not in ("admissions", "fp_stats"):
        raise ValueError(f"emit must be 'admissions' or 'fp_stats', got {emit!r}")
    word_bits = WORD_BITS  # local: the closure must not reference module globals
    emit_stats = emit == "fp_stats"

    def _admit_unseen(key, pdfs, state: GroupState):
        import hashlib

        import pandas as pd

        if state.exists:
            words = list(state.get[0])
        else:
            words = [0] * (m_bits // word_bits + 1)

        def positions(h: str):
            out = []
            for i in range(k):
                d = hashlib.md5(f"{i}:{h}".encode()).digest()
                out.append(int.from_bytes(d[:8], "big") % m_bits)
            return out

        rows_h, rows_d = [], []
        n_rows = 0
        pending = []
        for pdf in pdfs:
            pending.append(pdf[["content_hash", "doc_id"]])
        if pending:
            batch = pd.concat(pending).sort_values("doc_id")
            n_rows = len(batch)
            for h, d in zip(batch["content_hash"], batch["doc_id"]):
                pos = positions(h)
                if all((words[p // word_bits] >> (p % word_bits)) & 1 for p in pos):
                    continue  # seen (or fp): drop
                for p in pos:
                    words[p // word_bits] |= 1 << (p % word_bits)
                rows_h.append(h)
                rows_d.append(int(d))
        state.update((words,))
        if emit_stats:
            bits_set = sum(bin(w).count("1") for w in words)
            fill = bits_set / m_bits
            yield pd.DataFrame(
                {
                    "shard": [int(key[0])],
                    "batch_rows": [n_rows],
                    "batch_admitted": [len(rows_h)],
                    "bits_set": [bits_set],
                    "fill_ratio": [fill],
                    "expected_fp_rate": [fill**k],
                }
            )
        elif rows_h:
            yield pd.DataFrame({"content_hash": rows_h, "doc_id": rows_d})

    hashed = docs_stream.select(
        F.md5(F.col(text_col)).alias("content_hash"), F.col("doc_id")
    ).withColumn(
        "shard", F.pmod(F.xxhash64("content_hash"), F.lit(num_shards))
    )
    return (
        hashed.groupBy("shard")
        .applyInPandasWithState(
            _admit_unseen,
            outputStructType=FP_STATS_SCHEMA if emit_stats else OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
