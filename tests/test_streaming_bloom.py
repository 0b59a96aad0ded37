"""Bounded-state streaming bloom dedup (streaming/bloom_dedup.py).

Contract under test, stream staged as two identical files (every doc
arrives twice, in two micro-batches):

1. every true duplicate is dropped — across batches too (bloom no
   false negatives: once admitted, a hash always tests present);
2. survivors are a SUBSET of the exact batch winners with identical
   keep-first doc_ids (a false positive may drop a novel hash, never
   invent or swap one);
3. at the fixture cardinality the filter is sized so fp drops are zero
   — the output matches exact streaming dedup row-for-row;
4. the state is fixed-size by construction (word-array length depends
   only on m_bits, asserted on the module constants).
"""

import shutil

from pyspark.sql import functions as F

from cassandra_data_migrator_spark.sources.parquet import load_table
from cassandra_data_migrator_spark.streaming.bloom_dedup import (
    NUM_HASHES,
    SHARD_BITS,
    WORD_BITS,
    streaming_dedup_bloom,
)


def test_streaming_bloom_dedup_across_batches(spark, sf_dir, tmp_path):
    src = f"{sf_dir}/documents.parquet"
    stage = tmp_path / "docs_stream"
    stage.mkdir()
    shutil.copy(src, stage / "batch1.parquet")
    shutil.copy(src, stage / "batch2.parquet")

    static = spark.read.parquet(str(stage / "batch1.parquet"))
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    out = str(tmp_path / "out")
    q = (
        streaming_dedup_bloom(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out)
    exact = (
        load_table(spark, sf_dir, "documents")
        .select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    # (1) no duplicate survives, in-batch or cross-batch
    assert got.count() == got.select("content_hash").distinct().count()
    # (2) survivors ⊆ exact winners with the same keep-first doc_id
    assert got.join(exact, ["content_hash", "doc_id"]).count() == got.count()
    # (3) sized for zero fp at fixture cardinality: exact output recovered
    assert got.count() == exact.count()


def test_streaming_bloom_state_is_fixed_size():
    """The whole point vs exact streaming dedup: per-shard state is a
    word array whose length is a function of m_bits ALONE — more
    documents never grow it."""
    words_len = SHARD_BITS // WORD_BITS + 1
    assert words_len * 8 < 200_000  # <200 KB per shard at the default size
    assert NUM_HASHES >= 3
