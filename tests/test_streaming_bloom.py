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


def test_fp_stats_match_analytic_recomputation(spark, sf_dir, tmp_path):
    """emit='fp_stats' loss accounting: every emitted row must satisfy
    expected_fp_rate == fill_ratio**k and fill_ratio == bits_set/m_bits
    EXACTLY, and the final per-shard bits_set/admitted counts must equal a
    pure-Python recomputation of the same bloom (same md5 positions, same
    doc_id probe order) — plus the textbook (1-e^{-kn/m})^k approximation
    must sit near the emitted exact rate."""
    import hashlib
    import math

    m_bits, k, num_shards = 1 << 12, 5, 4
    docs = (
        load_table(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(200)
        .select("doc_id", "text")
    )
    rows = docs.collect()
    half = len(rows) // 2
    stage = tmp_path / "stream_in"
    stage.mkdir()
    spark.createDataFrame(rows[:half], docs.schema).coalesce(1).write.parquet(
        str(stage / "b1.parquet")
    )
    spark.createDataFrame(rows[half:], docs.schema).coalesce(1).write.parquet(
        str(stage / "b2.parquet")
    )

    static = spark.read.parquet(str(stage / "b1.parquet"))
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage) + "/*.parquet")
    )
    out = str(tmp_path / "stats_out")
    q = (
        streaming_dedup_bloom(
            stream, num_shards=num_shards, m_bits=m_bits, k=k, emit="fp_stats"
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stats = spark.read.parquet(out).collect()
    assert stats, "no fp-stats rows emitted"

    # internal consistency: exact, not approximate
    for r in stats:
        assert r.fill_ratio == r.bits_set / m_bits
        assert r.expected_fp_rate == r.fill_ratio**k

    # analytic recomputation: same shard routing (from the same Spark expr),
    # same positions (stdlib md5), same doc_id probe order
    hashed = (
        docs.select(F.md5("text").alias("h"), "doc_id")
        .withColumn("shard", F.pmod(F.xxhash64("h"), F.lit(num_shards)))
        .orderBy("doc_id")
        .collect()
    )

    def positions(h):
        return [
            int.from_bytes(hashlib.md5(f"{i}:{h}".encode()).digest()[:8], "big")
            % m_bits
            for i in range(k)
        ]

    sim_bits = {s: set() for s in range(num_shards)}
    sim_admitted = {s: 0 for s in range(num_shards)}
    for r in hashed:
        pos = positions(r.h)
        if all(p in sim_bits[r.shard] for p in pos):
            continue
        sim_bits[r.shard].update(pos)
        sim_admitted[r.shard] += 1

    for s in range(num_shards):
        shard_rows = [r for r in stats if r.shard == s]
        if not shard_rows:
            assert sim_admitted[s] == 0
            continue
        final = max(shard_rows, key=lambda r: r.bits_set)
        assert final.bits_set == len(sim_bits[s]), f"shard {s} bits"
        assert sum(r.batch_admitted for r in shard_rows) == sim_admitted[s]
        # textbook bound: (1 - e^{-kn/m})^k tracks the exact emitted rate
        n = sim_admitted[s]
        approx = (1.0 - math.exp(-k * n / m_bits)) ** k
        assert abs(final.expected_fp_rate - approx) <= 0.35 * max(
            approx, final.expected_fp_rate
        ), f"shard {s}: emitted {final.expected_fp_rate} vs approx {approx}"
