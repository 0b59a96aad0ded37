"""Stateful streaming dedup: duplicates across micro-batches are dropped by
keyed state (applyInPandasWithState). The source dir holds TWO copies of the
documents file with maxFilesPerTrigger=1, so every hash arrives in two
separate micro-batches — state must suppress the second."""

import os
import shutil

from pyspark.sql import functions as F

from cassandra_data_migrator_spark.sources.parquet import load_table
from cassandra_data_migrator_spark.streaming.dedup import streaming_dedup_exact


def test_streaming_dedup_across_batches(spark, sf_dir, tmp_path):
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
    deduped = streaming_dedup_exact(stream)
    out = str(tmp_path / "out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out)
    docs = load_table(spark, sf_dir, "documents")
    n_unique = docs.select(F.md5("text")).distinct().count()
    # 2x the input arrived; exactly one row per unique hash emitted
    assert got.count() == n_unique
    assert got.select("content_hash").distinct().count() == n_unique
    # keep-first semantics: emitted doc_id is the min for its hash
    expected = (
        docs.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    mismatch = got.join(expected, "content_hash").filter(
        got.doc_id != expected.doc_id
    )
    assert mismatch.count() == 0
