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


def test_streaming_url_dedup_composes(spark, sf_dir, tmp_path):
    """r07 composition: URL canonicalization is a pure JVM expression, so
    it drops straight into the streaming dedup — canonicalize per
    micro-batch, keyed state suppresses canonical re-fetches across
    batches (the crawl-frontier dedup shape). Two staged batches carry
    DIFFERENT raw noise (tracking param vs fragment + default port) for
    the SAME canonical URLs; exactly one row per canonical URL survives."""
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.functions.urls import canonicalize_url

    docs = load_table(spark, sf_dir, "documents").limit(200)
    u1 = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://c.example.com/p/"),
            (F.col("doc_id") % 25).cast("string"),
            F.lit("?utm_source=feed"),
        ).alias("url"),
    )
    u2 = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.lit("HTTP://C.Example.COM:80/p/"),
            (F.col("doc_id") % 25).cast("string"),
            F.lit("#frag"),
        ).alias("url"),
    )
    import glob as _glob

    stage = tmp_path / "urls_stream"
    stage.mkdir()
    # the file stream source wants FLAT files: stage each batch as a single
    # parquet file (coalesce -> copy the part file), like the test above
    for name, df in (("b1", u1), ("b2", u2)):
        tmp_dir = tmp_path / f"__{name}"
        df.coalesce(1).write.parquet(str(tmp_dir))
        part = _glob.glob(str(tmp_dir / "part-*.parquet"))[0]
        shutil.copy(part, stage / f"{name}.parquet")
    static = spark.read.parquet(str(stage / "b1.parquet"))
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    canon = stream.withColumn("canon_url", canonicalize_url(F.col("url")))
    deduped = streaming_dedup_exact(canon, text_col="canon_url")
    out = str(tmp_path / "url_out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "url_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    # 25 canonical URLs total across both batches, despite 2x raw variants
    assert got.count() == 25
    # keep-first: every surviving doc_id comes from the FIRST batch
    assert got.filter(F.col("doc_id") >= 1_000_000).count() == 0
