"""Continuous crawl ingestion: WARC files → records → text → running
quality profile, as Structured Streaming (round 11).

The batch front door (queries/web_ingest.py) reads a STATIC directory of
.warc files; real crawls LAND files continuously, so the same pipeline
must run as a stream: ``readStream.format("binaryFile")`` picks up each
arriving .warc, the Content-Length-framed Arrow kernel (sources/warc.py,
``with_payload=True``) splits records STATELESSLY (a record never spans
files, so no cross-batch state), the JVM regexp chain extracts visible
text, and the per-crawl quality profile is a streaming GLOBAL aggregation
of mergeable metrics only — counts and DECIMAL sums (exact and
order-independent across micro-batches; double addition is neither) — so
the whole profile is one row of native aggregation state, fixed size
forever (the streaming/profile.py discipline).

stream==batch equality is pinned in tests/test_streaming_warc.py: after
an availableNow drain over a multi-file source, the running profile row
equals the batch aggregation of the SAME expressions over the same files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions.html import (
    html_link_count,
    html_text,
)
from cassandra_data_migrator_spark.sources.warc import warc_decoded_pages

PROFILE_DEC = "decimal(28,4)"


def warc_page_metrics(files: DataFrame) -> DataFrame:
    """Per-page metric rows from a (streaming or static) binaryFile frame:
    response records only, visible-text length + anchor count — the
    shared per-row stage both the stream and its batch parity twin run.

    Charset-aware since r12 (advice r11): the body is decoded by the
    sniffing kernel (http header → meta prescan → utf-8 default, flagged
    iso-8859-1 fallback) instead of a blind binary→string UTF-8 cast that
    silently mangled non-UTF-8 pages; the profile counts fallback pages so
    undecodable-as-declared content is visible, not silent."""
    pages = warc_decoded_pages(files, content_col="content")
    text = html_text(F.col("html"))
    return pages.select(
        F.col("target_uri"),
        html_link_count(F.col("html")).cast("bigint").alias("n_links"),
        F.length(text).cast("bigint").alias("text_len"),
        F.col("charset_fallback"),
    )


def warc_profile_aggs() -> list:
    """The mergeable crawl-profile metric list (shared stream/batch)."""
    tl = F.col("text_len").cast("decimal(18,4)")
    return [
        F.count(F.lit(1)).cast("bigint").alias("n_pages"),
        F.sum("n_links").cast("bigint").alias("total_links"),
        F.sum(tl).cast(PROFILE_DEC).alias("sum_text_len"),
        F.min("text_len").cast("bigint").alias("min_text_len"),
        F.max("text_len").cast("bigint").alias("max_text_len"),
        F.sum(F.col("charset_fallback").cast("bigint"))
        .cast("bigint")
        .alias("n_charset_fallback"),
    ]


def streaming_warc_profile(files_stream: DataFrame) -> DataFrame:
    """One-row running crawl profile over an unbounded WARC file stream."""
    return warc_page_metrics(files_stream).agg(*warc_profile_aggs())


def run_warc_profile_available_now(
    profile: DataFrame, out_dir: str, ckpt: str
) -> None:
    """Drain with availableNow and materialize the LATEST profile row
    (1-row overwrite per micro-batch — idempotent under replays)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    (
        profile.writeStream.foreachBatch(_write)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
