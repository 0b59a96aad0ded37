"""Streaming WARC ingestion (streaming/warc_ingest.py): continuous crawl
files → record split → text extraction → running profile, stream==batch
EXACT after an availableNow drain over a multi-file source."""

from pyspark.sql import functions as F

from cassandra_data_migrator_spark.queries.web_ingest import (
    _WARCINFO_RECORD,
    WARC_GROUPS,
    _doc_html,
    _http_response,
    _san,
    _warc_response_record,
)
from cassandra_data_migrator_spark.sources.parquet import load_table
from cassandra_data_migrator_spark.streaming.warc_ingest import (
    run_warc_profile_available_now,
    streaming_warc_profile,
    warc_page_metrics,
    warc_profile_aggs,
)


def _stage_warc_files(spark, sf_dir, dest) -> None:
    """Materialize the batch fixture's .warc files (one per doc_id%N
    group) into ``dest`` — the arriving-crawl directory the stream
    watches."""
    d = load_table(spark, sf_dir, "documents")
    html = _doc_html(F.col("doc_id"), _san(F.col("text")))
    rec = _warc_response_record(F.col("doc_id"), _http_response(html))
    files = (
        d.select(
            F.pmod(F.col("doc_id"), F.lit(WARC_GROUPS)).alias("grp"),
            F.struct(F.col("doc_id"), rec.alias("rec")).alias("s"),
        )
        .groupBy("grp")
        .agg(
            F.concat(
                F.lit(_WARCINFO_RECORD),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("s")), lambda s: s["rec"]
                    ),
                    "",
                ),
            ).alias("warc"),
        )
        .collect()
    )
    for r in files:
        (dest / f"{r['grp']}.warc").write_bytes(r["warc"].encode("ascii"))


def test_streaming_warc_profile_matches_batch(spark, sf_dir, tmp_path):
    src = tmp_path / "crawl"
    src.mkdir()
    _stage_warc_files(spark, sf_dir, src)

    static = spark.read.format("binaryFile").load(str(src))
    stream = (
        spark.readStream.format("binaryFile")
        .schema(static.schema)
        .option("maxFilesPerTrigger", 4)  # several micro-batches
        .load(str(src))
    )
    out = str(tmp_path / "profile")
    run_warc_profile_available_now(
        streaming_warc_profile(stream), out, str(tmp_path / "ckpt")
    )

    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    want = warc_page_metrics(static).agg(*warc_profile_aggs()).collect()[0]
    g = got[0]
    for f in want.asDict():
        assert g[f] == want[f], f"{f}: stream {g[f]} != batch {want[f]}"
    # and the profile saw every response record exactly once
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert g["n_pages"] == n_docs
