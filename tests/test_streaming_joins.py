"""Stream-stream interval join: an availableNow drain over the events
fixture must produce exactly the batch interval_join_bucketed match set
(same keys, same matched pairs, same values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_data_migrator_spark.operators.interval import interval_join_bucketed
from cassandra_data_migrator_spark.sources.parquet import load_table
from cassandra_data_migrator_spark.streaming.joins import streaming_interval_join
from cassandra_data_migrator_spark.streaming.windows import read_events_stream

WINDOW_US = 6 * 3600 * 1_000_000


def _pairs(rows):
    return sorted(
        (r.event_id, r.rv_ts, round(r.rv_value, 4)) for r in rows
    )


def test_streaming_interval_join_matches_batch(spark, sf_dir, tmp_path):
    stream = read_events_stream(spark, sf_dir)
    anchors = stream.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts_us"
    )
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "value"
    )
    joined = streaming_interval_join(
        anchors,
        purchases,
        ["user_id"],
        "ts_us",
        "ts_us",
        WINDOW_US,
        ["value"],
    )
    query = (
        joined.writeStream.format("memory")
        .queryName("sj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = _pairs(spark.sql("SELECT * FROM sj_out").collect())

    e = load_table(spark, sf_dir, "events")
    b_anchors = e.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts_us"
    )
    b_purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "value"
    )
    batch = interval_join_bucketed(
        b_anchors, b_purch, ["user_id"], "ts_us", "ts_us", WINDOW_US, ["value"]
    )
    exp = _pairs(batch.collect())
    assert got == exp and len(got) > 0


def test_streaming_interval_join_rejects_bad_window(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    try:
        streaming_interval_join(stream, stream, ["user_id"], "ts_us", "ts_us", 0, [])
        raise AssertionError("window_us=0 should raise")
    except ValueError:
        pass
