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


def test_streaming_interval_join_drops_late_right_rows(spark, tmp_path):
    """Late-data contract of the stream-stream interval join (documented
    divergence from batch): a right-side row arriving in a later run whose
    event time sits beyond the watermark is DROPPED — its matching left
    anchor's join state was already evicted — while the batch operator,
    which sees all rows at once, reports the match. Two availableNow runs
    over one checkpoint (the watermark persists in the checkpoint)."""
    from cassandra_data_migrator_spark.streaming.windows import run_available_now

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    hour_us = 3_600_000_000
    schema = "event_id BIGINT, user_id BIGINT, event_type STRING, ts_us BIGINT, value DOUBLE"

    def mk(rows):
        return spark.createDataFrame(rows, schema)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        anchors = stream.filter(F.col("event_type") == "signup").select(
            "event_id", "user_id", "ts_us"
        )
        purchases = stream.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts_us", "value"
        )
        joined = streaming_interval_join(
            anchors, purchases, ["user_id"], "ts_us", "ts_us", hour_us, ["value"]
        )
        run_available_now(joined, out, ckpt)

    # Run 1: anchor at t=1s, in-window purchase at t=+10min, plus a pair far
    # in the future (t=20h) on BOTH sides so each side's watermark advances
    # to ~20h - delay, far past the anchor's eviction bound (ts + window).
    batch1 = [
        (1, 100, "signup", 1_000_000, 0.0),
        (2, 100, "purchase", 600 * 1_000_000, 5.0),
        (3, 999, "signup", 20 * hour_us, 0.0),
        (4, 999, "purchase", 21 * hour_us, 1.0),
    ]
    mk(batch1).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    first = _pairs(spark.read.parquet(out).collect())
    assert (1, 600 * 1_000_000, 5.0) in first, "in-window match must be emitted"

    # Run 2: a LATE purchase for the same anchor — event time t=+20min is
    # inside the anchor's 1h window, but the watermark already passed it.
    mk([(5, 100, "purchase", 1200 * 1_000_000, 7.0)]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_once()
    got = _pairs(spark.read.parquet(out).collect())
    assert (1, 1200 * 1_000_000, 7.0) not in got, (
        "purchase beyond the watermark must be dropped by the stream"
    )

    # The batch operator, seeing all rows at once, DOES report that match —
    # the divergence is the watermark trade-off, asserted explicitly.
    all_rows = mk(batch1 + [(5, 100, "purchase", 1200 * 1_000_000, 7.0)])
    b_anchors = all_rows.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts_us"
    )
    b_purch = all_rows.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "value"
    )
    batch = _pairs(
        interval_join_bucketed(
            b_anchors, b_purch, ["user_id"], "ts_us", "ts_us", hour_us, ["value"]
        ).collect()
    )
    assert (1, 1200 * 1_000_000, 7.0) in batch
    assert sorted(got + [(1, 1200 * 1_000_000, 7.0)]) == batch


def test_streaming_static_enrich_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static enrichment (r08): every micro-batch joins the fact
    stream to a bounded dim broadcast-side; the availableNow drain must
    equal the batch left join row-for-row, including facts with NO dim row
    (left semantics: unmatched facts survive with NULLs, never drop)."""
    from cassandra_data_migrator_spark.streaming.joins import (
        streaming_static_enrich,
    )
    from cassandra_data_migrator_spark.streaming.windows import (
        run_available_now,
    )

    ev = load_table(spark, sf_dir, "events")
    # bounded dim derived from the batch side: per-user event count and
    # value sum — with a planted GAP (odd user ids missing) so the left
    # semantics are actually exercised
    dim = (
        ev.filter(F.col("user_id") % 2 == 0)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("u_events"),
            F.sum("value").alias("u_value"),
        )
    )
    stream = read_events_stream(spark, sf_dir).select(
        "event_id", "user_id", "value"
    )
    enriched = streaming_static_enrich(stream, dim)
    out = str(tmp_path / "out_se")
    run_available_now(enriched, out, str(tmp_path / "ckpt_se"))
    got = spark.read.parquet(out)

    batch = ev.select("event_id", "user_id", "value").join(dim, "user_id", "left")
    g = {(r.event_id, r.u_events) for r in got.collect()}
    b = {(r.event_id, r.u_events) for r in batch.collect()}
    assert g == b
    assert any(ue is None for _, ue in g), "planted dim gap must surface as NULLs"


def test_streaming_interval_join_checkpoint_restart_exactly_once(spark, tmp_path):
    """Kill-and-restart recovery for the stream-stream join (the last
    streaming operator without a restart pin): run 1 drains an anchor and
    one in-window purchase, the 'job' dies; run 2 restarts from the same
    checkpoint with a SECOND in-window purchase — the match can only be
    emitted if the anchor's buffered join STATE was recovered from the
    checkpoint, not rebuilt from the source (the first batch's files are
    not re-read). A third run with nothing new must emit nothing. No pair
    may ever appear twice."""
    from cassandra_data_migrator_spark.streaming.windows import run_available_now

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    hour_us = 3_600_000_000
    schema = "event_id BIGINT, user_id BIGINT, event_type STRING, ts_us BIGINT, value DOUBLE"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        anchors = stream.filter(F.col("event_type") == "signup").select(
            "event_id", "user_id", "ts_us"
        )
        purchases = stream.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts_us", "value"
        )
        joined = streaming_interval_join(
            anchors, purchases, ["user_id"], "ts_us", "ts_us", hour_us, ["value"]
        )
        run_available_now(joined, out, ckpt)

    def mk(rows):
        return spark.createDataFrame(rows, schema)

    mk([
        (1, 100, "signup", 1_000_000, 0.0),
        (2, 100, "purchase", 600 * 1_000_000, 5.0),
    ]).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    first = _pairs(spark.read.parquet(out).collect())
    assert (1, 600 * 1_000_000, 5.0) in first

    # restart: a second in-window purchase (t=+20min; the run-1 watermark is
    # max_evt - 10min = 0, so it is NOT late) must match the RECOVERED anchor
    mk([(3, 100, "purchase", 1200 * 1_000_000, 7.0)]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_once()
    second = _pairs(spark.read.parquet(out).collect())
    assert (1, 1200 * 1_000_000, 7.0) in second, (
        "restart lost the anchor's buffered join state"
    )
    assert sorted(second) == sorted(
        first + [(1, 1200 * 1_000_000, 7.0)]
    ), "restart re-emitted an already-delivered match"

    # idle restart: nothing new in the source -> output must not move
    run_once()
    third = _pairs(spark.read.parquet(out).collect())
    assert third == second
    assert len(third) == len(set(third)), "duplicate match pairs after restarts"
