"""Structured Streaming window variants: availableNow drain over the events
fixture must agree with the batch operators (same expressions + watermark)."""

from pyspark.sql import functions as F

from cassandra_data_migrator_spark.operators.windows import tumbling_window
from cassandra_data_migrator_spark.sources.parquet import load_table
from cassandra_data_migrator_spark.streaming.windows import (
    read_events_stream,
    run_available_now,
    streaming_session,
    streaming_tumbling,
)


def test_streaming_tumbling_matches_batch(spark, sf_dir, tmp_path):
    stream = read_events_stream(spark, sf_dir)
    agg = streaming_tumbling(stream)
    out = str(tmp_path / "out")
    run_available_now(agg, out, str(tmp_path / "ckpt"))

    got = spark.read.parquet(out)
    batch = tumbling_window(load_table(spark, sf_dir, "events")).select(
        "window_start_us", "n_events", "sum_value"
    )
    # availableNow + watermark: all windows emitted except possibly those still
    # open at end-of-stream; every emitted window must match batch exactly.
    joined = got.alias("s").join(batch.alias("b"), "window_start_us", "inner")
    assert got.count() > 0
    assert joined.count() == got.count()
    bad = joined.filter(
        (F.col("s.n_events") != F.col("b.n_events"))
        | (F.abs(F.col("s.sum_value") - F.col("b.sum_value")) > 1e-9)
    )
    assert bad.count() == 0


def test_streaming_session_runs(spark, sf_dir, tmp_path):
    stream = read_events_stream(spark, sf_dir)
    agg = streaming_session(stream)
    out = str(tmp_path / "out_s")
    run_available_now(agg, out, str(tmp_path / "ckpt_s"))
    got = spark.read.parquet(out)
    assert got.columns == ["user_id", "session_start_us", "n_events"]
    assert got.count() > 0


def test_streaming_session_matches_batch(spark, sf_dir, tmp_path):
    """Stream==batch parity for SESSIONIZATION (the tumbling test's sibling
    — r08 upgrade of the runs-only smoke): every (user, session) the
    availableNow drain emits must match the batch session_window over the
    same events exactly; the ONLY admissible difference is batch sessions
    still open at end-of-stream (Append mode emits a session only once the
    watermark passes it, so sessions starting inside the final watermark
    tail may be withheld — measured 3 of 946 at sf0.001)."""
    stream = read_events_stream(spark, sf_dir)
    agg = streaming_session(stream)
    out = str(tmp_path / "out_sp")
    run_available_now(agg, out, str(tmp_path / "ckpt_sp"))
    got = spark.read.parquet(out)

    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(
            F.col("user_id"), F.session_window(F.col("ts"), "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )
    g = {(r.user_id, r.session_start_us): r.n_events for r in got.collect()}
    b = {(r.user_id, r.session_start_us): r.n_events for r in batch.collect()}
    # every emitted session matches batch exactly
    assert set(g) <= set(b)
    assert all(b[k] == v for k, v in g.items())
    # nothing missing except sessions inside the final 2h watermark tail
    max_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    tail_us = 2 * 3600 * 1_000_000
    missing = set(b) - set(g)
    assert missing, "fixture should leave at least one session open"
    assert all(start >= max_us - tail_us for _, start in missing), missing
    assert len(missing) < len(b) * 0.05


def test_streaming_migrate_matches_batch(spark, sf_dir, tmp_path):
    """The config-driven feature pipeline produces identical results on the
    streaming and batch paths (same Column expressions on both)."""
    from cassandra_data_migrator_spark.config import MigrationConfig
    from cassandra_data_migrator_spark.plans.migrate import build_feature_pipeline
    from cassandra_data_migrator_spark.streaming.migrate import streaming_migrate

    cfg = MigrationConfig(
        {
            "spark.cdm.schema.pk": "user_id",
            "spark.cdm.filter.cassandra.whereCondition": "value > 100",
            "spark.cdm.feature.extractJson.originColumn": "props",
            "spark.cdm.feature.extractJson.propertyName": "k",
            "spark.cdm.feature.extractJson.targetColumn": "k_val",
            "spark.cdm.feature.constantColumns.names": "migrated_by",
            "spark.cdm.feature.constantColumns.values": "cdm-stream",
            "spark.cdm.feature.constantColumns.types": "string",
        }
    )
    stream = read_events_stream(spark, sf_dir)
    out = str(tmp_path / "mig_out")
    q = streaming_migrate(stream, cfg, out, str(tmp_path / "mig_ckpt"))
    q.awaitTermination()

    got = spark.read.parquet(out)
    batch = build_feature_pipeline(load_table(spark, sf_dir, "events"), cfg)
    assert got.count() == batch.count() > 0
    assert "migrated_by" in got.columns and "k_val" in got.columns
    g = {r.event_id: r.k_val for r in got.select("event_id", "k_val").collect()}
    b = {r.event_id: r.k_val for r in batch.select("event_id", "k_val").collect()}
    assert g == b


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    """The watermark's late-data contract: a row arriving in a later batch
    whose event time sits beyond the watermark is DROPPED — the finalized
    window's count never changes and no duplicate window row is appended.
    Two availableNow runs over one checkpoint (watermark persists in the
    checkpoint across restarts)."""
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.streaming.windows import (
        run_available_now,
        streaming_tumbling,
    )

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    hour_us = 3_600_000_000

    def mk(rows):
        df = spark.createDataFrame(rows, "event_id BIGINT, ts_us BIGINT, value DOUBLE")
        return df.withColumn("ts", F.timestamp_micros("ts_us"))

    def run_once():
        stream = (
            spark.readStream.schema("event_id BIGINT, ts_us BIGINT, value DOUBLE, ts TIMESTAMP")
            .parquet(str(src))
        )
        run_available_now(streaming_tumbling(stream, watermark="1 hour"), out, ckpt)

    # batch 1: 3 events in hour 0, spread through hour 5 → watermark = 5h-1h
    batch1 = [(i, i * hour_us + 1, 1.0) for i in range(6)] + [
        (10, 100, 1.0),
        (11, 200, 1.0),
    ]
    mk(batch1).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    first = {r.window_start_us: r.n_events for r in spark.read.parquet(out).collect()}
    assert first.get(0) == 3  # hour-0 window finalized with 3 events

    # batch 2: a LATE hour-0 event (beyond watermark) + a fresh hour-7 event
    mk([(20, 300, 1.0), (21, 7 * hour_us + 1, 1.0)]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_once()
    rows = spark.read.parquet(out).filter(F.col("window_start_us") == 0).collect()
    assert len(rows) == 1 and rows[0].n_events == 3, (
        "late row beyond the watermark must be dropped, not appended"
    )


def test_streaming_migrate_merge_upserts_across_restarts(spark, tmp_path):
    """The CDC merge sink: batch 1 loads keys 1-10, a restart with the same
    checkpoint picks up ONLY the new file (keys 5-15 at v2) and upserts it —
    old keys survive, colliding keys take the new value, processed files
    are never re-merged (exactly-once via checkpoint)."""
    from cassandra_data_migrator_spark.config import MigrationConfig
    from cassandra_data_migrator_spark.streaming.migrate import streaming_migrate_merge

    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    cfg = MigrationConfig({"spark.cdm.schema.pk": "id"})
    schema = "id BIGINT, val BIGINT"

    def run_once() -> None:
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = streaming_migrate_merge(stream, cfg, target, ckpt, ["id"])
        q.awaitTermination()

    spark.createDataFrame([(i, 1) for i in range(1, 11)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_once()
    assert spark.read.parquet(target).count() == 10

    spark.createDataFrame([(i, 2) for i in range(5, 16)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_once()
    got = {r.id: r.val for r in spark.read.parquet(target).collect()}
    assert len(got) == 15
    assert all(got[i] == 1 for i in range(1, 5))
    assert all(got[i] == 2 for i in range(5, 16))


def test_streaming_window_distinct_within_sketch_bound(spark, sf_dir, tmp_path):
    """The streaming per-window HLL++ distinct estimate must land within
    the sketch's rsd bound (2% requested; 6-sigma slack) of the batch
    exact COUNT(DISTINCT) for every emitted window — bounded-state
    cardinality on an unbounded stream."""
    from cassandra_data_migrator_spark.streaming.windows import (
        read_events_stream,
        run_available_now,
        streaming_window_distinct,
    )

    stream = read_events_stream(spark, sf_dir)
    out = str(tmp_path / "out_d")
    run_available_now(
        streaming_window_distinct(stream), out, str(tmp_path / "ckpt_d")
    )
    got = spark.read.parquet(out)
    assert got.count() > 0

    e = load_table(spark, sf_dir, "events")
    exact = (
        e.groupBy(F.window(F.col("ts"), "1 hour").alias("w"))
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"), "n_users"
        )
    )
    joined = got.join(exact, "window_start_us", "inner").collect()
    assert len(joined) == got.count(), "every emitted window must exist in batch"
    for r in joined:
        tol = max(2, 0.12 * r.n_users)  # 6 x 2% rsd
        assert abs(r.n_users_est - r.n_users) <= tol, (
            r.window_start_us,
            r.n_users_est,
            r.n_users,
        )


def test_streaming_quarantine_split_matches_batch(spark, sf_dir, tmp_path):
    """The streaming quarantine splitter (CDM error-file semantics in
    foreachBatch form) must agree with the batch operator row for row:
    main ∪ quarantine == pipeline output, reasons identical, and no
    flagged row ever reaches the main sink."""
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.config import MigrationConfig
    from cassandra_data_migrator_spark.plans.migrate import build_feature_pipeline
    from cassandra_data_migrator_spark.streaming.migrate import (
        streaming_migrate_quarantine,
    )

    cfg = MigrationConfig(
        {
            "spark.cdm.schema.pk": "user_id",
            "spark.cdm.filter.cassandra.whereCondition": "value > 100",
        }
    )
    reason_expr = (
        "CASE WHEN event_type = 'error' THEN 'error_event' "
        "WHEN value > 400.0 THEN 'outlier_value' END"
    )
    stream = read_events_stream(spark, sf_dir)
    out = str(tmp_path / "q_out")
    quar = str(tmp_path / "q_quar")
    q = streaming_migrate_quarantine(
        stream, cfg, out, quar, str(tmp_path / "q_ckpt"), reason_expr
    )
    q.awaitTermination()

    got_main = spark.read.parquet(out)
    got_quar = spark.read.parquet(quar)
    batch = build_feature_pipeline(load_table(spark, sf_dir, "events"), cfg)
    b_reason = batch.withColumn("reason", F.expr(reason_expr))
    b_clean = {r.event_id for r in b_reason.filter(F.col("reason").isNull()).collect()}
    b_bad = {
        r.event_id: r.reason
        for r in b_reason.filter(F.col("reason").isNotNull()).collect()
    }
    assert {r.event_id for r in got_main.select("event_id").collect()} == b_clean
    g_bad = {r.event_id: r.reason for r in got_quar.select("event_id", "reason").collect()}
    assert g_bad == b_bad and len(b_bad) > 0 and len(b_clean) > 0
    assert "reason" not in got_main.columns
    assert "quarantine_batch" in got_quar.columns


def test_streaming_quarantine_restart_does_not_double_append(spark, tmp_path):
    """Append sinks are not idempotent, so exactly-once for the quarantine
    splitter rests entirely on the checkpoint: a restart with the same
    checkpoint and no new source files must append NOTHING to either sink,
    and a restart with one new file must append only that file's rows."""
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.config import MigrationConfig
    from cassandra_data_migrator_spark.streaming.migrate import (
        streaming_migrate_quarantine,
    )

    src = tmp_path / "qsrc"
    src.mkdir()
    out, quar, ckpt = (
        str(tmp_path / "q_out2"), str(tmp_path / "q_quar2"), str(tmp_path / "q_ckpt2")
    )
    cfg = MigrationConfig({"spark.cdm.schema.pk": "id"})
    schema = "id BIGINT, event_type STRING, value DOUBLE"
    reason = "CASE WHEN event_type = 'error' THEN 'error_event' END"

    def run_once() -> None:
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = streaming_migrate_quarantine(stream, cfg, out, quar, ckpt, reason)
        q.awaitTermination()

    rows1 = [(1, "view", 10.0), (2, "error", 20.0), (3, "view", 30.0)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    assert spark.read.parquet(out).count() == 2
    assert spark.read.parquet(quar).count() == 1

    run_once()  # restart, nothing new: counts must not move
    assert spark.read.parquet(out).count() == 2
    assert spark.read.parquet(quar).count() == 1

    spark.createDataFrame([(4, "error", 40.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_once()
    assert spark.read.parquet(out).count() == 2
    got = {r.id: (r.reason, r.quarantine_batch) for r in spark.read.parquet(quar).collect()}
    assert set(got) == {2, 4} and got[4][0] == "error_event"
    # the two quarantined rows came from different micro-batches
    assert got[2][1] != got[4][1]


def test_streaming_profile_matches_batch(spark, sf_dir, tmp_path):
    """The incremental tier-1 profile (streaming/profile.py): after an
    availableNow drain over a MULTI-batch source, the one-row running
    profile equals the batch aggregation of the same expressions exactly —
    including the HLL distinct (register-max merge is commutative, so
    stream and batch agree bit-for-bit at the same rsd), the decimal
    sum/min/max, and the null counts."""
    from cassandra_data_migrator_spark.streaming.profile import (
        profile_aggs,
        run_profile_available_now,
        streaming_profile,
    )

    src = str(tmp_path / "src")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    events.repartition(4).write.parquet(src)  # >=4 files -> >=4 micro-batches

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    prof = streaming_profile(
        stream, null_cols=["user_id"], sum_col="value", distinct_col="event_type"
    )
    out = str(tmp_path / "profile")
    run_profile_available_now(prof, out, str(tmp_path / "ckpt_p"))

    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    want = events.agg(
        *profile_aggs(["user_id"], "value", "event_type")
    ).collect()[0]
    g = got[0]
    for f in want.asDict():
        assert g[f] == want[f], f"{f}: stream {g[f]} != batch {want[f]}"


def _stage_file(df, tmp_path, work_name, dest_dir, dest_name):
    """Write df as ONE parquet file named dest_name inside dest_dir (the
    file-arrival unit the restart tests control batch-by-batch)."""
    import glob
    import os
    import shutil

    os.makedirs(str(dest_dir), exist_ok=True)
    work = str(tmp_path / work_name)
    df.repartition(1).write.mode("overwrite").parquet(work)
    part = glob.glob(work + "/part-*.parquet")[0]
    shutil.copy(part, str(dest_dir / dest_name))


def _events_halves(spark, sf_dir):
    """The raw events fixture split at the median event time — sessions
    spanning the split are the state the checkpoint must carry."""
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    key = (
        F.col("ts")
        if dict(raw.dtypes)["ts"] == "bigint"
        else F.unix_micros(F.col("ts").cast("timestamp"))
    )
    med = raw.select(key.cast("double").alias("k")).approxQuantile("k", [0.5], 0.0)[0]
    return raw.filter(key.cast("double") <= med), raw.filter(key.cast("double") > med)


def test_streaming_session_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    """Kill-and-restart mid-stream (r08 verdict #6): drain the first half of
    the events, stop, stage the second half, restart from the SAME
    checkpoint. Exactly-once demands (a) the first half is never
    reprocessed, (b) open-session STATE is recovered so sessions spanning
    the restart merge to their exact batch counts, (c) a further restart
    with no new files emits nothing. Red-green sensitivity: the same
    assertions FAIL when a duplicate of batch 1 is planted (fresh
    checkpoint) — proving the parity check catches double-processing."""
    from cassandra_data_migrator_spark.sources.parquet import load_table
    from cassandra_data_migrator_spark.streaming.windows import (
        read_parquet_stream_dir,
        streaming_session,
    )

    b1, b2 = _events_halves(spark, sf_dir)
    src = tmp_path / "src"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _stage_file(b1, tmp_path, "w1", src, "b1.parquet")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")

    def drain():
        stream = read_parquet_stream_dir(spark, raw, str(src))
        run_available_now(streaming_session(stream), out, ckpt)

    drain()  # run 1: first half only
    n_after_1 = spark.read.parquet(out).count()
    _stage_file(b2, tmp_path, "w2", src, "b2.parquet")
    drain()  # restart: same checkpoint, picks up ONLY b2, state recovered
    drain()  # restart with nothing new: must emit nothing
    got = spark.read.parquet(out)
    assert got.count() > n_after_1, "second half never processed"
    # exactly-once: no (user, session) emitted twice across the restarts
    assert got.count() == got.select("user_id", "session_start_us").distinct().count()

    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(
            F.col("user_id"), F.session_window(F.col("ts"), "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )
    g = {(r.user_id, r.session_start_us): r.n_events for r in got.collect()}
    b = {(r.user_id, r.session_start_us): r.n_events for r in batch.collect()}
    # every emitted session matches batch EXACTLY — a session straddling
    # the restart only reaches its batch count if state was recovered
    assert set(g) <= set(b)
    assert all(b[k] == v for k, v in g.items())
    max_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    tail_us = 2 * 3600 * 1_000_000
    missing = set(b) - set(g)
    assert all(start >= max_us - tail_us for _, start in missing), missing

    # --- red path: duplicate-batch injection must VIOLATE the parity ---
    src2 = tmp_path / "src_dup"
    _stage_file(b1, tmp_path, "w3", src2, "b1.parquet")
    _stage_file(b1, tmp_path, "w4", src2, "b1_dup.parquet")
    _stage_file(b2, tmp_path, "w5", src2, "b2.parquet")
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    stream2 = read_parquet_stream_dir(spark, raw, str(src2))
    run_available_now(streaming_session(stream2), out2, ckpt2)
    g2 = {
        (r.user_id, r.session_start_us): r.n_events
        for r in spark.read.parquet(out2).collect()
    }
    assert any(k not in b or g2[k] != b[k] for k in g2), (
        "duplicate batch went undetected — the parity assertions are blind"
    )


def test_streaming_enrich_join_checkpoint_restart(spark, sf_dir, tmp_path):
    """The stream-static enrich join across a kill/restart: the joined
    output after (drain half, restart, drain rest, restart no-op) must be
    row-identical to the batch left join — no fact reprocessed, none
    dropped at the restart boundary (the join is stateless, so this pins
    the SOURCE's checkpoint bookkeeping)."""
    from cassandra_data_migrator_spark.sources.parquet import load_table
    from cassandra_data_migrator_spark.streaming.joins import streaming_static_enrich
    from cassandra_data_migrator_spark.streaming.windows import (
        read_parquet_stream_dir,
    )

    b1, b2 = _events_halves(spark, sf_dir)
    src = tmp_path / "esrc"
    out, ckpt = str(tmp_path / "eout"), str(tmp_path / "eckpt")
    _stage_file(b1, tmp_path, "ew1", src, "b1.parquet")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )

    def drain():
        stream = read_parquet_stream_dir(spark, raw, str(src))
        enriched = streaming_static_enrich(stream, dim).select(
            "event_id", "user_id", "segment"
        )
        q = (
            enriched.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    _stage_file(b2, tmp_path, "ew2", src, "b2.parquet")
    drain()
    drain()  # nothing new: must append nothing
    got = spark.read.parquet(out)
    ev = load_table(spark, sf_dir, "events")
    batch = ev.join(F.broadcast(dim), "user_id", "left").select(
        "event_id", "user_id", "segment"
    )
    assert got.count() == batch.count()
    g = {(r.event_id): (r.user_id, r.segment) for r in got.collect()}
    bm = {(r.event_id): (r.user_id, r.segment) for r in batch.collect()}
    assert g == bm
