"""Streaming migrate: the batch feature pipeline applied to a continuous
source (CDC/event-stream shape). The reference is batch-only; this is the
north-star extension that makes the migrate engine incremental — the same
``build_feature_pipeline`` (config-driven Column expressions) runs unchanged
on a readStream DataFrame because it is pure projection/filter (no
aggregation → append mode, no state).

At scale: the writetime-window filter (#17) is the natural incremental-sync
predicate — a CDC feed filtered to writetime > last-sync-watermark lands only
changed rows, replacing CDM's full-table re-migration."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cassandra_data_migrator_spark.config import MigrationConfig
from cassandra_data_migrator_spark.plans.migrate import build_feature_pipeline


def streaming_migrate(
    source: DataFrame,
    cfg: MigrationConfig,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run the config-driven feature pipeline on a streaming source and sink
    to parquet. Returns the StreamingQuery (caller awaits)."""
    piped = build_feature_pipeline(source, cfg)
    writer = (
        piped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_migrate_merge(
    source: DataFrame,
    cfg: MigrationConfig,
    target_path: str,
    checkpoint_dir: str,
    pk_cols: list[str],
    available_now: bool = True,
):
    """Continuous UPSERT migrate: each micro-batch merges into the target by
    PK via foreachBatch (append mode cannot overwrite existing keys — the
    true CDC sink needs the merge). Across restarts the checkpoint skips
    batches already committed, and a batch replayed after a mid-batch
    failure re-merges the SAME rows into the same PKs — the upsert's
    idempotence, not the checkpoint alone, is what makes the sink
    effectively exactly-once. At scale each batch's merge is one PK shuffle; with a lakehouse
    target the foreachBatch body becomes a MERGE INTO — the plan shape is
    identical (plans/upsert.py docstring)."""
    from cassandra_data_migrator_spark.plans.upsert import upsert_parquet

    piped = build_feature_pipeline(source, cfg)

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_parquet(batch_df.sparkSession, batch_df, target_path, pk_cols)

    writer = piped.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_migrate_quarantine(
    source: DataFrame,
    cfg: MigrationConfig,
    out_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    reason_expr: str,
    available_now: bool = True,
):
    """CDM's error-row accounting (the batch ``quarantine_split`` operator)
    in streaming form: every micro-batch runs the SAME feature pipeline,
    then splits on the reason expression — clean rows append to the main
    sink, flagged rows append to the quarantine sink carrying the failing
    reason plus the micro-batch id for replay. ``reason_expr`` is a SQL
    expression evaluating to the FIRST failing rule name or NULL (the batch
    operator's fixed-precedence contract), so stream and batch agree row
    for row. foreachBatch evaluates the pipeline once per micro-batch
    (persisted across the two appends), two partition-local parquet
    writes — no shuffle, no state, append-only at any scale.

    Delivery contract, stated precisely: a plain parquet append is NOT
    transactional, so a failure between the two writes (or after writing
    but before the checkpoint commit) replays the batch and can duplicate
    appended rows — at-least-once, not exactly-once. Every quarantine row
    carries ``quarantine_batch`` exactly so replays are detectable and
    reconcilable downstream (keep max one copy per (batch, pk)); with a
    transactional table format the same foreachBatch body becomes
    exactly-once with no other change. (The merge sibling above IS
    effectively exactly-once because the PK upsert is idempotent —
    re-merging a replayed batch rewrites the same rows.)"""
    from pyspark.sql import functions as F

    piped = build_feature_pipeline(source, cfg)

    def _split_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        flagged = batch_df.withColumn("reason", F.expr(reason_expr)).persist()
        try:
            flagged.filter(F.col("reason").isNull()).drop("reason").write.mode(
                "append"
            ).parquet(out_dir)
            flagged.filter(F.col("reason").isNotNull()).withColumn(
                "quarantine_batch", F.lit(batch_id).cast("bigint")
            ).write.mode("append").parquet(quarantine_dir)
        finally:
            flagged.unpersist()

    writer = piped.writeStream.foreachBatch(_split_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
