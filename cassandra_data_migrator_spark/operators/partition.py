"""Slice planner (SURVEY.md §2 #25; CDM SplitPartitions [upstream@6.0.1],
parallelism context --master local[*] /root/reference/entrypoint.sh:278,
spark-submit-cdm:31).

CDM splits the token ring into numParts contiguous ranges and processes them
as independent work units (also the retry/resume unit — #5/#6). Spark already
partitions scans; this operator exists to (a) expose the same slice accounting
(per-slice row counts / token bounds) and (b) drive slice-targeted reruns via
run tracking (plans.tracking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions.tokens import slice_bounds, slice_id, tok


def with_slice(df: DataFrame, pk_col: str, num_slices: int) -> DataFrame:
    """Attach token + slice_id columns."""
    t = tok(pk_col)
    return df.withColumn("token", t).withColumn("slice_id", slice_id(F.col("token"), num_slices))


def slice_stats(df: DataFrame, pk_col: str, num_slices: int) -> DataFrame:
    """Per-slice accounting: row count + observed token bounds (the per-slice
    progress CDM logs per JobCounter)."""
    return (
        with_slice(df, pk_col, num_slices)
        .groupBy("slice_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("row_cnt"),
            F.min("token").alias("min_token"),
            F.max("token").alias("max_token"),
        )
    )


def slice_manifest(spark: SparkSession, num_slices: int) -> DataFrame:
    """The planned slice list (slice_id, slice_min, slice_max) — what CDM's
    partition file holds (#5) and what run tracking marks complete (#6)."""
    return spark.createDataFrame(
        slice_bounds(num_slices), "slice_id BIGINT, slice_min BIGINT, slice_max BIGINT"
    )


def restrict_to_slices(df: DataFrame, pk_col: str, num_slices: int, slices: list[int]) -> DataFrame:
    """Reprocess only the named slices (partition-file retry path, #5)."""
    return with_slice(df, pk_col, num_slices).filter(F.col("slice_id").isin(slices))
