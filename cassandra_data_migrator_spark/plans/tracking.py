"""Run tracking & resume (SURVEY.md §2 #6, §4.3.2; CDM spark.cdm.trackRun*,
cdm_run_info / cdm_run_details tables [upstream@6.0.1]).

CDM writes a run-info row plus one status row per token-range slice into the
target keyspace; a rerun with ``previousRunId`` re-processes only failed or
unstarted slices. Spark-native shape: two small bookkeeping DataFrames written
as parquet next to the target; resume = anti-join of the slice manifest
against completed slices. The bookkeeping is tiny (numParts rows) — the scan
of the origin is still the only big thing that happens.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions.tokens import slice_bounds
from cassandra_data_migrator_spark.operators.partition import restrict_to_slices

STATUS_PENDING = "pending"
STATUS_PASSED = "passed"
STATUS_FAILED = "failed"


def _one_part_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Build a bookkeeping DataFrame as ONE partition from the start.

    ``spark.createDataFrame(local_rows)`` parallelizes to
    defaultParallelism slices; coalescing that back to one output file
    makes a single task compute every parent slice through sequential
    Python-worker round-trips — measured ~5 s per tiny write at
    local[32] vs ~0.3 s for a 1-slice parallelize. The manifest is
    ≤ MAX_NUM_PARTS rows, so one partition is also the right layout."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


class RunTracker:
    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base_path = base_path.rstrip("/")

    def _details_path(self, run_id: str) -> str:
        return f"{self.base_path}/cdm_run_details/run_id={run_id}"

    def _info_path(self, run_id: str) -> str:
        return f"{self.base_path}/cdm_run_info/run_id={run_id}"

    def start_run(self, job: str, num_slices: int, run_id: str | None = None) -> str:
        run_id = run_id or uuid.uuid4().hex[:16]
        info = _one_part_df(
            self.spark,
            [(run_id, job, num_slices, int(time.time() * 1000))],
            "run_id STRING, job STRING, num_slices INT, start_ms BIGINT",
        )
        info.write.mode("overwrite").parquet(self._info_path(run_id))
        manifest = _one_part_df(
            self.spark,
            [(*b, STATUS_PENDING) for b in slice_bounds(num_slices)],
            "slice_id BIGINT, slice_min BIGINT, slice_max BIGINT, status STRING",
        )
        manifest.write.mode("overwrite").parquet(self._details_path(run_id))
        return run_id

    def record_slices(self, run_id: str, slice_ids: list[int], status: str) -> None:
        details = self.spark.read.parquet(self._details_path(run_id))
        # The manifest is numParts rows — bounded driver-side state by design,
        # and ENFORCED: config validation caps numParts at config.MAX_NUM_PARTS
        # (10^4), so this collect is ≤10^4 tiny rows, never corpus-sized.
        # Materialize it before overwriting the path it was read from (parquet
        # is not updatable in place), so no staging directory is needed.
        updated = details.withColumn(
            "status",
            F.when(F.col("slice_id").isin(slice_ids), F.lit(status)).otherwise(
                F.col("status")
            ),
        )
        rows = updated.collect()
        fresh = _one_part_df(self.spark, rows, updated.schema)
        fresh.write.mode("overwrite").parquet(self._details_path(run_id))

    def pending_slices(self, run_id: str) -> list[int]:
        """Slices to (re)process on resume: everything not passed — the
        anti-join CDM does against cdm_run_details [upstream@6.0.1]."""
        details = self.spark.read.parquet(self._details_path(run_id))
        rows = details.filter(F.col("status") != STATUS_PASSED).select("slice_id").collect()
        return sorted(r.slice_id for r in rows)

    def resume_scope(
        self, df: DataFrame, pk_col: str, num_slices: int, previous_run_id: str
    ) -> DataFrame:
        """Restrict the origin scan to the previous run's unfinished slices."""
        pending = self.pending_slices(previous_run_id)
        return restrict_to_slices(df, pk_col, num_slices, pending)

    def run_exists(self, run_id: str) -> bool:
        return os.path.exists(self._info_path(run_id))
