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

from cassandra_data_migrator_spark.functions.tokens import slice_bounds
from cassandra_data_migrator_spark.operators.partition import restrict_to_slices

STATUS_PENDING = "pending"
STATUS_PASSED = "passed"
STATUS_FAILED = "failed"


# --- r12 optimization (guide §5 "the driver should do almost no data work",
# inverted: BOOKKEEPING should do no CLUSTER work): the run-info and
# slice-manifest tables are ≤ MAX_NUM_PARTS (10^4) rows by config contract,
# yet each start/record/pending call launched full Spark jobs (parallelize →
# write, read → collect) — ~6 scheduler round-trips per tracked run, ~2 s of
# the run_tracking_resume key's 2.6 s. The reference engine writes these rows
# through its driver-side Cassandra session for the same reason. The tables
# stay ON DISK in the same parquet layout (Spark reads the manifest in the
# resume/report paths unchanged — pinned by tests/test_jobs.py and the
# run_tracking_resume oracle); only the bookkeeping I/O goes through pyarrow
# in-process instead of Spark jobs.

_INFO_SCHEMA = [
    ("run_id", "string"), ("job", "string"),
    ("num_slices", "int32"), ("start_ms", "int64"),
]
_DETAILS_SCHEMA = [
    ("slice_id", "int64"), ("slice_min", "int64"),
    ("slice_max", "int64"), ("status", "string"),
]


def _pa_schema(cols):
    import pyarrow as pa

    return pa.schema([(n, getattr(pa, t)()) for n, t in cols])


def _write_bookkeeping(path: str, cols, rows) -> None:
    """Overwrite `path` (a parquet directory) with one file of `rows`."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = _pa_schema(cols)
    table = pa.Table.from_pylist(
        [dict(zip([n for n, _ in cols], r)) for r in rows], schema=schema
    )
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    pq.write_table(table, os.path.join(path, "part-00000.parquet"))


def _read_bookkeeping(path: str) -> list[dict]:
    import pyarrow.parquet as pq

    return pq.read_table(path).to_pylist()


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
        _write_bookkeeping(
            self._info_path(run_id),
            _INFO_SCHEMA,
            [(run_id, job, num_slices, int(time.time() * 1000))],
        )
        _write_bookkeeping(
            self._details_path(run_id),
            _DETAILS_SCHEMA,
            [(*b, STATUS_PENDING) for b in slice_bounds(num_slices)],
        )
        return run_id

    def record_slices(self, run_id: str, slice_ids: list[int], status: str) -> None:
        # The manifest is numParts rows — bounded driver-side state by design,
        # and ENFORCED: config validation caps numParts at config.MAX_NUM_PARTS
        # (10^4), so this read-update-rewrite is ≤10^4 tiny rows, never
        # corpus-sized. Read fully before overwriting the path (parquet is not
        # updatable in place), so no staging directory is needed.
        want = set(slice_ids)
        rows = [
            (
                r["slice_id"],
                r["slice_min"],
                r["slice_max"],
                status if r["slice_id"] in want else r["status"],
            )
            for r in _read_bookkeeping(self._details_path(run_id))
        ]
        _write_bookkeeping(self._details_path(run_id), _DETAILS_SCHEMA, rows)

    def pending_slices(self, run_id: str) -> list[int]:
        """Slices to (re)process on resume: everything not passed — the
        anti-join CDM does against cdm_run_details [upstream@6.0.1]."""
        return sorted(
            r["slice_id"]
            for r in _read_bookkeeping(self._details_path(run_id))
            if r["status"] != STATUS_PASSED
        )

    def resume_scope(
        self, df: DataFrame, pk_col: str, num_slices: int, previous_run_id: str
    ) -> DataFrame:
        """Restrict the origin scan to the previous run's unfinished slices."""
        pending = self.pending_slices(previous_run_id)
        return restrict_to_slices(df, pk_col, num_slices, pending)

    def run_exists(self, run_id: str) -> bool:
        return os.path.exists(self._info_path(run_id))
