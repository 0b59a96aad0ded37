"""SparkSession construction & normalization.

The engine needs a handful of session confs for deterministic, oracle-checkable
results (UTC timezone) and for reading the fixture parquet (nanosecond
timestamps are stored as INT64 TIMESTAMP(NANOS) which Spark 4 only reads via
``spark.sql.legacy.parquet.nanosAsLong``). ``configure_session`` applies the
runtime-settable ones to an externally provided session (the verify driver owns
its own SparkSession); ``get_spark`` builds a local session for tests/bench.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs required for correctness parity with the DuckDB oracle.
RUNTIME_CONFS = {
    # deterministic timestamp formatting / window bucketing
    "spark.sql.session.timeZone": "UTC",
    # fixture events.parquet stores ts as INT64 TIMESTAMP(NANOS); read as long
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for any pandas_udf paths
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # local-scale shuffle sizing (Spark's 200 default over-parallelizes the
    # fixture scales; results are partition-count independent by construction
    # — deterministic sums/rankings — so this is purely a latency knob. AQE
    # coalesces further at runtime.)
    "spark.sql.shuffle.partitions": "64",
}

# Scan-split sizing is SCALE-APPROPRIATE, not a constant (r10, measured both
# ways): at sf1 a 16 MB split turns the ~100 MB scans into 8-10 parallel
# tasks (corr_stats 24 s -> 1.6 s vs a 1-task layout), but the SAME 16 MB at
# sf0.1 doubles artifact-heavy sub-second keys (stratified_sample 0.44 ->
# 0.86 s, dedup_cluster_sizes 1.9 -> 3.8 s: dozens of tiny session-artifact
# files become dozens of ~ms tasks and launch overhead dominates). So the
# knob rides an env var — sf1 bench runs set SPARK_GRAFT_MAX_PARTITION_BYTES
# =16m, fixture scales keep Spark's 128 MB default. A 100 TB deployment
# sizes this per executor-memory budget (the brief's own instruction).
_MAX_PARTITION_ENV = "SPARK_GRAFT_MAX_PARTITION_BYTES"


def _scan_split_conf() -> dict[str, str]:
    v = os.environ.get(_MAX_PARTITION_ENV)
    return {"spark.sql.files.maxPartitionBytes": v} if v else {}

# Confs we want at build time for performance (AQE is default-on in Spark 4 but
# be explicit — the 100 TB posture depends on it).
BUILD_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent, best-effort)."""
    for k, v in {**RUNTIME_CONFS, **_scan_split_conf()}.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Static conf in this Spark build — loaders have fallbacks.
            pass
    return spark


def get_spark(app_name: str = "cdm-spark", cpus: int | None = None) -> SparkSession:
    """Local session for tests and bench (mirrors the reference's local[*]
    deployment, /root/reference/entrypoint.sh:278)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    # SPARK_GRAFT_MASTER overrides the deployment (r09 verdict #1: run the
    # surface under local-cluster[n,cores,mem] — real executor JVMs: task
    # serialization, broadcast transport, per-executor Python workers,
    # shuffle fetch — the axis single-JVM local[] can't exercise).
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(min(32, cpus * 2)))
        .config("spark.driver.memory", os.environ.get("CDM_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-Dlog4j2.level=ERROR")
    )
    if master.startswith("local-cluster"):
        # executor python workers must import the repo package (UDF/kernel
        # closures reference it); executor JVMs don't inherit the driver's
        # sys.path, so ship it via executorEnv.
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        extra = os.environ.get("PYTHONPATH", "")
        builder = builder.config(
            "spark.executorEnv.PYTHONPATH",
            f"{repo_root}:{extra}" if extra else repo_root,
        )
    for k, v in {**RUNTIME_CONFS, **BUILD_CONFS, **_scan_split_conf()}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return configure_session(spark)
