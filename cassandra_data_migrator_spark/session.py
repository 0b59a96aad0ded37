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
    # scan-split sizing (r10): fixture tables are single parquet FILES
    # (driver convention), so the 128 MB default makes the sf1 tier's
    # ~100 MB lineitem scan ONE task — a single-threaded scan feeding a
    # 32-core box. 16 MB splits the file at row-group boundaries into
    # ~8-10 parallel scan tasks; at sf0.1 every file is already under
    # 16 MB so nothing changes there. This is exactly the knob a 100 TB
    # deployment sizes per-executor (brief: "size maxPartitionBytes so
    # partitions fit in executor memory at the target SF").
    "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
}

# Confs we want at build time for performance (AQE is default-on in Spark 4 but
# be explicit — the 100 TB posture depends on it).
BUILD_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent, best-effort)."""
    for k, v in RUNTIME_CONFS.items():
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
    for k, v in {**RUNTIME_CONFS, **BUILD_CONFS}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return configure_session(spark)
