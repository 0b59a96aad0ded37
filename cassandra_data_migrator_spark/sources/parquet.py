"""Parquet source layer (the fixture world's stand-in for the Cassandra
token-range scan, SURVEY.md §2 #1).

In production the source would be the spark-cassandra-connector, which does
token-range input partitioning natively; here every table is a parquet file
under ``{sf_dir}/{name}.parquet`` (TESTDATA.md). The one quirk handled here:
``events.ts`` is INT64 TIMESTAMP(NANOS) which Spark 4 reads only with
``spark.sql.legacy.parquet.nanosAsLong=true`` — we normalize it to

- ``ts_ns``  BIGINT nanoseconds since epoch (raw)
- ``ts_us``  BIGINT microseconds since epoch (truncated, matches DuckDB's read)
- ``ts``     TimestampType at microsecond precision

All downstream operators use ``ts_us``/``ts``; integer division (``DIV``) is
used rather than double division so no precision is lost on ~1.7e18 values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Cassandra-style primary keys declared for the fixtures (FIXTURES.md): the
# migrate/diff/guardrail jobs key on these.
PRIMARY_KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],  # partition key + clustering
    "events": ["user_id", "ts_us", "event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _normalize_events(df: DataFrame) -> DataFrame:
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        df = df.withColumnRenamed("ts", "ts_ns")
        df = df.withColumn("ts_us", F.expr("ts_ns DIV 1000"))
    else:
        # already a timestamp (some other reader path)
        df = df.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
        df = df.withColumn("ts_ns", F.col("ts_us") * F.lit(1000)).drop("ts")
    return df.withColumn("ts", F.timestamp_micros(F.col("ts_us")))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing the events timestamp columns."""
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name != "events":
        return spark.read.parquet(path)
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(path)
    return _normalize_events(df)


# Opt-in view widening for the SQL frontend: a view named in ``spread`` gets
# a hash-keyed spread on its primary key (operators/partition.spread_by) —
# every fixture parquet is ONE row group, so its scan is one task no matter
# the split config, and a heavy map side fed straight by the scan (Q1's
# decimal partial sums) otherwise runs on a single core. PK-keyed
# (near-unique, deterministic — no retry hazard), pass-through whenever the
# scan is already split at least session-parallelism fine (production scans),
# and gated on file size so sub-open-cost views never pay an exchange. The
# SQL text of every frontend key is untouched — this widens the view the text
# reads, nothing else. OPT-IN per key because it is not uniformly a win
# (measured r12: q1 1.95 -> 1.38, ds8 2.46 -> 1.20, but ds9/ds12/ds15/q5
# each ~0.4 s WORSE — their plans re-read the view several times and pay the
# exchange per read).
_SPREAD_BYTES_MIN = 4 * 1024 * 1024  # spark.sql.files.openCostInBytes default


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str] | None = None,
    spread: tuple[str, ...] = (),
) -> None:
    """Register every fixture table as a temp view so the engine's surface is
    also reachable through plain ``spark.sql`` (the reference has no SQL
    frontend — this is free with Spark and costs nothing to expose)."""
    import os

    from cassandra_data_migrator_spark.operators.partition import spread_by

    for name in tables or TABLES:
        df = load_table(spark, sf_dir, name)
        if name in spread:
            path = f"{sf_dir.rstrip('/')}/{name}.parquet"
            try:
                big = os.path.getsize(path) >= _SPREAD_BYTES_MIN
            except OSError:
                big = False
            if big:
                df = spread_by(df, *PRIMARY_KEYS[name])
        df.createOrReplaceTempView(name)
