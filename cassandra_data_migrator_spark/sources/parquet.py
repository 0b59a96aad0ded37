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


def register_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register every fixture table as a temp view so the engine's surface is
    also reachable through plain ``spark.sql`` (the reference has no SQL
    frontend — this is free with Spark and costs nothing to expose)."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
