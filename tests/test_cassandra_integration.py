"""Connector-facing integration smoke (round-5 verdict #7).

Everything in sources/cassandra.py is contract-tested jar-free in
test_sink_semantics.py, but nothing EXECUTED read_table/write_table — so
the first real-cluster run would be the first execution of that file.
This module closes that gap: when a spark-cassandra-connector jar is on
the classpath AND a reachable cluster is configured via
``CDM_SPARK_CASSANDRA_HOST`` (explicit opt-in — never assume a cluster),
it round-trips write_table (with per-row writetime) → read_table and
checks the written timestamps via WRITETIME(). In this sandbox both
guards are false and the test skips cleanly.
"""

import os

import pytest

from cassandra_data_migrator_spark.sources.cassandra import (
    CASSANDRA_FORMAT,
    PERFOPS_TO_CONNECTOR,
    CassandraConnectorUnavailable,
    _ensure_connector,
    read_table,
    write_table,
)


def _connector_available(spark) -> bool:
    try:
        _ensure_connector(spark)
        return True
    except CassandraConnectorUnavailable:
        return False


# Connector 3.5 documented option names (doc/reference.md +
# doc/14_data_frames.md). Asserted jar-free so a typo in the knob map is
# caught here, not on the first cluster run.
_CONNECTOR_35_OPTIONS = frozenset(
    {
        "spark.cassandra.input.split.sizeInMB",
        "spark.cassandra.input.fetch.sizeInRows",
        "spark.cassandra.output.batch.size.rows",
        "spark.cassandra.output.throughputMBPerSec",
        "spark.cassandra.input.consistency.level",
        "spark.cassandra.output.consistency.level",
        "spark.cassandra.output.timestamp",
        "spark.cassandra.output.ttl",
    }
)


def test_perfops_knob_map_targets_connector_35_options():
    assert set(PERFOPS_TO_CONNECTOR.values()) <= _CONNECTOR_35_OPTIONS
    assert CASSANDRA_FORMAT == "org.apache.spark.sql.cassandra"


def test_connector_roundtrip_with_per_row_writetime(spark):
    """EXECUTES the connector path when present: write rows with explicit
    per-row writetimes, read them back, and verify both values and
    WRITETIME() server-side timestamps."""
    if not _connector_available(spark):
        pytest.skip("spark-cassandra-connector jar not on the classpath")
    host = os.environ.get("CDM_SPARK_CASSANDRA_HOST")
    if not host:
        pytest.skip("CDM_SPARK_CASSANDRA_HOST not set (no opt-in cluster)")

    spark.conf.set("spark.cassandra.connection.host", host)
    spark.conf.set(
        "spark.sql.catalog.cdm_it",
        "com.datastax.spark.connector.datasource.CassandraCatalog",
    )
    ks, tbl = "cdm_it_smoke", "roundtrip"
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS cdm_it.{ks} "
        "WITH DBPROPERTIES (class='SimpleStrategy', replication_factor='1')"
    )
    spark.sql(f"DROP TABLE IF EXISTS cdm_it.{ks}.{tbl}")
    spark.sql(
        f"CREATE TABLE cdm_it.{ks}.{tbl} "
        "(id BIGINT, v STRING) USING cassandra PARTITIONED BY (id)"
    )
    try:
        wt0 = 1_700_000_000_000_000  # fixed epoch µs — assertable exactly
        df = spark.createDataFrame(
            [(1, "a", wt0), (2, "b", wt0 + 5)], "id BIGINT, v STRING, wt BIGINT"
        )
        write_table(
            df,
            ks,
            tbl,
            options={"spark.cassandra.output.batch.size.rows": "10"},
            writetime_col="wt",
        )
        back = read_table(
            spark, ks, tbl, options={"spark.cassandra.input.fetch.sizeInRows": "100"}
        )
        got = {r.id: r.v for r in back.collect()}
        assert got == {1: "a", 2: "b"}
        wts = {
            r.id: r.wt
            for r in spark.sql(
                f"SELECT id, WRITETIME(v) AS wt FROM cdm_it.{ks}.{tbl}"
            ).collect()
        }
        assert wts == {1: wt0, 2: wt0 + 5}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS cdm_it.{ks}.{tbl}")
