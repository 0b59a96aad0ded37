"""CQL sink-semantics rules as explicit unit tests (SURVEY.md §5.2/§7)."""

import pytest
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.sources.sink import (
    CounterSemanticsError,
    apply_null_policy,
    counter_update_frame,
    guard_counter_write,
    normalize_set_columns,
)


def test_set_dedup_on_write(spark):
    df = spark.createDataFrame([(1, ["b", "a", "b", "a"])], "id INT, tags ARRAY<STRING>")
    row = normalize_set_columns(df, ["tags"]).first()
    assert row.tags == ["a", "b"]


def test_set_dedup_preserves_other_columns(spark):
    df = spark.createDataFrame([(1, [3, 1, 3], ["x"])], "id INT, a ARRAY<INT>, b ARRAY<STRING>")
    row = normalize_set_columns(df, ["a"]).first()
    assert row.a == [1, 3] and row.b == ["x"]


def test_null_policy_validation(spark):
    df = spark.createDataFrame([(1,)], "id INT")
    apply_null_policy(df, "null", ["id"])
    apply_null_policy(df, "unset", ["id"])
    with pytest.raises(ValueError):
        apply_null_policy(df, "tombstone", ["id"])


def test_counter_guard():
    guard_counter_write(["c"], None, None)  # fine
    with pytest.raises(CounterSemanticsError):
        guard_counter_write(["c"], "__writetime", None)
    with pytest.raises(CounterSemanticsError):
        guard_counter_write(["c"], None, "__ttl")


def test_counter_update_frame_shape(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "junk")], "user_id INT, cnt DOUBLE, extra STRING"
    )
    out = counter_update_frame(df, ["user_id"], ["cnt"])
    assert out.columns == ["user_id", "cnt"]
    assert dict(out.dtypes)["cnt"] == "bigint"


# ---------------------------------------------------------------------------
# Cassandra writer contract (connector jar absent in-sandbox: the option
# mapping IS the testable surface — pin it so the production path is at least
# contract-checked against connector 3.5's documented option names)


def test_cassandra_writer_option_contract():
    from cassandra_data_migrator_spark.sources.cassandra import writer_options

    # per-row writetime/ttl ride as COLUMN-NAME-valued 'writetime'/'ttl'
    opts = writer_options(writetime_col="__writetime", ttl_col="__ttl")
    assert opts == {"writetime": "__writetime", "ttl": "__ttl"}
    # extra options pass through untouched; explicit options win on collision
    opts = writer_options(
        writetime_col="wt",
        options={"spark.cassandra.output.batch.size.rows": "10", "writetime": "override"},
    )
    assert opts["spark.cassandra.output.batch.size.rows"] == "10"
    assert opts["writetime"] == "override"
    assert writer_options() == {}


def test_cassandra_perfops_knob_translation():
    from cassandra_data_migrator_spark.config import MigrationConfig
    from cassandra_data_migrator_spark.sources.cassandra import (
        connector_write_options_from_config,
    )

    cfg = MigrationConfig(
        {
            "spark.cdm.perfops.batchSize": 25,
            "spark.cdm.perfops.fetchSizeInRows": 2000,
            "spark.cdm.perfops.ratelimit.target": 60,
        }
    )
    out = connector_write_options_from_config(cfg)
    assert out == {
        "spark.cassandra.input.fetch.sizeInRows": "2000",
        "spark.cassandra.output.batch.size.rows": "25",
        "spark.cassandra.output.throughputMBPerSec": "60",
    }


def test_migrate_write_request_wires_perfops_through():
    """Job-level contract (r2 verdict #7): a cassandra-format migrate config
    emits the full writer request — keyspace/table parsed from the CDM
    keyspaceTable convention, perfops knobs translated, per-row writetime
    column option attached, and no READ option leaking onto the writer."""
    from cassandra_data_migrator_spark.config import MigrationConfig
    from cassandra_data_migrator_spark.sources.cassandra import migrate_write_request

    cfg = MigrationConfig(
        {
            "spark.cdm.connect.target.format": "cassandra",
            "spark.cdm.schema.target.table": "prod_ks.events_v2",
            "spark.cdm.perfops.batchSize": 25,
            "spark.cdm.perfops.fetchSizeInRows": 2000,
            "spark.cdm.perfops.ratelimit.target": 60,
        }
    )
    ks, tbl, opts = migrate_write_request(cfg, writetime_col="__writetime")
    assert (ks, tbl) == ("prod_ks", "events_v2")
    assert opts == {
        "writetime": "__writetime",
        "spark.cassandra.output.batch.size.rows": "25",
        "spark.cassandra.output.throughputMBPerSec": "60",
    }
    with pytest.raises(ValueError):
        migrate_write_request(cfg.with_overrides(**{"spark.cdm.schema.target.table": "flat"}))


def test_run_migrate_cassandra_format_requires_connector(spark):
    """run_migrate routes a cassandra-format target through write_table —
    in-sandbox that surfaces as the connector-unavailable error (the option
    assembly above is the jar-free half of the contract)."""
    from cassandra_data_migrator_spark.config import MigrationConfig
    from cassandra_data_migrator_spark.plans.migrate import run_migrate
    from cassandra_data_migrator_spark.sources.cassandra import (
        CassandraConnectorUnavailable,
    )

    cfg = MigrationConfig(
        {
            "spark.cdm.connect.target.format": "cassandra",
            "spark.cdm.schema.target.table": "ks.t",
        }
    )
    df = spark.createDataFrame([(1,)], "id INT")
    with pytest.raises(CassandraConnectorUnavailable):
        run_migrate(spark, df, cfg)


def test_cassandra_write_requires_connector(spark):
    from cassandra_data_migrator_spark.sources.cassandra import (
        CassandraConnectorUnavailable,
        write_table,
    )

    df = spark.createDataFrame([(1,)], "id INT")
    with pytest.raises(CassandraConnectorUnavailable):
        write_table(df, "ks", "tbl", writetime_col="__writetime")