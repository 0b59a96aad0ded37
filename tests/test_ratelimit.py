"""Rate limiting (SURVEY.md §4.1 perfops; reference Dockerfile:60-61 pins the
ratelimit knobs): the distributed token-bucket pacer and its migrate wiring."""

import time

from pyspark.sql import functions as F

from cassandra_data_migrator_spark.config import MigrationConfig
from cassandra_data_migrator_spark.operators.ratelimit import throttled
from cassandra_data_migrator_spark.plans.migrate import run_migrate
from cassandra_data_migrator_spark.sources.parquet import load_table


def test_throttled_is_identity_on_data(spark):
    df = spark.range(0, 1000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    out = throttled(df.coalesce(1), rows_per_sec=100_000, num_tasks=1)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, df.collect()))
    assert out.schema == df.schema


def test_throttled_zero_rate_is_noop_plan(spark):
    df = spark.range(0, 10)
    assert throttled(df, rows_per_sec=0) is df


def test_throttled_paces_to_budget(spark):
    # 800 rows at 800 rows/s on one task must take >= ~1s end to end;
    # unthrottled the same job is ~100x faster. Generous margin for CI noise.
    df = spark.range(0, 800).coalesce(1)
    t0 = time.monotonic()
    throttled(df, rows_per_sec=800, num_tasks=1).write.format("noop").mode(
        "overwrite"
    ).save()
    elapsed = time.monotonic() - t0
    assert elapsed >= 0.9, f"pacer did not pace: {elapsed:.2f}s for a 1s budget"


def test_run_migrate_ratelimit_same_output(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    base = {
        "spark.cdm.connect.target.path": str(tmp_path / "plain"),
        "spark.cdm.filter.cassandra.whereCondition": "o_totalprice > 150000",
    }
    plain = run_migrate(spark, o, MigrationConfig(dict(base)))
    limited = run_migrate(
        spark,
        o,
        MigrationConfig(
            {
                **base,
                "spark.cdm.connect.target.path": str(tmp_path / "limited"),
                "spark.cdm.perfops.ratelimit.enabled": True,
                "spark.cdm.perfops.ratelimit.origin": 500_000,
                "spark.cdm.perfops.ratelimit.target": 1_000_000,
            }
        ),
    )
    a = sorted(map(tuple, plain.output.select("o_orderkey", "o_totalprice").collect()))
    b = sorted(map(tuple, limited.output.select("o_orderkey", "o_totalprice").collect()))
    assert a == b
    assert limited.counters == plain.counters
