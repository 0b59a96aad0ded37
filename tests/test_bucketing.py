"""Bucketed-table co-located join (SCALE.md: 'bucketed target tables for
repeated validate runs kill the diff shuffle').

Writing both sides bucketed on the join key means a later join needs NO
Exchange at all — at 100 TB that removes the single largest cost of a
repeated validate/diff pipeline. This pins that the bucketing metadata
actually survives the write and the planner exploits it."""

import pytest
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def bucketed_db(spark, sf_dir, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    for name, df, key in (("orders_b", o, "o_custkey"), ("customer_b", c, "c_custkey")):
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(f"bucketdb.{name}")
        )
    yield "bucketdb"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_db):
    """Join two tables bucketed on the join key: the plan must contain zero
    shuffle Exchanges (broadcast disabled so the bucket layout, not a
    broadcast, is what avoids the shuffle)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(f"{bucketed_db}.orders_b")
        c = spark.table(f"{bucketed_db}.customer_b")
        j = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the JOIN must not shuffle on its keys (the later groupBy on
        # c_mktsegment legitimately exchanges on ITS key)
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert "Exchange hashpartitioning(c_custkey" not in plan
        assert plan.count("Bucketed: true") == 2, "bucket metadata lost on write"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_db):
    o = spark.table(f"{bucketed_db}.orders_b")
    c = spark.table(f"{bucketed_db}.customer_b")
    got = {
        r["c_mktsegment"]: r["count"]
        for r in o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count().collect()
    }
    oo = load_table(spark, sf_dir, "orders")
    cc = load_table(spark, sf_dir, "customer")
    want = {
        r["c_mktsegment"]: r["count"]
        for r in oo.join(cc, oo.o_custkey == cc.c_custkey)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    }
    assert got == want and sum(got.values()) > 0
