"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``cassandra_data_migrator_spark`` (see SURVEY.md §2
for the operator inventory these keys map to).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cassandra_data_migrator_spark import queries as _q
from cassandra_data_migrator_spark.operators import transforms, validation
from cassandra_data_migrator_spark.session import configure_session
from cassandra_data_migrator_spark.sources.parquet import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline on sf0.001: migrate lineitem (project/rename +
    constant column + where-filter), then validate the result against a
    perturbed target — the engine's two core jobs composed end-to-end
    (SURVEY.md §7 Phase 0)."""
    configure_session(spark)
    sf_dir = "/root/testdata/sf0.001"
    orders = load_table(spark, sf_dir, "orders")
    migrated = transforms.constant_columns(
        transforms.where_filter(orders, "o_totalprice > 0"),
        {"migrated_by": ("cdm-spark", "string")},
    )
    target = validation.derived_target(orders, "o_orderkey", "o_orderstatus")
    report = validation.diff(
        migrated.drop("migrated_by"),
        target,
        ["o_orderkey"],
        ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    )
    return report


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (keys without an entry get the
    driver's weaker rows-only check: minhash/simhash use engine-specific hash
    families that no ANSI SQL reproduces)."""
    return _q.oracle_sql()
