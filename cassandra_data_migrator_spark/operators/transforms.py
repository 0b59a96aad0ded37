"""Row-level migrate features: projections, constant columns, filters
(SURVEY.md §2 #8, #9, #14-#18; CDM features [upstream@6.0.1], config surface
pinned via /root/reference/Dockerfile:60-61).

Each feature is a ``DataFrame -> DataFrame`` combinator built purely from
Column expressions: Catalyst folds them into one codegen'd projection and
pushes the filters to the scan (CDM's per-row Java loop → vectorized codegen,
SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions.tokens import pmod_100, tok


def project_rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Select origin columns and map names to the target schema
    (spark.cdm.schema.origin.column.names.to.target, #8)."""
    return df.select([F.col(o).alias(t) for o, t in mapping.items()])


def constant_columns(df: DataFrame, consts: dict[str, tuple[object, str]]) -> DataFrame:
    """Append fixed-value columns to every row (#9): name → (value, sql_type)."""
    for name, (value, sql_type) in consts.items():
        df = df.withColumn(name, F.lit(value).cast(sql_type))
    return df


def where_filter(df: DataFrame, predicate: str) -> DataFrame:
    """User CQL/SQL predicate (#14, spark.cdm.filter.cassandra.whereCondition).
    Expressed declaratively so Catalyst pushes it into the scan."""
    return df.filter(F.expr(predicate))


def token_range_filter(
    df: DataFrame, pk_col: str, min_token: int, max_token: int
) -> DataFrame:
    """Process only [partition.min, partition.max] of the ring (#15)."""
    t = tok(pk_col)
    return df.filter((t >= F.lit(min_token)) & (t <= F.lit(max_token)))


def percent_coverage_filter(df: DataFrame, pk_col: str, percent: int) -> DataFrame:
    """Deterministic p% coverage sample by token residue (#16) — not
    df.sample(), which is nondeterministic across runs/partitionings."""
    return df.filter(pmod_100(tok(pk_col)) < F.lit(percent))


def writetime_window_filter(
    df: DataFrame, writetime: Column, min_us: int | None, max_us: int | None
) -> DataFrame:
    """Incremental-migration window on the computed row writetime (#17)."""
    if min_us is not None:
        df = df.filter(writetime >= F.lit(min_us))
    if max_us is not None:
        df = df.filter(writetime <= F.lit(max_us))
    return df


def column_value_skip_filter(df: DataFrame, column: str, value: str) -> DataFrame:
    """Skip rows whose (string) column contains the given value (#18)."""
    return df.filter(~F.col(column).contains(value))
