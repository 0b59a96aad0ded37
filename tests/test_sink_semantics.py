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