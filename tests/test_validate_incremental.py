"""Digest-gated incremental validation must find EXACTLY what the full diff
finds (the fixture perturbations touch several slices, not all), while
scoping the row-level join to the disagreeing slices only."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_data_migrator_spark.operators.validation import derived_target, diff
from cassandra_data_migrator_spark.plans.validate_incremental import (
    changed_slices,
    validate_incremental,
)
from cassandra_data_migrator_spark.sources.parquet import load_table

NUM_SLICES = 32
PK = ["o_orderkey"]
COMPARE = ["o_custkey", "o_orderstatus", "o_totalprice"]


def _report_rows(df):
    return sorted(
        (r.o_orderkey, r.status, r.mismatch_cols) for r in df.collect()
    )


def test_incremental_equals_full_diff(spark, sf_dir):
    origin = load_table(spark, sf_dir, "orders")
    target = derived_target(origin, "o_orderkey", "o_orderstatus")
    full = diff(origin, target, PK, COMPARE)
    inc, changed = validate_incremental(origin, target, PK, COMPARE, NUM_SLICES)
    assert _report_rows(inc) == _report_rows(full)
    # the perturbation touches some but not every slice — the digest phase
    # must actually prune work
    assert 0 < len(changed) < NUM_SLICES


def test_identical_sides_yield_no_changed_slices(spark, sf_dir):
    origin = load_table(spark, sf_dir, "orders")
    changed = changed_slices(origin, origin, "o_orderkey", NUM_SLICES, COMPARE)
    assert changed == []
    inc, _ = validate_incremental(origin, origin, PK, COMPARE, NUM_SLICES)
    assert inc.count() == 0


def test_tiny_float_delta_flags_slice(spark, sf_dir):
    """Round-4 advice regression: a change smaller than 1e-6 in a double
    column (invisible to the old DECIMAL(28,6) digest) must still flip the
    bit-pattern digest and be found by the incremental diff."""
    origin = load_table(spark, sf_dir, "orders")
    some_pk = origin.select(F.min("o_orderkey")).first()[0]
    target = origin.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") == some_pk, F.col("o_totalprice") + F.lit(1e-9)
        ).otherwise(F.col("o_totalprice")),
    )
    inc, changed = validate_incremental(origin, target, PK, COMPARE, NUM_SLICES)
    assert len(changed) == 1
    assert _report_rows(inc) == [(some_pk, "mismatch", "o_totalprice")]


def test_huge_float_value_participates_in_digest(spark, sf_dir):
    """Values beyond DECIMAL(28,6) range used to cast to NULL and drop out of
    the digest sum; the hash digest must see them."""
    origin = load_table(spark, sf_dir, "orders")
    some_pk = origin.select(F.min("o_orderkey")).first()[0]
    big = F.lit(1e30)
    with_big = origin.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == some_pk, big).otherwise(F.col("o_totalprice")),
    )
    target = with_big.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == some_pk, big * 2).otherwise(
            F.col("o_totalprice")
        ),
    )
    changed = changed_slices(with_big, target, "o_orderkey", NUM_SLICES, COMPARE)
    assert len(changed) == 1


def test_single_row_mutation_flags_one_slice(spark, sf_dir):
    origin = load_table(spark, sf_dir, "orders")
    some_pk = origin.select(F.min("o_orderkey")).first()[0]
    target = origin.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == some_pk, F.lit("Z")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    inc, changed = validate_incremental(origin, target, PK, COMPARE, NUM_SLICES)
    assert len(changed) == 1
    rows = _report_rows(inc)
    assert rows == [(some_pk, "mismatch", "o_orderstatus")]


def test_slice_digest_detects_signed_zero_flip(spark):
    """Round-5 review: a double column flipping 0.0 -> -0.0 must change the
    slice digest (Spark's hash expressions canonicalize -0.0, so the digest
    hashes the injective string form instead)."""
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.plans.validate_incremental import slice_digest

    base = spark.createDataFrame(
        [(i, 0.0) for i in range(8)], "pk BIGINT, v DOUBLE"
    )
    flipped = base.withColumn(
        "v", F.when(F.col("pk") == 3, F.lit(-0.0)).otherwise(F.col("v"))
    )
    d1 = {r.slice_id: r["sum_v"] for r in slice_digest(base, "pk", 4, ["v"]).collect()}
    d2 = {
        r.slice_id: r["sum_v"] for r in slice_digest(flipped, "pk", 4, ["v"]).collect()
    }
    assert d1 != d2, "-0.0 flip must change at least one slice digest"
