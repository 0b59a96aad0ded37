"""Bloom prefilter contract tests (operators/bloom.py).

The oracle key (bloom_prefilter_audit) pins the audit booleans on the
orders fixture; these tests pin the operator's guarantees on adversarial
synthetic frames where ground truth is enumerable — the no-false-negative
law, the flagged-subset law, the fp-rate sanity band, sizing, and NULL
keys.
"""

import math

import pytest
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.operators import bloom


@pytest.fixture(scope="module")
def built(spark):
    target = spark.range(0, 5_000).select((F.col("id") * 3).alias("pk"))
    m = bloom.sized_bits(5_000)
    packed = bloom.build_bloom(target, "pk", m)
    return target, m, packed


def test_no_false_negatives(spark, built):
    """Every key that went INTO the filter must test positive — the bloom
    law; a packing bug (wrong word index, lost sign bit, off-by-one shift)
    breaks this immediately."""
    target, m, packed = built
    misses = bloom.with_bloom_flag(target, "pk", packed, m).filter("flagged").count()
    assert misses == 0


def test_fp_rate_within_band(spark, built):
    """Probing 5k keys DISJOINT from the build set (multiples of 3 vs
    3k+1): the false-positive fraction must sit under ~4x the design rate
    (~0.22% at 20 bits/key) — a collapsed filter (all-ones words) would
    read 100% here while still passing the no-false-negative test."""
    target, m, packed = built
    probe = spark.range(0, 5_000).select((F.col("id") * 3 + 1).alias("pk"))
    fp = (
        bloom.with_bloom_flag(probe, "pk", packed, m, negate=False)
        .filter("flagged")
        .count()
    )
    assert fp / 5_000 < 0.01, f"fp rate {fp / 5_000}"


def test_flagged_subset_and_catch_rate(spark):
    """End-to-end audit on a frame with planted missing keys: both
    booleans true, and the exact missing count matches the plant."""
    origin = spark.range(0, 4_000).select(F.col("id").alias("pk"), F.lit("v").alias("val"))
    target = origin.filter(F.col("pk") % 10 != 0)  # 400 missing
    row = bloom.bloom_prefilter_audit(origin, target, "pk").collect()[0]
    assert row["n_origin"] == 4_000
    assert row["n_missing_exact"] == 400
    assert row["flagged_subset_ok"] is True
    assert row["catch_rate_ok"] is True


def test_null_key_never_present(spark):
    """NULL PKs must probe to 'not present' (flagged missing), never crash
    or poison the bit tests with a NULL three-valued AND."""
    target = spark.range(0, 100).select(F.col("id").alias("pk"))
    m = bloom.sized_bits(100)
    packed = bloom.build_bloom(target, "pk", m)
    probe = spark.createDataFrame([(None,), (5,)], "pk BIGINT")
    got = {
        r["pk"]: r["hit"]
        for r in bloom.with_bloom_flag(
            probe, "pk", packed, m, flag_col="hit", negate=False
        ).collect()
    }
    assert got[None] is False
    assert got[5] is True


def test_sized_bits_power_of_two_and_capacity():
    for n in (1, 100, 5_000, 150_000):
        m = bloom.sized_bits(n)
        assert m & (m - 1) == 0
        assert m >= n * bloom.BLOOM_BITS_PER_KEY
    assert bloom.sized_bits(0) == 1 << 10


def test_build_is_bounded_aggregate(spark):
    """The build collect is <= m/64 rows regardless of input size — the
    SCALE.md ground-rule-1 bound. Verified by the packed length, and by
    building from a much larger input than the word count."""
    target = spark.range(0, 50_000).select(F.col("id").alias("pk"))
    m = 1 << 14  # deliberately small: 256 words << 50k keys
    packed = bloom.build_bloom(target, "pk", m)
    assert len(packed) == m // 64


def test_duplicate_origin_pks_do_not_multiply(spark):
    """A duplicate-PK origin (staging tables, CDC replays) must not
    inflate n_origin through the audit's exact-side left join: each
    probed row picks up at most one __miss marker, so n_origin stays
    count(origin) and n_missing_exact counts missing ROWS."""
    base = spark.range(0, 1_000).select(F.col("id").alias("pk"))
    origin = base.union(base.filter(F.col("pk") < 100))  # 100 dup rows
    target = base.filter(F.col("pk") % 10 != 0)
    row = bloom.bloom_prefilter_audit(origin, target, "pk").collect()[0]
    assert row["n_origin"] == 1_100
    # 100 distinct missing pks; 10 of them (<100, %10==0) appear twice
    assert row["n_missing_exact"] == 110
    assert row["flagged_subset_ok"] is True
    assert row["catch_rate_ok"] is True
