"""Skew mitigation: salted two-phase aggregation (SCALE.md 'salting for
pathological keys').

AQE's skew-join splitting covers joins; for aggregations over heavily skewed
keys (one user with 1e9 events), a single reducer still owns the hot key.
Salting splits every key into partial groups (map-side spread), aggregates
partials, then aggregates the partials by the true key — two small shuffles
instead of one hot one. Only decomposable aggregates (sum/count/min/max)
qualify; the API takes them explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (partial_agg, final_agg) pairs per supported aggregate
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c).cast("bigint"), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name -> (agg_fn, column),
    e.g. {"total": ("sum", "value"), "n": ("count", "*")}."""
    for name, (fn, _) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"{name}: {fn!r} is not decomposable; use groupBy directly")

    # partition-id salt: spreads a hot key across the map partitions it
    # already lives in — no extra hashing, no data-dependent salt column
    salt = F.spark_partition_id() % num_salts

    partial_aggs = []
    for name, (fn, col) in aggs.items():
        part_fn, _ = _DECOMPOSABLE[fn]
        c = F.lit(1) if col == "*" else F.col(col)
        partial_aggs.append(part_fn(c).alias(f"__p_{name}"))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_aggs)

    final_aggs = []
    for name, (fn, _) in aggs.items():
        _, fin_fn = _DECOMPOSABLE[fn]
        final_aggs.append(fin_fn(F.col(f"__p_{name}")).alias(name))
    return partial.groupBy(*keys).agg(*final_aggs)
