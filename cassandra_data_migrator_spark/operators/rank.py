"""Distributed global ranking — no total-order window over the raw table.

A ``Window.orderBy(col)`` with no ``partitionBy`` funnels the ENTIRE dataset
through one reducer (Spark warns "No Partition Defined for Window operation");
correct at test scale, dead at 100 TB. This operator computes the identical
global position in two distributed phases:

1. aggregate the value histogram (one row per distinct value — bounded by
   value cardinality, not row count) and take cumulative counts over it; the
   only unpartitioned window in the plan runs over this aggregated table;
2. broadcast the cumulative histogram back onto the rows and rank only
   WITHIN each value group (partitioned window, deterministic id tiebreak).

Each row's global position = cum_count(smaller values) + rank among equals −
1, bit-identical to ``row_number() over (order by value, id)`` − 1.

Used by queries.length_percentile and queries.decile_assign; the plan shape
is pinned by tests/test_plans.py (no unpartitioned Window over raw input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame, value_col: str, id_col: str, pos_col: str = "pos", total_col: str = "n_total"
) -> DataFrame:
    """Attach ``pos`` (0-based global rank by (value_col, id_col)) and
    ``n_total`` to every row, computed distributed as described above."""
    hist = df.groupBy(value_col).agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    # ONE ordered window pass over the bounded histogram (round-4 verdict
    # #3): cum_before = inclusive running sum − own count, and the grand
    # total = running sum over the unbounded frame of the SAME ordering, so
    # both columns come out of a single WindowExec instead of two.
    w_cum = Window.orderBy(value_col).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        value_col,
        (F.sum("__cnt").over(w_cum) - F.col("__cnt")).alias("__cum_before"),
        F.sum("__cnt").over(w_all).alias(total_col),
    )
    w_in = Window.partitionBy(value_col).orderBy(id_col)
    return (
        df.join(F.broadcast(cum), value_col)
        .withColumn(pos_col, F.col("__cum_before") + F.row_number().over(w_in) - 1)
        .drop("__cum_before")
    )
