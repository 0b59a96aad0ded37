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


def top_k_rows(
    df: DataFrame, k: int, order_cols, rank_col: str | None = None
) -> DataFrame:
    """Global top-k rows by ``order_cols`` (which must end in a unique
    tiebreak column for determinism), computed in two distributed phases:

    1. per-partition prune — rank rows WITHIN each input partition
       (partitioned window over ``spark_partition_id()``; the global top-k
       is a subset of the union of per-partition top-ks under ANY
       partitioning, so this is conservative-correct) and keep each
       partition's local top-k;
    2. one ordered pass over the ≤ k × numPartitions survivors assigns the
       exact global ``row_number`` and keeps rank ≤ k.

    The only unpartitioned window in the plan reads a set bounded by
    k × numPartitions BY CONSTRUCTION — never the input table. Output is
    bit-identical to ``row_number() over (order by order_cols) <= k`` on
    the full input. If ``rank_col`` is None the rank is used only for the
    top-k filter and dropped."""
    out_rank = rank_col or "__grk"
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    pruned = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrk", F.row_number().over(w_local))
        .filter(F.col("__lrk") <= k)
        .drop("__pid", "__lrk")
    )
    w_global = Window.orderBy(*order_cols)
    out = pruned.withColumn(out_rank, F.row_number().over(w_global)).filter(
        F.col(out_rank) <= k
    )
    return out if rank_col else out.drop("__grk")


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


def global_index(
    df: DataFrame,
    key_col: str,
    tiebreak_col: str,
    pos_col: str = "pos",
    total_col: str = "n_total",
    bucket_chars: int = 4,
) -> DataFrame:
    """Contiguous 0-based global index over ``(key_col, tiebreak_col)`` —
    zipWithIndex as a DataFrame op, for keys where ``global_rank``'s
    value-cardinality bound fails (an all-distinct shuffle key makes the
    value histogram as big as the table).

    ``key_col`` must be a lowercase-hex string (md5/sha output), so its
    ``bucket_chars``-character prefix both preserves key order AND
    distributes uniformly. Phases:

    1. bucket histogram — one count per prefix bucket (≤ 16^bucket_chars
       rows BY CONSTRUCTION, 65 536 at the default); the only
       unpartitioned window cumulates offsets over THIS table, never rows;
    2. broadcast the bucket offsets back and rank only WITHIN each bucket
       (partitioned window — the single full-data shuffle in the plan).

    Output is bit-identical to ``row_number() over (order by key_col,
    tiebreak_col) - 1`` because the bucket is a prefix of the key.
    ``total_col`` carries the grand total on every row (same single
    WindowExec as the offsets — unbounded-frame sum over the histogram)."""
    rows = df.withColumn("__bkt", F.substring(F.col(key_col), 1, bucket_chars))
    hist = rows.groupBy("__bkt").agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    w_cum = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = hist.select(
        "__bkt",
        (F.sum("__cnt").over(w_cum) - F.col("__cnt")).alias("__off"),
        F.sum("__cnt").over(w_all).alias(total_col),
    )
    w_in = Window.partitionBy("__bkt").orderBy(key_col, tiebreak_col)
    return (
        rows.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            pos_col,
            (F.col("__off") + F.row_number().over(w_in) - 1).cast("bigint"),
        )
        .drop("__bkt", "__off")
    )
