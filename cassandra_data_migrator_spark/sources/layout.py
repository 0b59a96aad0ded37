"""Write-layout management: small-file compaction and hive-partitioned
writes with pruned reads.

At 100 TB the sink's FILE LAYOUT is as important as its contents:
- A long-running incremental migrate (plans/upsert.py) accretes small
  files — one per micro-batch per partition — until metadata handling,
  open() overhead and row-group fragmentation dominate read cost.
  ``compact`` rewrites a directory into ``ceil(rows / target_rows)``
  evenly-sized files with one round-robin shuffle.
- Date/tenant-partitioned directories (``partitionBy``) let every
  downstream query prune to the partitions its predicate touches —
  directory-listing-level pruning, before any file or row group is
  opened. CDM's token-range restriction (SURVEY.md §2 #15) is the ring
  analogue; this is the lakehouse analogue.

Both are deliberately thin compositions of Spark writer primitives —
the operators exist so their GUARANTEES (row preservation, exact file
count, pruned scan) sit under the oracle/plan tests, not to reinvent the
writer.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_count(df: DataFrame) -> int:
    """Number of distinct files feeding ``df``'s scan (post-pruning) —
    counted executor-side via input_file_name, no driver listing."""
    return (
        df.select(F.input_file_name().alias("f")).distinct().count()
    )


def compact(
    spark: SparkSession, src_path: str, dst_path: str, target_rows: int
) -> int:
    """Rewrite ``src_path`` into ``ceil(n / target_rows)`` files at
    ``dst_path`` (round-robin repartition → every output file holds
    ``~n/k`` rows, deterministic count since every partition is non-empty
    for n >= k). Returns k. The only driver-side state is the row count."""
    src = spark.read.parquet(src_path)
    n = src.count()
    k = max(1, math.ceil(n / target_rows))
    src.repartition(k).write.mode("overwrite").parquet(dst_path)
    return k


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Hive-layout write: one directory per ``partition_col`` value."""
    df.write.partitionBy(partition_col).mode("overwrite").parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_col: str) -> None:
    """Incremental backfill: overwrite ONLY the hive partitions present in
    ``df``, leaving every other partition untouched (Spark's dynamic
    partitionOverwriteMode — the sink behavior that lets a 100 TB table
    re-process one day/source without rewriting or losing the rest; static
    mode would DELETE the untouched partitions). The mode rides the WRITE
    as a per-writer option, never the session conf — a session-global
    set/restore would race with concurrent writers on the same session
    (one inheriting dynamic semantics it didn't ask for, or a mid-write
    restore flipping a backfill to partition-deleting static)."""
    (
        df.write.partitionBy(partition_col)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering — the third layout lever after compaction and
# hive partitioning: co-locate rows that are close in TWO dimensions so a
# bucket's (min, max) stats prune multi-dimensional range queries. The
# audit key queries.q_zorder_prune_audit quantifies the win; the pruning
# payoff is executed for real in tests/test_zorder.py.

ZORDER_BITS = 8  # 8 bits per dimension -> 16-bit Morton value
ZORDER_SCALE = 1 << ZORDER_BITS
ZORDER_BUCKETS = 16  # top-4 z bits -> a 4x4 grid over (x, y)
ZORDER_BUCKET_DIV = (1 << (2 * ZORDER_BITS)) // ZORDER_BUCKETS
ZORDER_LIN_DIV = ZORDER_SCALE // ZORDER_BUCKETS


def zorder_sql(xs: str, ys: str, div: str) -> str:
    """Bit-interleaved Morton value as PORTABLE integer arithmetic — the
    same string runs in Spark SQL (div='div') and DuckDB (div='//'), so
    the audit oracle is the identical formula, not a reimplementation."""
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"((({xs}) {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((({ys}) {div} {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def zorder_binned(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """(original columns +) xs, ys, zv, n_rows: all-integer equal-width
    8-bit binning (bounds via ONE 1-row broadcast agg — no data-sized
    shuffle) + the portable Morton interleave. Integer ``div`` binning,
    never float, so an engine-independent recomputation lands in the
    same bucket."""
    rng = df.agg(
        F.min(x_col).alias("__mnx"),
        F.max(x_col).alias("__mxx"),
        F.min(y_col).alias("__mny"),
        F.max(y_col).alias("__mxy"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    binned = df.crossJoin(F.broadcast(rng)).select(
        *df.columns,
        "n_rows",
        F.expr(
            f"(({x_col} - __mnx) * {ZORDER_SCALE}) div (__mxx - __mnx + 1)"
        ).alias("xs"),
        F.expr(
            f"(({y_col} - __mny) * {ZORDER_SCALE}) div (__mxy - __mny + 1)"
        ).alias("ys"),
    )
    return binned.withColumn("zv", F.expr(zorder_sql("xs", "ys", "div")))


def write_zordered(df: DataFrame, x_col: str, y_col: str, path: str) -> None:
    """Z-clustered write: one directory per Morton bucket. Downstream
    range queries on EITHER dimension derive their touched-bucket list
    from the per-bucket stats and prune at directory-listing level
    (tests/test_zorder.py executes this end-to-end)."""
    z = zorder_binned(df, x_col, y_col).withColumn(
        "bkt", F.expr(f"zv div {ZORDER_BUCKET_DIV}")
    )
    z.drop("n_rows", "zv").write.partitionBy("bkt").mode("overwrite").parquet(path)
