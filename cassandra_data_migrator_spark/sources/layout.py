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
