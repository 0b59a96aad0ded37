"""Slice planner (SURVEY.md §2 #25; CDM SplitPartitions [upstream@6.0.1],
parallelism context --master local[*] /root/reference/entrypoint.sh:278,
spark-submit-cdm:31).

CDM splits the token ring into numParts contiguous ranges and processes them
as independent work units (also the retry/resume unit — #5/#6). Spark already
partitions scans; this operator exists to (a) expose the same slice accounting
(per-slice row counts / token bounds) and (b) drive slice-targeted reruns via
run tracking (plans.tracking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions.tokens import slice_bounds, slice_id, tok


def with_slice(df: DataFrame, pk_col: str, num_slices: int) -> DataFrame:
    """Attach token + slice_id columns."""
    t = tok(pk_col)
    return df.withColumn("token", t).withColumn("slice_id", slice_id(F.col("token"), num_slices))


def slice_stats(df: DataFrame, pk_col: str, num_slices: int) -> DataFrame:
    """Per-slice accounting: row count + observed token bounds (the per-slice
    progress CDM logs per JobCounter)."""
    return (
        with_slice(df, pk_col, num_slices)
        .groupBy("slice_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("row_cnt"),
            F.min("token").alias("min_token"),
            F.max("token").alias("max_token"),
        )
    )


def slice_manifest(spark: SparkSession, num_slices: int) -> DataFrame:
    """The planned slice list (slice_id, slice_min, slice_max) — what CDM's
    partition file holds (#5) and what run tracking marks complete (#6)."""
    return spark.createDataFrame(
        slice_bounds(num_slices), "slice_id BIGINT, slice_min BIGINT, slice_max BIGINT"
    )


def restrict_to_slices(df: DataFrame, pk_col: str, num_slices: int, slices: list[int]) -> DataFrame:
    """Reprocess only the named slices (partition-file retry path, #5)."""
    return with_slice(df, pk_col, num_slices).filter(F.col("slice_id").isin(slices))


# ---------------------------------------------------------------------------
# Partition-file I/O (SURVEY.md §2 #5; spark.cdm.tokenrange.partitionFile.*
# [upstream@6.0.1]): CDM reads a CSV of "min,max" token ranges to (re)process
# and appends failed ranges to a file for the next retry run.


def read_partition_file(path: str) -> list[tuple[int, int]]:
    """Parse a token-range CSV (one "min,max" per line, '#' comments)."""
    ranges: list[tuple[int, int]] = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            lo_s, _, hi_s = line.partition(",")
            lo, hi = int(lo_s), int(hi_s)
            if lo > hi:
                raise ValueError(f"invalid token range {line!r}: min > max")
            ranges.append((lo, hi))
    return ranges


def append_failed_ranges(path: str, ranges: list[tuple[int, int]]) -> None:
    """Append failed ranges for the retry run (CDM's partitionFile.appendOnDiff)."""
    with open(path, "a") as fh:
        for lo, hi in ranges:
            fh.write(f"{lo},{hi}\n")


def restrict_to_token_ranges(
    df: DataFrame, pk_col: str, ranges: list[tuple[int, int]]
) -> DataFrame:
    """Scan scope = union of the listed token ranges (an OR of range
    predicates — pushable to a token-aware source)."""
    if not ranges:
        return df.limit(0)
    t = tok(pk_col)
    cond = None
    for lo, hi in ranges:
        c = (t >= F.lit(lo)) & (t <= F.lit(hi))
        cond = c if cond is None else (cond | c)
    return df.filter(cond)


def spread(df: DataFrame) -> DataFrame:
    """Scale-adaptive pre-fan-out parallelizer (guide §2.5 "repartition
    immediately after the read" — the derived-work variant of its
    unsplittable-input case).

    A scan whose file fits inside ``spark.sql.files.openCostInBytes`` plans
    as ONE split, so every row-multiplying Generate (shingle/gram/token
    explode) and every Arrow kernel fed directly by that scan runs its
    whole input on one core while the rest of the cluster idles — measured
    r12: the 40-char gram explode at sf0.1 took 1.67 s on the 1-split scan
    vs 0.43 s after a round-robin repartition to session parallelism.

    The repartition is CONDITIONAL: inputs already split at least as fine
    as ``sparkContext.defaultParallelism`` (any production-scale scan) pass
    through untouched, so this never coalesces or adds an exchange at
    scale — it only widens the degenerate small-scan case. Round-robin
    placement is safe for every consumer here (aggregates, joins,
    per-row kernels — nothing reads spark_partition_id/input_file_name
    downstream), and Spark's sort-before-repartition keeps task retries
    deterministic."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def spread_by(df: DataFrame, *cols: str) -> DataFrame:
    """``spread`` keyed on existing high-cardinality columns — the variant
    for consumers whose pre-shuffle work is expression-heavy but NOT
    row-multiplying (decimal partial aggregates, Expand fan-outs).

    A keyless ``repartition(n)`` pays a local sort of its whole input
    before the exchange (sort-before-repartition, SPARK-23207) so task
    retries are deterministic — measured r12 on corr_stats that sort made
    the cure worse than the disease (2.57 → 4.95 s isolated, the sort and
    full-row shuffle on the single scan core). Hash partitioning needs no
    such sort: row placement is a pure function of the key columns, so
    retries are deterministic for free. With a high-cardinality key
    (guide §2.5: use many × more distinct values than partitions) the same
    corr_stats aggregate measured 0.85 s.

    Same conditional contract as ``spread``: production-scale inputs pass
    through untouched. Callers pick columns that are (a) already in the
    projection and (b) near-unique — never a rand()-derived key (retry
    duplication, guide §2.5)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *[F.col(c) for c in cols])
