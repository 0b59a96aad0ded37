"""Guardrail scan (SURVEY.md §2 #23; CDM GuardrailCheck job, dispatched at
/root/reference/entrypoint.sh:237-239, GuardrailCheckJobSession
[upstream@6.0.1]).

Scans the origin only and flags rows where any checked column's serialized
size exceeds ``colSizeInKB`` — reporting the offending PK, column name and
size. Spark shape: per-column octet_length projected into (col_name, size)
pairs, exploded, filtered. Extended for the multimodal world with array-length
guardrails (vector columns, SURVEY.md §2b E10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def colsize_guardrail(
    df: DataFrame,
    pk_cols: list[str],
    checked_cols: list[str],
    max_bytes: int,
) -> DataFrame:
    """Rows × columns whose byte size exceeds ``max_bytes`` →
    (pk..., col_name, col_bytes)."""
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("col_name"), F.octet_length(F.col(c)).cast("bigint").alias("col_bytes"))
            for c in checked_cols
        ]
    )
    exploded = df.select(*pk_cols, F.explode(pairs).alias("chk"))
    return exploded.select(
        *pk_cols, F.col("chk.col_name").alias("col_name"), F.col("chk.col_bytes").alias("col_bytes")
    ).filter(F.col("col_bytes") > max_bytes)


def partition_rows_guardrail(
    df: DataFrame,
    partition_cols: list[str],
    payload_bytes: Column,
    max_rows: int,
    max_bytes: int,
) -> DataFrame:
    """Wide-partition guardrail — the classic Cassandra failure mode the
    per-column colSizeInKB check can't see: a single partition key
    accumulating millions of rows / gigabytes. Flags partition keys whose
    row count OR summed serialized payload exceeds the thresholds →
    (partition key..., part_rows, part_bytes).

    One partial-agg shuffle on the partition key (map-side combine reduces
    each input split to ≤ |distinct keys| rows before the exchange), so the
    scan cost dominates at 100 TB — the same shape Cassandra's own
    `nodetool tablehistograms` sizing would need."""
    return (
        df.groupBy(*partition_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("part_rows"),
            F.sum(payload_bytes).cast("bigint").alias("part_bytes"),
        )
        .filter((F.col("part_rows") > max_rows) | (F.col("part_bytes") > max_bytes))
    )


def partition_key_stats(
    df: DataFrame,
    partition_cols: list[str],
    payload_bytes: Column,
    top_n: int = 20,
) -> DataFrame:
    """Pre-migration skew diagnostics: the top-N heaviest partition keys by
    row count, with payload bytes and the skew ratio vs the mean partition
    (what decides whether a migrate needs salting/AQE skew handling before
    it runs). The per-key aggregate is one partial-agg shuffle; the 1-row
    corpus mean rides a broadcast cross-join (never a driver collect); the
    top-N is a TakeOrdered (no global sort shuffle). Deterministic order:
    (rows desc, key) with exact bigint counts."""
    per_key = df.groupBy(*partition_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("part_rows"),
        F.sum(payload_bytes).cast("bigint").alias("part_bytes"),
    )
    mean = per_key.agg(F.avg("part_rows").alias("mean_rows"))
    return (
        per_key.crossJoin(F.broadcast(mean))
        .select(
            *partition_cols,
            "part_rows",
            "part_bytes",
            F.round(F.col("part_rows") / F.col("mean_rows"), 4).alias("skew_ratio"),
        )
        .orderBy(F.col("part_rows").desc(), *partition_cols)
        .limit(top_n)
    )


def array_length_guardrail(
    df: DataFrame, pk_cols: list[str], array_col: str, expected_len: int
) -> DataFrame:
    """Vector-column extension: flag rows whose array length deviates from the
    declared dimensionality (e.g. a vector<float, 64> with 63 items)."""
    return df.select(
        *pk_cols, F.size(F.col(array_col)).cast("bigint").alias("array_len")
    ).filter(F.col("array_len") != expected_len)
