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

from pyspark.sql import DataFrame
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


def array_length_guardrail(
    df: DataFrame, pk_cols: list[str], array_col: str, expected_len: int
) -> DataFrame:
    """Vector-column extension: flag rows whose array length deviates from the
    declared dimensionality (e.g. a vector<float, 64> with 63 items)."""
    return df.select(
        *pk_cols, F.size(F.col(array_col)).cast("bigint").alias("array_len")
    ).filter(F.col("array_len") != expected_len)
