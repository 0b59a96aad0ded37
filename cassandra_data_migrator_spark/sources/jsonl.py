"""JSONL (newline-delimited JSON) source — the interchange format of LLM
training corpora — with first-class corrupt-record quarantine.

CDM itself only moves Cassandra tables, but its operational contract
(guardrail + error-row accounting, SURVEY.md §2 #23/#24, reference job
dispatch entrypoint.sh:230-243) expects malformed input to be COUNTED and
ROUTED, never to kill the job or silently vanish. This module applies
that contract to file ingestion:

- ``write_jsonl``: stage a DataFrame as JSONL text via ``to_json`` — one
  JSON object per line, written by the executors (no driver collect).
- ``read_jsonl``: line scan + ``from_json`` with an in-struct
  ``_corrupt_record`` column (PERMISSIVE): parse failures carry the raw
  line there with every data column NULL, so corrupt rows stay
  distinguishable from legitimately-all-null rows. Good path and
  quarantine path are two filters over ONE scan.

The file-source ``_corrupt_record`` pseudo-column is deliberately NOT
used: Spark disallows scans whose only referenced column is the internal
corrupt column, which makes the quarantine-count query fragile;
``from_json`` over a text scan has no such restriction and keeps the
parse inside whole-stage codegen either way.

Scale posture: uncompressed JSONL splits by line ranges, so a 100 TB
corpus parallelizes like any text source; the JSON decode is JVM-side
(Jackson), no Python in the path. Schema-explicit reads skip Spark's
inference pass (a full extra corpus scan just to guess types — never
acceptable at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, corrupt_expr=None) -> None:
    """Serialize ``df`` as JSONL text at ``path``. ``corrupt_expr`` is an
    optional boolean Column marking rows whose emitted line is
    deterministically truncated mid-object (fixture for quarantine tests —
    a real pipeline never does this, real corpora just arrive broken).
    The truncated length is floored at 1 char so severing always leaves a
    non-empty line that still contains the opening brace but not the
    closing one — guaranteed invalid JSON even for minimal records like
    an all-null row's '{}' (a zero-floor would emit an EMPTY line, which
    the reader rightly skips, silently losing the corrupted record —
    round-5 review)."""
    line = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    if corrupt_expr is not None:
        line = F.when(
            corrupt_expr,
            F.substring(
                line, 1, F.greatest(F.length(line) - F.lit(5), F.lit(1))
            ),
        ).otherwise(line)
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def read_jsonl(spark: SparkSession, path: str, ddl_schema: str) -> DataFrame:
    """Schema-explicit PERMISSIVE read. ``ddl_schema`` is the DATA schema
    as a DDL string (no corrupt column — appended here). Returns the data
    columns plus ``_corrupt_record`` (raw line when the parse failed,
    else NULL)."""
    full = f"{ddl_schema}, {CORRUPT_COL} STRING"
    # Blank lines are SKIPPED, matching spark.read.json's file-source
    # behavior: from_json('') under PERMISSIVE returns an all-null struct
    # with a null corrupt column, which would otherwise masquerade as a
    # legitimate all-null data row (round-5 review).
    raw = spark.read.text(path).filter(F.length(F.trim(F.col("value"))) > 0)
    parsed = raw.select(
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("j")
    )
    return parsed.select("j.*")


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_corrupt_col, quarantined_raw_lines) — two filters
    over one scan, mirroring the validation quarantine split
    (queries.q_quarantine_split)."""
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad
