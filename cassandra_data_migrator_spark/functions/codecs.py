"""Codec conversions (SURVEY.md §2 #10; CDM's com.datastax.cdm.cql.codec.*
registry, [upstream@6.0.1], pinned via /root/reference/Dockerfile:60-61).

CDM ships a closed set of origin→target type coercions. Spark expresses each as
a Column expression that whole-stage codegen vectorizes — no per-row Java loop.
Determinism notes (oracle parity):

- double→string formatting differs subtly across engines, so numeric→string
  goes through DECIMAL first (identical canonical text on both sides);
- timestamp→millis uses integer µs DIV 1000 (truncation, matches DuckDB
  epoch_ms of a µs-truncated timestamp);
- timestamp→string uses an explicit format + session TZ pinned to UTC.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# numeric <-> string


def int_to_string(c: Column) -> Column:
    return c.cast("string")


def string_to_bigint(c: Column) -> Column:
    return c.cast("bigint")


def double_to_string(c: Column, precision: int = 18, scale: int = 2) -> Column:
    """Canonical decimal text (e.g. '123.45') — identical in Spark and DuckDB,
    unlike raw double formatting."""
    return c.cast(f"decimal({precision},{scale})").cast("string")


def decimal_to_string(c: Column) -> Column:
    return c.cast("string")


# ---------------------------------------------------------------------------
# timestamp codecs (CDM CqlToStringCodec family)


def timestamp_to_millis(ts_us: Column) -> Column:
    """Epoch-µs BIGINT → epoch-ms BIGINT. Subtract-then-divide keeps the
    arithmetic integral (exact in double, then cast back) for positive epochs."""
    return ((ts_us - (ts_us % 1000)) / 1000).cast("bigint")


def timestamp_to_string(ts: Column, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Format in the session timezone (engine pins UTC)."""
    return F.date_format(ts, fmt)


def string_to_timestamp(c: Column, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    return F.to_timestamp(c, fmt)


# ---------------------------------------------------------------------------
# blob codecs


def blob_to_hex(c: Column) -> Column:
    return F.lower(F.hex(c))


def blob_to_base64(c: Column) -> Column:
    return F.base64(c)


def string_to_blob(c: Column) -> Column:
    return c.cast("binary")
