"""Writetime / TTL computation (SURVEY.md §2 #13; CDM WritetimeTTL feature,
[upstream@6.0.1]).

Cassandra carries per-cell writetimes (µs epoch) and TTLs. CDM computes each
output row's writetime as the MAX over the tracked columns' writetimes
(resp. TTL), with an optional constant override (custom.writetime/ttl) and an
additive shift (writetime.incrementBy). We model per-cell metadata as ordinary
``__writetime_<col>`` / ``__ttl_<col>`` BIGINT columns (SURVEY.md §4.3.1): in
the parquet fixture world these are derived from ``events.ts_us``; against a
real Cassandra source the connector materializes them (``writeTime(col)``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WRITETIME_PREFIX = "__writetime_"
TTL_PREFIX = "__ttl_"


def writetime_columns(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c.startswith(WRITETIME_PREFIX)]


def ttl_columns(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c.startswith(TTL_PREFIX)]


def max_writetime(
    cols: list[str | Column],
    custom: int | None = None,
    increment_by: int = 0,
) -> Column:
    """greatest(tracked writetimes) [+ incrementBy], or the custom constant.

    Mirrors CDM's WritetimeTTL.getLargestWriteTimeStamp [upstream@6.0.1].
    """
    if custom is not None:
        return F.lit(custom).cast("bigint")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    base = cs[0] if len(cs) == 1 else F.greatest(*cs)
    if increment_by:
        base = base + F.lit(increment_by)
    return base.cast("bigint")


def max_ttl(cols: list[str | Column], custom: int | None = None) -> Column:
    if custom is not None:
        return F.lit(custom).cast("bigint")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return (cs[0] if len(cs) == 1 else F.greatest(*cs)).cast("bigint")


def attach_event_writetimes(events: DataFrame) -> DataFrame:
    """Fixture writetime proxy (FIXTURES.md): writetime(value) = epoch-µs of
    ``ts``; writetime(props) = the same minus a deterministic per-row offset
    ((event_id % 1000) seconds) — exercises max-of-columns semantics."""
    return events.withColumn(
        f"{WRITETIME_PREFIX}value", F.col("ts_us")
    ).withColumn(
        f"{WRITETIME_PREFIX}props",
        F.col("ts_us") - (F.col("event_id") % 1000) * F.lit(1_000_000),
    )


def attach_event_ttls(events: DataFrame) -> DataFrame:
    """Fixture TTL proxy: ttl(value) = (event_id % 1000) + 100 seconds,
    ttl(props) = constant 500 — exercises max-of-columns TTL semantics
    (CDM tracks TTL per cell and takes the max, like writetime)."""
    return events.withColumn(
        f"{TTL_PREFIX}value", ((F.col("event_id") % 1000) + 100).cast("bigint")
    ).withColumn(f"{TTL_PREFIX}props", F.lit(500).cast("bigint"))


# SQL-string twins for the DuckDB oracle (FIXTURES.md writetime proxy)
WRITETIME_VALUE_SQL = "epoch_us(ts)"
WRITETIME_PROPS_SQL = "epoch_us(ts) - (event_id % 1000) * 1000000"
TTL_VALUE_SQL = "(event_id % 1000) + 100"
TTL_PROPS_SQL = "500"
