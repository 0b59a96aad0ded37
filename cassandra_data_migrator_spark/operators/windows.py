"""Event-time windowing (SURVEY.md §2b E8/E9) over the ``events`` fixture.

The reference is batch-only (SURVEY.md §2 'explicitly ABSENT'); these are the
north-star extensions. Batch implementations use window()/session_window() so
they stay DuckDB-checkable; streaming/windows.py holds the Structured
Streaming variants (same expressions, plus watermarks).

Determinism: window starts are emitted as epoch-µs BIGINTs, aggregated doubles
go through DECIMAL(18,4) before the final double cast (exact on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sum_value_exact(col: str = "value"):
    """Order-independent double sum: cast to DECIMAL first (decimal addition is
    exact and associative), cast the final value back to DOUBLE."""
    return F.sum(F.col(col).cast("decimal(18,4)")).cast("double")


def tumbling_window(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling event-time aggregation: (window_start_us, n_events, sum_value,
    n_users)."""
    w = F.window(F.col("ts"), duration)
    return (
        events.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            _sum_value_exact().alias("sum_value"),
            F.count_distinct(F.col("user_id")).cast("bigint").alias("n_users"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "sum_value",
            "n_users",
        )
    )


def sliding_window(
    events: DataFrame, duration: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding (hopping) event-time aggregation: each event contributes to
    duration/slide overlapping windows; Spark's window() expands the
    assignment map-side (an Expand of duration/slide rows per event — no
    extra shuffle beyond the one window-key agg)."""
    w = F.window(F.col("ts"), duration, slide)
    return (
        events.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            _sum_value_exact().alias("sum_value"),
            F.count_distinct(F.col("user_id")).cast("bigint").alias("n_users"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "sum_value",
            "n_users",
        )
    )


def session_window(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-based): (user_id, session_start_us,
    n_events, sum_value). session_window() is the native Spark stateful-window
    primitive; the DuckDB oracle re-derives sessions with lag + cumulative sum
    (gaps-and-islands), which must agree exactly."""
    w = F.session_window(F.col("ts"), gap)
    return (
        events.groupBy(F.col("user_id"), w.alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            _sum_value_exact().alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )
