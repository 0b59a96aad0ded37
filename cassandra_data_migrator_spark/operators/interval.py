"""Interval (range) join — a custom operator Spark lacks natively (prompt:
'range join' alongside as-of join; reference has no general joins, SURVEY.md
§2b north-star surface).

Semantics: for each left row, every right row of the same key with
right.ts in (left.ts, left.ts + window_us]  — "what happened for this entity
in the W following the anchor event" (attribution windows, conversion
windows, sensor correlation).

Plan shape — bucketized equi-join, never a range theta-join:
a naive ``l.join(r, (l.key==r.key) & (r.ts > l.ts) & (r.ts <= l.ts+W))``
has only one equi-predicate (key) and degenerates per hot key into an
O(n_k·m_k) comparison; with no equi-predicate at all Spark plans a
BroadcastNestedLoopJoin. Instead both sides are assigned time buckets of
width B = window_us: the right row lands in its single bucket
floor(ts/B); the left row fans out to the ≤2 buckets its window can touch
(sequence(floor(ts/B), floor((ts+W)/B))). The join is then a plain hash
equi-join on (key, bucket) — shuffle-partitioned, AQE-skew-splittable —
followed by the exact range filter. Each (left, right) match appears exactly
once because the right row has exactly one bucket. Cost: ≤2× fan-out of the
left side, zero fan-out of the (usually much larger) right side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts_col: str,
    right_ts_col: str,
    window_us: int,
    right_value_cols: list[str],
) -> DataFrame:
    """Matched pairs: left.* plus ``rv_<name>`` for every right row with
    right.ts in (left.ts, left.ts + window_us], same key. Inner semantics —
    callers wanting zero-match left rows re-join against the left side."""
    if window_us <= 0:
        raise ValueError("window_us must be positive")
    b = F.lit(window_us)
    l_exp = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(left_ts_col) / b),
                F.floor((F.col(left_ts_col) + b) / b),
            )
        ),
    )
    r = right.select(
        *key_cols,
        F.col(right_ts_col).alias("__rts"),
        *[F.col(c).alias(f"rv_{c}") for c in right_value_cols],
    ).withColumn("__bucket", F.floor(F.col("__rts") / b))
    return (
        l_exp.join(r, [*key_cols, "__bucket"])
        .filter(
            (F.col("__rts") > F.col(left_ts_col))
            & (F.col("__rts") <= F.col(left_ts_col) + b)
        )
        .drop("__bucket")
        .withColumnRenamed("__rts", "rv_ts")
    )
