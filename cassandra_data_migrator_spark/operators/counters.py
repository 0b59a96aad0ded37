"""Job counters (SURVEY.md §2 #24; CDM JobCounter [upstream@6.0.1], surfaced
in the reference's logs via /root/reference/log4j.properties:10-15).

CDM tracks read / written / skipped / error / missing / mismatch / corrected
counts in Spark accumulators, printed per-slice and at job end. DataFrame-
native shape: conditional-count aggregation producing a one-row summary, or —
zero-extra-pass — `df.observe()` metrics attached to the migrate write itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def count_if(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")


def job_counters(df: DataFrame, skip_predicate: Column) -> DataFrame:
    """One-row summary: read_cnt, skipped_cnt, written_cnt (written = read −
    skipped, mirroring JobCounter's read/skip/write accounting)."""
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("read_cnt"),
        count_if(skip_predicate).alias("skipped_cnt"),
        count_if(~skip_predicate).alias("written_cnt"),
    )


def observed(df: DataFrame, skip_predicate: Column, name: str = "job_counters"):
    """Attach counters to a pipeline without an extra pass (Spark Observation):
    returns (observed_df, observation). Read observation.get after the action.
    This is the scale path — at 100 TB you do not re-scan to count."""
    obs = Observation(name)
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("read_cnt"),
        count_if(skip_predicate).alias("skipped_cnt"),
        count_if(~skip_predicate).alias("written_cnt"),
    )
    return out, obs
