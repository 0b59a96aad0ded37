"""Streaming column profile — the tiered-validation tier-1 screen
(operators/validation.profile_drift) maintained INCREMENTALLY over an
unbounded CDC/ingest stream.

Every metric is a mergeable aggregate, so the whole profile is ONE row of
Structured Streaming's native global-aggregation state — no custom state
function, no per-key growth, fixed state size forever:

- row count, per-column null counts: LongType sums;
- sum/min/max of the numeric column: DECIMAL(28,4) — exact and
  order-independent across batches (double addition is neither);
- distinct count: ``approx_count_distinct`` — the ONE metric where the
  batch screen's exact ``count_distinct`` cannot stream (exact distinct
  over an unbounded stream is unbounded state by definition); HLL++
  register-max merge is commutative, so the streaming result equals the
  batch ``approx_count_distinct`` at the same rsd EXACTLY, and the parity
  test pins that equality rather than a tolerance.

The running profile row is the standing artifact a CDC validation ladder
reads between full diffs: compare it against the target side's profile
(validation.profile_drift's broadcast metric join) to catch a damaged
column family within one micro-batch of the damage landing, at the cost
of one row of state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_DEC = "decimal(28,4)"


def profile_aggs(
    null_cols: list[str], sum_col: str, distinct_col: str, rsd: float = 0.02
) -> list:
    """The shared metric list — importable by both the streaming profile
    and its batch parity twin so stream==batch equality is equality of the
    SAME expressions, not of two hand-kept copies."""
    s = F.col(sum_col).cast("decimal(18,4)")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    aggs += [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias(f"null_{c}")
        for c in null_cols
    ]
    aggs += [
        F.sum(s).cast(PROFILE_DEC).alias(f"sum_{sum_col}"),
        F.min(s).cast(PROFILE_DEC).alias(f"min_{sum_col}"),
        F.max(s).cast(PROFILE_DEC).alias(f"max_{sum_col}"),
        F.approx_count_distinct(distinct_col, rsd=rsd)
        .cast("bigint")
        .alias(f"nd_{distinct_col}"),
    ]
    return aggs


def streaming_profile(
    stream: DataFrame,
    null_cols: list[str],
    sum_col: str,
    distinct_col: str,
    rsd: float = 0.02,
) -> DataFrame:
    """The one-row running profile as a streaming global aggregation.
    Drive with ``run_profile_available_now`` (or any complete/update-mode
    sink); each micro-batch updates the single state row."""
    return stream.agg(*profile_aggs(null_cols, sum_col, distinct_col, rsd))


def run_profile_available_now(profile: DataFrame, out_dir: str, ckpt: str) -> None:
    """Drain the source with availableNow and materialize the LATEST
    running profile row at ``out_dir`` (overwritten per micro-batch — the
    standing profile artifact downstream drift checks read; overwrite of a
    1-row table is idempotent, so replays are harmless)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    (
        profile.writeStream.outputMode("complete")
        .foreachBatch(_write)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
