"""Validation / diff / autocorrect (SURVEY.md §2 #19-#22; CDM DiffData job,
dispatched at /root/reference/entrypoint.sh:234-236, DiffJobSession
[upstream@6.0.1]).

CDM validates row-by-row: for each origin row it fetches the target row by PK
and compares column-by-column, producing statuses valid / missing / mismatch
(with the differing columns listed), optionally autocorrecting. A Spark-native
engine replaces the per-row target lookups with ONE distributed PK-equi join:
AQE picks broadcast vs sort-merge, handles skew, and the comparison itself is a
codegen'd null-safe projection (SURVEY.md §4.2). At 100 TB this is the
difference between O(rows) async RPCs and a single co-partitioned shuffle.

Fixture note: the testdata is read-only, so the diff "target" is derived
in-query from the origin with deterministic perturbations (FIXTURES.md):
rows with pk % 97 = 0 dropped (→ missing), rows with pk % 101 = 0 get a
mutated status column (→ mismatch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATUS_VALID = "valid"
STATUS_MISSING = "missing"
STATUS_MISMATCH = "mismatch"


def derived_target(origin: DataFrame, pk: str, mutate_col: str) -> DataFrame:
    """Deterministic perturbed copy of the origin (FIXTURES.md convention)."""
    return origin.filter(F.col(pk) % 97 != 0).withColumn(
        mutate_col,
        F.when(F.col(pk) % 101 == 0, F.lit("X")).otherwise(F.col(mutate_col)),
    )


def diff(
    origin: DataFrame,
    target: DataFrame,
    pk_cols: list[str],
    compare_cols: list[str],
    include_valid: bool = False,
    null_safe_pk: bool = True,
) -> DataFrame:
    """Row-compare origin vs target → (pk..., status, mismatch_cols).

    One left join on the PK (origin-driven, like CDM's DiffData: target-only
    rows are not reported [upstream@6.0.1]); per-column null-safe inequality
    via eqNullSafe; mismatch_cols is a comma-joined, declaration-ordered list
    so results hash deterministically.

    ``null_safe_pk``: the default joins with ``<=>``, but Spark plans
    null-safe keys as hashpartitioning(coalesce(k, d), isnull(k)) — which
    does NOT match a bucketBy(k) table's layout, so BOTH sides of a
    repeated validate re-shuffle even against bucketed tables (measured:
    2 Exchanges). Cassandra primary keys can never be null, so pass
    ``null_safe_pk=False`` for the production repeated-validate path:
    plain equality keys make the bucketed join co-located with ZERO
    Exchange (pinned in tests/test_bucketing.py), and the two forms are
    row-identical whenever the PK is non-null on both sides.
    """
    if not pk_cols:
        raise ValueError("diff requires at least one PK column")
    o = origin.alias("o")
    t = target.alias("t")
    if null_safe_pk:
        cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"t.{k}")) for k in pk_cols]
    else:
        cond = [F.col(f"o.{k}") == F.col(f"t.{k}") for k in pk_cols]
    joined = o.join(t, cond, "left")

    target_absent = F.col(f"t.{pk_cols[0]}").isNull()
    diffs = [
        F.when(~F.col(f"o.{c}").eqNullSafe(F.col(f"t.{c}")), F.lit(c)).otherwise(F.lit(None))
        for c in compare_cols
    ]
    mismatch_arr = F.filter(F.array(*diffs), lambda x: x.isNotNull())
    status = (
        F.when(target_absent, F.lit(STATUS_MISSING))
        .when(F.size(mismatch_arr) > 0, F.lit(STATUS_MISMATCH))
        .otherwise(F.lit(STATUS_VALID))
    )
    out = joined.select(
        *[F.col(f"o.{k}").alias(k) for k in pk_cols],
        status.alias("status"),
        F.when(target_absent, F.lit("")).otherwise(F.array_join(mismatch_arr, ",")).alias(
            "mismatch_cols"
        ),
    )
    if not include_valid:
        out = out.filter(F.col("status") != STATUS_VALID)
    return out


def autocorrect_missing(origin: DataFrame, target: DataFrame, pk_cols: list[str]) -> DataFrame:
    """Rows present in origin but absent in target (#20,
    spark.cdm.autocorrect.missing): a left-anti join — the write-back side
    feeds these to the sink."""
    return origin.join(target, pk_cols, "left_anti")


def autocorrect_mismatch(
    origin: DataFrame, target: DataFrame, pk_cols: list[str], compare_cols: list[str]
) -> DataFrame:
    """Origin rows whose target row exists but differs (#21) — upsert payload."""
    d = diff(origin, target, pk_cols, compare_cols)
    bad = d.filter(F.col("status") == STATUS_MISMATCH).select(pk_cols)
    return origin.join(bad, pk_cols, "left_semi")


def counter_delta(
    origin_counts: DataFrame,
    target_counts: DataFrame,
    key_cols: list[str],
    counter_col: str,
) -> DataFrame:
    """Counter reconcile (#22): counters can't be overwritten, only
    incremented, so the correction is the delta origin − coalesce(target, 0)
    written as a counter update [upstream@6.0.1]."""
    o = origin_counts.alias("o")
    t = target_counts.alias("t")
    joined = o.join(t, key_cols, "left")
    delta = F.col(f"o.{counter_col}") - F.coalesce(F.col(f"t.{counter_col}"), F.lit(0))
    return joined.select(
        *[F.col(f"o.{k}").alias(k) for k in key_cols], delta.alias("delta")
    ).filter(F.col("delta") != 0)


def profile_drift(
    origin: DataFrame,
    target: DataFrame,
    null_cols: list[str],
    sum_col: str,
    distinct_col: str,
) -> DataFrame:
    """Aggregate-only validation screen (tier-1 of the tiered validation
    ladder; see queries.q_validate_profile_drift for the declared-key
    wiring): per-side column profiles — row count, per-column null
    counts, DECIMAL-exact sum/min/max of ``sum_col``, distinct count of
    ``distinct_col`` — unpivoted to long form and joined metric-by-metric
    with an exact drift flag. Two single-scan partial aggregations
    collapsing to ONE row per side, then a broadcast metric join: neither
    table is ever co-partition shuffled, so the screen costs two scans at
    any size and pinpoints the damaged column family before the row-level
    diff runs."""
    dec = "decimal(28,4)"
    metrics = (
        ["n_rows"]
        + [f"null_{c}" for c in null_cols]
        + [f"sum_{sum_col}", f"min_{sum_col}", f"max_{sum_col}", f"nd_{distinct_col}"]
    )

    def prof(df: DataFrame) -> DataFrame:
        s = F.col(sum_col).cast("decimal(18,4)")
        aggs = [F.count(F.lit(1)).cast(dec).alias("n_rows")]
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast(dec).alias(f"null_{c}")
            for c in null_cols
        ]
        aggs += [
            F.sum(s).cast(dec).alias(f"sum_{sum_col}"),
            F.min(s).cast(dec).alias(f"min_{sum_col}"),
            F.max(s).cast(dec).alias(f"max_{sum_col}"),
            F.count_distinct(F.col(distinct_col)).cast(dec).alias(f"nd_{distinct_col}"),
        ]
        return df.agg(*aggs)

    stack_expr = (
        f"stack({len(metrics)}, "
        + ", ".join(f"'{m}', {m}" for m in metrics)
        + ") as (metric, v)"
    )
    lo = prof(origin).select(F.expr(stack_expr)).select("metric", F.col("v").alias("vo"))
    lt = prof(target).select(F.expr(stack_expr)).select("metric", F.col("v").alias("vt"))
    # null-safe inequality: an aggregate that is NULL on exactly one side
    # (a column wiped to all-NULL, an empty target) IS drift and must flag
    # 1 — plain != would return NULL and silently drop the alarm.
    return lo.join(F.broadcast(lt), "metric").select(
        "metric",
        F.col("vo").cast("double").alias("origin_v"),
        F.col("vt").cast("double").alias("target_v"),
        (~F.col("vo").eqNullSafe(F.col("vt"))).cast("int").alias("drift"),
    )
