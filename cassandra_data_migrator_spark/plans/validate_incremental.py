"""Digest-gated incremental validation — the plan that makes periodic
re-validation affordable at 100 TB.

CDM's DiffData (reference: DiffJobSession [upstream@6.0.1], dispatched at
/root/reference/entrypoint.sh:234-236) always compares every row. The full
diff is ONE PK-equi join, but at 100 TB that join shuffles both corpora —
prohibitive to re-run nightly when almost nothing changed. This plan runs it
in two phases:

1. **Digest phase** — per token-range slice, exact order-independent
   checksums on both sides (row count + bigint/decimal column sums; the
   queries.slice_checksum shape). Two SCANS, no corpus shuffle: the
   per-slice aggregate partial-aggregates map-side and exchanges only
   numParts rows per side.
2. **Diff phase** — the row-level diff join, restricted to the slices whose
   digests disagree. The slice predicate is a token expression the source
   can push down (the same restrict path the retry/resume jobs use), so the
   join's inputs shrink to the changed fraction of the ring.

Exactness: the checksums are permutation-invariant exact sums (bigint /
DECIMAL — no float accumulation), so a slice digest matches iff the slice's
multiset of (pk, checked-column) values matches modulo compensating errors
(two rows changing such that every sum AND count AND min/max still agree),
which the periodic full diff (run weekly vs nightly) closes. Driver-side
state is the disagreeing-slice id list — bounded by numParts, which config
validation caps (config.MAX_NUM_PARTS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.operators.partition import (
    restrict_to_slices,
    with_slice,
)
from cassandra_data_migrator_spark.operators.validation import diff


def slice_digest(
    df: DataFrame,
    pk_col: str,
    num_slices: int,
    sum_cols: list[str],
) -> DataFrame:
    """Per-slice exact digest: (slice_id, n_rows, min/max pk, one exact,
    permutation-invariant sum per checked column).

    Precision contract (round-4 advice): a slice digest matches iff the
    slice's column multisets match EXACTLY — there is no rounding window.
    - integer types: exact DECIMAL(38,0) sum (overflow-proof below 1e38).
    - float/double: DECIMAL(38,0) sum of ``xxhash64`` over the STRING form
      — the shortest-round-trip repr is injective over doubles, so -0.0 vs
      0.0 and sub-1e-6 deltas all change the digest. (Hashing the value
      directly would NOT: Spark's hash expressions canonicalize -0.0 to
      +0.0 first.) A 6dp-rounded DECIMAL sum (the original scheme) missed
      any change smaller than 5e-7 and dropped values beyond DECIMAL(28,6)
      range to NULL. The one remaining equivalence class is NaN payload
      bits (every NaN stringifies to 'NaN') — deliberately matching the
      full diff's eqNullSafe, which also treats all NaNs as equal.
    - decimal/string/binary/...: DECIMAL(38,0) sum of ``xxhash64`` of the
      value bytes (unscaled value for decimal). NULL hashes to the seed (a
      constant), so null-count changes shift the digest too.
    The only remaining false-match class is a compensating HASH-sum
    collision across >=2 changed rows within one slice — cryptographically
    unlikely and closed by the periodic full diff, as the module docstring
    says."""
    s = with_slice(df, pk_col, num_slices)
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min(pk_col).alias("min_pk"),
        F.max(pk_col).alias("max_pk"),
    ]
    for c in sum_cols:
        dtype = dict(df.dtypes)[c]
        if dtype in ("bigint", "int", "smallint", "tinyint"):
            aggs.append(F.sum(F.col(c).cast("decimal(38,0)")).alias(f"sum_{c}"))
        elif dtype in ("float", "double"):
            # Hash the STRING form, not the value: Spark's hash expressions
            # canonicalize -0.0 to +0.0 before hashing (round-5 review),
            # while the shortest-round-trip string repr is injective over
            # doubles and keeps '-0.0' distinct. The remaining blind spot is
            # NaN payload bits (all NaNs stringify to 'NaN') — matching the
            # eqNullSafe semantics of the full diff, which also treats all
            # NaNs as equal.
            aggs.append(
                F.sum(F.xxhash64(F.col(c).cast("string")).cast("decimal(38,0)")).alias(
                    f"sum_{c}"
                )
            )
        else:
            # decimal/string/binary/...: value-bytes hash sum
            aggs.append(
                F.sum(F.xxhash64(F.col(c)).cast("decimal(38,0)")).alias(f"sum_{c}")
            )
    return s.groupBy("slice_id").agg(*aggs)


def changed_slices(
    origin: DataFrame,
    target: DataFrame,
    pk_col: str,
    num_slices: int,
    sum_cols: list[str],
) -> list[int]:
    """Slice ids whose digests disagree (or exist on only one side). The
    collect is ≤ numParts rows — the same bounded driver state the slice
    manifest already is."""
    od = slice_digest(origin, pk_col, num_slices, sum_cols).alias("o")
    td = slice_digest(target, pk_col, num_slices, sum_cols).alias("t")
    joined = od.join(td, F.col("o.slice_id") == F.col("t.slice_id"), "full_outer")
    cols = ["n_rows", "min_pk", "max_pk"] + [f"sum_{c}" for c in sum_cols]
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"t.{c}"))
    rows = (
        joined.filter(~same)
        .select(F.coalesce(F.col("o.slice_id"), F.col("t.slice_id")).alias("slice_id"))
        .collect()
    )
    return sorted(r.slice_id for r in rows)


def validate_incremental(
    origin: DataFrame,
    target: DataFrame,
    pk_cols: list[str],
    compare_cols: list[str],
    num_slices: int = 32,
) -> tuple[DataFrame, list[int]]:
    """Two-phase validation: digest compare, then the row-level diff
    restricted to disagreeing slices. Returns (diff_report, changed_slice_ids).
    Equivalent to the full diff whenever the digest covers the compared
    columns (pinned by tests/test_validate_incremental.py)."""
    pk = pk_cols[0]
    changed = changed_slices(origin, target, pk, num_slices, compare_cols)
    o_scoped = restrict_to_slices(origin, pk, num_slices, changed).drop("token", "slice_id")
    t_scoped = restrict_to_slices(target, pk, num_slices, changed).drop("token", "slice_id")
    return diff(o_scoped, t_scoped, pk_cols, compare_cols), changed
