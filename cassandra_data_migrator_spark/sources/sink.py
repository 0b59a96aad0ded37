"""Sink-side CQL semantics (SURVEY.md §7 'What's hard' #2): the rules CDM gets
implicitly from the Cassandra driver become explicit, unit-tested DataFrame
normalizations here.

- **set<T> dedup-on-write**: a CQL set silently deduplicates; our engine
  models sets as arrays (SURVEY.md §1.2), so writing to a set-typed target
  column sorts + dedups the array (sorted for determinism — set order is
  undefined anyway).
- **null vs unset**: a CQL INSERT with an explicit null writes a tombstone; an
  *unset* bound value leaves the cell untouched. Parquet can't express unset,
  so the policy is explicit: 'null' (write tombstones / nulls as-is) or
  'unset' (sub-select per-row non-null columns — in the parquet world this
  means nulls survive as nulls but are EXCLUDED from the diff comparison via
  compare-null-safe; against Cassandra the connector's ignoreNulls option
  implements it natively).
- **counter guard**: counter columns take deltas only — writing timestamps or
  TTLs alongside a counter update is a CQL error; we raise early.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CounterSemanticsError(ValueError):
    pass


def normalize_set_columns(df: DataFrame, set_columns: list[str]) -> DataFrame:
    """Apply set-on-write semantics: dedup + sort each array column."""
    for c in set_columns:
        df = df.withColumn(c, F.sort_array(F.array_distinct(F.col(c))))
    return df


def apply_null_policy(df: DataFrame, policy: str, writable_cols: list[str]) -> DataFrame:
    """'null' → pass through; 'unset' → nulls excluded from write intent.

    In the parquet fixture world 'unset' is a no-op at the file level (parquet
    nulls are absence already); the policy's real effect is on the Cassandra
    sink (connector spark.cassandra.output.ignoreNulls=true)."""
    if policy not in ("null", "unset"):
        raise ValueError(f"null policy must be 'null' or 'unset', got {policy!r}")
    return df


def upsert_cellwise(
    base: DataFrame,
    updates: DataFrame,
    pk_cols: list[str],
    value_cols: list[str],
    policy: str = "unset",
) -> DataFrame:
    """CELL-level upsert with CQL null-vs-unset semantics (SURVEY §7 'What's
    hard' #2): for PK matches each update cell overwrites the base cell —
    except under 'unset', where a NULL update cell leaves the base cell
    untouched (an unset bound value in CQL); under 'null' it tombstones
    (overwrites with null). Update-only rows insert, base-only rows
    survive. One full-outer PK join, per-cell CASE projection — the
    row-level merge (plans/upsert.py) is the special case where every cell
    is present."""
    if policy not in ("null", "unset"):
        raise ValueError(f"null policy must be 'null' or 'unset', got {policy!r}")
    b, u = base.alias("b"), updates.alias("u")
    cond = [F.col(f"b.{k}").eqNullSafe(F.col(f"u.{k}")) for k in pk_cols]
    joined = b.join(u, cond, "full_outer")
    upd_present = F.col(f"u.{pk_cols[0]}").isNotNull()
    out = [F.coalesce(F.col(f"b.{k}"), F.col(f"u.{k}")).alias(k) for k in pk_cols]
    for c in value_cols:
        if policy == "unset":
            v = F.when(upd_present & F.col(f"u.{c}").isNotNull(), F.col(f"u.{c}")).otherwise(
                F.col(f"b.{c}")
            )
        else:
            v = F.when(upd_present, F.col(f"u.{c}")).otherwise(F.col(f"b.{c}"))
        out.append(v.alias(c))
    return joined.select(*out)


def guard_counter_write(
    counter_cols: list[str], writetime_col: str | None, ttl_col: str | None
) -> None:
    """CQL forbids USING TIMESTAMP/TTL on counter updates [upstream@6.0.1
    guards this in TargetUpdateStatement]; fail fast at plan time."""
    if counter_cols and (writetime_col or ttl_col):
        raise CounterSemanticsError(
            "counter columns cannot be written with writetime/TTL: "
            f"{counter_cols} vs writetime={writetime_col!r} ttl={ttl_col!r}"
        )


def counter_update_frame(df: DataFrame, key_cols: list[str], counter_cols: list[str]) -> DataFrame:
    """Shape a counter write: keys + delta columns only (CQL counter UPDATE
    'SET c = c + ?' — non-key non-counter columns are illegal)."""
    guard_counter_write(counter_cols, None, None)
    return df.select(*key_cols, *[F.col(c).cast("bigint").alias(c) for c in counter_cols])
