"""Upsert/merge sink for the parquet world (CQL INSERT = upsert; parquet has
no MERGE without a lakehouse format, so emulate: new ∪ (old ⟕ anti new)).

This is the incremental-migrate sink: batch N's rows replace same-PK rows in
the target, everything else survives. With per-row writetimes the merge picks
the LARGER writetime (Cassandra's last-write-wins cell semantics) rather than
blindly preferring the new batch — an explicit, tested rule (SURVEY.md §7
'Cassandra-faithful semantics').

At scale this is the standard compact-and-swap: one shuffle on the PK for the
anti-join, a full rewrite of the target (a lakehouse table format would make
it a metadata swap; the interface here is format-agnostic)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame | None,
    updates: DataFrame,
    pk_cols: list[str],
    writetime_col: str | None = None,
) -> DataFrame:
    """Merged view: updates win on PK collision — unless ``writetime_col`` is
    given, in which case the row with the larger writetime wins (ties → the
    update, matching Cassandra's reconcile-by-timestamp-then-value bias
    toward the later write)."""
    if target is None:
        return updates
    if writetime_col is None:
        survivors = target.join(updates.select(pk_cols), pk_cols, "left_anti")
        return survivors.unionByName(updates)
    # last-write-wins by writetime: keep max-writetime row per PK
    from pyspark.sql import Window

    tagged = target.withColumn("__is_new", F.lit(0)).unionByName(
        updates.withColumn("__is_new", F.lit(1))
    )
    w = Window.partitionBy(*pk_cols).orderBy(
        F.col(writetime_col).desc(), F.col("__is_new").desc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__is_new")
    )


def upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    pk_cols: list[str],
    writetime_col: str | None = None,
) -> DataFrame:
    """Merge ``updates`` into the parquet table at ``path`` (created if
    absent); returns the re-read merged table.

    Crash-safe swap: write staging → move live table aside → move staging in
    → delete the old copy. At every instant a readable copy exists (live,
    aside, or staging); if the staging→live rename fails the aside copy is
    rolled back into place, so a crash never truncates the target."""
    import os
    import shutil

    target = spark.read.parquet(path) if os.path.exists(path) else None
    merged = merge_upsert(target, updates, pk_cols, writetime_col)
    tmp = path.rstrip("/") + "__staging"
    merged.write.mode("overwrite").parquet(tmp)
    staged = spark.read.parquet(tmp)
    staged.count()  # materialize before the swap
    old = path.rstrip("/") + "__old"
    if os.path.exists(path):
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(path, old)
    try:
        os.rename(tmp, path)
    except BaseException:
        if os.path.exists(old) and not os.path.exists(path):
            os.rename(old, path)  # roll the previous table back into place
        raise
    if os.path.exists(old):
        shutil.rmtree(old)
    return spark.read.parquet(path)
