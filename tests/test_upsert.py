"""Merge/upsert sink: PK collision resolution, last-write-wins by writetime,
crash-safe staging swap."""

from pyspark.sql import functions as F

from cassandra_data_migrator_spark.plans.upsert import merge_upsert, upsert_parquet


def test_upsert_new_keys_and_collisions(spark, tmp_path):
    path = str(tmp_path / "t")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "pk BIGINT, v STRING")
    out1 = upsert_parquet(spark, b1, path, ["pk"])
    assert sorted((r.pk, r.v) for r in out1.collect()) == [(1, "a"), (2, "b")]

    b2 = spark.createDataFrame([(2, "B"), (3, "c")], "pk BIGINT, v STRING")
    out2 = upsert_parquet(spark, b2, path, ["pk"])
    assert sorted((r.pk, r.v) for r in out2.collect()) == [(1, "a"), (2, "B"), (3, "c")]


def test_upsert_last_write_wins_by_writetime(spark, tmp_path):
    path = str(tmp_path / "t2")
    b1 = spark.createDataFrame([(1, "new", 200), (2, "old", 100)], "pk BIGINT, v STRING, wt BIGINT")
    upsert_parquet(spark, b1, path, ["pk"], writetime_col="wt")
    # batch 2 has a STALE row for pk=1 (wt 150 < 200) and a fresher pk=2
    b2 = spark.createDataFrame([(1, "stale", 150), (2, "fresh", 300)], "pk BIGINT, v STRING, wt BIGINT")
    out = upsert_parquet(spark, b2, path, ["pk"], writetime_col="wt")
    got = {r.pk: (r.v, r.wt) for r in out.collect()}
    # Cassandra cell semantics: larger writetime wins regardless of arrival order
    assert got == {1: ("new", 200), 2: ("fresh", 300)}


def test_upsert_writetime_tie_prefers_update(spark):
    target = spark.createDataFrame([(1, "old", 100)], "pk BIGINT, v STRING, wt BIGINT")
    updates = spark.createDataFrame([(1, "upd", 100)], "pk BIGINT, v STRING, wt BIGINT")
    out = merge_upsert(target, updates, ["pk"], writetime_col="wt")
    assert out.first().v == "upd"


def test_upsert_swap_crash_leaves_readable_target(spark, tmp_path, monkeypatch):
    """A failure during the staging→live rename rolls the previous table back
    into place: the target is never left truncated or missing."""
    import os

    path = str(tmp_path / "t3")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "pk BIGINT, v STRING")
    upsert_parquet(spark, b1, path, ["pk"])

    real_rename = os.rename

    def failing_rename(src, dst):
        if src.endswith("__staging"):
            raise OSError("simulated crash between swap steps")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_rename)
    b2 = spark.createDataFrame([(2, "B"), (3, "c")], "pk BIGINT, v STRING")
    import pytest

    with pytest.raises(OSError, match="simulated crash"):
        upsert_parquet(spark, b2, path, ["pk"])
    monkeypatch.undo()

    # the ORIGINAL table is back in place and fully readable
    got = sorted((r.pk, r.v) for r in spark.read.parquet(path).collect())
    assert got == [(1, "a"), (2, "b")]
    # and a retry completes the merge normally
    out = upsert_parquet(spark, b2, path, ["pk"])
    assert sorted((r.pk, r.v) for r in out.collect()) == [(1, "a"), (2, "B"), (3, "c")]
