"""Write-layout management (sources/layout.py): compaction guarantees and
partition-pruned scans."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_data_migrator_spark.sources import layout
from cassandra_data_migrator_spark.sources.parquet import load_table


def test_compact_preserves_rows_and_hits_file_count(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    e.repartition(16).write.parquet(src)
    assert layout.file_count(spark.read.parquet(src)) == 16
    k = layout.compact(spark, src, dst, target_rows=300)
    comp = spark.read.parquet(dst)
    n = e.count()
    assert k == (n + 299) // 300
    assert layout.file_count(comp) == k
    # row preservation: count and exact checksum survive the rewrite
    assert comp.count() == n
    assert (
        comp.agg(F.sum("event_id")).collect()[0][0]
        == e.agg(F.sum("event_id")).collect()[0][0]
    )


def test_compact_single_file_floor(spark, sf_dir, tmp_path):
    """target above the row count → exactly one output file, never zero."""
    e = load_table(spark, sf_dir, "events").select("event_id").limit(10)
    src, dst = str(tmp_path / "s2"), str(tmp_path / "d2")
    e.repartition(4).write.parquet(src)
    k = layout.compact(spark, src, dst, target_rows=10_000_000)
    assert k == 1
    assert layout.file_count(spark.read.parquet(dst)) == 1


def test_partitioned_write_scan_is_pruned(spark, sf_dir, tmp_path):
    """The date-filtered read must touch ONLY the matching partition
    directory: the scan plan carries a PartitionFilter on event_date and
    every file feeding the scan lives under that one date's directory."""
    e = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "parted")
    dated = e.withColumn("event_date", F.to_date(F.timestamp_micros("ts_us")))
    layout.write_partitioned(
        dated.select("event_id", "event_type", "value", "event_date"),
        out,
        "event_date",
    )
    min_date = dated.agg(F.min("event_date")).collect()[0][0]
    pr = spark.read.parquet(out).filter(F.col("event_date") == F.lit(min_date))
    plan = pr._sc._jvm.PythonSQLUtils.explainString(
        pr._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "event_date" in plan
    files = [
        r.f for r in pr.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert len(files) > 0
    assert all(f"event_date={min_date}" in f for f in files), (
        "scan read files outside the filtered partition directory"
    )
    # and the unfiltered relation really has >1 partition to prune
    all_files = [
        r.f
        for r in spark.read.parquet(out)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    ]
    assert len({f.split("event_date=")[1].split("/")[0] for f in all_files}) > 1


def test_overwrite_partitions_touches_only_batch_partitions(spark, tmp_path):
    """Dynamic overwrite must replace ONLY the partitions in the batch;
    static mode would delete the others (the backfill contract)."""
    from cassandra_data_migrator_spark.sources.layout import (
        overwrite_partitions,
        write_partitioned,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c")], "id LONG, p STRING"
    )
    write_partitioned(base, path, "p")
    batch = spark.createDataFrame([(99, "b")], "id LONG, p STRING")
    overwrite_partitions(batch, path, "p")
    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert got == [(1, "a"), (2, "a"), (4, "c"), (99, "b")]
    # and the session conf was restored (scoped, not leaked)
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode").upper()
        == "STATIC"
    )
