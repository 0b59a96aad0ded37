#!/usr/bin/env python3
"""Streaming per-batch latency micro-bench (r09 verdict #8): the streaming
twins are correctness-pinned (stream==batch) but carried no perf contract.
This measures per-micro-batch wall of the two stateful/production paths at
a FIXED batch size so a regression is a number, not an anecdote:

- streaming_migrate: the config-driven feature pipeline (projection/filter,
  stateless) over one parquet micro-batch of `orders`.
- streaming_dedup_bloom: the bounded-state bloom dedup
  (applyInPandasWithState, 64 shards) over one micro-batch of `documents`.

Protocol: stage the fixture as N identical-size micro-batch files, run ONE
warm-up query (fresh checkpoint) end-to-end, then time a second fresh-
checkpoint run and report wall / n_batches. Prints one JSON line; the
committed readings live in BASELINE.md (round-10 streaming section), and
tests/test_bench_contract.py pins a generous regression ceiling.

Usage: python tools/stream_bench.py [--sf /root/testdata/sf0.1] [--batches 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_migrate(spark, sf, stage_root, n_batches):
    from cassandra_data_migrator_spark.config import MigrationConfig
    from cassandra_data_migrator_spark.streaming.migrate import streaming_migrate

    src = f"{sf}/orders.parquet"
    stage = os.path.join(stage_root, "orders_stream")
    os.makedirs(stage)
    for i in range(n_batches):
        shutil.copy(src, os.path.join(stage, f"batch{i}.parquet"))
    static = spark.read.parquet(src)
    cfg = MigrationConfig(
        {
            "spark.cdm.filter.cassandra.whereCondition": "o_totalprice >= 50000",
            "spark.cdm.feature.constantColumns.names": "migrated_by",
            "spark.cdm.feature.constantColumns.values": "'cdm-spark'",
            "spark.cdm.feature.constantColumns.types": "string",
        }
    )

    def once(tag):
        stream = (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        t0 = time.perf_counter()
        q = streaming_migrate(
            stream,
            cfg,
            os.path.join(stage_root, f"mig_out_{tag}"),
            os.path.join(stage_root, f"mig_ckpt_{tag}"),
        )
        q.awaitTermination()
        return time.perf_counter() - t0

    once("warm")
    wall = once("timed")
    return static.count(), wall / n_batches


def run_bloom(spark, sf, stage_root, n_batches):
    from cassandra_data_migrator_spark.streaming.bloom_dedup import (
        streaming_dedup_bloom,
    )

    src = f"{sf}/documents.parquet"
    stage = os.path.join(stage_root, "docs_stream")
    os.makedirs(stage)
    for i in range(n_batches):
        shutil.copy(src, os.path.join(stage, f"batch{i}.parquet"))
    static = spark.read.parquet(src)

    def once(tag):
        stream = (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        t0 = time.perf_counter()
        q = (
            streaming_dedup_bloom(stream)
            .writeStream.format("parquet")
            .option("path", os.path.join(stage_root, f"bloom_out_{tag}"))
            .option("checkpointLocation", os.path.join(stage_root, f"bloom_ckpt_{tag}"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return time.perf_counter() - t0

    once("warm")
    wall = once("timed")
    return static.count(), wall / n_batches


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--batches", type=int, default=2)
    args = ap.parse_args()

    from cassandra_data_migrator_spark.session import get_spark

    spark = get_spark("stream-bench")
    root = tempfile.mkdtemp(prefix="cdm_stream_bench_")
    try:
        mig_rows, mig_sec = run_migrate(spark, args.sf, root, args.batches)
        bloom_rows, bloom_sec = run_bloom(spark, args.sf, root, args.batches)
        print(
            json.dumps(
                {
                    "metric": "stream_batch_sec",
                    "migrate_batch_rows": mig_rows,
                    "migrate_batch_sec": round(mig_sec, 4),
                    "migrate_rows_per_sec": round(mig_rows / mig_sec, 1),
                    "bloom_batch_rows": bloom_rows,
                    "bloom_batch_sec": round(bloom_sec, 4),
                    "bloom_rows_per_sec": round(bloom_rows / bloom_sec, 1),
                    "batches": args.batches,
                    "sf_dir": args.sf,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
