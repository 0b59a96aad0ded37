#!/usr/bin/env python3
"""Reproduce SCALE.md's scale-up linearity table: union the sf0.1 fixture
k times with shifted ids (every doc gains k-1 exact clones — also a
worst-case duplicate-density stress) and time representative operator
families at 1x and kx with the noop-write sink.

Usage:
    python tools/scale_stress.py [--k 4] [--sf /root/testdata/sf0.1]

Prints one line per (operator, scale) plus the kx/1x ratios (linear = k).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.operators import dedup, validation, windows
    from cassandra_data_migrator_spark.session import get_spark
    from cassandra_data_migrator_spark.sources.parquet import load_table

    spark = get_spark("scale-stress", cpus=os.cpu_count() or 8)

    def scaled(name: str, id_col: str, k: int):
        base = load_table(spark, args.sf, name)
        out = base
        for i in range(1, k):
            out = out.unionByName(
                base.withColumn(id_col, F.col(id_col) + F.lit(i * 100_000_000))
            )
        return out

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timed(fn) -> float:
        t0 = time.time()
        fn()
        return time.time() - t0

    results: dict[int, dict[str, float]] = {}
    for k in (1, args.k):
        docs = scaled("documents", "doc_id", k)
        events = scaled("events", "event_id", k)
        docs.count(), events.count()  # warm IO + JIT
        tgt = events.withColumn(
            "value",
            F.when(
                F.col("event_id") % 1000 == 0, F.col("value") + 1
            ).otherwise(F.col("value")),
        )
        cases = {
            "dedup_exact": lambda: noop(dedup.dedup_exact(docs)),
            "ngram_jaccard_pairs": lambda: noop(
                dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2)
            ),
            "dedup_fuzzy": lambda: noop(dedup.dedup_fuzzy(docs)),
            "group_agg": lambda: noop(
                events.groupBy("event_type").agg(
                    F.count(F.lit(1)), F.sum("value")
                )
            ),
            "tumbling_window": lambda: noop(windows.tumbling_window(events)),
            "validate_diff": lambda: noop(
                validation.diff(events, tgt, ["event_id"], ["value", "event_type"])
            ),
        }
        results[k] = {}
        for name, fn in cases.items():
            dt = timed(fn)
            results[k][name] = dt
            print(f"{name} x{k}: {dt:.2f}s", flush=True)

    print(f"=== ratios x{args.k}/x1 (linear = {args.k}.0) ===")
    for name in results[1]:
        print(f"{name}: {results[args.k][name] / results[1][name]:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
