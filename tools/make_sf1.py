#!/usr/bin/env python3
"""Materialize an sf1 fixture directory (r09 verdict #2: the 2x bench gate is
vacuous while ~200 of the keys are sub-second at sf0.1 — give the top-cost
keys a scale where a regression is detectable).

The driver's generator is not in the repo, so sf1 = a 10x PK-shifted union of
the read-only sf0.1 fixture with deterministic per-clone PERTURBATIONS chosen
so the scaled corpus keeps the original's statistical shape without exact-
clone cliques (which would quadratically distort every dedup/ANN key):

- fact tables (customer/supplier/part/orders/lineitem): keys shifted by
  i*100_000_000 per clone i, FKs shifted in lockstep (join fan-out per key is
  IDENTICAL to sf0.1); region/nation stay fixed (TPC-H scales facts only).
- events: ids shifted, ts shifted i seconds (per-user event density and
  window/session structure preserved); written back as INT64 ns like the
  original so load_table's normalize path is unchanged.
- documents: doc_id shifted (by a multiple of 4: residue-class fixtures keep
  their classes), text gains a 4-char per-clone suffix — near-dup structure
  preserved, exact-clone cliques avoided; n_chars recomputed.
- embeddings: vec_id shifted, dim-0 nudged by i*1e-3 (distinct vectors, same
  geometry).

Output: /root/repo/testdata/sf1/*.parquet (~170 MB, .gitignored — regenerate
with this script; deterministic, no RNG).

Usage: python tools/make_sf1.py [--k 10] [--src /root/testdata/sf0.1]
                                [--out /root/repo/testdata/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHIFT = 100_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/testdata/sf1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.session import get_spark
    from cassandra_data_migrator_spark.sources.parquet import load_table

    spark = get_spark("make-sf1")
    os.makedirs(args.out, exist_ok=True)

    def write(df, name, n_files):
        # MULTI-FILE directories (what Spark and every lake layout actually
        # produce at scale), not the toy single-file convention: a 1-file
        # table bounds SCAN parallelism at one task below maxPartitionBytes
        # (and a coalesce(1) file is ONE row group, unsplittable at any
        # conf) — measured at sf1: corr_stats 5.1 s -> 24 s single-file,
        # sq8_recall_clustered 8.2 s -> 24.7 s on the single-file
        # embeddings. tools/parity_check.py globs directory tables for the
        # DuckDB oracle side.
        path = f"{args.out}/{name}.parquet"
        df.repartition(n_files).write.mode("overwrite").parquet(path)
        print(f"{name}: {spark.read.parquet(path).count()} rows -> {path} ({n_files} files)")

    # dimensions stay fixed (TPC-H convention)
    for name in ("region", "nation"):
        write(load_table(spark, args.src, name), name, 1)

    def clones(name, shifts, extra=None, n_files=8):
        base = load_table(spark, args.src, name)
        parts = []
        for i in range(args.k):
            df = base
            for col in shifts:
                df = df.withColumn(col, F.col(col) + F.lit(i * SHIFT))
            if extra is not None:
                df = extra(df, i)
            parts.append(df.select(base.columns if extra is None else df.columns))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        write(out, name, n_files)

    clones("customer", ["c_custkey"], n_files=4)
    clones("supplier", ["s_suppkey"], n_files=2)
    clones("part", ["p_partkey"], n_files=4)
    clones("orders", ["o_orderkey", "o_custkey"], n_files=8)
    clones("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"], n_files=16)

    # events: keep the original column order and write ts back as raw ns
    ev = load_table(spark, args.src, "events")
    parts = []
    for i in range(args.k):
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(i * SHIFT)).alias("event_id"),
                (F.col("ts_ns") + F.lit(i * 1_000_000_000)).alias("ts"),
                (F.col("user_id") + F.lit(i * SHIFT)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    write(out, "events", 16)
    # faithfulness pass: the driver fixture stores ts as INT64
    # TIMESTAMP(NANOS) (parquet 2.6) — DuckDB reads it as a timestamp,
    # Spark (with nanosAsLong) as BIGINT, and load_table's PRIMARY
    # normalize branch depends on that. Re-annotate the int64 ns column.
    import pyarrow as pa
    import pyarrow.parquet as pq

    import glob as _glob

    for part in _glob.glob(f"{args.out}/events.parquet/part-*.parquet"):
        t = pq.read_table(part)
        idx = t.schema.get_field_index("ts")
        t = t.set_column(idx, "ts", t.column("ts").cast(pa.timestamp("ns")))
        pq.write_table(t, part, version="2.6")
    # the rewrite invalidates Spark's .crc sidecars — drop them or every
    # later read dies with ChecksumException
    for crc in _glob.glob(f"{args.out}/events.parquet/.*.crc"):
        os.remove(crc)
    print("events: ts re-annotated INT64 TIMESTAMP(NANOS) per part file")

    def doc_extra(df, i):
        if i == 0:
            return df.select("doc_id", "text", "lang", "source", "n_chars")
        txt = F.concat(F.col("text"), F.lit(f" c{i}x"))
        return df.select(
            "doc_id",
            txt.alias("text"),
            "lang",
            "source",
            F.length(txt).cast("long").alias("n_chars"),
        )

    clones("documents", ["doc_id"], extra=doc_extra, n_files=16)

    def emb_extra(df, i):
        if i == 0:
            return df.select("vec_id", "embedding", "label")
        nudged = F.concat(
            F.transform(
                F.slice("embedding", 1, 1),
                lambda x: (x + F.lit(float(i) * 1e-3)).cast("float"),
            ),
            F.slice("embedding", 2, 1_000_000),
        )
        return df.select("vec_id", nudged.alias("embedding"), "label")

    clones("embeddings", ["vec_id"], extra=emb_extra, n_files=16)
    spark.stop()


if __name__ == "__main__":
    main()
