#!/usr/bin/env python3
"""Spot-check declared query keys against their DuckDB oracles from the CLI.

Usage:
    python tools/parity_check.py [--sf /root/testdata/sf0.01] key [key ...]
    python tools/parity_check.py --all

Complements tests/test_oracle_parity.py (the pytest-integrated sweep at
sf0.001): this runs any key at any scale factor in a fresh process — the
same import-and-drive path the verify driver takes — and prints the first
differing row on mismatch.

Normalization mirrors the driver's compare: columns sorted by name, rows
sorted, floats rounded to 4dp (NaN≡NULL; pandas upcasts nullable BIGINT to
float64, so integral floats compare as ints).
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if hasattr(v, "item") and not isinstance(v, (bytes, bytearray)):
                # duckdb fetchdf() yields numpy scalars; under numpy>=2 their
                # repr() is 'np.int64(5)' which would mismatch the Spark side.
                v = v.item()
            if isinstance(v, float):
                if math.isnan(v):
                    v = None
                else:
                    v = round(v, 4)
                    # NOTE: signed zero is deliberately NOT normalized — the
                    # driver's value hash distinguishes -0.0 from 0.0, so the
                    # local sweep must too (round-4 bigram_pmi lesson).
                    if v == int(v) and not (
                        v == 0.0 and math.copysign(1.0, v) < 0.0
                    ):
                        v = int(v)
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true", help="check every oracled key")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as m

    # SPARK_GRAFT_MASTER=local-cluster[4,8,4096] runs the same check under
    # real executor JVMs (r09 verdict #1); session.get_spark handles the
    # executor PYTHONPATH plumbing.
    if os.environ.get("SPARK_GRAFT_MASTER"):
        from cassandra_data_migrator_spark.session import get_spark

        spark = get_spark("parity-check")
    else:
        spark = (
            SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
            .config("spark.ui.enabled", "false")
            # everything else stays default (the verify driver's plain-
            # session conf bootstrap is still exercised), but the stock 1g
            # heap shared by 32 executor threads OOMs the join-heavy keys
            # at sf1 (ds9's 6M-row outer join found this in r11) — size it
            # like session.get_spark does
            .config(
                "spark.driver.memory",
                os.environ.get("CDM_DRIVER_MEMORY", "8g"),
            )
            .getOrCreate()
        )
    qs, os_ = m.queries(), m.oracle_sql()
    keys = [k for k in qs if k in os_] if args.all else args.keys
    unknown = [k for k in keys if k not in qs]
    if unknown:
        ap.error(f"unknown keys: {unknown}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            # driver fixtures are single files; the sf1 tier writes
            # Spark-native multi-file DIRECTORIES (scan parallelism) — glob
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet{'/*.parquet' if os.path.isdir(f'{args.sf}/{t}.parquet') else ''}')"
        )

    failed = []
    for k in keys:
        if k not in os_:
            print(f"{k}: rows-only (no oracle), spark rows = {qs[k](spark, args.sf).count()}")
            continue
        df = qs[k](spark, args.sf)
        cols = sorted(df.columns)
        srows = _norm([r.asDict() for r in df.collect()], cols)
        orows = _norm(con.execute(os_[k]).fetchdf().to_dict("records"), cols)
        ok = srows == orows
        print(f"{k}: rows {len(srows)} {'match' if ok else 'MISMATCH'}")
        if not ok:
            failed.append(k)
            for a, b in zip(srows, orows):
                if a != b:
                    print("  spark :", a)
                    print("  oracle:", b)
                    break
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
