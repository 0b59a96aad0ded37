#!/usr/bin/env python3
"""Dump `.explain("formatted")` for named query keys to plans/<tag>/<key>_<suffix>.txt.

The optimization-round evidence artifact (guide §1: capture the plan before
and after every change). Usage:

    python tools/plan_dump.py --tag r12 --suffix before key [key ...]
    python tools/plan_dump.py --tag r12 --suffix before --all
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from cassandra_data_migrator_spark import queries as q
    from cassandra_data_migrator_spark.session import get_spark

    registry = q.queries()
    keys = list(registry) if args.all else args.keys
    unknown = sorted(set(keys) - set(registry))
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("cdm-plan-dump")
    sf = args.sf.rstrip("/")
    for key in keys:
        df = registry[key](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{key}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# key={key} sf={sf} spark={spark.version}\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
