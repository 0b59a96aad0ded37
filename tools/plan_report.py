#!/usr/bin/env python3
"""Per-key physical-plan hygiene report → PLAN_REPORT.json.

Mechanizes the plan audit the round reviews do by hand: for every declared
query key, record the scale-relevant plan facts —

  exchanges              shuffle count (mode=simple plan text)
  broadcast_exchanges    broadcast count
  wholestage_spans       WholeStageCodegen region count (JVM-side health)
  bnlj / cartesian       nested-loop / cartesian presence (must match the
                         BNLJ_KEYS allowlist in tests/test_plans.py)
  python_nodes           ArrowEvalPython / MapInPandas / BatchEvalPython
                         (BatchEvalPython must never appear)
  unpartitioned_windows  single-reducer Window count (must match
                         GLOBAL_WINDOW_KEYS)
  pushed_filters         scans with a non-empty PushedFilters list

The committed artifact is diffable round to round: a regression that adds
a shuffle, drops pushdown, or sneaks a Python node into a JVM key shows up
as a one-line JSON diff even before the bench moves.

Usage: python tools/plan_report.py [--sf /root/testdata/sf0.01]
                                   [--out PLAN_REPORT.json]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP = {"migrate_rowcount"}  # writes as a side effect during construction


def _walk(node):
    yield node
    for i in range(node.children().size()):
        yield from _walk(node.children().apply(i))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "PLAN_REPORT.json",
        ),
    )
    args = ap.parse_args()

    from cassandra_data_migrator_spark import queries as q
    from cassandra_data_migrator_spark.session import get_spark

    spark = get_spark("plan-report", cpus=8)
    report: dict[str, dict] = {}
    for key, fn in q.queries().items():
        if key in SKIP:
            continue
        df = fn(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("simple")
        p = buf.getvalue()
        # codegen spans are only annotated on non-adaptive plans (AQE wraps
        # everything in AdaptiveSparkPlan pre-execution), so build a second
        # plan with AQE off just for this metric
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            buf3 = io.StringIO()
            with redirect_stdout(buf3):
                fn(spark, args.sf).explain("simple")
            codegen_spans = len(set(re.findall(r"\*\((\d+)\)", buf3.getvalue())))
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        buf2 = io.StringIO()
        with redirect_stdout(buf2):
            df.explain("formatted")
        pf = buf2.getvalue()
        unpart = 0
        for node in _walk(df._jdf.queryExecution().optimizedPlan()):
            if (
                node.getClass().getSimpleName() == "Window"
                and node.partitionSpec().isEmpty()
            ):
                unpart += 1
        report[key] = {
            "exchanges": len(re.findall(r"Exchange (?:hash|range|Single)", p)),
            "broadcast_exchanges": p.count("BroadcastExchange"),
            "wholestage_spans": codegen_spans,
            "bnlj": "BroadcastNestedLoopJoin" in p,
            "cartesian": "CartesianProduct" in p,
            "python_nodes": sorted(
                {
                    n
                    for n in ("ArrowEvalPython", "MapInPandas",
                              "FlatMapGroupsInPandas", "BatchEvalPython")
                    if n in p
                }
            ),
            "unpartitioned_windows": unpart,
            "pushed_filters": len(
                [l for l in pf.splitlines()
                 if "PushedFilters" in l and "PushedFilters: []" not in l]
            ),
        }
        print(f"{key}: {json.dumps(report[key], separators=(',', ':'))}", flush=True)
    with open(args.out, "w") as fh:
        json.dump(
            {"sf": args.sf, "keys": report},
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")
    n_bad = sum(1 for r in report.values() if "BatchEvalPython" in r["python_nodes"])
    print(f"\nwrote {args.out} ({len(report)} keys; BatchEvalPython rows: {n_bad})")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
