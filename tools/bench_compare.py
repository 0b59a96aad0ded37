#!/usr/bin/env python3
"""Diff two bench sweeps (BENCH_FULL.json format) and print per-key
regressions — the mechanical half of BASELINE.md's "keep the bench honest"
protocol.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--threshold 2.0]
                                  [--min-sec 0.3]

Prints shared-key totals, the ratio, and every shared key whose NEW median
exceeds threshold × OLD (ignoring keys under --min-sec in both sweeps —
sub-noise). Exit code 1 if any key trips the threshold, so a CI step can
gate on it.
"""

from __future__ import annotations

import argparse
import json
import sys


def _queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    q = d.get("queries", d)
    if "parsed" in d and isinstance(d["parsed"], dict):  # driver BENCH_r*.json
        q = d["parsed"].get("queries", q)
    return {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=0.3)
    args = ap.parse_args()

    old, new = _queries(args.old), _queries(args.new)
    shared = sorted(set(old) & set(new))
    if not shared:
        print("no shared keys between the two sweeps")
        return 2
    s_old = sum(old[k] for k in shared)
    s_new = sum(new[k] for k in shared)
    print(
        f"shared-{len(shared)}: old {s_old:.1f}s  new {s_new:.1f}s  "
        f"ratio {s_new / s_old:.2f}x"
    )
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new-only keys ({len(only_new)}): "
              + ", ".join(f"{k}={new[k]:.2f}s" for k in only_new))
    tripped = []
    for k in shared:
        if max(old[k], new[k]) < args.min_sec:
            continue  # sub-noise
        if new[k] > args.threshold * old[k]:
            tripped.append((new[k] / old[k], k))
    for ratio, k in sorted(tripped, reverse=True):
        print(f"REGRESSION {k}: {old[k]:.2f}s -> {new[k]:.2f}s = {ratio:.2f}x")
    if not tripped:
        print(f"gate clean: no shared key over {args.threshold}x "
              f"(min-sec {args.min_sec})")
    return 1 if tripped else 0


if __name__ == "__main__":
    sys.exit(main())
