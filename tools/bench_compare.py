#!/usr/bin/env python3
"""Diff two bench sweeps (BENCH_FULL.json format) and print per-key
regressions — the mechanical half of BASELINE.md's "keep the bench honest"
protocol.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--threshold 2.0]
                                  [--min-sec 0.3] [--isolate]
                                  [--sf-dir /root/testdata/sf0.1]

Prints shared-key totals, the ratio, and every shared key whose NEW median
exceeds threshold × OLD (ignoring keys under --min-sec in both sweeps —
sub-noise). Exit code 1 if any key trips the threshold, so a CI step can
gate on it.

--isolate is the sub-second-key gate protocol (BASELINE.md): in-sweep
timings of sub-second keys carry ±50% noise (GC pressure, block-cleanup
timing, neighbor keys), so a flagged key is RE-MEASURED alone in a fresh
Spark session (bench.py with SPARK_GRAFT_KEYS=<key>, same 3-run median,
same noop-write protocol) before being declared a regression. Only keys
whose ISOLATED median still exceeds threshold x OLD count toward the
exit code; the rest are reported as in-sweep noise.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile


# bench.py's measured in-sweep-vs-isolated inflation (~+27%): a full
# contended sweep reads hotter than a fresh single-key session. Used by
# --isolate to put the OLD (in-sweep) number and the NEW (isolated)
# re-measure on the same footing.
INSWEEP_INFLATION = 1.27


def _queries(path: str) -> tuple[dict[str, float], str | None]:
    """Per-key timings plus the file's recorded provenance ('sweep' /
    'isolated'; None for legacy files predating the field)."""
    with open(path) as fh:
        d = json.load(fh)
    q = d.get("queries", d)
    prov = d.get("provenance")
    if "parsed" in d and isinstance(d["parsed"], dict):  # driver BENCH_r*.json
        q = d["parsed"].get("queries", q)
        prov = d["parsed"].get("provenance", prov)
    timings = {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}
    return timings, prov


def _isolated_timing(key: str, sf_dir: str) -> float | None:
    """Median wall-clock of KEY measured alone in a fresh session (fresh
    python process -> fresh JVM -> no in-sweep GC/cache contamination)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        out_path = tf.name
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_KEYS": key,
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "BENCH_OUT": out_path,
        }
    )
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            timeout=900,
        )
        if proc.returncode != 0:
            print(f"  isolate {key}: bench.py rc={proc.returncode}", file=sys.stderr)
            return None
        with open(out_path) as fh:
            return float(json.load(fh)["queries"][key])
    except (OSError, subprocess.TimeoutExpired, KeyError, ValueError) as exc:
        print(f"  isolate {key}: {exc}", file=sys.stderr)
        return None
    finally:
        try:
            os.unlink(out_path)
        except OSError:
            pass


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=0.3)
    ap.add_argument(
        "--isolate",
        action="store_true",
        help="re-measure flagged keys in a fresh session before declaring them",
    )
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    (old, old_prov), (new, new_prov) = _queries(args.old), _queries(args.new)
    shared = sorted(set(old) & set(new))
    if not shared:
        print("no shared keys between the two sweeps")
        return 2
    # Sweep-ness per file: recorded "provenance" field (advice r07), with
    # the >=50-key count heuristic only for legacy files predating it.
    old_is_sweep = old_prov == "sweep" if old_prov is not None else len(old) >= 50
    new_is_sweep = new_prov == "sweep" if new_prov is not None else len(new) >= 50
    # Put BOTH sides on the same (isolated-equivalent) footing BEFORE the
    # trip decision (review r08: discarding NEW's provenance let an
    # isolated NEW regression hide under the contended OLD's ~1.27x
    # inflation and never reach the tripped stage).
    old_adj = INSWEEP_INFLATION if old_is_sweep and not new_is_sweep else 1.0
    new_adj = INSWEEP_INFLATION if new_is_sweep and not old_is_sweep else 1.0
    if old_adj != 1.0 or new_adj != 1.0:
        print(
            f"provenance mismatch (old={'sweep' if old_is_sweep else 'isolated'}, "
            f"new={'sweep' if new_is_sweep else 'isolated'}): the contended "
            f"side is deflated by {INSWEEP_INFLATION}x before comparison"
        )
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
        if new[k] / new_adj > args.threshold * (old[k] / old_adj):
            tripped.append((new[k] / new_adj / (old[k] / old_adj), k))
    confirmed = []
    for ratio, k in sorted(tripped, reverse=True):
        if args.isolate:
            iso = _isolated_timing(k, args.sf_dir)
            # the OLD number may come from a CONTENDED full sweep (~1.27x
            # inflated vs isolated, bench.py's own measurement), while iso
            # is uncontended — deflate old accordingly or a true isolated
            # regression up to threshold*1.27x reads as "noise"; an
            # isolated OLD (BENCH_SUBSET.json) is already uncontended and
            # deflating it would manufacture regressions.
            old_iso_est = old[k] / INSWEEP_INFLATION if old_is_sweep else old[k]
            if iso is None:
                confirmed.append((ratio, k, new[k]))  # unmeasurable: keep flag
                print(f"REGRESSION {k}: {old[k]:.2f}s -> {new[k]:.2f}s = "
                      f"{ratio:.2f}x (isolation failed — flag stands)")
            elif iso > args.threshold * old_iso_est:
                confirmed.append((iso / old_iso_est, k, iso))
                print(f"REGRESSION {k}: {old[k]:.2f}s -> {new[k]:.2f}s in-sweep, "
                      f"{iso:.2f}s ISOLATED vs ~{old_iso_est:.2f}s est. isolated "
                      f"old = {iso / old_iso_est:.2f}x — confirmed")
            else:
                print(f"noise {k}: {old[k]:.2f}s -> {new[k]:.2f}s in-sweep "
                      f"({ratio:.2f}x) but {iso:.2f}s isolated vs "
                      f"~{old_iso_est:.2f}s est. isolated old "
                      f"({iso / old_iso_est:.2f}x) — in-sweep noise, not a regression")
        else:
            confirmed.append((ratio, k, new[k]))
            print(f"REGRESSION {k}: {old[k]:.2f}s -> {new[k]:.2f}s = {ratio:.2f}x")
    if not tripped:
        print(f"gate clean: no shared key over {args.threshold}x "
              f"(min-sec {args.min_sec})")
    elif not confirmed:
        print(f"gate clean after isolation: all {len(tripped)} flags were "
              "in-sweep noise")
    return 1 if confirmed else 0


if __name__ == "__main__":
    sys.exit(main())
