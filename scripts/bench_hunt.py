#!/usr/bin/env python
"""Repeated bench.py passes with window telemetry; picks the best calm pass.

The host carries bursty co-tenant load (CLAUDE.md: 2-3x wall-clock noise),
so a single bench.py read is a window sample, not an engine measurement.
r4/r5 methodology, now scripted: run many passes spread over time, keep
each pass's inline probe/steal fields (bench.py embeds them), and report
  * best_pass        — lowest q1 across ALL passes (the historical metric)
  * best_calm_pass   — lowest q1 among passes whose START probe cleared
                       PROBE_CALM_FLOOR (default 6.5 M tok/s/core), the
                       honest headline: a fast q1 in a noisy window is as
                       confounded as a slow one in a calm window.

Each pass is a fresh subprocess (fresh JVM).  All pass JSONs are appended
to the --log file so the full sequence is auditable, never hand-picked.

Usage: python scripts/bench_hunt.py [--passes 12] [--sleep 30]
                                    [--log .cache/bench_hunt.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CALM_FLOOR = float(os.environ.get("PROBE_CALM_FLOOR", "6.5"))


def run_pass() -> dict | None:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                r = json.loads(line)
            except ValueError:
                continue
            # Only accept a bench.py result line — any other JSON emitted
            # on stdout (ADVICE r6) must not crash the multi-hour hunt
            # with a KeyError downstream.
            if (
                isinstance(r, dict)
                and isinstance(r.get("queries"), dict)
                and "q1_encode" in r["queries"]
            ):
                return r
    sys.stderr.write(out.stderr[-2000:])
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=12)
    ap.add_argument("--sleep", type=float, default=30.0)
    ap.add_argument("--log", default=os.path.join(REPO, ".cache", "bench_hunt.jsonl"))
    args = ap.parse_args()

    os.makedirs(os.path.dirname(args.log), exist_ok=True)
    results: list[dict] = []
    for i in range(args.passes):
        r = run_pass()
        if r is None:
            print(f"pass {i + 1}: bench.py failed, skipping", file=sys.stderr)
            continue
        r["pass"] = i + 1
        r["ts"] = time.time()
        with open(args.log, "a") as fh:
            fh.write(json.dumps(r) + "\n")
        q1 = r["queries"]["q1_encode"]
        print(
            f"pass {i + 1}: q1 {q1:.3f}s  {r['value'] / 1e6:.2f} M tok/s"
            f"  probe_start {r.get('probe_mtoks_core_start')}"
            f"  steal {r.get('steal_pct')}%",
            file=sys.stderr,
        )
        results.append(r)
        if i + 1 < args.passes:
            time.sleep(args.sleep)

    if not results:
        raise SystemExit("no successful passes")
    best = min(results, key=lambda r: r["queries"]["q1_encode"])
    if any(r.get("probe_mtoks_core_start") is None for r in results):
        # An old bench.py without the probe field would otherwise be
        # silently classified noisy, leaving best_calm_pass null with no
        # explanation (ADVICE r6).
        print(
            "warning: some passes lack probe_mtoks_core_start "
            "(old bench.py?) — they are treated as NOISY",
            file=sys.stderr,
        )
    calm = [
        r
        for r in results
        if (r.get("probe_mtoks_core_start") or 0) >= CALM_FLOOR
    ]
    best_calm = min(calm, key=lambda r: r["queries"]["q1_encode"]) if calm else None
    print(
        json.dumps(
            {
                "n_passes": len(results),
                "n_calm_passes": len(calm),
                "calm_floor_mtoks": CALM_FLOOR,
                "best_pass": best,
                "best_calm_pass": best_calm,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
