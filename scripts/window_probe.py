#!/usr/bin/env python
"""Measurement-window quality probe: single-core kernel rate + steal%.

The host carries external co-tenants whose pressure load-average cannot
see (hypervisor steal).  Calm reference: kernel >= 7 M tok/s/core and
steal < ~5%.  Run before bench.py / scaling_bench.py; don't record
round-over-round comparisons from a window that fails both.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from crumble_spark.encode import encode_flat  # noqa: E402


def jiffies():
    """(steal, busy) jiffies across all CPUs.  The probe is single-core,
    so normalizing steal against TOTAL jiffies dilutes it ~1/N on a
    mostly-idle N-core host (ADVICE r4) — busy (non-idle, non-iowait)
    jiffies is the honest denominator: while only the probe runs, busy
    ≈ the probe core's jiffies.  Still advisory: SMT-sibling and memory-
    bandwidth pressure never show up as steal at all (measured 1.3-6.1 M
    tok/s swings at near-zero steal); the kernel-rate floor carries the
    verdict."""
    with open("/proc/stat") as fh:
        v = [int(x) for x in fh.readline().split()[1:9]]
    busy = sum(v) - v[3] - v[4]  # drop idle + iowait
    return v[7], busy


def measure() -> dict:
    """One probe measurement: {'rate', 'steal', 'load', 'verdict'} —
    callable from other scripts (scaling_bench gates runs on it,
    VERDICT r5 #5) as well as the CLI below."""
    rng = np.random.default_rng(7)
    lens = rng.integers(200, 2000, 2000)
    offs = np.zeros(len(lens) + 1, np.int64)
    offs[1:] = np.cumsum(lens)
    flat = rng.integers(0, 500, offs[-1]).astype(np.int32)
    encode_flat(flat, offs, 4096)  # warm
    j0 = jiffies()
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        encode_flat(flat, offs, 4096)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    j1 = jiffies()
    steal = 100.0 * (j1[0] - j0[0]) / max(1, j1[1] - j0[1])
    rate = offs[-1] / best / 1e6
    floor = float(os.environ.get("PROBE_CALM_FLOOR", "6.5"))
    return {
        "rate": round(rate, 2),
        "steal": round(steal, 1),
        "load": round(os.getloadavg()[0], 2),
        "verdict": "CALM" if rate >= floor and steal < 8 else "NOISY",
    }


def main() -> None:
    p = measure()
    print(
        f"kernel {p['rate']:.2f} M tok/s/core  steal {p['steal']:.1f}%  "
        f"load {p['load']:.2f}  verdict: {p['verdict']}"
    )


if __name__ == "__main__":
    main()
