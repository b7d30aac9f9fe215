#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule: >=0.8 between N and 4N).

No real cluster exists in this sandbox, so the two "cluster sizes" are two
local parallelism levels running the *same* encode job on the *same*
deterministic input: local[N] and local[4N] (default 8 vs 32).  Each level
runs in its own subprocess (fresh JVM) so nothing is shared or cached
between them.  Throughput excludes JVM/python-worker warmup (a cluster
amortizes startup across hours, and the north rule concerns throughput
scaling, not boot time).

Window gating (VERDICT r5 #5): the host carries bursty co-tenant load, so
every measurement cycle is pre-qualified by the single-core kernel probe
(scripts/window_probe.py) — NOISY windows are skipped, not recorded, and
each counted cycle runs its N / 4N pair back-to-back inside one CALM
window with a post-pair probe confirming the window held.  The JSON
output carries BOTH the best-of-each-level efficiency (the old metric)
and the calmest same-pass pairing (pre+post probes calm, highest min
probe rate) — r5's 0.815 best-of vs 0.937 calm-pair gap was pure window
selection, so the calm pair is the honest headline.

Writes results to stdout as JSON and appends a markdown row usable in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import window_probe  # noqa: E402

WORKER = r"""
import json, shutil, sys, time
sys.path.insert(0, sys.argv[4])
import pandas as pd
from pyspark.sql import functions as F
from crumble_spark.session import get_spark
from crumble_spark.sources import parquet_direct as direct

def jif():
    try:
        with open("/proc/stat") as fh:
            v = [int(x) for x in fh.readline().split()[1:9]]
        return v[7], sum(v)
    except Exception:
        return None

master, tok_path, out = sys.argv[1], sys.argv[2], sys.argv[3]
spark = get_spark(app=f"scaling-{master}", master=master)
spark.sparkContext.setLogLevel("ERROR")
tok = spark.read.parquet(tok_path)
n_tokens = tok.agg(F.sum(F.col("n_tok").cast("long"))).collect()[0][0]

def noop(batches):
    for p in batches:
        yield pd.DataFrame({"n": [len(p)]})

tok.limit(2000).mapInPandas(noop, schema="n long").collect()  # warm python workers

shutil.rmtree(out, ignore_errors=True)
j0 = jif()
t0 = time.perf_counter()
direct.encode_job_direct(spark, tok_path, out, block_size=4096, n_splits=64, resume=False)
dt = time.perf_counter() - t0
j1 = jif()
steal = round(100.0 * (j1[0] - j0[0]) / (j1[1] - j0[1]), 1) if j0 and j1 and j1[1] > j0[1] else None
print(json.dumps({"sec": dt, "tokens": int(n_tokens), "steal_pct": steal}))
spark.stop()
"""


def ensure_input(n_rows: int) -> str:
    # 256 files: split granularity must exceed the largest core count
    # under test, else the bigger "cluster" idles (task-count ceiling)
    path = f"{CACHE}/scaling_tokens_{n_rows}_p256"
    if not os.path.exists(path):
        from crumble_spark import synth
        from crumble_spark.session import get_spark

        spark = get_spark(app="scaling-gen")
        spark.sparkContext.setLogLevel("ERROR")
        synth.synth_table(spark, n_rows, seed=42, mean_len=1024, parts=256).write.mode(
            "overwrite"
        ).parquet(path)
        spark.stop()
    return path


def run_level(master: str, tok_path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, master, tok_path, f"{CACHE}/scaling_out", REPO],
        capture_output=True,
        text=True,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"worker {master} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(os.environ.get("SCALING_N", "8"))
    rows = int(os.environ.get("SCALING_ROWS", "480000"))
    cycles_wanted = int(os.environ.get("SCALING_REPS", "2"))
    max_attempts = int(os.environ.get("SCALING_MAX_ATTEMPTS", str(cycles_wanted * 6)))
    skip_sleep = float(os.environ.get("SCALING_SKIP_SLEEP", "20"))
    tok_path = ensure_input(rows)

    best: dict[int, dict] = {}
    passes: list[dict] = []
    skipped = 0
    attempts = 0
    while len(passes) < cycles_wanted and attempts < max_attempts:
        attempts += 1
        pre = window_probe.measure()
        if pre["verdict"] != "CALM":
            skipped += 1
            print(
                f"skip: NOISY window (probe {pre['rate']} M/core, steal {pre['steal']}%)",
                file=sys.stderr,
            )
            time.sleep(skip_sleep)
            continue
        # calm window: run the pair back-to-back; alternate order per cycle
        # so a slow drift cannot systematically favor one level
        order = [n, 4 * n] if len(passes) % 2 == 0 else [4 * n, n]
        pair: dict[int, dict] = {}
        for level in order:
            r = run_level(f"local[{level}]", tok_path)
            r["tokens_per_sec"] = round(r["tokens"] / r["sec"])
            pair[level] = r
            print(
                f"local[{level}]: {r['sec']:.2f}s  {r['tokens_per_sec']:,} tok/s"
                f"  steal={r.get('steal_pct')}%",
                file=sys.stderr,
            )
        post = window_probe.measure()
        eff = round(pair[4 * n]["tokens_per_sec"] / pair[n]["tokens_per_sec"] / 4, 3)
        calm_pair = post["verdict"] == "CALM"
        passes.append(
            {
                "order": order,
                f"sec_local{n}": round(pair[n]["sec"], 2),
                f"sec_local{4 * n}": round(pair[4 * n]["sec"], 2),
                f"steal_local{n}": pair[n].get("steal_pct"),
                f"steal_local{4 * n}": pair[4 * n].get("steal_pct"),
                "probe_pre": pre["rate"],
                "probe_post": post["rate"],
                "calm_pair": calm_pair,
                "efficiency": eff,
            }
        )
        print(
            f"pass {len(passes)}: eff {eff}  probe {pre['rate']}->{post['rate']}"
            f"  {'CALM' if calm_pair else 'window degraded mid-pass'}",
            file=sys.stderr,
        )
        for level, r in pair.items():
            prev = best.get(level)
            if prev is None or r["sec"] < prev["sec"]:
                best[level] = r

    if not passes:
        raise SystemExit(
            f"no CALM window in {attempts} attempts — rerun later "
            "(recording a NOISY-window number would be noise, not evidence)"
        )
    best_eff = round(best[4 * n]["tokens_per_sec"] / best[n]["tokens_per_sec"] / 4, 3)
    calm_passes = [p for p in passes if p["calm_pair"]]
    # STRICTLY calm, null when no pass's window verifiably held — the same
    # no-silent-fallback rule as scaling_aggregate.py (ADVICE r6): a NOISY
    # pass must never be reported under a calm-named key.  Super-unity
    # efficiency (> 1.0 from N to 4N cores) is physically impossible for
    # this CPU-bound kernel and proves the N side ate a squeeze the probe
    # cannot see — such passes stay in the full pass log but are likewise
    # never promoted under the calm key (mirrors scaling_aggregate.py).
    plausible = [p for p in calm_passes if p["efficiency"] <= 1.0]
    calmest = (
        max(plausible, key=lambda p: min(p["probe_pre"], p["probe_post"]))
        if plausible
        else None
    )
    print(
        json.dumps(
            {
                "n_cores": n,
                "n4_cores": 4 * n,
                "tokens": best[n]["tokens"],
                f"sec_local{n}": round(best[n]["sec"], 2),
                f"sec_local{4 * n}": round(best[4 * n]["sec"], 2),
                f"tput_local{n}": best[n]["tokens_per_sec"],
                f"tput_local{4 * n}": best[4 * n]["tokens_per_sec"],
                f"steal_local{n}": best[n].get("steal_pct"),
                f"steal_local{4 * n}": best[4 * n].get("steal_pct"),
                "scaling_efficiency": best_eff,
                "calmest_pass_efficiency": (
                    calmest["efficiency"] if calmest else None
                ),
                "calmest_pass": calmest,
                "n_passes": len(passes),
                "n_skipped_noisy": skipped,
                "passes": passes,
            }
        )
    )


if __name__ == "__main__":
    main()
