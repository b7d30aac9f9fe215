#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule: >=0.8 between N and 4N).

No real cluster exists in this sandbox, so the two "cluster sizes" are two
local parallelism levels running the *same* encode job on the *same*
deterministic input: local[N] and local[4N] (default 8 vs 32).  Each level
runs in its own subprocess (fresh JVM) so nothing is shared or cached
between them.  Throughput excludes JVM/python-worker warmup (a cluster
amortizes startup across hours, and the north rule concerns throughput
scaling, not boot time).

Writes results to stdout as JSON and appends a markdown row usable in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".cache")

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
        sys.path.insert(0, REPO)
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
    reps = int(os.environ.get("SCALING_REPS", "2"))
    tok_path = ensure_input(rows)
    # the sandbox host carries bursty external load (co-tenants): alternate
    # levels A/B/B/A and keep the best run per level, so a noise burst
    # cannot land on one level only
    order = ([n, 4 * n, 4 * n, n] * reps)[: 2 * reps]
    results = {}
    for level in order:
        r = run_level(f"local[{level}]", tok_path)
        r["tokens_per_sec"] = round(r["tokens"] / r["sec"])
        prev = results.get(level)
        if prev is None or r["sec"] < prev["sec"]:
            results[level] = r
        print(
            f"local[{level}]: {r['sec']:.2f}s  {r['tokens_per_sec']:,} tok/s"
            f"  steal={r.get('steal_pct')}%",
            file=sys.stderr,
        )
    eff = results[4 * n]["tokens_per_sec"] / results[n]["tokens_per_sec"] / 4
    print(
        json.dumps(
            {
                "n_cores": n,
                "n4_cores": 4 * n,
                "tokens": results[n]["tokens"],
                f"sec_local{n}": round(results[n]["sec"], 2),
                f"sec_local{4 * n}": round(results[4 * n]["sec"], 2),
                f"tput_local{n}": results[n]["tokens_per_sec"],
                f"tput_local{4 * n}": results[4 * n]["tokens_per_sec"],
                f"steal_local{n}": results[n].get("steal_pct"),
                f"steal_local{4 * n}": results[4 * n].get("steal_pct"),
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
