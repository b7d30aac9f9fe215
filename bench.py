#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
  {"metric": "encode throughput (tokens/sec)", "value": N,
   "unit": "tokens/sec", "queries": {name: sec, ...}, "sf": S, ...extras}

Workload: the codec engine (encode to parquet sink, decode+verify) on a
deterministic synthetic token table (FIXTURES.md regimes incl. the skewed
long-doc tail), plus representative pipeline queries (minhash dedup, ANN
top-k, fingerprinting) on the driver-provided sf tables.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from crumble_spark import synth  # noqa: E402
from crumble_spark.pipeline import curate, dedup, relational, simsearch, textqc  # noqa: E402
from crumble_spark.session import get_spark  # noqa: E402
from crumble_spark.sources import parquet_direct  # noqa: E402

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
ROWS_PER_SF = 160_000  # sf0.1 → 16k docs ≈ 20M tokens with the skew tail


def _cpu_jiffies() -> tuple[int, int] | None:
    """(steal, total) jiffies from /proc/stat — the delta across the run
    gives steal_pct, the direct measure of hypervisor co-tenant pressure
    (load average can't see steal; a 'calm' load with high steal still
    runs 3x slow)."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()[1:]
        vals = [int(x) for x in parts[:8]]
        return vals[7], sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def _kernel_probe_mtoks() -> float:
    """Single-core kernel rate (M tok/s) on a fixed synthetic input — the
    5-second window-quality probe run inline (VERDICT r4 #5) so every
    recorded artifact carries its own normalizer: q1 divided by this rate
    compares rounds without re-litigating host noise (the host's
    co-tenant pressure swings wall-clock 2-3x and is invisible to the
    steal counter when it comes via SMT siblings / memory bandwidth).
    Same workload as scripts/window_probe.py; calm reference ≈ 7 M+."""
    import numpy as np

    from crumble_spark.encode import encode_flat

    rng = np.random.default_rng(7)
    lens = rng.integers(200, 2000, 2000)
    offs = np.zeros(len(lens) + 1, np.int64)
    offs[1:] = np.cumsum(lens)
    flat = rng.integers(0, 500, offs[-1]).astype(np.int32)
    encode_flat(flat, offs, 4096)  # warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        encode_flat(flat, offs, 4096)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(offs[-1] / best / 1e6, 2)


def sf_of(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[1])
    except Exception:
        return 0.1


def tokens_parquet(spark, sf: float) -> str:
    n_rows = max(200, int(ROWS_PER_SF * sf))
    path = f"{CACHE}/bench_tokens_{n_rows}_p128"
    if not os.path.exists(path):
        synth.synth_table(spark, n_rows, seed=42, mean_len=1024, parts=128).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_of(sf_dir)
    try:
        load_at_start = round(os.getloadavg()[0], 2)
    except OSError:
        load_at_start = None
    cpu_at_start = _cpu_jiffies()
    probe_start = _kernel_probe_mtoks()
    spark = get_spark(app="crumble-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    tok_path = tokens_parquet(spark, sf)
    tok = spark.read.parquet(tok_path)
    n_tokens = tok.agg(F.sum(F.col("n_tok").cast("long"))).collect()[0][0]

    # warm the executor python workers (JVM/worker spin-up is not part of
    # steady-state throughput; a real cluster amortizes it across hours)
    import pandas as pd

    def _noop(batches):
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    tok.mapInPandas(_noop, schema="n long").collect()

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    # q1: encode (the headline) — the pyarrow-direct job (the 100 TB hot
    # path: Spark schedules (file,row-group) splits + lineage; pyarrow
    # moves the bytes).  best-of-2: the sandbox host carries external
    # load; min is the standard noise-robust wall-clock estimator.
    out = f"{CACHE}/bench_encoded_direct"
    best = None
    for _ in range(2):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        parquet_direct.encode_job_direct(
            spark, tok_path, out, block_size=4096, n_splits=64, resume=False
        )
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    queries["q1_encode"] = best

    sizes = (
        spark.read.parquet(f"{out}/encoded")
        .agg(F.sum("bytes_in").alias("bi"), F.sum("bytes_out").alias("bo"))
        .collect()[0]
    )
    extras["compression_ratio"] = round(sizes["bi"] / max(sizes["bo"], 1), 3)

    # q2: decode + per-row block-hash verification (direct path)
    t0 = time.perf_counter()
    totals = parquet_direct.decode_verify_direct(spark, f"{out}/encoded")
    queries["q2_decode_verify"] = time.perf_counter() - t0
    assert totals["tokens"] == n_tokens

    # pipeline representatives on the provided sf tables — one per family
    # (dedup, ANN, text, relational join/agg, multi-stage curation) so a
    # regression anywhere in the non-engine half moves a tracked number
    for name, fn in (
        ("q3_dedup_minhash", dedup.q_dedup_minhash),
        ("q4_ann_brute_topk", simsearch.q_ann_brute_topk),
        ("q5_text_fingerprint", textqc.q_fingerprint),
        ("q6_rel_pricing_summary", relational.q_pricing_summary),
        ("q7_curation_funnel", curate.q_clean_funnel),
        # q8 (VERDICT r6 #4): the clustering family — iterative pointer-
        # jumping joins + localCheckpoints over the capped simhash48 edge
        # feed — is the heaviest pipeline query and needs its own round-
        # over-round latency record.  Additive key; q1-q7 stay stable.
        ("q8_dedup_clusters", dedup.q_dedup_clusters),
    ):
        best = None
        for _ in range(2):  # best-of-2, same noise discipline as q1
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = best

    tput = n_tokens / queries["q1_encode"]
    extras["decode_tokens_per_sec"] = round(n_tokens / queries["q2_decode_verify"])
    extras["n_tokens"] = int(n_tokens)
    # Measurement-window telemetry (VERDICT r3 #5): the host carries
    # external co-tenants with 2-3x wall-clock swing; a reader of the
    # recorded artifact needs the window quality alongside the numbers
    # (r3's artifact looked like a 36% regression and was load noise).
    if load_at_start is not None:
        extras["load_avg_1m_start"] = load_at_start
    # probe before AND after the spark work: a mid-run co-tenant burst
    # shows as a start/end disagreement; normalize q1 by the min
    extras["probe_mtoks_core_start"] = probe_start
    extras["probe_mtoks_core"] = _kernel_probe_mtoks()
    cpu_at_end = _cpu_jiffies()
    if cpu_at_start and cpu_at_end and cpu_at_end[1] > cpu_at_start[1]:
        steal = cpu_at_end[0] - cpu_at_start[0]
        total = cpu_at_end[1] - cpu_at_start[1]
        extras["steal_pct"] = round(100.0 * steal / total, 1)
    try:
        extras["load_avg_1m"] = round(os.getloadavg()[0], 2)
        extras["load_avg_5m"] = round(os.getloadavg()[1], 2)
    except OSError:
        pass
    try:
        with open("/proc/uptime") as fh:
            extras["uptime_sec"] = round(float(fh.read().split()[0]))
    except OSError:
        pass

    print(
        json.dumps(
            {
                "metric": "encode throughput (tokens/sec)",
                "value": round(tput),
                "unit": "tokens/sec",
                "queries": {k: round(v, 3) for k, v in queries.items()},
                "sf": sf,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
