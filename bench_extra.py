#!/usr/bin/env python
"""Per-query isolation bench + plan capture (guide §1.4/§1.5/§7.2).

bench.py is FROZEN for the driver's measurement; this file is the
round-8 optimization instrument: each declared bench query is timed
against the noop sink (computation only, no sink cost, no .count()
column pruning), labelled via setJobDescription, and its
.explain("formatted") output written to plans/r08/<name>_<tag>.txt.

Usage:
  python bench_extra.py [tag] [query ...]
    tag     — suffix for the plan files (default "before")
    query   — subset of query names to run (default: the 8 bench queries)

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
Prints one JSON line: {"tag": ..., "queries": {name: sec}, probe/steal}.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crumble_spark.pipeline import curate, dedup, relational, simsearch, textqc  # noqa: E402
from crumble_spark.session import get_spark  # noqa: E402

PLANS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r08")

BENCH_QUERIES = {
    "q3_dedup_minhash": dedup.q_dedup_minhash,
    "q4_ann_brute_topk": simsearch.q_ann_brute_topk,
    "q5_text_fingerprint": textqc.q_fingerprint,
    "q6_rel_pricing_summary": relational.q_pricing_summary,
    "q7_curation_funnel": curate.q_clean_funnel,
    "q8_dedup_clusters": dedup.q_dedup_clusters,
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(PLANS, exist_ok=True)
    spark = get_spark(app="crumble-spark-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, float] = {}
    for name in names:
        fn = BENCH_QUERIES[name]
        df = fn(spark, sf_dir)
        with open(os.path.join(PLANS, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan_text(df))
        spark.sparkContext.setJobDescription(f"{name} [{tag}] noop")
        best = None
        for _ in range(2):
            # t0 BEFORE fn(): iterative queries (q8) do their work during
            # DataFrame construction, exactly as bench.py times them
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)

    from bench import _kernel_probe_mtoks

    extras = {"probe_mtoks_core": _kernel_probe_mtoks()}
    try:
        extras["load_avg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "queries": out, **extras}))
    spark.stop()


if __name__ == "__main__":
    main()
