#!/usr/bin/env python
"""Driver correctness-gate simulation at the driver's own scale factor.

Mirrors what the round driver records in CORRECTNESS_r{N}.json: for every
`__spark_entry__.queries()` entry, run the Spark query AND its
`oracle_sql()` on DuckDB over the same sf parquet, compare row count,
column names, and a value hash over the column-name-sorted, row-sorted,
stringified frame.  Queries without an oracle get the weaker rows-only
check, exactly like the driver.

Usage:  SPARK_GRAFT_CPUS=16 python scripts/gate_sim.py [sf_dir]
        (default sf_dir /root/testdata/sf0.01 — the driver's gate SF)

Prints one line per query and exits nonzero on any mismatch.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _value_hash(df: pd.DataFrame) -> str:
    # stringify everything so int64 vs int32 storage differences don't
    # change the hash (the driver compares values, not physical dtypes)
    s = df.astype(str).to_csv(index=False)
    return hashlib.sha256(s.encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entry
    from crumble_spark.session import get_spark

    spark = get_spark(app="gate-sim")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        try:
            got = _norm(fn(spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001 — report, keep gating
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows (no oracle, rows-only)")
            continue
        try:
            want = _norm(con.sql(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        rows_ok = len(got) == len(want)
        cols_ok = list(got.columns) == list(want.columns)
        hash_ok = rows_ok and cols_ok and _value_hash(got) == _value_hash(want)
        if rows_ok and cols_ok and hash_ok:
            print(f"ok    {name}: {len(got)} rows, hash match")
        else:
            print(
                f"FAIL  {name}: rows {len(got)}/{len(want)} cols_ok={cols_ok} "
                f"hash_ok={hash_ok}"
            )
            if not cols_ok:
                print(f"      spark cols: {list(got.columns)}")
                print(f"      oracle cols: {list(want.columns)}")
            n_fail += 1
    print(f"\n{len(qs)} queries, {n_fail} failures")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
