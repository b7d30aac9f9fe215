"""spark-submit entry: read tokens table → encode → write encoded +
lineage, resumable.  (crumble `main`/`transcode` analogue, minus the CLI
option zoo — config is the EncodeConfig dataclass, presets TBD.)

Usage:
    spark-submit --py-files crumble_spark.zip -m crumble_spark.job \
        --input <parquet-or-iceberg> --output <dir> [--resume]

Sink: Iceberg (`--format iceberg`) when the runtime has the Iceberg Spark
connector on the classpath; parquet with dynamic partition overwrite
otherwise (this sandbox).  Both give idempotent per-split re-writes.
"""

from __future__ import annotations

import argparse
import dataclasses
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import DEFAULT_BLOCK_SIZE, lineage
from .encode import with_split_id
from .partitioning import encode_df_skewaware


@dataclass
class EncodeConfig:
    block_size: int = DEFAULT_BLOCK_SIZE
    n_splits: int = 256
    giant_threshold: int = 262_144


# preset bundles, the analogue of crumble's -1..-9 macro levels
# (snp_score.c:2380-2482): smaller blocks react faster to regime changes
# (better ratio on mixed data), bigger blocks amortize headers (faster,
# better on uniform data); split counts scale with intended input size.
PRESETS = {
    1: EncodeConfig(block_size=256, n_splits=64),       # small/latency
    3: EncodeConfig(block_size=512, n_splits=128),
    5: EncodeConfig(block_size=1024, n_splits=256),     # default
    7: EncodeConfig(block_size=2048, n_splits=1024),
    9: EncodeConfig(block_size=4096, n_splits=4096),    # 100 TB bulk
}


def run_encode_job(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    cfg: EncodeConfig | None = None,
    resume: bool = True,
    sink: str = "parquet",
    table_reader=None,
    writer_factory=None,
) -> dict:
    """Encode `df` into {out_dir}/encoded (partitioned by split_id) with
    lineage rows in {out_dir}/lineage. Returns run summary.

    sink="iceberg" treats out_dir as a catalog table name and writes via
    sinks.write_encoded_iceberg (needs the Iceberg runtime; see README).
    `table_reader(name) -> DataFrame` / `writer_factory(df, name)` inject
    the catalog IO so the whole table-in/table-out job is testable without
    the runtime (tests/test_sinks.py round-trips it)."""
    from . import sinks

    cfg = cfg or EncodeConfig()
    run_id = run_id or uuid.uuid4().hex[:12]
    enc_dir = f"{out_dir}/encoded"
    lin_dir = f"{out_dir}/lineage"

    if sink == "iceberg":
        lin_dir = f"{out_dir}_lineage"
    read_table = table_reader or (lambda name: spark.read.table(name))

    def read_lineage():
        if sink == "iceberg":
            return read_table(lin_dir)
        return spark.read.parquet(lin_dir)

    df = with_split_id(df, cfg.n_splits)
    done = lineage.completed_splits(spark, lin_dir, reader=read_lineage) if resume else None
    todo = lineage.filter_resume(df, done)

    enc = encode_df_skewaware(
        todo, block_size=cfg.block_size, n_splits=cfg.n_splits,
        giant_threshold=cfg.giant_threshold,
    )

    def wf(table):
        # sinks take factory(df); bind the table name per call site
        return (lambda d: writer_factory(d, table)) if writer_factory else None

    if sink == "iceberg":
        sinks.write_encoded_iceberg(
            enc, out_dir, run_id, writer_factory=wf(out_dir), n_splits=cfg.n_splits
        )
        enc_written = read_table(out_dir)
    else:
        sinks.write_encoded_parquet(enc, enc_dir, n_splits=cfg.n_splits)
        enc_written = spark.read.parquet(enc_dir)
    if done is not None:
        enc_written = enc_written.join(F.broadcast(done), "split_id", "left_anti")
    lin = lineage.lineage_from_encoded(enc_written, run_id)
    if sink == "iceberg":
        sinks.append_lineage_iceberg(lin, lin_dir, writer_factory=wf(lin_dir))
    else:
        lin.write.mode("append").parquet(lin_dir)

    summary = (
        read_lineage()
        .agg(
            F.countDistinct("split_id").alias("splits"),
            F.sum("n_rows").alias("rows"),
            F.sum("n_tokens").alias("tokens"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("bytes_out").alias("bytes_out"),
        )
        .collect()[0]
        .asDict()
    )
    summary["run_id"] = run_id
    return summary


def main() -> None:
    from .session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--block-size", type=int, default=None)
    ap.add_argument("--n-splits", type=int, default=None)
    ap.add_argument("--preset", type=int, default=5, choices=sorted(PRESETS))
    ap.add_argument(
        "--format",
        choices=("parquet", "iceberg"),
        default="parquet",
        help="parquet dirs (default) or Iceberg catalog tables for BOTH "
        "--input and --output (requires the Iceberg Spark runtime; see README)",
    )
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument(
        "--direct",
        action="store_true",
        help="pyarrow-direct throughput path (sources/parquet_direct)",
    )
    ap.add_argument(
        "--verify",
        action="store_true",
        help="decode the written output and check every row's "
        "block-combinable hash (crumble's conservation check as a flag)",
    )
    args = ap.parse_args()

    spark = get_spark(app="crumble-spark-encode")
    # replace, never mutate: PRESETS entries are shared process-wide
    overrides = {}
    if args.block_size:
        overrides["block_size"] = args.block_size
    if args.n_splits:
        overrides["n_splits"] = args.n_splits
    cfg = dataclasses.replace(PRESETS[args.preset], **overrides)
    if args.direct:
        from .sources.parquet_direct import encode_job_direct

        lin = encode_job_direct(
            spark, args.input, args.output, block_size=cfg.block_size,
            n_splits=cfg.n_splits, resume=not args.no_resume,
        )
        print(lin.groupBy("status").count().collect())
        if args.verify:
            from .sources.parquet_direct import decode_verify_direct

            totals = decode_verify_direct(spark, f"{args.output}/encoded")
            print(f"verified: {totals}")
    else:
        if args.format == "iceberg":
            # table-in/table-out: the input is an Iceberg catalog table,
            # symmetric with the sink (BASELINE input contract)
            from . import sinks

            df = sinks.read_tokens_iceberg(spark, args.input)
        else:
            df = spark.read.parquet(args.input)
        print(
            run_encode_job(
                spark, df, args.output, cfg=cfg, resume=not args.no_resume,
                sink=args.format,
            )
        )
        if args.verify:
            from .decode import decode_df

            enc = (
                spark.read.table(args.output)
                if args.format == "iceberg"
                else spark.read.parquet(f"{args.output}/encoded")
            )
            n = decode_df(enc, verify=True).count()  # raises on any mismatch
            print(f"verified: {n} rows round-trip bit-identical")


if __name__ == "__main__":
    main()
