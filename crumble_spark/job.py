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


def run_encode_job(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    cfg: EncodeConfig = EncodeConfig(),
    resume: bool = True,
) -> dict:
    """Encode `df` into {out_dir}/encoded (partitioned by split_id) with
    lineage rows in {out_dir}/lineage. Returns run summary."""
    run_id = run_id or uuid.uuid4().hex[:12]
    enc_dir = f"{out_dir}/encoded"
    lin_dir = f"{out_dir}/lineage"

    df = with_split_id(df, cfg.n_splits)
    done = lineage.completed_splits(spark, lin_dir) if resume else None
    todo = lineage.filter_resume(df, done)

    enc = encode_df_skewaware(
        todo, block_size=cfg.block_size, n_splits=cfg.n_splits,
        giant_threshold=cfg.giant_threshold,
    )

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    enc.write.partitionBy("split_id").mode("overwrite").parquet(enc_dir)

    enc_written = spark.read.parquet(enc_dir)
    if done is not None:
        enc_written = enc_written.join(F.broadcast(done), "split_id", "left_anti")
    lin = lineage.lineage_from_encoded(enc_written, run_id)
    lin.write.mode("append").parquet(lin_dir)

    summary = (
        spark.read.parquet(lin_dir)
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
    ap.add_argument("--block-size", type=int, default=DEFAULT_BLOCK_SIZE)
    ap.add_argument("--n-splits", type=int, default=256)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app="crumble-spark-encode")
    df = spark.read.parquet(args.input)
    cfg = EncodeConfig(block_size=args.block_size, n_splits=args.n_splits)
    print(run_encode_job(spark, df, args.output, cfg=cfg, resume=not args.no_resume))


if __name__ == "__main__":
    main()
