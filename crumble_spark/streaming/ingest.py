"""Continuous encode of arriving token shards.

readStream(file source) → foreachBatch(batch encode + lineage append).
`availableNow` drains everything present and stops — the cron-friendly
incremental mode; drop the trigger for a long-running ingester.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .. import DEFAULT_BLOCK_SIZE, lineage
from ..encode import encode_df
from ..schema import TOKENS_SCHEMA


def encode_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    block_size: int = DEFAULT_BLOCK_SIZE,
    n_splits: int = 256,
    available_now: bool = True,
    await_termination: bool = True,
):
    """Encode newly arrived parquet shards from in_dir into
    {out_dir}/encoded, one lineage row set per micro-batch."""
    # layout guard: pre-r2 runs appended bare part files into encoded/;
    # mixing them with the batch=<id> partition dirs would make every
    # later read fail with 'conflicting directory structures' — refuse
    # up front with a actionable message instead
    import glob
    import os

    legacy = glob.glob(os.path.join(out_dir, "encoded", "part-*"))
    if legacy:
        raise ValueError(
            f"{out_dir}/encoded contains {len(legacy)} bare part files from "
            "the pre-batch-partition layout; move them into a batch=-1/ "
            "subdirectory (or start a fresh out_dir) before resuming"
        )

    stream = (
        spark.readStream.schema(TOKENS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(in_dir)
    )

    def handle(batch_df, batch_id: int) -> None:
        # persist: the encoded batch feeds both the sink and the lineage
        # aggregation — without it the kernel would run twice
        enc = encode_df(batch_df, block_size=block_size, n_splits=n_splits).persist()
        # exactly-once despite foreachBatch's at-least-once replay: each
        # micro-batch owns the batch=<id> partition and dynamic-overwrites
        # it, so a batch replayed after a post-write/pre-commit crash
        # replaces its own previous output instead of duplicating it
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                enc.withColumn("batch", F.lit(batch_id))
                .write.partitionBy("batch")
                .mode("overwrite")
                .parquet(f"{out_dir}/encoded")
            )
            lin = lineage.lineage_from_encoded(enc, run_id=f"stream-{batch_id}")
            (
                lin.withColumn("batch", F.lit(batch_id))
                .write.partitionBy("batch")
                .mode("overwrite")
                .parquet(f"{out_dir}/lineage")
            )
        finally:
            enc.unpersist()

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", f"{out_dir}/_checkpoint"
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if await_termination:
        q.awaitTermination()
    return q
