"""Watermarked windowed aggregation over the events stream.

The streaming twin of `pipeline.relational.q_events_hourly`: readStream →
withWatermark → tumbling window groupBy.  The watermark bounds state (a
window's partial aggregate is dropped once the event-time high-water mark
passes window_end + delay), which is what lets this run forever at
100 TB/day — without it the state store grows with every hour ever seen.

Cents are floored per row before summing (integer sums are order-free, so
the streaming result is bit-equal to the batch rollup — asserted in
tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def hourly_rollup_stream(
    spark: SparkSession,
    in_dir: str,
    watermark: str = "2 hours",
    query_name: str = "events_hourly_stream",
    output_mode: str = "append",
    max_files_per_trigger: int | None = None,
):
    """Start the streaming rollup into an in-memory sink; returns the
    StreamingQuery.  availableNow drains what exists and stops — the
    incremental/cron mode; drop the trigger for continuous operation.

    output_mode `append` (default, the production mode) emits a window
    exactly once, when the watermark passes window_end + delay — that
    watermark-driven state DROP is what lets this run forever at
    100 TB/day.  `complete` re-emits every window each trigger (handy
    for bounded equivalence tests; state never shrinks, so never use it
    on an unbounded stream).  max_files_per_trigger splits a bounded
    input into multiple micro-batches so the watermark actually advances
    between them (append emits nothing if all data lands in one batch).
    """
    if output_mode == "append" and max_files_per_trigger is None:
        # append emits a window only when a LATER batch's watermark closes
        # it — this function always drains with availableNow, so a bounded
        # input consumed in one micro-batch yields ZERO rows.  That reads
        # as silent data loss, so it is an error, not a warning (ADVICE
        # r3: a caller relying on the old 'complete' default would
        # otherwise get an empty result signaled only via warnings.warn).
        raise ValueError(
            "hourly_rollup_stream in append mode requires max_files_per_trigger: "
            "a bounded input processed in a single micro-batch emits NO rows "
            "(the watermark never advances within a batch); set "
            "max_files_per_trigger to split batches, or output_mode='complete' "
            "for bounded equivalence checks"
        )
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    cents = F.floor(F.col("value") * 100).cast("long")
    agg = (
        stream.withWatermark("ts", watermark)
        .select(F.col("ts"), F.col("event_type"), cents.alias("cents"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("value_cents"))
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )
    return (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def batch_rollup(spark: SparkSession, events: DataFrame) -> DataFrame:
    """The bounded twin, for equivalence checks."""
    cents = F.floor(F.col("value") * 100).cast("long")
    return (
        events.select(F.window("ts", "1 hour").alias("w"), "event_type", cents.alias("cents"))
        .groupBy(F.col("w.start").alias("hour_start"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("value_cents"))
    )
