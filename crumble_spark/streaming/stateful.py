"""Custom stateful streaming operator: exact dedup across micro-batches.

applyInPandasWithState keyed by the text hash: the state store remembers
which hashes have been emitted, so a document arriving in any later
micro-batch (or later in the same batch) is dropped — the streaming twin
of `pipeline.dedup.q_dedup_exact`, with the "seen" set held in Spark's
per-key state store instead of a shuffle-wide window.

Scale shape: state is one tiny record per distinct document hash,
partitioned by the hash — exactly the key the groupBy shuffles on, so
lookups are local.  At 10^12 docs the state store itself becomes the
unbounded set, so `ttl` enables a processing-time GroupStateTimeout:
a hash not seen for the TTL expires (its state is removed) and a later
duplicate re-emits — bounded state, at the cost of missing dups farther
apart than the TTL.  Default stays NoTimeout (deterministic, exact).

Determinism: within a batch the winner is the lexicographically smallest
doc_id of the group (micro-batch row order is not guaranteed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("text_hash", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


_TTL_UNITS = {
    "ms": 1, "millisecond": 1, "second": 1000, "sec": 1000, "s": 1000,
    "minute": 60_000, "min": 60_000, "hour": 3_600_000, "h": 3_600_000,
    "day": 86_400_000, "d": 86_400_000,
}


def _ttl_ms(ttl: str | int) -> int:
    """"7 days" / "1 seconds" / "500 ms" / 5000 → milliseconds (pyspark's
    GroupState.setTimeoutDuration only accepts int ms)."""
    if isinstance(ttl, int):
        return ttl
    import re

    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]+)\s*", ttl)
    if m:
        unit = m.group(2).lower()
        # exact unit first so 'ms' resolves to millisecond, not 'm'+plural
        if unit not in _TTL_UNITS and unit.endswith("s"):
            unit = unit[:-1]
        if unit in _TTL_UNITS:
            return int(m.group(1)) * _TTL_UNITS[unit]
    raise ValueError(f"unparseable ttl {ttl!r}; use e.g. '7 days' or ms int")


def _emit_first_fn(ttl: str | int | None):
    """Build the per-key state function; `ttl` (e.g. "7 days") enables
    processing-time expiry of hashes not seen for that long."""
    ttl = _ttl_ms(ttl) if ttl is not None else None

    def _emit_first(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            # no data for this hash within the TTL: forget it — the next
            # arrival of this text re-emits (bounded-state trade-off)
            state.remove()
            return iter(())
        if state.exists:
            if ttl is not None:
                state.setTimeoutDuration(ttl)  # sighting refreshes the TTL
            return iter(())  # hash already emitted in an earlier batch
        # winner = smallest doc_id under (length, lexicographic) order,
        # which equals NUMERIC order for canonical decimal ids — matching
        # the batch twin q_dedup_exact's ORDER BY on the int64 column
        # ('10' must lose to '2'), while staying a deterministic total
        # order for any string id
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            top = (
                pdf.assign(_k=pdf["doc_id"].astype(str).str.len())
                .sort_values(["_k", "doc_id"], kind="stable")
                .iloc[0]
            )
            if best is None or (len(str(top["doc_id"])), str(top["doc_id"])) < (
                len(str(best["doc_id"])),
                str(best["doc_id"]),
            ):
                best = top
        if best is None:
            return iter(())
        state.update((True,))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        return iter(
            [
                pd.DataFrame(
                    {
                        "text_hash": [key[0]],
                        "doc_id": [best["doc_id"]],
                        "source": [best["source"]],
                    }
                )
            ]
        )

    return _emit_first


def dedup_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    await_termination: bool = True,
    ttl: str | None = None,
):
    """Continuously emit the first occurrence of each distinct text.
    Output parquet under {out_dir}/unique; checkpoint keeps the state
    store (and therefore the dedup guarantee) across restarts.

    ttl: processing-time state expiry (e.g. "7 days") — hashes idle for
    that long are forgotten so the state store stays bounded; None keeps
    exact dedup forever (NoTimeout).

    With a TTL, no-data micro-batches are disabled for this query:
    FlatMapGroupsWithStateExec under ProcessingTimeTimeout always
    reports "run another batch", so availableNow would otherwise spin
    no-data batches forever and never terminate.  Expiry therefore
    fires lazily, on the next batch that has any data — exactly when an
    expired hash could matter for dedup anyway."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(in_dir)
    keyed = stream.select(
        F.md5("text").alias("text_hash"),
        F.col("doc_id").cast("string").alias("doc_id"),
        "source",
    ).groupBy("text_hash")
    uniq = keyed.applyInPandasWithState(
        _emit_first_fn(ttl),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
    conf_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = spark.conf.get(conf_key, None)
    if ttl is not None:
        spark.conf.set(conf_key, "false")
    try:
        q = (
            uniq.writeStream.outputMode("append")
            .format("parquet")
            .option("path", f"{out_dir}/unique")
            .option("checkpointLocation", f"{out_dir}/_checkpoint")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        # the query snapshots session conf at start; restore for others
        if ttl is not None:
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)
    if await_termination:
        q.awaitTermination()
    return q
