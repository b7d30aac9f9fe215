"""Custom stateful streaming operator: exact dedup across micro-batches.

applyInPandasWithState keyed by the text hash: the state store remembers
which hashes have been emitted, so a document arriving in any later
micro-batch (or later in the same batch) is dropped — the streaming twin
of `pipeline.dedup.q_dedup_exact`, with the "seen" set held in Spark's
per-key state store instead of a shuffle-wide window.

Scale shape: state is one tiny record per distinct document hash,
partitioned by the hash — exactly the key the groupBy shuffles on, so
lookups are local.  At 10^12 docs you'd add a TTL via GroupStateTimeout
(state for hashes not seen in N days expires); kept NoTimeout here to
stay deterministic for the tests.

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


def _emit_first(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    if state.exists:
        return iter(())  # hash already emitted in an earlier batch
    # winner = smallest doc_id under (length, lexicographic) order, which
    # equals NUMERIC order for canonical decimal ids — matching the batch
    # twin q_dedup_exact's ORDER BY on the int64 column ('10' must lose
    # to '2'), while staying a deterministic total order for any string id
    def doc_key(doc_id) -> tuple:
        s = str(doc_id)
        return (len(s), s)

    best = None
    for pdf in pdfs:
        for _, cand in pdf.iterrows():
            if best is None or doc_key(cand["doc_id"]) < doc_key(best["doc_id"]):
                best = cand
    if best is None:
        return iter(())
    state.update((True,))
    return iter(
        [pd.DataFrame({"text_hash": [key[0]], "doc_id": [best["doc_id"]], "source": [best["source"]]})]
    )


def dedup_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    await_termination: bool = True,
):
    """Continuously emit the first occurrence of each distinct text.
    Output parquet under {out_dir}/unique; checkpoint keeps the state
    store (and therefore the dedup guarantee) across restarts."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(in_dir)
    keyed = stream.select(
        F.md5("text").alias("text_hash"),
        F.col("doc_id").cast("string").alias("doc_id"),
        "source",
    ).groupBy("text_hash")
    uniq = keyed.applyInPandasWithState(
        _emit_first,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        uniq.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/unique")
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
