"""Random access into the encoded store: decode only the requested docs.

The encoded table is partitioned by split_id = crc32(doc_id) % n_splits
(encode.with_split_id), so a doc_id lookup knows exactly which partitions
can contain it — the filter is computed OUTSIDE the scan and lands as a
partition filter, pruning every other split's files without reading them.
This is the reference's indexed region scan (S2: samtools-style region
fetch via the BAM index, snp_score.c main loop seeks by region) applied
to the engine's own output: a compressed store you can point-query.

At 10^12 rows with n_splits=4096, a k-doc lookup touches at most k
partitions (~0.025% of the data per doc), then row-group min/max on
doc_id prunes within the partition.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .decode import decode_df


def split_of(doc_id: str, n_splits: int) -> int:
    """Python twin of encode.with_split_id's crc32 assignment."""
    return zlib.crc32(doc_id.encode()) % n_splits


def decode_docs(
    spark: SparkSession,
    enc_dir: str,
    doc_ids: list[str],
    n_splits: int | None = None,
    verify: bool = True,
) -> DataFrame:
    """Decode exactly `doc_ids` from a split_id-partitioned encoded dir.

    The split set is computed driver-side from the same crc32 the encoder
    used, so the IN-filter on the partition column prunes at file-listing
    time (PartitionFilters in the plan — asserted by test_lookup.py);
    the doc_id filter then lands as a parquet row-group predicate.

    n_splits defaults to the store's own `_crumble_meta.json` sidecar
    (written by the encode job) — a hand-passed mismatch would silently
    route lookups to the wrong partition and return partial results.
    """
    if n_splits is None:
        from .sinks import read_store_meta

        meta = read_store_meta(enc_dir)
        if meta is None:
            raise ValueError(
                f"{enc_dir} has no _crumble_meta.json sidecar; pass n_splits= "
                "explicitly (it must equal the encoder's value or lookups "
                "will silently miss)"
            )
        n_splits = int(meta["n_splits"])
    splits = sorted({split_of(d, n_splits) for d in doc_ids})
    enc = (
        spark.read.parquet(enc_dir)
        .filter(F.col("split_id").isin(splits))
        .filter(F.col("doc_id").isin(doc_ids))
    )
    return decode_df(enc, verify=verify)


def decode_docs_table(
    spark: SparkSession,
    table: str,
    doc_ids: list[str],
    n_splits: int | None = None,
    verify: bool = True,
    reader=None,
    snapshots_reader=None,
) -> DataFrame:
    """decode_docs for an Iceberg-cataloged store: the split_id IN-filter
    prunes at Iceberg partition level (manifests, not file listing), the
    doc_id filter lands on row groups.

    n_splits defaults to the `crumble.n_splits` snapshot property the
    encode job stamped (the catalog twin of the parquet sidecar) — read
    from `{table}.snapshots`, newest snapshot that carries it.  `reader`
    / `snapshots_reader` are injectable for runtime-free tests."""
    if n_splits is None:
        sr = snapshots_reader or (lambda: spark.read.table(f"{table}.snapshots"))
        rows = (
            sr()
            .select(
                "committed_at",
                # try_element_at, not element_at: under Spark 4 ANSI mode
                # (a production Iceberg session may not pin it off like
                # session.py does) a snapshot whose summary lacks the key
                # would throw MAP_KEY_DOES_NOT_EXIST instead of yielding
                # null and reaching the isNotNull filter (ADVICE r3)
                F.try_element_at(F.col("summary"), F.lit("crumble.n_splits")).alias("ns"),
            )
            .filter(F.col("ns").isNotNull())
            .orderBy(F.desc("committed_at"))
            .limit(1)
            .collect()
        )
        if not rows:
            raise ValueError(
                f"no snapshot of {table} carries crumble.n_splits; pass "
                "n_splits= explicitly (it must equal the encoder's value "
                "or lookups will silently miss)"
            )
        n_splits = int(rows[0]["ns"])
    rd = reader or (lambda t: spark.read.table(t))
    splits = sorted({split_of(d, n_splits) for d in doc_ids})
    enc = (
        rd(table)
        .filter(F.col("split_id").isin(splits))
        .filter(F.col("doc_id").isin(doc_ids))
    )
    return decode_df(enc, verify=verify)
