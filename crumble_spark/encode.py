"""The encode stage: chunk → stats → pick codec → emit blocks, one fused
Arrow pass (mapInPandas), the engine analogue of crumble's single fused
transcode loop (snp_score.c:1336-2029): all decisions are local to a
bounded block, the transform is verified (row_hash), and a verbatim RAW
fallback bounds the worst case.

Catalyst note: the pipeline stays one narrow stage — scan → (optional
salted repartition, partitioning.py) → mapInPandas → sink.  No shuffle is
introduced by encoding itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import DEFAULT_BLOCK_SIZE, cost, hashing
from . import codecs as codecs_mod
from .schema import ENCODED_SCHEMA

BLOCK_OVERHEAD = 9  # block_id/codec_id/n stored as struct fields
# bounded-memory guard: one kernel slice never holds more than this many
# tokens, regardless of how many giant rows share an Arrow batch
# (crumble's MAX_DEPTH bail analogue, snp_score.c:92,1493-1500)
MAX_TOKENS_PER_SLICE = 8_000_000


def encode_tokens(a: np.ndarray, block_size: int = DEFAULT_BLOCK_SIZE, force_raw: bool = False):
    """Encode one token array → (blocks, bytes_out, row_hash).

    Blocks never cross row boundaries (SURVEY.md §7.6) so row round-trip
    equality is local, mirroring crumble bounding all decisions to a
    ±250bp window (snp_score.c:1229).

    force_raw: the preserve-verbatim override — crumble's -R keep-bed /
    low-mqual whole-read preserve (snp_score.c:1443-1463, 1852-1859)
    expressed as a row predicate: every block stored as codec 0.
    """
    a = np.ascontiguousarray(a, dtype=np.int32)
    blocks = []
    bytes_out = 0
    hashes = []
    for bi, off in enumerate(range(0, len(a), block_size)):
        chunk = a[off : off + block_size]
        if force_raw:
            codec_id, payload = codecs_mod.RAW, codecs_mod.encode(codecs_mod.RAW, chunk)
        else:
            codec_id, payload = cost.choose(chunk)
        blocks.append(
            {"block_id": bi, "codec_id": codec_id, "n": len(chunk), "payload": payload}
        )
        bytes_out += len(payload) + BLOCK_OVERHEAD
        hashes.append(hashing.block_hash(bi, chunk))
    return blocks, bytes_out, hashing.combine(hashes)


def encode_pdf(pdf: pd.DataFrame, block_size: int = DEFAULT_BLOCK_SIZE) -> pd.DataFrame:
    """Pure-pandas kernel (unit-testable without Spark)."""
    out = {
        "doc_id": pdf["doc_id"].to_numpy(),
        "source": pdf["source"].to_numpy(),
        "n_tok": pdf["n_tok"].to_numpy().astype(np.int32),
        "split_id": pdf["split_id"].to_numpy().astype(np.int32),
    }
    force = (
        pdf["force_raw"].to_numpy()
        if "force_raw" in pdf.columns
        else np.zeros(len(pdf), dtype=bool)
    )
    blocks_col, bout_col, hash_col = [], [], []
    for toks, fr in zip(pdf["tokens"], force):
        blocks, bytes_out, row_hash = encode_tokens(np.asarray(toks), block_size, bool(fr))
        blocks_col.append(blocks)
        bout_col.append(bytes_out)
        hash_col.append(row_hash)
    out["blocks"] = blocks_col
    out["bytes_in"] = (out["n_tok"].astype(np.int64)) * 4
    out["bytes_out"] = np.array(bout_col, dtype=np.int64)
    out["row_hash"] = np.array(hash_col, dtype=np.int64)
    return pd.DataFrame(out)


def with_split_id(df: DataFrame, n_splits: int) -> DataFrame:
    """Deterministic split assignment (crc32 of doc_id) — stable across
    runs/cluster sizes, which is what makes lineage-based resume sound,
    and reproducible JVM-side (F.crc32) AND python-side (zlib.crc32) so
    the pyarrow-direct source assigns identical splits.
    Idempotent: a df that already carries split_id passes through."""
    if "split_id" in df.columns:
        return df
    return df.withColumn(
        "split_id",
        F.pmod(F.crc32(F.col("doc_id").cast("binary")), F.lit(n_splits)).cast("int"),
    )


def encode_df(
    df: DataFrame, block_size: int = DEFAULT_BLOCK_SIZE, n_splits: int = 256
) -> DataFrame:
    """tokens table → encoded table (blocks of codec-tagged payloads)."""
    if "split_id" not in df.columns:
        df = with_split_id(df, n_splits)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for sl in bounded_slices(pdf):
                yield encode_pdf(sl, block_size)

    return df.mapInPandas(fn, schema=ENCODED_SCHEMA)


def bounded_slices(pdf: pd.DataFrame, max_tokens: int = MAX_TOKENS_PER_SLICE):
    """Split an Arrow batch into slices bounded by total token count, so a
    batch full of pathological long documents cannot blow executor memory."""
    if len(pdf) == 0:
        return
    cum = pdf["n_tok"].to_numpy().astype(np.int64).cumsum()
    start = 0
    base = 0
    for i in range(len(pdf)):
        if cum[i] - base > max_tokens and i > start:
            yield pdf.iloc[start:i]
            start = i
            base = cum[i - 1]
    yield pdf.iloc[start:]
