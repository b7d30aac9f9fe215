"""The decode stage: exact inverse of encode.py, with in-job verification.

Crumble hard-errors when a record is lost (count_in == count_out,
snp_score.c:2021-2026); we hard-error when a row's decoded bytes hash
differently from the hash taken at encode time — verification as an
operator, not only a test.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import codecs, hashing
from .schema import TOKENS_SCHEMA


def decode_blocks(blocks, verify: bool = False) -> np.ndarray:
    if blocks is None or len(blocks) == 0:
        empty = np.zeros(0, dtype=np.int32)
        return (empty, 0) if verify else empty
    parts = []
    hashes = []
    for b in blocks:
        chunk = codecs.decode(b["codec_id"], bytes(b["payload"]), b["n"])
        if verify:
            hashes.append(hashing.block_hash(b["block_id"], chunk))
        parts.append(chunk)
    out = np.concatenate(parts) if parts else np.zeros(0, dtype=np.int32)
    return (out, hashing.combine(hashes)) if verify else out


def decode_pdf(pdf: pd.DataFrame, verify: bool = True) -> pd.DataFrame:
    toks_col = []
    for blocks, row_hash, doc_id in zip(pdf["blocks"], pdf["row_hash"], pdf["doc_id"]):
        if verify:
            a, h = decode_blocks(blocks, verify=True)
            if h != int(row_hash):
                raise ValueError(f"round-trip hash mismatch for doc_id={doc_id}")
        else:
            a = decode_blocks(blocks)
        toks_col.append(a)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy(),
            "tokens": toks_col,
            "n_tok": pdf["n_tok"].to_numpy().astype(np.int32),
            "source": pdf["source"].to_numpy(),
        }
    )


def decode_df(df: DataFrame, verify: bool = True) -> DataFrame:
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield decode_pdf(pdf, verify)

    return df.mapInPandas(fn, schema=TOKENS_SCHEMA)
