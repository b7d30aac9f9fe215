"""Codec 3 — dictionary + bit-packed indexes, with optional escape code.

Generalizes crumble's bin2[] binary quantisation table (snp_score.c:231-247)
— a 2-entry dictionary — to k entries, and its preserve_qual[] keep-value
exceptions (snp_score.c:2362-2375, -k/-K flags) to an FSST-style escape
code: rare values outside the top-k table are emitted as code k and their
exact value stored verbatim in a side stream, so round-trip stays
bit-identical.

Layout (little-endian):
    u16 k | u8 width | u8 flags(bit0=escape) | [u32 n_esc if escape]
    | k * i4 table | pack(codes, width) | [n_esc * i4 escaped values]
"""

from __future__ import annotations

import struct

import numpy as np

from .. import bitpack

_HDR = struct.Struct("<HBB")
_ESC = struct.Struct("<I")

MAX_TABLE = 4096  # beyond this a dictionary stops paying for itself


def plan(counts_desc: np.ndarray, n: int) -> tuple[int, bool, int]:
    """Pick the table size minimizing exact encoded bytes.

    counts_desc: occurrence counts of distinct values, descending.
    Returns (k, use_escape, exact_size). Candidates: full dictionary and
    top-k + escape for k in powers of two.
    """
    card = len(counts_desc)
    best = (card, False, full_size(card, n)) if card <= MAX_TABLE else None
    if card > 1:
        cum = np.cumsum(counts_desc)
        k = 1
        while k < min(card, MAX_TABLE):
            n_esc = int(n - cum[k - 1])
            sz = escape_size(k, n, n_esc)
            if best is None or sz < best[2]:
                best = (k, True, sz)
            k <<= 1
    assert best is not None
    return best


def full_size(k: int, n: int) -> int:
    return _HDR.size + 4 * k + (n * bitpack.width_for(k - 1) + 7) // 8


def escape_size(k: int, n: int, n_esc: int) -> int:
    return (
        _HDR.size + _ESC.size + 4 * k
        + (n * bitpack.width_for(k) + 7) // 8
        + 4 * n_esc
    )


def encode(
    arr: np.ndarray,
    k: int | None = None,
    use_escape: bool | None = None,
    values: np.ndarray | None = None,
    counts: np.ndarray | None = None,
) -> bytes:
    a = np.asarray(arr, dtype=np.int64)
    if values is None or counts is None:
        values, counts = np.unique(a, return_counts=True)
    # values is sorted unique → inverse via binary search (cheaper than a
    # second full sort when the caller already computed stats)
    inverse = np.searchsorted(values, a)
    order = np.argsort(-counts, kind="stable")
    if k is None or use_escape is None:
        k, use_escape, _ = plan(counts[order], len(a))
    if not use_escape:
        table = values  # np.unique order; inverse already indexes it
        width = bitpack.width_for(k - 1)
        return (
            _HDR.pack(k, width, 0)
            + table.astype("<i4").tobytes()
            + bitpack.pack(inverse, width)
        )
    # top-k table by frequency; everything else escapes (code == k)
    rank_of = np.empty(len(values), dtype=np.int64)
    rank_of[order] = np.arange(len(values))
    codes = rank_of[inverse]
    esc_mask = codes >= k
    codes = np.where(esc_mask, k, codes)
    escaped = a[esc_mask]
    table = values[order[:k]]
    width = bitpack.width_for(k)
    return (
        _HDR.pack(k, width, 1)
        + _ESC.pack(len(escaped))
        + table.astype("<i4").tobytes()
        + bitpack.pack(codes, width)
        + escaped.astype("<i4").tobytes()
    )


def decode(buf: bytes, n: int) -> np.ndarray:
    k, width, flags = _HDR.unpack_from(buf, 0)
    off = _HDR.size
    if flags & 1:
        (n_esc,) = _ESC.unpack_from(buf, off)
        off += _ESC.size
    table = np.frombuffer(buf, dtype="<i4", count=k, offset=off)
    off += 4 * k
    nbytes = (n * width + 7) // 8
    codes = bitpack.unpack(buf[off : off + nbytes], n, width).astype(np.int64)
    off += nbytes
    if flags & 1:
        escaped = np.frombuffer(buf, dtype="<i4", count=n_esc, offset=off)
        out = np.empty(n, dtype=np.int32)
        esc_mask = codes == k
        out[~esc_mask] = table[codes[~esc_mask]]
        out[esc_mask] = escaped
        return out
    return table[codes].astype(np.int32, copy=False)
