"""Vectorized bit-packing primitives (numpy only, pure integer ops).

Every codec that stores fixed-width codes (dict indexes, FOR offsets,
zig-zag deltas, RLE values/lengths) goes through these two functions.
Bit order is little-endian within and across bytes, so a width-w stream of
n values occupies ceil(n*w/8) bytes exactly.

Reference analogue: crumble's transforms shrink the *value range* so that
the downstream CRAM entropy coder packs tighter (snp_score.c:803-834,
231-247); here the packing itself is explicit and lossless.
"""

from __future__ import annotations

import numpy as np


def width_for(max_value: int) -> int:
    """Smallest bit width that can represent max_value (>=0). 0 for 0."""
    if max_value < 0:
        raise ValueError("width_for expects non-negative values")
    return int(max_value).bit_length()


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers into a little-endian bitstream.

    values: any integer dtype, all 0 <= v < 2**width, width <= 32.
    Fully vectorized: unpack each value's low `width` bits, concatenate,
    repack to bytes.
    """
    if width == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64 unsupported")
    nbytes = 4 if width <= 32 else 8
    v = np.ascontiguousarray(values, dtype=f"<u{nbytes}")
    if v.size == 0:
        return b""
    # touch only ceil(width/8) bytes per value — memory traffic is the
    # scaling bottleneck when many cores encode concurrently
    nb = (width + 7) // 8
    lo = v.view(np.uint8).reshape(-1, nbytes)[:, :nb]
    if width == nb * 8:
        # byte-aligned widths (8/16/24/32): the sliced little-endian bytes
        # ARE the bitstream — skip the unpack/pack round trip entirely
        return lo.tobytes()
    bits = np.unpackbits(lo, axis=1, bitorder="little")
    return np.packbits(bits[:, :width].ravel(), bitorder="little").tobytes()


def unpack(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of pack(): recover n values (uint32, or uint64 if width>32)."""
    nbytes = 4 if width <= 32 else 8
    if width == 0:
        return np.zeros(n, dtype=np.uint32)
    if n == 0:
        return np.zeros(0, dtype=f"<u{nbytes}")
    raw = np.frombuffer(buf, dtype=np.uint8)
    bits = np.unpackbits(raw, bitorder="little")[: n * width].reshape(n, width)
    nb = (width + 7) // 8
    pad = np.zeros((n, nb * 8), dtype=np.uint8)
    pad[:, :width] = bits
    packed = np.packbits(pad.ravel(), bitorder="little").reshape(n, nb)
    out = np.zeros(n, dtype=f"<u{nbytes}")
    out.view(np.uint8).reshape(n, nbytes)[:, :nb] = packed
    return out


def zigzag(deltas: np.ndarray) -> np.ndarray:
    """Map signed int64 deltas to unsigned (0,-1,1,-2 -> 0,1,2,3)."""
    d = deltas.astype(np.int64)
    return ((d << 1) ^ (d >> 63)).astype(np.uint64)


def unzigzag(u: np.ndarray) -> np.ndarray:
    v = u.astype(np.uint64)
    return ((v >> np.uint64(1)).astype(np.int64)) ^ -(v & np.uint64(1)).astype(np.int64)
