"""Codec 1 — CONSTANT: a whole block of one repeated value (4 bytes total).

Degenerate run case: crumble's output is dominated by constant-quality runs
(crumble.1:560-562 worked example); here a constant block costs one word.
"""

from __future__ import annotations

import numpy as np


def encode(arr: np.ndarray) -> bytes:
    return np.int32(arr[0]).tobytes()


def decode(buf: bytes, n: int) -> np.ndarray:
    v = np.frombuffer(buf, dtype="<i4", count=1)[0]
    return np.full(n, v, dtype=np.int32)


SIZE = 4
