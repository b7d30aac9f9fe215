import numpy as np
import pytest

from crumble_spark import bitpack


@pytest.mark.parametrize("width", [0, 1, 3, 7, 8, 13, 17, 31, 32])
def test_pack_roundtrip(width):
    rng = np.random.default_rng(42 + width)
    n = 1000
    hi = (1 << width) if width else 1
    vals = rng.integers(0, hi, size=n, dtype=np.uint64)
    buf = bitpack.pack(vals, width)
    assert len(buf) == (n * width + 7) // 8
    out = bitpack.unpack(buf, n, width)
    np.testing.assert_array_equal(out.astype(np.uint64), vals)


def test_pack_empty():
    assert bitpack.pack(np.zeros(0, np.uint64), 5) == b""
    assert len(bitpack.unpack(b"", 0, 5)) == 0


def test_zigzag_roundtrip():
    d = np.array([0, -1, 1, -2, 2, 2**31 - 1, -(2**31)], dtype=np.int64)
    np.testing.assert_array_equal(bitpack.unzigzag(bitpack.zigzag(d)), d)


def test_width_for():
    assert bitpack.width_for(0) == 0
    assert bitpack.width_for(1) == 1
    assert bitpack.width_for(255) == 8
    assert bitpack.width_for(256) == 9
