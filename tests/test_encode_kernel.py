"""Pure-pandas kernel tests (no Spark): encode_pdf, bounded_slices,
hashing — the pieces mapInPandas wraps."""

import numpy as np
import pandas as pd

from crumble_spark import hashing
from crumble_spark.decode import decode_blocks, decode_pdf
from crumble_spark.encode import bounded_slices, encode_pdf, encode_tokens


def _pdf(rows):
    return pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source", "split_id"])


def test_encode_pdf_roundtrip():
    rows = [
        ("a", np.arange(100, dtype=np.int32), 100, "web", 0),
        ("b", np.zeros(0, dtype=np.int32), 0, "web", 1),
        ("c", np.array([5] * 2000, dtype=np.int32), 2000, "code", 2),
    ]
    enc = encode_pdf(_pdf(rows), block_size=256)
    dec = decode_pdf(enc, verify=True)
    for (doc_id, toks, *_), got in zip(rows, dec["tokens"]):
        np.testing.assert_array_equal(got, toks)
    assert list(enc["bytes_in"]) == [400, 0, 8000]
    assert all(enc["bytes_out"] <= enc["bytes_in"] + 32)


def test_bounded_slices_caps_token_total():
    rows = [(f"d{i}", np.zeros(1000, np.int32), 1000, "web", 0) for i in range(10)]
    slices = list(bounded_slices(_pdf(rows), max_tokens=2500))
    assert sum(len(s) for s in slices) == 10
    for s in slices[:-1]:
        assert s["n_tok"].sum() <= 2500 or len(s) == 1
    # a single giant row still forms its own slice rather than being dropped
    giant = [("g", np.zeros(10_000, np.int32), 10_000, "web", 0)] + rows[:2]
    slices = list(bounded_slices(_pdf(giant), max_tokens=2500))
    assert sum(len(s) for s in slices) == 3
    assert len(slices[0]) == 1  # the giant is alone


def test_block_hash_combinable():
    a = np.arange(5000, dtype=np.int32)
    whole = hashing.row_hash(a, 1024)
    parts = [
        hashing.block_hash(bi, a[off : off + 1024])
        for bi, off in enumerate(range(0, len(a), 1024))
    ]
    assert hashing.combine(parts) == whole
    # order of combination is irrelevant (sum), block identity is not
    assert hashing.combine(reversed(parts)) == whole
    swapped = [hashing.block_hash(1, a[:1024]), hashing.block_hash(0, a[1024:2048])]
    assert hashing.combine(swapped + parts[2:]) != whole


def test_encode_tokens_block_structure():
    a = np.arange(2500, dtype=np.int32)
    blocks, bytes_out, rh = encode_tokens(a, block_size=1024)
    assert [b["block_id"] for b in blocks] == [0, 1, 2]
    assert [b["n"] for b in blocks] == [1024, 1024, 452]
    assert rh == hashing.row_hash(a, 1024)
    out, h = decode_blocks(blocks, verify=True)
    np.testing.assert_array_equal(out, a)
    assert h == rh


def test_batched_slow_path_matches_per_block_choose():
    # encode_flat's _batch_slow_plans must reproduce the per-block
    # cost.choose decision AND payload bytes exactly, for every regime
    # and for blocks that straddle the narrow/unit/general uniquing
    # classes — this is the direct equivalence pin for the r3 batching
    import numpy as np

    from crumble_spark import cost, synth
    from crumble_spark.encode import encode_flat

    rng = np.random.default_rng(7)
    arrs = []
    for i in range(120):
        regime = synth.REGIMES[i % len(synth.REGIMES)]
        arrs.append(synth.gen_tokens(rng, regime, int(rng.integers(8, 1500))).astype(np.int32))
    # adversarial extremes for the class split
    arrs.append(np.arange(1000, dtype=np.int32) * 7919)          # unit runs, wide range
    arrs.append(np.repeat(np.arange(5, dtype=np.int32), 100))     # narrow, few runs
    arrs.append(rng.integers(-(2**31), 2**31 - 1, 600).astype(np.int32))  # full int32 span
    flat = np.concatenate(arrs)
    offsets = np.concatenate(([0], np.cumsum([len(a) for a in arrs]))).astype(np.int64)

    from crumble_spark import codecs

    for block_size in (64, 512, 4096):
        blocks_per_row, _, _ = encode_flat(flat, offsets, block_size)
        for row, a in enumerate(arrs):
            for b in blocks_per_row[row]:
                s = b["block_id"] * block_size
                chunk = a[s : s + block_size]
                cid, payload = cost.choose(chunk)
                if (cid, payload) != (b["codec_id"], b["payload"]):
                    # the ONE documented divergence: exact size ties may
                    # pick different codec ids (encode_flat routes
                    # constant blocks before the argmin) — sizes must
                    # tie and both must invert bit-identically
                    assert len(payload) == len(b["payload"]), (
                        row, b["block_id"], block_size, cid, b["codec_id"])
                    np.testing.assert_array_equal(
                        codecs.decode(b["codec_id"], b["payload"], b["n"]), chunk
                    )
                    np.testing.assert_array_equal(
                        codecs.decode(cid, payload, len(chunk)), chunk
                    )
