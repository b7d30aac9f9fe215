"""Property-based round-trip tests (hypothesis): every codec and the
adaptive selector must invert exactly on arbitrary int32 arrays — the
strongest form of the north_rule invariant."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from crumble_spark import codecs, cost
from crumble_spark.encode import encode_tokens
from crumble_spark.decode import decode_blocks

int32s = st.integers(min_value=-(2**31), max_value=2**31 - 1)
token_arrays = arrays(
    np.int32, st.integers(min_value=1, max_value=600), elements=int32s
)
# structured arrays: runs of few values (the codecs' home turf)
runny = st.lists(
    st.tuples(st.integers(0, 50), st.integers(1, 40)), min_size=1, max_size=40
).map(lambda rs: np.repeat([v for v, _ in rs], [n for _, n in rs]).astype(np.int32))


@settings(max_examples=150, deadline=None)
@given(token_arrays)
def test_adaptive_choice_roundtrips_random(a):
    codec_id, payload = cost.choose(a)
    np.testing.assert_array_equal(codecs.decode(codec_id, payload, len(a)), a)


@settings(max_examples=150, deadline=None)
@given(runny)
def test_adaptive_choice_roundtrips_runny(a):
    codec_id, payload = cost.choose(a)
    np.testing.assert_array_equal(codecs.decode(codec_id, payload, len(a)), a)
    assert len(payload) <= 4 * len(a)  # structured input must never expand past raw


@settings(max_examples=60, deadline=None)
@given(runny)
def test_fsst_roundtrips_runny(a):
    buf = codecs.encode(codecs.FSST, a)
    np.testing.assert_array_equal(codecs.decode(codecs.FSST, buf, len(a)), a)


@settings(max_examples=60, deadline=None)
@given(token_arrays, st.sampled_from([7, 64, 256, 1024]))
def test_row_encode_roundtrips_any_block_size(a, bs):
    blocks, _, rh = encode_tokens(a, bs)
    out, h = decode_blocks(blocks, verify=True)
    np.testing.assert_array_equal(out, a)
    assert h == rh
