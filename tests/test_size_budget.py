"""Size-budget regression (FIXTURES.md assertion 2; BASELINE.md target):

* adaptive selection <= every fixed single-codec choice, per regime
  (guaranteed by construction — argmin over exact sizes — but asserted);
* adaptive beats the zlib general-purpose floor on structured regimes
  (the analogue of crumble's 482MB -> 37MB QS-block budget).
"""

import zlib

import numpy as np
import pytest

from crumble_spark import codecs, cost, synth
from crumble_spark.encode import encode_tokens

REGIMES = synth.REGIMES


def _regime_rows(regime, n_rows=20, n=2048, seed=7):
    # NB: python's hash() is salted per process — crc32 keeps this fixture
    # deterministic across runs
    rng = np.random.default_rng([seed, zlib.crc32(regime.encode())])
    return [synth.gen_tokens(rng, regime, n) for _ in range(n_rows)]


@pytest.mark.parametrize("regime", REGIMES)
def test_adaptive_beats_every_fixed_choice(regime):
    rows = _regime_rows(regime)
    adaptive = fixed_best = 0
    fixed_totals = dict.fromkeys((codecs.RLE, codecs.DICT, codecs.FOR_BP, codecs.DELTA_BP), 0)
    for a in rows:
        _, payload = cost.choose(a)
        adaptive += len(payload)
        for cid in fixed_totals:
            fixed_totals[cid] += len(codecs.encode(cid, a))
    fixed_best = min(fixed_totals.values())
    assert adaptive <= fixed_best, (regime, adaptive, fixed_totals)


@pytest.mark.parametrize(
    "regime", [r for r in REGIMES if r not in ("high_entropy",)]
)
def test_adaptive_beats_zlib_floor_on_structured(regime):
    rows = _regime_rows(regime)
    adaptive = sum(encode_tokens(a, 1024)[1] for a in rows)
    floor = sum(len(zlib.compress(a.astype("<i4").tobytes(), 6)) for a in rows)
    assert adaptive <= floor * 1.15, (regime, adaptive, floor)


def test_high_entropy_never_expands():
    rows = _regime_rows("high_entropy")
    for a in rows:
        blocks, bytes_out, _ = encode_tokens(a, 1024)
        raw = 4 * len(a)
        assert bytes_out <= raw * 1.01 + 32 * len(blocks)
