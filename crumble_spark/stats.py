"""Per-block statistics kernel (pure numpy).

The analogue of crumble's consensus scoring (snp_score.c:533-797): fold a
block into a small stats record that drives the keep-vs-transform decision.
Here the stats are exact (min/max/bit-width, cardinality with counts,
run-length structure, delta range, lag periodicity) and the decision is
per-chunk codec selection (cost.py).

Cheap-stats-gate-expensive-analysis mirrors crumble's -Y indel_fract gate
(snp_score.c:1732): the lag-periodicity scan (STR-finder analogue,
str_finder.c:135-189) only runs when the cheap candidates leave room to
improve, and only then is an FSST trial encode attempted.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import bitpack

MAX_LAG = 8  # STR finder searches periods 1..8 (str_finder.h:13)


@dataclass
class BlockStats:
    n: int
    vmin: int
    vmax: int
    n_runs: int
    run_vrange: int
    max_run_len: int
    max_zigzag: int
    _rvals: np.ndarray  # values at run starts (distinct set == block's)
    _lengths: np.ndarray  # run lengths, aligned with _rvals
    _values: np.ndarray | None = None
    _counts: np.ndarray | None = None
    # (k, use_escape, size) memo from candidate sizing, so the winning
    # dictionary encode doesn't re-derive the same plan (cost.py fills it)
    _dict_plan: tuple[int, bool, int] | None = None

    def _materialize_counts(self) -> None:
        """Cardinality/counts are the one expensive stat (a sort) — only
        computed when the dictionary codec is still in the running.
        Uniquing run values (with run-length weights) beats uniquing the
        block whenever runs compress; bincount beats both when the value
        range is narrow."""
        if self._values is not None:
            return
        rv = self._rvals
        vrange = self.vmax - self.vmin
        if vrange < 4 * len(rv):
            cnt = np.bincount(rv - self.vmin, weights=self._lengths, minlength=vrange + 1)
            nz = np.flatnonzero(cnt)
            self._values = (nz + self.vmin).astype(np.int64)
            self._counts = cnt[nz].astype(np.int64)
        elif self.n_runs == self.n:
            # every run has length 1 → all weights are 1: a plain value
            # sort is enough, counts are the group sizes (no argsort, no
            # weight gather) — the common case for high-entropy blocks
            srv = np.sort(rv)
            starts = np.concatenate(([0], np.flatnonzero(srv[1:] != srv[:-1]) + 1))
            self._values = srv[starts]
            self._counts = np.diff(np.concatenate((starts, [len(srv)])))
        else:
            # one argsort + segmented integer sum: same result as
            # np.unique(return_inverse) + weighted bincount, without
            # building the inverse array or round-tripping through float.
            # stability is irrelevant: equal keys contribute the same sum
            # in any order
            order = np.argsort(rv)
            srv = rv[order]
            starts = np.concatenate(([0], np.flatnonzero(srv[1:] != srv[:-1]) + 1))
            self._values = srv[starts]
            self._counts = np.add.reduceat(self._lengths[order], starts)

    @property
    def values(self) -> np.ndarray:
        self._materialize_counts()
        return self._values

    @property
    def counts(self) -> np.ndarray:
        self._materialize_counts()
        return self._counts

    @property
    def card(self) -> int:
        return len(self.values)

    @property
    def counts_desc(self) -> np.ndarray:
        return np.sort(self.counts)[::-1]

    @property
    def bit_width(self) -> int:
        return bitpack.width_for(self.vmax - self.vmin)


def compute(a: np.ndarray) -> BlockStats:
    """a: non-empty int64 array (one block)."""
    n = len(a)
    vmin = int(a.min())
    vmax = int(a.max())
    starts = np.concatenate(([0], np.flatnonzero(a[1:] != a[:-1]) + 1))
    rvals = a[starts]
    lengths = np.diff(np.concatenate((starts, [n])))
    zz = bitpack.zigzag(np.diff(a)) if n > 1 else np.zeros(0, np.uint64)
    return BlockStats(
        n=n,
        vmin=vmin,
        vmax=vmax,
        n_runs=len(starts),
        run_vrange=int(rvals.max() - rvals.min()),
        max_run_len=int(lengths.max()),
        max_zigzag=int(zz.max()) if len(zz) else 0,
        _rvals=rvals,
        _lengths=lengths,
    )


def periodicity(a: np.ndarray, max_lag: int = MAX_LAG) -> float:
    """Max lag-match fraction (see periodicity_scan)."""
    return periodicity_scan(a, max_lag)[1]


def periodicity_scan(a: np.ndarray, max_lag: int = MAX_LAG) -> tuple[int, float]:
    """(best_lag, fraction of positions equal to the position `lag` back),
    over lags 2..max_lag (lag 1 is run structure, already owned by RLE).

    Vectorized np.equal lag comparison — the numeric STR finder
    (str_finder.c:135-189 does the same via a rolling 2-bit word).
    """
    n = len(a)
    best_lag, best = 0, 0.0
    for lag in range(2, min(max_lag, n - 1) + 1):
        frac = float(np.count_nonzero(a[lag:] == a[:-lag])) / (n - lag)
        if frac > best:
            best_lag, best = lag, frac
    return best_lag, best


def chance_match_rate(counts: np.ndarray, n: int) -> float:
    """Probability two random positions hold equal values (sum p_i^2) —
    the lag-match fraction an i.i.d. block produces by chance alone.
    Low-cardinality noise looks 'periodic' without this correction."""
    p = counts / n
    return float(np.dot(p, p))
