"""Deterministic synthetic token-table generator (FIXTURES.md regimes).

Every row is generated from rng seeded by (seed, row id) only, so the
table is identical regardless of partitioning, ordering, or cluster size —
the property that makes the scaling-efficiency benchmark and the resume
test meaningful.  Distributed generation goes through mapInPandas over
spark.range (no driver-side materialization).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from .schema import TOKENS_SCHEMA

REGIMES = (
    "constant",
    "runs",
    "low_card",
    "narrow_range",
    "monotone",
    "periodic",
    "escape_mix",
    "high_entropy",
)
SOURCES = ("web", "code", "chat", "wiki")
VOCAB = 50_257


def gen_tokens(rng: np.random.Generator, regime: str, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    if regime == "constant":
        return np.full(n, rng.integers(0, 256), dtype=np.int32)
    if regime == "runs":
        n_runs = max(1, n // 32)
        vals = rng.integers(0, 16, n_runs)
        lens = rng.geometric(1 / 32.0, n_runs)
        out = np.repeat(vals, lens)[:n]
        if len(out) < n:
            out = np.concatenate([out, np.full(n - len(out), vals[-1])])
        return out.astype(np.int32)
    if regime == "low_card":
        k = int(rng.choice([2, 4, 16]))
        alphabet = rng.choice(VOCAB, size=k, replace=False)
        w = 1.0 / np.arange(1, k + 1)  # zipf-ish
        return alphabet[rng.choice(k, size=n, p=w / w.sum())].astype(np.int32)
    if regime == "narrow_range":
        base = int(rng.integers(0, VOCAB - 256))
        return (base + rng.integers(0, int(rng.choice([4, 16, 64, 256])), n)).astype(np.int32)
    if regime == "monotone":
        return np.cumsum(rng.integers(0, 7, n)).astype(np.int32)
    if regime == "periodic":
        p = int(rng.integers(2, 9))
        pat = rng.integers(0, VOCAB, p)
        out = np.tile(pat, n // p + 1)[:n]
        # sparse mutations so it's not perfectly tiled
        m = rng.random(n) < 0.01
        out[m] = rng.integers(0, VOCAB, int(m.sum()))
        return out.astype(np.int32)
    if regime == "escape_mix":
        body = rng.choice(rng.choice(VOCAB, 4, replace=False), n)
        esc = rng.random(n) < 0.005
        body[esc] = rng.integers(0, 2**30, int(esc.sum()))
        return body.astype(np.int32)
    if regime == "high_entropy":
        return rng.integers(0, VOCAB, n).astype(np.int32)
    raise ValueError(f"unknown regime {regime}")


def gen_row(seed: int, row_id: int, mean_len: int = 1024, skew_source: bool = True):
    """One deterministic row. Heavy tail on one source exercises the
    long-document skew path (FIXTURES.md skew fixture; crumble's over-depth
    guard analogue, snp_score.c:1671-1687)."""
    rng = np.random.default_rng([seed, row_id])
    regime = REGIMES[int(rng.integers(0, len(REGIMES)))]
    source = SOURCES[int(rng.integers(0, len(SOURCES)))]
    n = int(rng.lognormal(np.log(mean_len), 0.6))
    if skew_source and source == "web" and rng.random() < 0.02:
        n *= int(rng.integers(32, 257))  # pareto-ish long-document tail
    n = max(0, min(n, 1_000_000))
    tokens = gen_tokens(rng, regime, n)
    return f"{source}-{row_id:010d}", tokens, len(tokens), source


def gen_pdf(seed: int, ids: np.ndarray, mean_len: int = 1024) -> pd.DataFrame:
    rows = [gen_row(seed, int(i), mean_len) for i in ids]
    return pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source"])


def synth_table(spark, n_rows: int, seed: int = 42, mean_len: int = 1024, parts: int | None = None):
    """Distributed deterministic token table as a Spark DataFrame."""
    parts = parts or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield gen_pdf(seed, b["id"].to_numpy(), mean_len)

    return (
        spark.range(0, n_rows, numPartitions=parts)
        .mapInPandas(gen, schema=TOKENS_SCHEMA)
    )
