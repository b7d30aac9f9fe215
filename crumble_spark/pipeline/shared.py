"""Hash/tokenize primitives shared by pipeline operators — each has an
exactly-equivalent SQL spelling (the *_SQL constants) used inside oracle
queries, so Spark results and DuckDB oracles agree bit-for-bit.

Determinism contract: all hashing goes through md5 (identical hex in both
engines); all float math is done in double precision with explicit
left-to-right fold order; integer arithmetic only elsewhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

VOCAB = 32_768
HASH_HEX = 6  # 24-bit word hashes
FP_MOD = 2_147_483_647
FP_MUL = 1_000_003


def words(c: Column) -> Column:
    """Whitespace words with empties dropped.  NULL text is pinned to the
    empty array (ADVICE r5): without the coalesce, Spark's legacy
    size(NULL) = -1 meets DuckDB's NULL-skipping least()/greatest() and
    every word-derived score diverges on a NULL-text doc.  NULL text ≡
    empty text for the whole word-op family, in both engines."""
    return F.filter(F.split(F.coalesce(c, F.lit("")), " "), lambda w: w != F.lit(""))


WORDS_SQL = "list_filter(string_split(coalesce({c}, ''), ' '), w -> w <> '')"


def word_hash(w: Column) -> Column:
    """24-bit integer hash of a word via md5 prefix."""
    return F.conv(F.substring(F.md5(w), 1, HASH_HEX), 16, 10).cast("long")


WORD_HASH_SQL = "CAST(('0x' || substr(md5({w}), 1, 6)) AS BIGINT)"


def token_of(w: Column) -> Column:
    return (word_hash(w) % VOCAB).cast("int")


TOKEN_SQL = f"CAST({WORD_HASH_SQL} % {VOCAB} AS INTEGER)"


def tokens_col(text: Column) -> Column:
    return F.transform(words(text), token_of)


TOKENS_SQL = (
    "list_transform(" + WORDS_SQL.format(c="{c}") + ", w -> " + TOKEN_SQL.format(w="w") + ")"
)


def grams3(ws: Column) -> Column:
    """Distinct word 3-grams (shingles). Empty for docs under 3 words.

    Built with zip_with over shifted slices, NOT element_at inside a
    transform lambda: lambda-captured expressions are re-evaluated per
    element (and CollapseProject re-inlines projected columns), turning
    the naive spelling into O(words^2) per document.  zip_with keeps it
    O(words): each slice is evaluated once per row.  zip_with pads the
    shorter side with nulls; the trailing <3-word grams become null and
    are filtered.
    """
    pair = F.zip_with(
        ws, F.slice(ws, 2, F.size(ws)), lambda x, y: F.concat_ws(" ", x, y)
    )
    tri = F.zip_with(
        pair,
        F.slice(ws, 3, F.size(ws)),
        lambda xy, z: F.when(z.isNotNull(), F.concat(xy, F.lit(" "), z)),
    )
    return F.array_distinct(F.filter(tri, lambda g: g.isNotNull()))


GRAMS3_SQL = (
    "list_distinct(list_transform("
    "generate_series(1, len({ws}) - 2), "
    "i -> {ws}[i] || ' ' || {ws}[i+1] || ' ' || {ws}[i+2]))"
)

GRAM8_N = 8  # benchmark-contamination window (the usual 8-13 gram check)


def grams8(ws: Column) -> Column:
    """Distinct word 8-grams via doubling: g2 from words, g4 from g2
    zipped with itself shifted by 2, g8 from g4 shifted by 4 — three
    zip_with passes instead of seven (each pass materializes a full
    intermediate array per doc, so halving passes halves the gram-build
    cost; same O(words) discipline as grams3, never element_at inside a
    transform lambda).  Empty for docs under 8 words."""
    join2 = lambda a, b: F.when(b.isNotNull(), F.concat(a, F.lit(" "), b))
    g2 = F.zip_with(ws, F.slice(ws, 2, F.size(ws)), join2)
    g4 = F.zip_with(g2, F.slice(g2, 3, F.size(ws)), join2)
    g8 = F.zip_with(g4, F.slice(g4, 5, F.size(ws)), join2)
    return F.array_distinct(F.filter(g8, lambda g: g.isNotNull()))


GRAMS8_SQL = (
    "list_distinct(list_transform("
    f"generate_series(1, len({{ws}}) - {GRAM8_N - 1}), "
    "i -> " + " || ' ' || ".join(f"{{ws}}[i+{d}]" for d in range(GRAM8_N)) + "))"
)
