"""Deduplication operators over the documents table.

Four families, each a pure DataFrame composition with a DuckDB oracle:

* exact        — full-text md5 group dedup (hash-groupBy)
* prefix       — first-10-word hash dedup (catches boilerplate heads)
* minhash LSH  — shingle → 16-perm minhash → 4-row bands → bucket join
* simhash      — 16-bit sign-of-weighted-bits signature + hamming pairs
* ngram jaccard— exact jaccard on distinct 3-gram sets for candidate pairs

Scale notes (100 TB): every candidate generator is a shuffle on a *short
key* (band hash / gram / signature), never a cross join; pair dedup is a
groupBy on (doc_a, doc_b).  The jaccard verifier only runs on candidate
pairs emitted by the gram join, mirroring cheap-gate-then-expensive from
the engine's cost model.  Hot grams (stop-shingles) should be frequency-
capped before the join at real scale; at test scale the cap is a no-op
and is therefore left out of the verified semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import shared
from .tokenize import documents

N_PERM = 16
N_BANDS = 4  # 4 rows per band
SIMHASH_BITS = 16
JACCARD_THRESHOLD = 0.3
PREFIX_WORDS = 10


# --- exact -----------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs to drop under exact full-text dedup (keep lowest doc_id)."""
    d = documents(spark, sf_dir).select("doc_id", F.md5("text").alias("text_hash"))
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("doc_id", "text_hash")
    )


Q_DEDUP_EXACT_SQL = (
    "SELECT doc_id, text_hash FROM ("
    "SELECT doc_id, md5(text) AS text_hash, "
    "row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM documents"
    ") WHERE rn > 1"
)


def q_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-prefix groups: docs sharing their first 10 words."""
    d = documents(spark, sf_dir).select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(shared.words(F.col("text")), 1, PREFIX_WORDS))).alias(
            "prefix_hash"
        ),
    )
    w = Window.partitionBy("prefix_hash").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("group_n", F.count("*").over(Window.partitionBy("prefix_hash")))
        .filter(F.col("group_n") > 1)
        .select("doc_id", "prefix_hash", F.col("rn").cast("int").alias("rn"))
    )


Q_DEDUP_PREFIX_SQL = (
    "WITH p AS (SELECT doc_id, md5(array_to_string("
    + shared.WORDS_SQL.format(c="text")
    + "[1:10], ' ')) AS prefix_hash FROM documents) "
    "SELECT doc_id, prefix_hash, CAST(row_number() OVER "
    "(PARTITION BY prefix_hash ORDER BY doc_id) AS INTEGER) AS rn "
    "FROM p QUALIFY count(*) OVER (PARTITION BY prefix_hash) > 1"
)


# --- minhash LSH -------------------------------------------------------------

def _doc_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize the words array BEFORE gram construction: element_at
    # inside a higher-order lambda re-evaluates its argument expression,
    # so building grams directly over split(text) is O(words^2) per doc
    d = documents(spark, sf_dir).select("doc_id", shared.words(F.col("text")).alias("ws"))
    return d.select("doc_id", shared.grams3(F.col("ws")).alias("grams")).filter(
        F.size("grams") > 0
    )


MINHASH_P = 2_147_483_647  # 2^31-1: affine-permutation products stay < 2^62
# deterministic affine permutation constants (a odd, within [1, P))
MINHASH_AB = [((2 * j + 1) * 2_654_435_761 % MINHASH_P, (j * 40_503 + 17) % MINHASH_P) for j in range(N_PERM)]


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textbook minhash: one md5 per shingle → 48-bit int → N_PERM affine
    permutations mod 2^31-1, min per permutation.

    Plan shape (scale path): explode shingles → flat columnar hashing →
    groupBy(doc_id) with N_PERM partial-aggregating mins.  One shuffle of
    (doc_id, 16 longs); no per-row array lambdas, no repeated md5 passes.
    """
    g = _doc_grams(spark, sf_dir).select("doc_id", F.explode("grams").alias("gram"))
    h = (F.conv(F.substring(F.md5("gram"), 1, 12), 16, 10).cast("long") % MINHASH_P).alias("h")
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"s{j}")
        for j, (a, b) in enumerate(MINHASH_AB)
    ]
    return g.select("doc_id", h).groupBy("doc_id").agg(*aggs)


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on any 4-row minhash band.

    Pairing is bucket-local (groupBy band-key → in-bucket pair expansion),
    the shape that survives 10^12 rows: no self-join of the signature
    table, pair blowup bounded per bucket.
    """
    sig = minhash_signatures(spark, sf_dir)
    rows_per_band = N_PERM // N_BANDS
    bands = F.array(
        *[
            F.concat_ws(
                "|",
                *[F.col(f"s{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)],
            )
            for b in range(N_BANDS)
        ]
    )
    banded = sig.select("doc_id", F.posexplode(bands).alias("band", "key"))
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pairs = F.filter(
        F.flatten(
            F.transform(
                F.col("ds"),
                lambda x: F.transform(
                    F.col("ds"), lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b"))
                ),
            )
        ),
        lambda p: p["doc_a"] < p["doc_b"],
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )


def _minhash_cte() -> str:
    grams = shared.GRAMS3_SQL.format(ws=shared.WORDS_SQL.format(c="text"))
    sig_cols = ", ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS s{j}" for j, (a, b) in enumerate(MINHASH_AB)
    )
    band_rows = []
    rows_per_band = N_PERM // N_BANDS
    for b in range(N_BANDS):
        cols = " || '|' || ".join(
            f"CAST(s{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        band_rows.append(f"SELECT doc_id, {b} AS band, {cols} AS key FROM sig")
    return (
        f"WITH g AS (SELECT doc_id, {grams} AS grams FROM documents), "
        "e AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE len(grams) > 0), "
        "h AS (SELECT doc_id, CAST(('0x' || substr(md5(gram), 1, 12)) AS BIGINT) "
        f"% {MINHASH_P} AS h FROM e), "
        f"sig AS (SELECT doc_id, {sig_cols} FROM h GROUP BY doc_id), "
        "bands AS (" + " UNION ALL ".join(band_rows) + ")"
    )


Q_DEDUP_MINHASH_SQL = (
    _minhash_cte()
    + " SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a "
    "JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id"
)


# --- simhash -----------------------------------------------------------------

def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit simhash per doc from 24-bit word hashes (explode → groupBy,
    map-side combinable — one shuffle of (doc_id, 16 counters))."""
    d = documents(spark, sf_dir)
    w = d.select("doc_id", F.explode(shared.words(F.col("text"))).alias("w"))
    h = w.select("doc_id", shared.word_hash(F.col("w")).alias("h"))
    sums = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = h.groupBy("doc_id").agg(*sums)
    sim = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.cast("int").alias("simhash"))


def _simhash_cte() -> str:
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_BITS)
    )
    val = " + ".join(f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(SIMHASH_BITS))
    return (
        "WITH wds AS (SELECT doc_id, unnest("
        + shared.WORDS_SQL.format(c="text")
        + ") AS w FROM documents), "
        "h AS (SELECT doc_id, " + shared.WORD_HASH_SQL.format(w="w") + " AS h FROM wds), "
        f"agg AS (SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id), "
        f"sim AS (SELECT doc_id, CAST({val} AS INTEGER) AS simhash FROM agg)"
    )


Q_SIMHASH_SQL = _simhash_cte() + " SELECT doc_id, simhash FROM sim"


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at hamming distance <= 2 on the 16-bit simhash.
    (Test-scale pairing is a self-join on signature tables; at 100 TB,
    band the 16 bits into 4 nibbles and join per band — same semantics.)"""
    s = q_simhash(spark, sf_dir)
    a, b = s.alias("a"), s.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= 2)
    )


Q_DEDUP_SIMHASH_SQL = (
    _simhash_cte()
    + " SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming "
    "FROM sim a JOIN sim b ON a.doc_id < b.doc_id "
    "WHERE bit_count(xor(a.simhash, b.simhash)) <= 2"
)


# --- n-gram jaccard ----------------------------------------------------------

def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact jaccard over distinct 3-gram sets, computed distributively:
    explode grams → pair candidates via gram join → |∩| by groupBy →
    |∪| = |A|+|B|-|∩|.  No cross join anywhere."""
    g = _doc_grams(spark, sf_dir).select(
        "doc_id", F.size("grams").alias("n"), F.explode("grams").alias("gram")
    )
    a, b = g.alias("a"), g.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.withColumn("jaccard_e6", F.floor(jac * 1_000_000).cast("long"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard_e6")
    )


Q_DEDUP_JACCARD_SQL = (
    "WITH g AS (SELECT doc_id, "
    + shared.GRAMS3_SQL.format(ws=shared.WORDS_SQL.format(c="text"))
    + " AS grams FROM documents), "
    "e AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS gram FROM g WHERE len(grams) > 0), "
    "i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb, "
    "count(*) AS inter FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id "
    "GROUP BY 1, 2, 3, 4) "
    "SELECT doc_a, doc_b, CAST(floor((inter * 1.0 / (na + nb - inter)) * 1000000) AS BIGINT) AS jaccard_e6 "
    f"FROM i WHERE inter * 1.0 / (na + nb - inter) >= {JACCARD_THRESHOLD}"
)


def q_dedup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production dedup shape: cheap LSH candidate generation, exact
    jaccard verification only on candidates (cheap-gate-then-expensive,
    the engine cost model's discipline applied to dedup)."""
    cand = q_dedup_minhash(spark, sf_dir)
    ver = q_dedup_jaccard(spark, sf_dir)
    return ver.join(cand, ["doc_a", "doc_b"]).select("doc_a", "doc_b", "jaccard_e6")


Q_DEDUP_LSH_VERIFIED_SQL = (
    "WITH cand AS (" + Q_DEDUP_MINHASH_SQL + "), "
    "ver AS (" + Q_DEDUP_JACCARD_SQL + ") "
    "SELECT v.doc_a, v.doc_b, v.jaccard_e6 FROM ver v "
    "JOIN cand c ON v.doc_a = c.doc_a AND v.doc_b = c.doc_b"
)


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_prefix": q_dedup_prefix,
    "dedup_minhash_lsh": q_dedup_minhash,
    "dedup_simhash_sig": q_simhash,
    "dedup_simhash_pairs": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_jaccard,
    "dedup_lsh_verified": q_dedup_lsh_verified,
}

ORACLES = {
    "dedup_lsh_verified": Q_DEDUP_LSH_VERIFIED_SQL,
    "dedup_exact": Q_DEDUP_EXACT_SQL,
    "dedup_prefix": Q_DEDUP_PREFIX_SQL,
    "dedup_minhash_lsh": Q_DEDUP_MINHASH_SQL,
    "dedup_simhash_sig": Q_SIMHASH_SQL,
    "dedup_simhash_pairs": Q_DEDUP_SIMHASH_SQL,
    "dedup_ngram_jaccard": Q_DEDUP_JACCARD_SQL,
}
