"""Corpus curation composite: the end-to-end cleaning manifest a
training-data pipeline actually ships — quality gate AND language gate
AND exact-dedup survivor, composed from the individually-oracled
operators so the whole funnel is value-hash-checked.

Mirrors the engine's own discipline (every stage independently verified,
the composition verified again end-to-end — crumble verifies per record
AND reports run totals, snp_score.c:2021-2026, 2650-2666).

Scale shape: quality/langid are projections (no shuffle); the dedup drop
list anti-joins on doc_id with NO broadcast hint — at web scale exact-dup
drop lists are 20-50% of all docs (billions of rows), so forcing a
driver-side broadcast would OOM; AQE upgrades the anti-join to broadcast
at runtime iff the list actually fits.  The final join is on doc_id (the
natural key both sides are derived from).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import shared, textqc
from .dedup import Q_DEDUP_EXACT_SQL, _text_hash

QUALITY_MIN_E6 = 500_000  # keep docs scoring >= 0.5
KEEP_LANGS = ("en",)


def _doc_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every gate's value in one pass over documents: quality and langid
    are the oracled expressions re-used as columns (identical
    floor-scaled values by construction), and the exact-dedup survivor
    flag is doc_id == min(doc_id) over the text-hash group — computed as
    a map-side-combinable groupBy(min) joined back (merge-hinted: one
    row per distinct text, never broadcast at scale), so a
    mass-duplicated text collapses to one partial row per mapper instead
    of colocating and sorting every copy in one rank-window task (the
    r2-r4 shape).  The min branch prunes to (text) only — its second
    scan reads one column and computes one md5, no quality/langid math.
    The join key is dedup._text_hash() — null-pinned (ADVICE r5), so a
    NULL-text doc still appears in the flags table (one dup group of all
    NULL texts) instead of being silently dropped by the inner join."""
    d = textqc.documents(spark, sf_dir)
    q = textqc.quality_exprs(F.col("text"), shared.words(F.col("text")))
    _, pred = textqc.langid_profile_exprs(shared.words(F.col("text")))
    base = d.select(
        "doc_id",
        F.floor(q["score"] * 1_000_000).cast("long").alias("quality_e6"),
        pred.alias("lang_pred"),
        _text_hash().alias("text_hash"),
    )
    mins = (
        textqc.documents(spark, sf_dir)
        .select("doc_id", _text_hash().alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("min_doc"))
        .hint("merge")
    )
    return base.join(mins, "text_hash").withColumn(
        "is_keeper", F.col("doc_id") == F.col("min_doc")
    )


def q_clean_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_ids that survive the full cleaning funnel, with their scores."""
    return (
        _doc_flags(spark, sf_dir)
        .filter(
            (F.col("quality_e6") >= QUALITY_MIN_E6)
            & F.col("lang_pred").isin(*KEEP_LANGS)
            & F.col("is_keeper")
        )
        .select("doc_id", "quality_e6", "lang_pred")
    )


def _q_clean_manifest_sql() -> str:
    langs = ", ".join(f"'{x}'" for x in KEEP_LANGS)
    return (
        "WITH q AS (SELECT doc_id, quality_e6 FROM ("
        + textqc._q_text_quality_sql()
        + f") WHERE quality_e6 >= {QUALITY_MIN_E6}), "
        "l AS (SELECT doc_id, lang_pred FROM ("
        + textqc._q_langid_profiles_sql()
        + f") WHERE lang_pred IN ({langs})), "
        "d AS (SELECT doc_id FROM (" + Q_DEDUP_EXACT_SQL + ")) "
        "SELECT q.doc_id, q.quality_e6, l.lang_pred FROM q "
        "JOIN l ON l.doc_id = q.doc_id "
        "WHERE q.doc_id NOT IN (SELECT doc_id FROM d)"
    )


def q_clean_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-by-stage survivor counts (the report a curation run emits:
    how many docs each gate removed — crumble's end-of-run counters).
    One conditional aggregation over the single-scan flags table, then a
    4-row unpivot — no unions of re-scans, no driver-side actions."""
    f = _doc_flags(spark, sf_dir)
    q_ok = F.col("quality_e6") >= QUALITY_MIN_E6
    l_ok = F.col("lang_pred").isin(*KEEP_LANGS)
    agg = f.agg(
        F.count("*").alias("c0"),
        F.sum(q_ok.cast("long")).alias("c1"),
        F.sum(l_ok.cast("long")).alias("c2"),
        F.sum((q_ok & l_ok & F.col("is_keeper")).cast("long")).alias("c3"),
    )
    return agg.select(
        F.expr(
            "stack(4, '0_total', c0, '1_quality', c1, '2_lang', c2, '3_clean', c3)"
        ).alias("stage", "n_docs")
    )


def _q_clean_funnel_sql() -> str:
    langs = ", ".join(f"'{x}'" for x in KEEP_LANGS)
    return (
        "SELECT '0_total' AS stage, count(*) AS n_docs FROM documents "
        "UNION ALL SELECT '1_quality', count(*) FROM ("
        + textqc._q_text_quality_sql()
        + f") WHERE quality_e6 >= {QUALITY_MIN_E6} "
        "UNION ALL SELECT '2_lang', count(*) FROM ("
        + textqc._q_langid_profiles_sql()
        + f") WHERE lang_pred IN ({langs}) "
        "UNION ALL SELECT '3_clean', count(*) FROM ("
        + _q_clean_manifest_sql()
        + ")"
    )


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: training docs sharing any word
    8-gram with the held-out eval split, with hit counts — the
    decontamination pass every pretraining pipeline runs before a corpus
    ships (nothing the benchmark contains may leak into training).

    The eval split stands in for a real benchmark set: docs whose
    md5(doc_id) starts with '0' (deterministic ~1/16 of the corpus; in
    production the eval grams come from the actual benchmark files).

    Scale shape (r5): two branches, each gram-constructing ONLY its own
    doc subset — the eval-side filter pushes below the expensive gram
    build, so total gram work equals the old single-scan shape — then
    the distinct eval-gram set (map-side-combinable partial distinct)
    semi-joins onto the training grams.  The r2-r4 max(is_eval) window
    over the gram partition buffered EVERY occurrence of each gram in
    one WindowExec group before the flag — a boilerplate 8-gram with
    10^9 training occurrences pinned one task (the same class as the r4
    gram-df finding).  The semi-join probe streams instead.  merge hint:
    the eval gram set is benchmark-sized in production but nothing may
    force a driver collect if it isn't.
    """
    d = textqc.documents(spark, sf_dir).select(
        "doc_id", shared.words(F.col("text")).alias("ws")
    )
    is_eval = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    g = d.select(
        "doc_id", is_eval.alias("is_eval"), shared.grams8(F.col("ws")).alias("grams")
    )
    eval_grams = (
        g.filter(F.col("is_eval"))
        .select(F.explode("grams").alias("gram"))
        .distinct()
        .hint("merge")
    )
    train = g.filter(~F.col("is_eval") & (F.size("grams") > 0)).select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        F.explode("grams").alias("gram"),
    )
    return (
        train.join(eval_grams, "gram", "left_semi")
        .groupBy("doc_id", "n_grams")
        .agg(F.count("*").cast("int").alias("n_hit_grams"))
        .select("doc_id", "n_hit_grams", F.col("n_grams").cast("int").alias("n_grams"))
    )


def _q_contamination_sql() -> str:
    grams = shared.GRAMS8_SQL.format(ws=shared.WORDS_SQL.format(c="text"))
    return (
        f"WITH g AS (SELECT doc_id, {grams} AS grams FROM documents), "
        "f AS (SELECT doc_id, grams, len(grams) AS n_grams FROM g WHERE len(grams) > 0), "
        "e AS (SELECT DISTINCT unnest(grams) AS gram FROM f "
        "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'), "
        "t AS (SELECT doc_id, n_grams, unnest(grams) AS gram FROM f "
        "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0') "
        "SELECT t.doc_id, CAST(count(*) AS INTEGER) AS n_hit_grams, "
        "CAST(t.n_grams AS INTEGER) AS n_grams "
        "FROM t JOIN e ON e.gram = t.gram GROUP BY t.doc_id, t.n_grams"
    )


QUERIES = {
    "corpus_clean_manifest": q_clean_manifest,
    "corpus_clean_funnel": q_clean_funnel,
    "corpus_contamination": q_contamination,
}

ORACLES = {
    "corpus_clean_manifest": _q_clean_manifest_sql(),
    "corpus_clean_funnel": _q_clean_funnel_sql(),
    "corpus_contamination": _q_contamination_sql(),
}
