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
from .dedup import Q_DEDUP_EXACT_SQL, q_dedup_exact

QUALITY_MIN_E6 = 500_000  # keep docs scoring >= 0.5
KEEP_LANGS = ("en",)


def q_clean_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_ids that survive the full cleaning funnel, with their scores."""
    quality = textqc.q_text_quality(spark, sf_dir).select("doc_id", "quality_e6")
    lang = textqc.q_langid_profiles(spark, sf_dir).select("doc_id", "lang_pred")
    drop = q_dedup_exact(spark, sf_dir).select("doc_id")
    return (
        quality.filter(F.col("quality_e6") >= QUALITY_MIN_E6)
        .join(lang.filter(F.col("lang_pred").isin(*KEEP_LANGS)), "doc_id")
        .join(drop, "doc_id", "left_anti")
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
    Fully lazy: one DataFrame of unioned aggregates, no driver-side
    .count() actions — the caller (driver / a scheduler) decides when
    the single job runs."""

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )

    quality = textqc.q_text_quality(spark, sf_dir).filter(
        F.col("quality_e6") >= QUALITY_MIN_E6
    )
    lang = textqc.q_langid_profiles(spark, sf_dir).filter(
        F.col("lang_pred").isin(*KEEP_LANGS)
    )
    return (
        stage("0_total", textqc.documents(spark, sf_dir))
        .unionByName(stage("1_quality", quality))
        .unionByName(stage("2_lang", lang))
        .unionByName(stage("3_clean", q_clean_manifest(spark, sf_dir)))
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

    Scale shape: distinct 8-grams explode → one equi-join on the gram
    string.  The eval side is benchmark-sized (thousands of grams, not
    corpus-sized), so AQE broadcasts it; the train side is one scan, and
    per-doc distinct grams bound the fanout.
    """
    d = textqc.documents(spark, sf_dir).select(
        "doc_id", shared.words(F.col("text")).alias("ws")
    )
    g = d.select("doc_id", shared.grams8(F.col("ws")).alias("grams")).filter(
        F.size("grams") > 0
    )
    is_eval = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    eval_grams = (
        g.filter(is_eval).select(F.explode("grams").alias("gram")).distinct()
    )
    train = g.filter(~is_eval).select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        F.explode("grams").alias("gram"),
    )
    return (
        train.join(eval_grams, "gram")
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
