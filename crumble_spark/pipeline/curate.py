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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import shared, textqc
from .dedup import Q_DEDUP_EXACT_SQL

QUALITY_MIN_E6 = 500_000  # keep docs scoring >= 0.5
KEEP_LANGS = ("en",)


def _doc_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every gate's value computed in ONE scan of documents: quality and
    langid are the oracled expressions re-used as columns (identical
    floor-scaled values by construction), and the exact-dedup survivor
    flag is rn == 1 over the text-hash window — a doc is on
    q_dedup_exact's drop list iff rn > 1, so the anti-join collapses to
    a filter.  One scan + one window shuffle replaces the r2 shape's
    ~6 scans and two joins."""
    d = textqc.documents(spark, sf_dir)
    q = textqc.quality_exprs(F.col("text"), shared.words(F.col("text")))
    _, pred = textqc.langid_profile_exprs(shared.words(F.col("text")))
    base = d.select(
        "doc_id",
        F.floor(q["score"] * 1_000_000).cast("long").alias("quality_e6"),
        pred.alias("lang_pred"),
        F.md5("text").alias("text_hash"),
    )
    rn = F.row_number().over(Window.partitionBy("text_hash").orderBy("doc_id"))
    return base.withColumn("rn", rn)


def q_clean_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_ids that survive the full cleaning funnel, with their scores."""
    return (
        _doc_flags(spark, sf_dir)
        .filter(
            (F.col("quality_e6") >= QUALITY_MIN_E6)
            & F.col("lang_pred").isin(*KEEP_LANGS)
            & (F.col("rn") == 1)
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
        F.sum((q_ok & l_ok & (F.col("rn") == 1)).cast("long")).alias("c3"),
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

    Scale shape: ONE scan of documents (gram construction is the
    expensive part — never do it twice), explode with the eval flag
    attached, then a max(is_eval) window over the gram partition marks
    contaminated grams in the same shuffle a gram-keyed join would have
    needed; finally a groupBy(doc_id).  Per-doc distinct grams bound the
    fanout; no broadcast hints (an eval set is small, but nothing forces
    a driver collect if it isn't).
    """
    d = textqc.documents(spark, sf_dir).select(
        "doc_id", shared.words(F.col("text")).alias("ws")
    )
    is_eval = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    g = d.select(
        "doc_id", is_eval.alias("is_eval"), shared.grams8(F.col("ws")).alias("grams")
    ).filter(F.size("grams") > 0)
    ex = g.select(
        "doc_id",
        "is_eval",
        F.size("grams").alias("n_grams"),
        F.explode("grams").alias("gram"),
    )
    hit = F.max(F.col("is_eval").cast("int")).over(Window.partitionBy("gram")) == 1
    return (
        ex.withColumn("hit", hit)
        .filter(~F.col("is_eval") & F.col("hit"))
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
