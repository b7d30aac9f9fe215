"""Corpus curation composite: the end-to-end cleaning manifest a
training-data pipeline actually ships — quality gate AND language gate
AND exact-dedup survivor, composed from the individually-oracled
operators so the whole funnel is value-hash-checked.

Mirrors the engine's own discipline (every stage independently verified,
the composition verified again end-to-end — crumble verifies per record
AND reports run totals, snp_score.c:2021-2026, 2650-2666).

Scale shape (r8): quality/langid are projections (no shuffle); the
exact-dedup survivor is folded into ONE map-side-combinable
groupBy(text_hash) as the group's min(struct(doc_id, scores)) — one scan,
one shuffle of per-mapper partial rows, no join anywhere.  A
mass-duplicated text (10^8 copies at web scale) collapses to one partial
row per mapper; nothing is broadcast, nothing is windowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import shared, textqc
from .dedup import Q_DEDUP_EXACT_SQL, _text_hash

QUALITY_MIN_E6 = 500_000  # keep docs scoring >= 0.5
KEEP_LANGS = ("en",)


def _group_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every gate, aggregated per distinct-text group in ONE scan + ONE
    map-side-combinable groupBy (r8, guide §2.3/§2.4): quality and langid
    are the oracled expressions re-used as columns (identical
    floor-scaled values by construction), and the exact-dedup survivor is
    the group's argmin-by-doc_id row, taken as min(struct(doc_id, ...))
    inside the same aggregation — doc_id is globally unique, so the
    struct min IS the keeper row with its own scores attached.  The r5-r7
    shape scanned documents twice (flags + a pruned min branch) and
    merge-joined them back on text_hash; the keeper flag never needed the
    join — it is a per-group aggregate, and folding it into the group
    rollup deletes a full scan, an md5 pass and a corpus-sized sort-merge
    join while keeping the two-level discipline (a mass-duplicated text
    still collapses to one partial row per mapper; nothing is broadcast).
    The group key is dedup._text_hash() — null-pinned (ADVICE r5), so
    NULL-text docs form one group instead of being dropped."""
    w = textqc._with_words(textqc.documents(spark, sf_dir))
    qf = textqc.quality_feature_exprs(F.col("text"), F.col("ws"))
    raw = textqc.profile_score_exprs(F.col("ws"))
    langs = sorted(textqc.LANG_PROFILES)
    # r8 staging (see textqc._with_words): words, then every raw feature/
    # profile score, materialize exactly once; the score/argmax exprs in
    # the outer projection read attributes (the r7 inline plan carried 53
    # copies of the split and ~3 evaluations of each profile score)
    feat = w.select(
        "doc_id",
        _text_hash().alias("text_hash"),
        qf["n_words"].alias("_nw"),
        qf["mean_wl"].alias("_mwl"),
        qf["stop"].alias("_stop"),
        *[raw[lang].alias(f"_sc_{lang}") for lang in langs],
    )
    score = textqc.quality_score_expr(F.col("_nw"), F.col("_mwl"), F.col("_stop"))
    pred = textqc.langid_pred_expr({lang: F.col(f"_sc_{lang}") for lang in langs})
    base = feat.select(
        "doc_id",
        F.floor(score * 1_000_000).cast("long").alias("quality_e6"),
        pred.alias("lang_pred"),
        "text_hash",
    )
    q_ok = F.col("quality_e6") >= QUALITY_MIN_E6
    l_ok = F.col("lang_pred").isin(*KEEP_LANGS)
    return base.groupBy("text_hash").agg(
        F.count("*").alias("n_docs"),
        F.sum(q_ok.cast("long")).alias("n_quality"),
        F.sum(l_ok.cast("long")).alias("n_lang"),
        F.min(F.struct("doc_id", "quality_e6", "lang_pred")).alias("keeper"),
    )


def _keeper_ok():
    return (F.col("keeper.quality_e6") >= QUALITY_MIN_E6) & F.col(
        "keeper.lang_pred"
    ).isin(*KEEP_LANGS)


def q_clean_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_ids that survive the full cleaning funnel, with their scores.
    Survivors are exactly the group keepers whose own row passes both
    gates — emitted straight from the group rollup, join-free."""
    return (
        _group_flags(spark, sf_dir)
        .filter(_keeper_ok())
        .select(
            F.col("keeper.doc_id").alias("doc_id"),
            F.col("keeper.quality_e6").alias("quality_e6"),
            F.col("keeper.lang_pred").alias("lang_pred"),
        )
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
    f = _group_flags(spark, sf_dir)
    agg = f.agg(
        F.sum("n_docs").alias("c0"),
        F.sum("n_quality").alias("c1"),
        F.sum("n_lang").alias("c2"),
        F.sum(_keeper_ok().cast("long")).alias("c3"),
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
