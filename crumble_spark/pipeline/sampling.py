"""Deterministic corpus sampling — the downsampling stage every
training-data pipeline runs between cleaning and tokenization.

Both operators are hash-deterministic (md5 of doc_id), so the sample is
reproducible across runs, partitionings and engines — the same property
that makes the engine's split assignment resumable.  No RNG state, no
driver-side sampling:

* stratified rate sampling — per-source keep-rates (permille) applied by
  hashing each doc into 1000 buckets; a pure broadcast-join + filter
  (no shuffle of the corpus).
* token-budget sampling — keep each source's docs in hash order until a
  token budget is exhausted; one window cumsum per source (single
  shuffle on the short source key).

Reference analogue: crumble's -p/-P sub-sampling of qualities keeps a
deterministic subset rather than an RNG draw (snp_score.c option table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import shared
from .shared import WORDS_SQL
from .tokenize import documents

# per-source keep rates in permille (the knobs a data-mixture config
# sets); testdata source names so the differentiated rates are actually
# exercised by the oracle — unlisted sources fall back to DEFAULT_RATE
SAMPLE_RATES = {"src0": 800, "src1": 400, "src2": 200, "src3": 1000}
DEFAULT_RATE = 100
TOKEN_BUDGET = 500  # per-source token budget — binds at oracle scale


def _doc_ntok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id string, source, n_tok) WITHOUT building token arrays (r8,
    guide §1.2 don't-compute-what-you-throw-away): the samplers only need
    the token COUNT, and n_tok == size(words) by construction — tokens
    are a 1:1 transform of the filtered words, and the SQL oracles
    (TOK_CTE_N / the budget CTE) already spell it len(words).  The r5-r7
    shape went through tokens_table, which md5-hashes every word into a
    token id per doc only for size() to throw the array away."""
    return documents(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("source"),
        F.size(shared.words(F.col("text"))).alias("n_tok"),
    )


def _bucket1000(c):
    """Deterministic 0..999 bucket from md5(doc_id) — same hex math both
    engines (shared.word_hash discipline applied to sampling)."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 6), 16, 10).cast("long") % 1000


_BUCKET1000_SQL = "CAST(('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 6)) AS BIGINT) % 1000"


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs kept under per-source rates: hash bucket < rate_permille.
    Plan: broadcast the tiny rate table, filter — zero corpus shuffles,
    and the sample is stable under re-runs and repartitioning."""
    d = documents(spark, sf_dir).select("doc_id", "source")
    rates = spark.createDataFrame(
        [(k, v) for k, v in sorted(SAMPLE_RATES.items())], "source string, rate int"
    )
    return (
        d.join(F.broadcast(rates), "source", "left")
        .withColumn("rate", F.coalesce(F.col("rate"), F.lit(DEFAULT_RATE)))
        .withColumn("bucket", _bucket1000(F.col("doc_id")))
        .filter(F.col("bucket") < F.col("rate"))
        .select("doc_id", "source", F.col("bucket").cast("int").alias("bucket"))
    )


def _rates_cte() -> str:
    rows = " UNION ALL ".join(
        f"SELECT '{k}' AS source, {v} AS rate" for k, v in sorted(SAMPLE_RATES.items())
    )
    return f"rates AS ({rows})"


Q_SAMPLE_STRATIFIED_SQL = (
    "WITH " + _rates_cte() + ", "
    "b AS (SELECT d.doc_id, d.source, coalesce(r.rate, "
    + str(DEFAULT_RATE)
    + ") AS rate, "
    + _BUCKET1000_SQL.format(c="d.doc_id")
    + " AS bucket FROM documents d LEFT JOIN rates r ON r.source = d.source) "
    "SELECT doc_id, source, CAST(bucket AS INTEGER) AS bucket FROM b WHERE bucket < rate"
)


def q_sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget sample: walk each source's docs in
    (hash-bucket, doc_id) order and keep while the running token total
    stays within TOKEN_BUDGET (the first doc crossing the line is kept,
    so every non-empty source contributes).

    Scale shape (r5): the exact per-source cumsum window would pull a
    source's ENTIRE doc set through one task even though only a
    budget-sized prefix can survive.  A bucket-granularity pre-filter
    bounds it: per-(source, bucket) token sums (map-side combinable),
    an exclusive bucket-prefix window over <= 1000 rows per source
    (bounded by construction), and only buckets whose prefix is still
    under budget feed the exact window — any doc in a later bucket has
    cum_tok - n_tok >= its bucket prefix >= budget and could never pass
    the exact filter, so the result set is provably identical (the
    DuckDB oracle stays the naive full-corpus cumsum).  The exact window
    then runs over ~budget-sized survivors per source, not the corpus."""
    t = _doc_ntok(spark, sf_dir)
    keyed = t.withColumn("bucket", _bucket1000(F.col("doc_id")))
    per_bucket = keyed.groupBy("source", "bucket").agg(
        F.sum(F.col("n_tok").cast("long")).alias("bt")
    )
    wb = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    live = (
        per_bucket.withColumn("bucket_prefix", F.sum("bt").over(wb) - F.col("bt"))
        .filter(F.col("bucket_prefix") < TOKEN_BUDGET)
        .select("source", "bucket")
        .hint("merge")  # <= 1000 rows/source but corpus-many sources: never broadcast
    )
    w = (
        Window.partitionBy("source")
        .orderBy("bucket", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col("n_tok").cast("long")).over(w)
    # null-safe probe (ADVICE r5): window PARTITION BY groups NULL
    # sources into one partition in both engines, but a plain semi-join
    # on source would silently drop NULL-source rows — eqNullSafe keeps
    # the join and the windows in agreement on the NULL group.
    cond = F.col("k.source").eqNullSafe(F.col("l.source")) & (
        F.col("k.bucket") == F.col("l.bucket")
    )
    return (
        keyed.alias("k")
        .join(live.alias("l"), cond, "left_semi")
        .withColumn("cum_tok", cum)
        .filter(
            (F.col("cum_tok") - F.col("n_tok") < TOKEN_BUDGET)
        )
        .select("doc_id", "source", "n_tok", "cum_tok")
    )


Q_SAMPLE_TOKEN_BUDGET_SQL = (
    "WITH tok AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, source, "
    "len(" + WORDS_SQL.format(c="text") + ") AS n_tok, "
    + _BUCKET1000_SQL.format(c="doc_id")
    + " AS bucket FROM documents), "
    "c AS (SELECT doc_id, source, CAST(n_tok AS INTEGER) AS n_tok, "
    "CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY bucket, doc_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok FROM tok) "
    f"SELECT doc_id, source, n_tok, cum_tok FROM c WHERE cum_tok - n_tok < {TOKEN_BUDGET}"
)


# (doc_id string, n_tok) twin of tokens_table — n_tok == word count by
# construction (tokens are a 1:1 transform of the filtered words)
TOK_CTE_N = (
    "WITH t AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
    "len(" + WORDS_SQL.format(c="text") + ") AS n_tok FROM documents)"
)

CTX_LEN = 2048  # training context window the packer fills
PACK_RANGE_PARTS = 32  # range partitions for the distributed prefix sum


def q_pack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing manifest: where every document's tokens land in
    the fixed-CTX_LEN training examples when the corpus is concatenated
    in doc_id order (the assembly step between tokenization and the
    trainer; documents straddle pack boundaries, tokens flow
    continuously).  Emits per doc: global token offset, first/last pack
    index, and whether it straddles a boundary.

    Scale shape — a global running total WITHOUT a global window: a
    one-partition orderBy window would serialize the corpus through a
    single task, so this uses the classic two-phase distributed scan:
    range-partition by doc_id (partition i's keys all sort before
    partition i+1's), per-partition window cumsum, and a driver-side
    prefix of the per-partition totals (one tiny collect, #partitions
    rows) joined back as each partition's base offset.  The oracle is
    the naive single-window cumsum in DuckDB — the two must agree
    exactly, which is precisely what makes the distributed scan safe to
    ship.
    """
    t = _doc_ntok(spark, sf_dir).select("doc_id", "n_tok").filter(F.col("n_tok") > 0)
    # no sortWithinPartitions: pid depends only on the range partitioner,
    # and the per-partition window below shuffles + sorts by doc_id anyway
    rp = t.repartitionByRange(PACK_RANGE_PARTS, "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    rp = rp.localCheckpoint(eager=True)  # pin partition ids for the two phases
    totals = sorted(
        (r["pid"], r["s"])
        for r in rp.groupBy("pid").agg(F.sum(F.col("n_tok").cast("long")).alias("s")).collect()
    )
    base, acc = {}, 0
    for pid, s in totals:
        base[pid] = acc
        acc += s
    base_col = F.create_map(
        *[F.lit(x) for kv in sorted(base.items()) for x in kv]
    )[F.col("pid")]
    w = Window.partitionBy("pid").orderBy("doc_id")
    cum_before = (base_col + F.sum(F.col("n_tok").cast("long")).over(w) - F.col("n_tok")).cast(
        "long"
    )
    return (
        rp.withColumn("tok_start", cum_before)
        .select(
            "doc_id",
            F.col("n_tok").cast("int").alias("n_tok"),
            "tok_start",
            F.floor(F.col("tok_start") / CTX_LEN).cast("long").alias("pack_first"),
            F.floor((F.col("tok_start") + F.col("n_tok") - 1) / CTX_LEN)
            .cast("long")
            .alias("pack_last"),
        )
        .withColumn("straddles", F.col("pack_last") > F.col("pack_first"))
    )


Q_PACK_PLAN_SQL = (
    TOK_CTE_N
    + ", c AS (SELECT doc_id, n_tok, "
    "sum(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "- n_tok AS tok_start FROM t WHERE n_tok > 0) "
    "SELECT doc_id, CAST(n_tok AS INTEGER) AS n_tok, CAST(tok_start AS BIGINT) AS tok_start, "
    f"CAST(floor(tok_start / {CTX_LEN}) AS BIGINT) AS pack_first, "
    f"CAST(floor((tok_start + n_tok - 1) / {CTX_LEN}) AS BIGINT) AS pack_last, "
    f"floor((tok_start + n_tok - 1) / {CTX_LEN}) > floor(tok_start / {CTX_LEN}) AS straddles "
    "FROM c"
)


QUERIES = {
    "sample_stratified": q_sample_stratified,
    "sample_token_budget": q_sample_token_budget,
    "corpus_pack_plan": q_pack_plan,
}

ORACLES = {
    "sample_stratified": Q_SAMPLE_STRATIFIED_SQL,
    "sample_token_budget": Q_SAMPLE_TOKEN_BUDGET_SQL,
    "corpus_pack_plan": Q_PACK_PLAN_SQL,
}
