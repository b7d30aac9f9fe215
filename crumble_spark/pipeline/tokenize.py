"""Documents → token table, plus the engine queries the driver verifies.

The tokenizer (md5-prefix word hash mod 32k) is deliberately expressible
in both Spark and ANSI SQL, so the *whole* encode→decode round trip can be
oracle-checked: the oracle is the identity over the derived tokens, the
Spark side runs the full codec engine — any bit flip anywhere in the stack
shows up as a value-hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import codecs
from ..decode import decode_df
from ..encode import encode_df
from . import shared

BLOCK = 256


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def tokens_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """input_hint-shaped table derived deterministically from documents."""
    return (
        documents(spark, sf_dir)
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            shared.tokens_col(F.col("text")).alias("tokens"),
            F.col("source"),
        )
        .withColumn("n_tok", F.size("tokens"))
        .select("doc_id", "tokens", "n_tok", "source")
    )


# CTE prefix reused by every token-level oracle
TOK_CTE = (
    "WITH tok AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
    + shared.TOKENS_SQL.format(c="text")
    + " AS tokens, source FROM documents)"
)


def q_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine round trip; oracle = identity over derived tokens."""
    t = tokens_table(spark, sf_dir)
    dec = decode_df(encode_df(t, block_size=BLOCK), verify=True)
    return dec.select(
        "doc_id", F.posexplode("tokens").alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "token")


Q_ROUNDTRIP_DOCS_SQL = (
    TOK_CTE
    + ", idx AS (SELECT doc_id, tokens, unnest(generate_series(1, len(tokens))) AS i FROM tok) "
    "SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, tokens[i] AS token FROM idx"
)


def q_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc stats the cost model keys on, via JVM-side array functions
    (A1 consensus-scoring analogue expressed in pure Catalyst ops)."""
    t = tokens_table(spark, sf_dir).filter(F.size("tokens") > 0)
    ts = F.col("tokens")
    n_runs = F.when(F.size(ts) == 1, F.lit(1)).otherwise(
        F.size(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.size(ts) - 1),
                    lambda i: F.element_at(ts, i) != F.element_at(ts, i + 1),
                ),
                lambda x: x,
            )
        )
        + 1
    )
    return t.select(
        "doc_id",
        F.size(F.array_distinct(ts)).cast("int").alias("card"),
        F.array_min(ts).alias("vmin"),
        F.array_max(ts).alias("vmax"),
        n_runs.cast("int").alias("n_runs"),
    )


Q_BLOCK_STATS_SQL = (
    TOK_CTE
    + " SELECT doc_id, CAST(len(list_distinct(tokens)) AS INTEGER) AS card, "
    "list_aggregate(tokens, 'min') AS vmin, "
    "list_aggregate(tokens, 'max') AS vmax, "
    "CAST(CASE WHEN len(tokens) = 1 THEN 1 ELSE "
    "len(list_filter(generate_series(1, len(tokens) - 1), i -> tokens[i] <> tokens[i+1])) + 1 "
    "END AS INTEGER) AS n_runs "
    "FROM tok WHERE len(tokens) > 0"
)


def q_compression_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-internal metrics (no SQL oracle — codec output is not SQL)."""
    enc = encode_df(tokens_table(spark, sf_dir), block_size=BLOCK)
    return (
        enc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_tok").cast("long")).alias("n_tokens"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("bytes_out").alias("bytes_out"),
        )
        .withColumn(
            "ratio", F.round(F.col("bytes_in") / F.greatest(F.col("bytes_out"), F.lit(1)), 3)
        )
        .orderBy("source")
    )


def q_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle-checkable projection of the compression rollup: doc,
    token and input-byte accounting per source, read FROM THE ENCODER'S
    OUTPUT — the oracle recomputes the same from raw text, so any row the
    encoder drops, duplicates or mis-sizes shows up as a mismatch.  Only
    bytes_out/ratio (codec-dependent) stay engine-internal."""
    enc = encode_df(tokens_table(spark, sf_dir), block_size=BLOCK)
    return enc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_tok").cast("long")).alias("n_tokens"),
        F.sum("bytes_in").alias("bytes_in"),
    )


Q_SOURCE_PROFILE_SQL = (
    TOK_CTE
    + " SELECT source, count(*) AS n_docs, "
    "CAST(sum(len(tokens)) AS BIGINT) AS n_tokens, "
    "CAST(sum(len(tokens)) * 4 AS BIGINT) AS bytes_in "
    "FROM tok GROUP BY source"
)


def q_block_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-count conservation per source: the encoder's emitted block
    count must equal ceil(n_tok / block_size) summed over docs — derivable
    from the input, so the chunker itself is oracle-checked."""
    enc = encode_df(tokens_table(spark, sf_dir), block_size=BLOCK)
    return enc.groupBy("source").agg(
        F.sum(F.size("blocks").cast("long")).alias("n_blocks")
    )


Q_BLOCK_COUNT_SQL = (
    TOK_CTE
    + " SELECT source, CAST(sum(ceil(len(tokens) * 1.0 / "
    + str(BLOCK)
    + ")) AS BIGINT) AS n_blocks FROM tok GROUP BY source"
)


def q_codec_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which codecs the cost model picked (crumble's exit counters V2)."""
    enc = encode_df(tokens_table(spark, sf_dir), block_size=BLOCK)
    name_map = F.create_map(
        *[x for cid, nm in sorted(codecs.CODEC_NAMES.items()) for x in (F.lit(cid), F.lit(nm))]
    )
    return (
        enc.select(F.explode("blocks.codec_id").alias("codec_id"))
        .groupBy("codec_id")
        .agg(F.count("*").alias("n_blocks"))
        .withColumn("codec", name_map[F.col("codec_id")])
        .orderBy("codec_id")
    )


def q_roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second engine round trip on a differently-shaped token table:
    per-order part-key streams from lineitem (short arrays, wide values)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    t = (
        li.groupBy(F.col("l_orderkey").cast("string").alias("doc_id"))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("l_linenumber").alias("ln"),
                            (F.col("l_partkey") % 4096).cast("int").alias("tk"),
                        )
                    )
                ),
                lambda s: s["tk"],
            ).alias("tokens")
        )
        .select(
            "doc_id", "tokens", F.size("tokens").alias("n_tok"), F.lit("lineitem").alias("source")
        )
    )
    dec = decode_df(encode_df(t, block_size=BLOCK), verify=True)
    return dec.select("doc_id", F.posexplode("tokens").alias("pos", "token")).select(
        "doc_id", F.col("pos").cast("int").alias("pos"), "token"
    )


Q_ROUNDTRIP_LINEITEM_SQL = (
    "WITH t AS (SELECT CAST(l_orderkey AS VARCHAR) AS doc_id, "
    "list(CAST(l_partkey % 4096 AS INTEGER) ORDER BY l_linenumber, l_partkey % 4096) AS tokens "
    "FROM lineitem GROUP BY 1), "
    "idx AS (SELECT doc_id, tokens, unnest(generate_series(1, len(tokens))) AS i FROM t) "
    "SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, tokens[i] AS token FROM idx"
)


def q_validate_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input-contract check on the derived tokens table (all-zero
    violation counts when the contract holds)."""
    from ..validate import validation_report

    return validation_report(tokens_table(spark, sf_dir)).orderBy("source")


Q_VALIDATE_SQL = (
    TOK_CTE
    + " SELECT source, count(*) AS n_rows, "
    "CAST(sum(CASE WHEN tokens IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_tokens, "
    "CAST(0 AS BIGINT) AS n_tok_mismatch, "  # derived table: n_tok == len(tokens) by construction

    "CAST(sum(CASE WHEN doc_id IS NULL OR doc_id = '' THEN 1 ELSE 0 END) AS BIGINT) AS bad_doc_id "
    "FROM tok GROUP BY source"
)


QUERIES = {
    "engine_roundtrip_docs": q_roundtrip_docs,
    "engine_roundtrip_lineitem": q_roundtrip_lineitem,
    "engine_validate_contract": q_validate_contract,
    "engine_block_stats": q_block_stats,
    "engine_source_profile": q_source_profile,
    "engine_block_count": q_block_count,
    "engine_compression_by_source": q_compression_by_source,
    "engine_codec_histogram": q_codec_histogram,
}

ORACLES = {
    "engine_roundtrip_docs": Q_ROUNDTRIP_DOCS_SQL,
    "engine_roundtrip_lineitem": Q_ROUNDTRIP_LINEITEM_SQL,
    "engine_validate_contract": Q_VALIDATE_SQL,
    "engine_block_stats": Q_BLOCK_STATS_SQL,
    "engine_source_profile": Q_SOURCE_PROFILE_SQL,
    "engine_block_count": Q_BLOCK_COUNT_SQL,
    # bytes_out/ratio and the codec histogram are engine-internal (codec
    # output is not SQL-expressible): rows-only checks by design
}
