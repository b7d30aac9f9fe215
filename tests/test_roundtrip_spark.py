"""End-to-end Spark round-trip: decode(encode(tokens)) bit-identical per
row, across every synthesis regime — the north_rule invariant and the
analogue of crumble's record-conservation check (snp_score.c:2021-2026).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crumble_spark import codecs, synth
from crumble_spark.decode import decode_df
from crumble_spark.encode import encode_df


@pytest.fixture(scope="module")
def tokens_df(spark):
    return synth.synth_table(spark, n_rows=300, seed=42, mean_len=600, parts=4).cache()


def test_roundtrip_bit_identical(spark, tokens_df):
    enc = encode_df(tokens_df, block_size=256, n_splits=8)
    dec = decode_df(enc, verify=True)  # verify=True raises on hash mismatch
    orig = {r["doc_id"]: r["tokens"] for r in tokens_df.collect()}
    back = {r["doc_id"]: r["tokens"] for r in dec.collect()}
    assert set(orig) == set(back)
    for k in orig:
        assert orig[k] == back[k], f"mismatch for {k}"


def test_row_count_conserved(spark, tokens_df):
    enc = encode_df(tokens_df, block_size=256)
    assert enc.count() == tokens_df.count()


def test_compression_beats_raw_overall(spark, tokens_df):
    enc = encode_df(tokens_df, block_size=1024)
    row = enc.agg(
        F.sum("bytes_in").alias("bi"), F.sum("bytes_out").alias("bo")
    ).collect()[0]
    assert row["bo"] < row["bi"]  # adaptive must win on the mixed-regime table


def test_codec_diversity(spark, tokens_df):
    enc = encode_df(tokens_df, block_size=1024)
    used = {
        r["codec_id"]
        for r in enc.select(F.explode("blocks.codec_id").alias("codec_id")).distinct().collect()
    }
    # the mixed fixture must exercise most of the codec stack
    assert {codecs.CONSTANT, codecs.RLE, codecs.DICT, codecs.FOR_BP}.issubset(used)


def test_empty_and_tiny_rows(spark):
    pdf = [
        ("a-1", [], 0, "web"),
        ("a-2", [7], 1, "web"),
        ("a-3", list(range(5)), 5, "code"),
    ]
    df = spark.createDataFrame(pdf, schema="doc_id string, tokens array<int>, n_tok int, source string")
    dec = decode_df(encode_df(df, block_size=4), verify=True)
    got = {r["doc_id"]: r["tokens"] for r in dec.collect()}
    assert got == {"a-1": [], "a-2": [7], "a-3": [0, 1, 2, 3, 4]}
