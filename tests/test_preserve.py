"""Keep-ranges: rows inside preserve ranges come out all-RAW and still
round-trip; rows outside keep their adaptive codecs."""

from pyspark.sql import functions as F

from crumble_spark import codecs, synth
from crumble_spark.decode import decode_df
from crumble_spark.encode import encode_df
from crumble_spark.preserve import KEEP_SCHEMA, with_force_raw


def test_keep_ranges_force_raw(spark):
    df = synth.synth_table(spark, 120, seed=21, mean_len=300, parts=2).cache()
    keep = spark.createDataFrame(
        [("web", "web-0000000000", "web-0000000059")], schema=KEEP_SCHEMA
    )
    marked = with_force_raw(df, keep)
    kept_ids = {
        r["doc_id"] for r in marked.filter("force_raw").select("doc_id").collect()
    }
    assert kept_ids  # fixture must actually cover some rows
    assert all(d.startswith("web-") and d <= "web-0000000059" for d in kept_ids)

    enc = encode_df(marked, block_size=128, n_splits=8).cache()
    codec_by_doc = {
        r["doc_id"]: set(r["cids"])
        for r in enc.select(
            "doc_id", F.col("blocks.codec_id").alias("cids")
        ).collect()
    }
    for doc_id, cids in codec_by_doc.items():
        if doc_id in kept_ids:
            assert cids <= {codecs.RAW}, f"{doc_id} not verbatim: {cids}"
    # adaptive rows still use non-RAW codecs somewhere
    assert any(
        cids - {codecs.RAW} for d, cids in codec_by_doc.items() if d not in kept_ids
    )

    dec = decode_df(enc, verify=True)
    got = {r["doc_id"]: r["tokens"] for r in dec.collect()}
    want = {r["doc_id"]: r["tokens"] for r in df.collect()}
    assert got == want
