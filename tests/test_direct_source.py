"""pyarrow-direct encode job: byte-equivalent to the DataFrame path,
idempotent resume on (file, row-group) input splits, verified decode."""

import pyspark.sql.functions as F
import pytest

from crumble_spark import synth
from crumble_spark.encode import encode_df
from crumble_spark.sources import parquet_direct as direct


@pytest.fixture(scope="module")
def tok_dir(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("tok") / "tokens")
    synth.synth_table(spark, 150, seed=11, mean_len=400, parts=5).write.parquet(p)
    return p


def test_direct_matches_dataframe_path(spark, tok_dir, tmp_path):
    out = str(tmp_path / "direct")
    lin = direct.encode_job_direct(spark, tok_dir, out, block_size=256, n_splits=16)
    assert lin.filter("status='done'").count() == len(direct.list_input_splits(tok_dir))

    got = spark.read.parquet(f"{out}/encoded")
    want = encode_df(
        spark.read.parquet(tok_dir), block_size=256, n_splits=16
    )
    key = lambda df: {
        r["doc_id"]: (r["row_hash"], r["bytes_out"], r["split_id"], len(r["blocks"]))
        for r in df.collect()
    }
    assert key(got) == key(want)


def test_direct_decode_verify(spark, tok_dir, tmp_path):
    out = str(tmp_path / "dv")
    direct.encode_job_direct(spark, tok_dir, out, block_size=256, n_splits=16)
    totals = direct.decode_verify_direct(spark, f"{out}/encoded")
    src = spark.read.parquet(tok_dir).agg(
        F.count("*").alias("r"), F.sum(F.col("n_tok").cast("long")).alias("t")
    ).collect()[0]
    assert totals["rows"] == src["r"]
    assert totals["tokens"] == src["t"]


def test_direct_resume_skips_done_splits(spark, tok_dir, tmp_path):
    out = str(tmp_path / "resume")
    all_splits = direct.list_input_splits(tok_dir)
    # first run: only 2 input splits exist in a copied subdir? simpler —
    # run full, then re-run with resume: nothing should re-encode
    direct.encode_job_direct(spark, tok_dir, out, block_size=256, n_splits=16)
    lin1 = spark.read.parquet(f"{out}/lineage_direct")
    n1 = lin1.count()
    assert n1 == len(all_splits)
    direct.encode_job_direct(spark, tok_dir, out, block_size=256, n_splits=16)
    lin2 = spark.read.parquet(f"{out}/lineage_direct")
    assert lin2.count() == n1  # resume appended nothing
