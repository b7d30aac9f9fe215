"""Point lookups into the encoded store: correct rows back, and the
split filter must prune partitions at scan time (not post-scan)."""

from pyspark.sql import functions as F

from crumble_spark import lookup, synth
from crumble_spark.encode import encode_df, with_split_id


def _encoded_dir(spark, tmp_path, n_splits=16):
    out = str(tmp_path / "enc")
    df = with_split_id(synth.synth_table(spark, 300, seed=21, mean_len=300, parts=4), n_splits)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    encode_df(df, block_size=256, n_splits=n_splits).write.partitionBy(
        "split_id"
    ).mode("overwrite").parquet(out)
    return out, df


def test_lookup_returns_exact_docs(spark, tmp_path):
    out, src = _encoded_dir(spark, tmp_path)
    want = {r["doc_id"]: r["tokens"] for r in src.limit(50).collect()}
    ids = sorted(want)[:5]
    got = {r["doc_id"]: r["tokens"] for r in lookup.decode_docs(spark, out, ids, n_splits=16).collect()}
    assert set(got) == set(ids)
    for d in ids:
        assert got[d] == want[d]


def test_lookup_resolves_n_splits_from_sidecar(spark, tmp_path):
    from crumble_spark import sinks

    out, src = _encoded_dir(spark, tmp_path, n_splits=16)
    sinks.write_store_meta(out, 16)
    ids = [src.select("doc_id").collect()[0]["doc_id"]]
    got = lookup.decode_docs(spark, out, ids).collect()  # no n_splits passed
    assert {r["doc_id"] for r in got} == set(ids)


def test_lookup_refuses_sidecarless_store_without_n_splits(spark, tmp_path):
    import pytest

    out, src = _encoded_dir(spark, tmp_path)
    with pytest.raises(ValueError, match="_crumble_meta.json"):
        lookup.decode_docs(spark, out, ["x"])


def test_lookup_prunes_partitions(spark, tmp_path):
    out, src = _encoded_dir(spark, tmp_path)
    ids = [src.select("doc_id").collect()[0]["doc_id"]]
    enc = (
        spark.read.parquet(out)
        .filter(F.col("split_id").isin([lookup.split_of(ids[0], 16)]))
        .filter(F.col("doc_id").isin(ids))
    )
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "split_id" in plan.split("PartitionFilters")[1][:120]
    # and the doc_id predicate reaches parquet
    assert "PushedFilters" in plan and "doc_id" in plan.split("PushedFilters")[1][:200]
