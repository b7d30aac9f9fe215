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


def test_sidecar_republish_is_atomic_overwrite(spark, tmp_path):
    # republish over an existing sidecar must go through the FileContext
    # overwrite-rename (no delete-then-rename window where a concurrent
    # reader sees no sidecar — ADVICE r3), and the new content must win
    from crumble_spark import sinks

    out = str(tmp_path / "store")
    sinks.write_store_meta(out, 16)
    assert sinks.read_store_meta(out)["n_splits"] == 16
    # the local-fs FileContext is always available → overwrite path taken
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    tmp = jvm_path(f"{out}/_probe.tmp")
    fs = jvm_path(out).getFileSystem(spark._jsc.hadoopConfiguration())
    o = fs.create(tmp, True)
    o.write(bytearray(b"x"))
    o.close()
    assert sinks._rename_overwrite(tmp, jvm_path(f"{out}/_crumble_meta.json"))
    # republish restores valid JSON over the clobbered sidecar
    sinks.write_store_meta(out, 32)
    assert sinks.read_store_meta(out)["n_splits"] == 32


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


def test_decode_docs_table_via_snapshot_property(spark, tmp_path):
    # Iceberg-store lookup: n_splits comes from the crumble.n_splits
    # snapshot property the encode job stamps; catalog IO injected
    # (runtime-free), decode must return exactly the requested docs
    import datetime as dt

    from crumble_spark import job, lookup, synth
    from test_sinks import DirCatalog

    cat = DirCatalog(spark, tmp_path)
    src = synth.synth_table(spark, 40, seed=21)
    src.write.parquet(cat.path("lake.tokens"))
    cfg = job.EncodeConfig(block_size=256, n_splits=8)
    job.run_encode_job(
        spark, cat.read("lake.tokens"), "lake.enc", cfg=cfg, sink="iceberg",
        table_reader=cat.read, writer_factory=cat.writer,
    )
    snaps = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), {"crumble.run_id": "r", "crumble.n_splits": "8"})],
        "committed_at timestamp, summary map<string,string>",
    )
    want = {r["doc_id"]: list(r["tokens"]) for r in src.collect()}
    ids = sorted(want)[:3]
    got = lookup.decode_docs_table(
        spark, "lake.enc", ids,
        reader=cat.read, snapshots_reader=lambda: snaps,
    ).collect()
    assert sorted(r["doc_id"] for r in got) == ids
    for r in got:
        assert list(r["tokens"]) == want[r["doc_id"]]

    # missing property → explicit error, never a silent partial lookup
    import pytest

    empty = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), {"other": "x"})],
        "committed_at timestamp, summary map<string,string>",
    )
    with pytest.raises(ValueError, match="crumble.n_splits"):
        lookup.decode_docs_table(
            spark, "lake.enc", ids, reader=cat.read,
            snapshots_reader=lambda: empty,
        )

    # under ANSI mode (Spark 4 default; a production Iceberg session may
    # not pin it off) the missing map key must still reach the designed
    # ValueError, not throw MAP_KEY_DOES_NOT_EXIST (ADVICE r3 →
    # try_element_at)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with pytest.raises(ValueError, match="crumble.n_splits"):
            lookup.decode_docs_table(
                spark, "lake.enc", ids, reader=cat.read,
                snapshots_reader=lambda: empty,
            )
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
