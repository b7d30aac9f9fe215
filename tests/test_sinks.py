"""Iceberg sink plumbing, injection-tested (the runtime isn't on this
sandbox's classpath): overwritePartitions for idempotent split re-writes,
create-on-first-run with split_id partitioning, snapshot-summary
provenance, and a clear error when the runtime is absent."""

import pytest

from crumble_spark import sinks


class FakeWriter:
    """Records the DataFrameWriterV2 call chain."""

    def __init__(self, log, fail_overwrite=None, fail_append=None):
        self.log = log
        self._fail_overwrite = fail_overwrite
        self._fail_append = fail_append

    def option(self, k, v):
        self.log.append(("option", k, v))
        return self

    def using(self, fmt):
        self.log.append(("using", fmt))
        return self

    def partitionedBy(self, col):
        self.log.append(("partitionedBy", str(col)))
        return self

    def overwritePartitions(self):
        if self._fail_overwrite:
            raise self._fail_overwrite
        self.log.append(("overwritePartitions",))

    def append(self):
        if self._fail_append:
            raise self._fail_append
        self.log.append(("append",))

    def create(self):
        self.log.append(("create",))


def test_iceberg_write_overwrites_partitions_with_provenance():
    log = []
    sinks.write_encoded_iceberg(
        enc=object(), table="lake.enc", run_id="r42",
        writer_factory=lambda df: FakeWriter(log),
    )
    assert ("overwritePartitions",) in log
    assert ("option", "snapshot-property.crumble.run_id", "r42") in log
    assert ("option", "snapshot-property.crumble.engine", "crumble_spark") in log


def test_iceberg_write_creates_partitioned_table_on_first_run(spark):
    # spark fixture: the create path builds a Column for partitionedBy()
    log = []
    calls = {"n": 0}

    def factory(df):
        calls["n"] += 1
        if calls["n"] == 1:
            return FakeWriter(log, fail_overwrite=Exception("TABLE_OR_VIEW_NOT_FOUND"))
        return FakeWriter(log)

    sinks.write_encoded_iceberg(object(), "lake.enc", "r1", writer_factory=factory)
    assert ("create",) in log
    assert ("using", "iceberg") in log
    assert any(op == "partitionedBy" and "split_id" in arg for op, *rest in log for arg in rest)


def test_iceberg_write_names_the_missing_runtime():
    with pytest.raises(RuntimeError, match="Iceberg catalog/runtime"):
        sinks.write_encoded_iceberg(
            object(), "lake.enc", "r1",
            writer_factory=lambda df: FakeWriter(
                [], fail_overwrite=Exception("Cannot find catalog plugin for lake")
            ),
        )


def test_iceberg_write_reraises_unrelated_failures():
    with pytest.raises(Exception, match="quota exceeded"):
        sinks.write_encoded_iceberg(
            object(), "lake.enc", "r1",
            writer_factory=lambda df: FakeWriter(
                [], fail_overwrite=Exception("quota exceeded")
            ),
        )


class DirCatalog:
    """Parquet-dir-backed stand-in for an Iceberg catalog: table name →
    directory, overwritePartitions → dynamic partition overwrite, append →
    parquet append.  Lets the WHOLE table-in/table-out encode job run
    without the Iceberg runtime on the classpath."""

    def __init__(self, spark, root):
        self.spark, self.root = spark, str(root)

    def path(self, name):
        return f"{self.root}/{name.replace('.', '__')}"

    def read(self, name):
        return self.spark.read.parquet(self.path(name))

    def writer(self, df, name):
        cat, p = self, self.path(name)

        class W:
            def option(self, k, v):
                return self

            def overwritePartitions(self):
                cat.spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", "dynamic"
                )
                df.write.partitionBy("split_id").mode("overwrite").parquet(p)

            def append(self):
                df.write.mode("append").parquet(p)

        return W()


def test_job_round_trips_iceberg_table_in_table_out(spark, tmp_path):
    # the full job surface under injected catalog IO: read the tokens
    # table from the "catalog", encode, write encoded + lineage tables,
    # then decode-verify what the catalog read returns — bit-identical
    from crumble_spark import job, synth
    from crumble_spark.decode import decode_df

    cat = DirCatalog(spark, tmp_path)
    synth.synth_table(spark, 60, seed=11).write.parquet(cat.path("lake.tokens"))

    df = sinks.read_tokens_iceberg(spark, "lake.tokens", reader=cat.read)
    cfg = job.EncodeConfig(block_size=256, n_splits=8)
    summary = job.run_encode_job(
        spark, df, "lake.enc", cfg=cfg, sink="iceberg",
        table_reader=cat.read, writer_factory=cat.writer,
    )
    assert summary["rows"] == 60 and summary["splits"] <= 8

    decoded = decode_df(cat.read("lake.enc"), verify=True)
    assert decoded.count() == 60
    # lineage landed in the sibling catalog table, not a filesystem path
    assert cat.read("lake.enc_lineage").filter("status = 'done'").count() > 0


def test_read_tokens_iceberg_names_the_missing_runtime(spark):
    def boom(_):
        raise Exception("Cannot find catalog plugin for lake")

    with pytest.raises(RuntimeError, match="Iceberg catalog/runtime"):
        sinks.read_tokens_iceberg(spark, "lake.tokens", reader=boom)


def test_lineage_append_creates_then_appends():
    log = []
    calls = {"n": 0}

    def factory(df):
        calls["n"] += 1
        if calls["n"] == 1:
            return FakeWriter(log, fail_append=Exception("NoSuchTableException"))
        return FakeWriter(log)

    sinks.append_lineage_iceberg(object(), "lake.enc_lineage", writer_factory=factory)
    assert ("create",) in log
    log2 = []
    sinks.append_lineage_iceberg(
        object(), "lake.enc_lineage", writer_factory=lambda df: FakeWriter(log2)
    )
    assert ("append",) in log2


def test_job_iceberg_resume_skips_completed_splits(spark, tmp_path):
    # second run over the same catalog tables must find every split done
    # (lineage read back through the catalog), re-encode nothing new,
    # and leave the encoded table byte-identical
    import glob
    import os

    from crumble_spark import job, synth
    from crumble_spark.decode import decode_df

    cat = DirCatalog(spark, tmp_path)
    synth.synth_table(spark, 50, seed=13).write.parquet(cat.path("lake.tokens"))
    cfg = job.EncodeConfig(block_size=256, n_splits=8)
    kw = dict(cfg=cfg, sink="iceberg", table_reader=cat.read, writer_factory=cat.writer)
    s1 = job.run_encode_job(spark, cat.read("lake.tokens"), "lake.enc", **kw)
    files1 = sorted(glob.glob(cat.path("lake.enc") + "/**/*.parquet", recursive=True))
    mtimes1 = {f: os.path.getmtime(f) for f in files1}

    s2 = job.run_encode_job(spark, cat.read("lake.tokens"), "lake.enc", **kw)
    assert s2["rows"] == s1["rows"] == 50
    assert s2["splits"] == s1["splits"]
    # no split was re-written: same files, same mtimes (dynamic overwrite
    # only touches partitions present in the written frame — resume left
    # it empty)
    files2 = sorted(glob.glob(cat.path("lake.enc") + "/**/*.parquet", recursive=True))
    assert files2 == files1
    assert all(os.path.getmtime(f) == mtimes1[f] for f in files1)
    assert decode_df(cat.read("lake.enc"), verify=True).count() == 50
