"""Mirror of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + sorted values.  Runs at sf0.001 for speed (driver uses 0.01).
"""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _pairs():
    import __spark_entry__ as entry

    qs = dict(entry.queries())
    os_ = dict(entry.oracle_sql())
    # Parity baselines retired from the driver's 50-row window stay
    # oracle-checked here (LOCAL_QUERIES/LOCAL_ORACLES per module).
    qs.update(entry.local_queries())
    os_.update(entry.local_oracle_sql())
    return [(name, qs[name], os_[name]) for name in qs if name in os_]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name,qfn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, ddb, name, qfn, sql):
    got = _norm(qfn(spark, SF_DIR).toPandas())
    want = _norm(ddb.sql(sql).df())
    assert len(got) == len(want), f"{name}: rows {len(got)} != oracle {len(want)}"
    assert list(got.columns) == list(want.columns), f"{name}: column mismatch"
    want = want.astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_every_query_has_rows_or_documented_empty(spark):
    import __spark_entry__ as entry

    all_queries = {**entry.queries(), **entry.local_queries()}
    for name, fn in all_queries.items():
        n = fn(spark, SF_DIR).count()
        # dedup_exact is legitimately empty (no full-text dups in testdata)
        if name not in ("dedup_exact",):
            assert n > 0, f"{name} returned no rows"


def test_null_text_and_source_parity(spark, tmp_path):
    # ADVICE r5 (medium): the r5 window→join rewrites must not change
    # NULL-key semantics — an inner/semi join on md5(text) or (source,
    # bucket) silently drops NULL-keyed rows while the DuckDB oracles'
    # windows group them.  The contract is now pinned (sentinel text
    # hash, coalesced prefix hash, null-safe sampling semi-join); this
    # corpus has NULL text, empty text, NULL source, and real dup groups
    # so every one of those paths diverges if the pin regresses.
    from conftest import write_docs_fixture

    from crumble_spark.pipeline import curate, dedup, sampling

    rows = [
        # (doc_id, text, source) — lang/n_chars filled by the fixture
        (1, None, "src0"),
        (2, None, "src1"),
        (3, None, None),
        (4, "", "src0"),
        (5, "", None),
        (6, "the quick brown fox jumps over the lazy dog again today", "src0"),
        (7, "the quick brown fox jumps over the lazy dog again today", "src1"),
        (8, "completely different text with many plain english words here", None),
        (9, "completely different text with many plain english words here", "src2"),
        (10, "a unique document with its own words and nothing shared", "src2"),
    ]
    # pad with distinct docs so sampling buckets/budget actually bind
    rows += [
        (100 + i, f"filler document number {i} with some extra words " + ("pad " * i), None if i % 3 == 0 else f"src{i % 4}")
        for i in range(24)
    ]
    write_docs_fixture(tmp_path, rows)

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    checks = [
        ("dedup_exact", dedup.q_dedup_exact, dedup.Q_DEDUP_EXACT_SQL),
        ("dedup_prefix", dedup.q_dedup_prefix, dedup.Q_DEDUP_PREFIX_SQL),
        # r7: the exact-dup collapse adds th-keyed joins (family table,
        # star branch) feeding the registered clusters oracle and the
        # collapsed census — per the CLAUDE.md rule, every new join on
        # the null-pinned text hash gets NULL-corpus parity coverage HERE
        # (this corpus has NULL text, empty text, and real dup families).
        ("dedup_clusters", dedup.q_dedup_clusters, dedup._q_dedup_clusters_sql()),
        (
            "simhash48_bucket_stats_collapsed",
            dedup.q_simhash48_bucket_stats_collapsed,
            dedup._q_simhash48_bucket_stats_sql(
                src="reps", head=dedup._FAM_REPS_CTE
            ),
        ),
        ("clean_manifest", curate.q_clean_manifest, curate._q_clean_manifest_sql()),
        ("clean_funnel", curate.q_clean_funnel, curate._q_clean_funnel_sql()),
        ("sample_stratified", sampling.q_sample_stratified, sampling.Q_SAMPLE_STRATIFIED_SQL),
        ("sample_token_budget", sampling.q_sample_token_budget, sampling.Q_SAMPLE_TOKEN_BUDGET_SQL),
    ]
    for name, qfn, sql in checks:
        got = _norm(qfn(spark, str(tmp_path)).toPandas())
        want = _norm(con.sql(sql).df())
        assert len(got) == len(want), f"{name}: rows {len(got)} != oracle {len(want)}"
        want = want.astype(got.dtypes.to_dict())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the NULL-text docs must actually be PRESENT in the exact-dup drop
    # list (they form one group, keeper doc_id=1) — the very rows the
    # pre-pin inner join silently lost
    dropped = set(dedup.q_dedup_exact(spark, str(tmp_path)).toPandas()["doc_id"])
    assert {2, 3} <= dropped
    # and the funnel total must still count every document
    funnel = curate.q_clean_funnel(spark, str(tmp_path)).toPandas()
    assert int(funnel.loc[funnel.stage == "0_total", "n_docs"].iloc[0]) == len(rows)


def test_token_count_regex_exotic_whitespace_parity(spark, tmp_path):
    # U+000B (vertical tab) is inside Java's \s but outside RE2's; the
    # Unicode spaces (U+00A0, U+2028) are outside both ASCII classes.
    # The explicit whitespace class keeps both engines in lockstep on a
    # corpus containing all of them (ADVICE r2: \s divergence).
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crumble_spark.pipeline import textqc

    texts = [
        "a\x0b.b",
        "x\u00a0y!",
        "line\u2028two,",
        "tab\t; end\r\n",
        "plain words",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(len(texts))],
            "text": texts,
            "source": ["t"] * len(texts),
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf), str(tmp_path / "documents.parquet"))

    got = _norm(textqc.q_token_count_regex(spark, str(tmp_path)).toPandas())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = _norm(con.sql(textqc._Q_TOKEN_COUNT_REGEX_SQL).df())
    want = want.astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
