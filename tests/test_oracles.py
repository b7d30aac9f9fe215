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
