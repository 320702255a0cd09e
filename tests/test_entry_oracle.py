"""Local emulation of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf=0.01, compare row count, column names, and an order-insensitive value
multiset."""

import math

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    return str(v)


def _normalize(pdf):
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False)
    )
    return list(pdf.columns), rows


QUERIES = sorted(E.queries().keys())


def test_oracle_covers_all_queries():
    assert set(E.oracle_sql().keys()) == set(E.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    q = E.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    oracle_pdf = ddb.execute(E.oracle_sql()[name]).fetchdf()
    s_cols, s_rows = _normalize(spark_pdf)
    o_cols, o_rows = _normalize(oracle_pdf)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} vs {len(o_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, o_rows) if a != b
    ]
    assert not mismatches, f"{name}: first diffs {mismatches[:3]}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
