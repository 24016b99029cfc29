"""Driver-contract smoke: entry() + queries()/oracle_sql() shape, and the
full Spark-vs-DuckDB comparison at sf0.001 (fast; sf0.01 runs in
tools/check_contract.py and in the driver itself)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_entry_returns_edges(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"src", "dst", "rel_type", "stoichiometry", "order"} <= set(df.columns)


def test_oracle_keys_subset_of_queries():
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 30


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_query_matches_duckdb_oracle(spark, duck, name):
    got = entrymod.queries()[name](spark, SF_DIR).toPandas()
    exp = duck.sql(entrymod.oracle_sql()[name]).df()
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    assert sorted(got.columns) == sorted(exp.columns)
    a, b = _norm(got), _norm(exp)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
