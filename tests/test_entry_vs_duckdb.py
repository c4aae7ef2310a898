"""Mimic the driver's correctness gate: run every __spark_entry__
queries() entry on sf0.001 and compare against its oracle_sql() via
DuckDB (row count + column names + sorted values)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_entry_matches_oracle(spark, ddb, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    got = _norm(fn(spark, SF_DIR).toPandas())
    assert sql is not None, f"{name} missing oracle_sql"
    want = _norm(ddb.sql(sql).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype != w.dtype:
            g, w = g.astype(str), w.astype(str)
        assert g.equals(w), f"{name}.{c} mismatch:\n{got[~(g == w)].head()}\n{want[~(g == w)].head()}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "score_q"}
