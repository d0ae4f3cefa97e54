"""Mini-driver: run every queries() entry and its oracle_sql() side by side
at sf0.001, exactly like the real correctness gate (order-insensitive,
columns sorted by name)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(str(r[i]) for i in order))
    return sorted(cols), sorted(out)


ALL_KEYS = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ALL_KEYS)
def test_query_vs_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    df = q(spark, SF_DIR)
    s_cols, s_rows = _normalize(df.columns, [tuple(r) for r in df.collect()])
    if sql is None:
        assert len(s_rows) >= 0  # rows-only check
        return
    res = duck.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    d_cols, d_rows = _normalize(d_cols, d_rows)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    assert s_rows == d_rows, f"{name}: value mismatch"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["s", "p", "o"]
