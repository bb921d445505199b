"""Replicates the driver's correctness gate: run every queries() entry at
sf0.01 and compare against oracle_sql() via DuckDB (row count + column names
+ order-insensitive values)."""

import math
from collections import Counter

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return c


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    return cols, Counter(tuple(_norm(r[c]) for c in cols)
                         for r in df.collect())


def _duck_rows(con, sql):
    rel = con.sql(sql)
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    rows = Counter(tuple(_norm(row[i]) for i in order)
                   for row in rel.fetchall())
    return sorted_cols, rows


ORACLE = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLE.keys()))
def test_query_vs_oracle(spark, con, name):
    qcols, qrows = _spark_rows(QUERIES[name](spark, SF_DIR))
    ocols, orows = _duck_rows(con, ORACLE[name])
    assert qcols == ocols, f"{name}: column mismatch {qcols} vs {ocols}"
    assert sum(qrows.values()) == sum(orows.values()), \
        f"{name}: row count {sum(qrows.values())} vs {sum(orows.values())}"
    if qrows != orows:
        missing = list((orows - qrows).items())[:5]
        extra = list((qrows - orows).items())[:5]
        pytest.fail(f"{name}: value mismatch; oracle-only={missing} "
                    f"spark-only={extra}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert set(df.columns) == {"url", "kind", "text", "media_ref", "offset",
                               "depth", "epoch"}
