"""Local replica of the driver's CORRECTNESS gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir, canonicalize
(sort columns by name, sort rows, stringify) and compare.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return pdf


def main() -> None:
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from goscrape_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check-oracle", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name}: SPARK ERR {type(e).__name__}: {e}")
            fails.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            # rows-only: still exercise the canonicalizer (driver does)
            try:
                _canon(sdf.astype(str))
                print(f"{name}: no_oracle rows={len(sdf)} (canon ok)")
            except Exception as e:
                print(f"{name}: no_oracle CANON ERR {e}")
                fails.append(name)
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"{name}: ORACLE ERR {type(e).__name__}: {e}")
            fails.append(name)
            continue
        a = _canon(sdf.astype(str))
        b = _canon(odf.astype(str))
        rows = len(a) == len(b)
        schema = list(a.columns) == list(b.columns)
        match = rows and schema and a.equals(b)
        status = "OK" if match else "MISMATCH"
        print(f"{name}: {status} spark_rows={len(sdf)} oracle_rows={len(odf)}")
        if not match:
            fails.append(name)
            if rows and schema:
                diff = (a != b).any(axis=1)
                print(a[diff].head(3))
                print(b[diff].head(3))
            else:
                print(" spark cols:", list(a.columns), "oracle:", list(b.columns))
                print(a.head(3))
                print(b.head(3))
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
