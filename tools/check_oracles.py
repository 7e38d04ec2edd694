"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.01 via Spark AND the matching oracle_sql() via DuckDB, then
compare row count + column names + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from simages_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str:
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWS {len(spark_pdf)} vs {len(duck_pdf)}"
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"COLS {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            import numpy as np

            if not np.allclose(
                av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True
            ):
                bad = (av.astype(float) - bv.astype(float)).abs().idxmax()
                return f"VALUES col={c} e.g. {av[bad]} vs {bv[bad]}"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                diff = av.astype(str) != bv.astype(str)
                i = diff.idxmax()
                return f"VALUES col={c} row{i}: {av[i]!r} vs {bv[i]!r}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    # a typo'd query name must be a hard error, not an empty loop that
    # prints "FAILURES: 0" — this tool is the correctness gate
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        print(f"known: {sorted(qs)}")
        return 2
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in oracles:
            print(f"{name:24s} rows-only  rows={len(sdf)}  ({t1 - t0:.1f}s)")
            continue
        ddf = con.sql(oracles[name]).df()
        verdict = compare(name, sdf, ddf)
        if verdict != "OK":
            failures += 1
        print(
            f"{name:24s} {verdict}  rows={len(sdf)}  "
            f"(spark {t1 - t0:.1f}s, duck {time.time() - t1:.1f}s)"
        )
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
