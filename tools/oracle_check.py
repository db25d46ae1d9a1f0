"""Local mirror of the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side, compare row count + schema + order-
insensitive values.  Usage:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str:
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWS {len(spark_pdf)} vs {len(duck_pdf)}"
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"SCHEMA {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            import numpy as np
            if not np.allclose(av.astype(float), bv.astype(float),
                               rtol=0, atol=0, equal_nan=True):
                bad = (av.astype(float) != bv.astype(float))
                i = bad[bad].index[0]
                return f"VALUES col {c} row {i}: {av[i]!r} vs {bv[i]!r}"
        else:
            if not av.equals(bv.astype(av.dtype) if av.dtype != bv.dtype else bv):
                neq = av != bv
                i = neq[neq].index[0]
                return (f"VALUES col {c} row {i}: {av[i]!r} vs {bv[i]!r}"
                        f" (dtypes {av.dtype}/{bv.dtype})")
    # dtype drift report (informational; driver may be stricter)
    drift = [f"{c}:{a[c].dtype}/{b[c].dtype}" for c in a.columns
             if a[c].dtype != b[c].dtype]
    return "OK" + (f" (dtype drift {drift})" if drift else "")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from gqlite_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:28s} SPARK-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only ({len(sdf)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name:28s} DUCK-ERROR {str(e)[:200]}")
            failures += 1
            continue
        verdict = compare(sdf, ddf)
        status = "OK" if verdict.startswith("OK") else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name:28s} {verdict[:160]}  ({len(sdf)} rows, "
              f"{time.time()-t0:.1f}s)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main() else 0)
