"""Certify the driver's next CORRECTNESS window at driver scale.

Runs the first N entries of ``__spark_entry__.queries()`` (the names
the round driver will sample — rotation order puts never-verified
entries first) against their DuckDB oracles at sf0.01, using the same
row-count + schema + order-insensitive value comparison as
tests/test_oracle_queries.py.  Usage:

    python bench/certify_window.py [N] [SF_DIR]
"""

import datetime
import math
import os
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NULL"
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return str(v.date())
        return str(v)[:19]
    if isinstance(v, datetime.date):
        return str(v)
    import pandas as pd
    if v is pd.NaT:
        return "\x00NULL"
    return str(v)


def _rows(df, cols):
    return sorted(
        tuple(_norm(r[c]) for c in cols) for r in df.to_dict("records")
    )


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("certify-window")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = list(queries)[:N]
    failed = []
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
            oracle = oracles.get(name)
            if oracle is None:
                print(f"[{i:3}/{len(names)}] {name}: rows-only "
                      f"({len(sdf)} rows, {time.time()-t0:.1f}s)")
                continue
            odf = con.sql(oracle).df()
            s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
            ok = (
                s_cols == o_cols
                and len(sdf) == len(odf)
                and _rows(sdf, s_cols) == _rows(odf, o_cols)
            )
            status = "PASS" if ok else "FAIL"
            if not ok:
                failed.append(name)
                if s_cols != o_cols:
                    print(f"    schema: {s_cols} vs {o_cols}")
                elif len(sdf) != len(odf):
                    print(f"    rows: {len(sdf)} vs {len(odf)}")
            print(f"[{i:3}/{len(names)}] {name}: {status} "
                  f"({len(sdf)} rows, {time.time()-t0:.1f}s)")
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"[{i:3}/{len(names)}] {name}: ERROR {exc}")
    print(f"\n{len(names) - len(failed)}/{len(names)} pass")
    if failed:
        print("FAILED:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
