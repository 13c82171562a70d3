"""Mimics the round driver's correctness gate: run every entry of
``__spark_entry__.queries()`` and its ``oracle_sql()`` twin on the same
parquet, compare row count + schema (column names) + order-insensitive
values. Runs at sf0.001 locally (driver uses sf0.01)."""

import datetime
import math
import os
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _norm(v):
    """Everything becomes a string so row tuples are always sortable;
    None/NaN → sentinel; datetimes at midnight fold to their date."""
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
    if v is getattr(__import__("pandas"), "NaT", object()):
        return "\x00NULL"
    return str(v)


def _rows(df, cols):
    return sorted(
        tuple(_norm(r[c]) for c in cols) for r in df.to_dict("records")
    )


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, con, name):
    q = entry_mod.queries()[name]
    oracle = entry_mod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR).toPandas()
    if oracle is None:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    odf = con.sql(oracle).df()
    s_cols = sorted(sdf.columns)
    o_cols = sorted(odf.columns)
    assert s_cols == o_cols, f"{name}: schema mismatch {s_cols} vs {o_cols}"
    assert len(sdf) == len(odf), f"{name}: rowcount {len(sdf)} vs {len(odf)}"
    srows = _rows(sdf, s_cols)
    orows = _rows(odf, o_cols)
    if srows != orows:
        diffs = [
            (a, b) for a, b in zip(srows, orows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
