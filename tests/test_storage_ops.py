"""Tests for operators/storage_ops.py against pandas/python
restatements of process/storage.py's maintenance loops."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from adscrawler_spark.operators import storage_ops as SO


def test_weekly_monday_prefixes_matches_pandas_wmon(spark):
    ranges = spark.createDataFrame(
        [("bucket/tbl", dt.date(2026, 1, 1), dt.date(2026, 2, 10)),
         ("other", dt.date(2026, 3, 2), dt.date(2026, 3, 2))],  # Monday start
        "prefix string, start_date date, end_date date",
    )
    got = {(r.prefix, r.delete_prefix)
           for r in SO.weekly_monday_prefixes(ranges).collect()}
    want = set()
    for prefix, start, end in [("bucket/tbl", "2026-01-01", "2026-02-10"),
                               ("other", "2026-03-02", "2026-03-02")]:
        for d in pd.date_range(start, end, freq="W-MON"):
            want.add((prefix, f"{prefix}/week_start={d.strftime('%Y-%m-%d')}/"))
    assert got == want
    # sanity: the reference's anchored range includes a Monday start day
    assert ("other", "other/week_start=2026-03-02/") in got


def test_date_range_delete_plan_chunks(spark):
    mondays = ["2026-01-05", "2026-01-12"]
    keys = []
    for m in mondays:
        keys += [(f"bucket/tbl/week_start={m}/part-{i:04d}.parquet",)
                 for i in range(7)]
    # outside the range / non-weekly keys never match
    keys += [("bucket/tbl/week_start=2026-02-02/part-0000.parquet",),
             ("bucket/tbl/other=x/part-0000.parquet",)]
    listing = spark.createDataFrame(keys, "s3_key string")
    ranges = spark.createDataFrame(
        [("bucket/tbl", dt.date(2026, 1, 4), dt.date(2026, 1, 18))],
        "prefix string, start_date date, end_date date",
    )
    prefixes = SO.weekly_monday_prefixes(ranges)
    got = SO.date_range_delete_plan(listing, prefixes, chunk_size=5).collect()
    # reference order: prefix asc, then key asc, chunked by 5
    ordered = sorted(
        (k for k, in keys if "week_start=2026-01-05" in k
         or "week_start=2026-01-12" in k)
    )
    want = {k: i // 5 for i, k in enumerate(ordered)}
    assert {r.s3_key: r.chunk_idx for r in got} == want
    assert len(got) == 14


def test_mitm_upload_reconciliation(spark):
    local = spark.createDataFrame(
        [("traffic_com.app.one.log",), ("traffic_com.app.two.log",),
         ("traffic_com.app.three.log",), ("notes.txt",),
         ("traffic_.log",)],
        "file_name string",
    )
    scans = spark.createDataFrame(
        [("com.app.one", 11), ("com.app.three", 12), ("com.other", 13)],
        "store_id string, run_id int",
    )
    up, missing = SO.mitm_upload_reconciliation(local, scans)
    assert {(r.store_id, r.run_id) for r in up.collect()} == {
        ("com.app.one", 11), ("com.app.three", 12)}
    assert {r.store_id for r in missing.collect()} == {"com.app.two"}


def test_apk_keys_with_version(spark):
    listing = spark.createDataFrame(
        [("apks/android/com.a/123/com.a_h.apk", 10, "2026-01-01"),
         ("apks/android/com.b/com.b.apk", 20, "2026-01-02"),
         ("apks/android/com.c", 30, "2026-01-03")],
        "s3_key string, size long, last_modified string",
    )
    got = {r.s3_key: r for r in SO.apk_keys_with_version(listing).collect()}
    a = got["apks/android/com.a/123/com.a_h.apk"]
    assert (a.store_id, a.version_code, a.size) == ("com.a", "123", 10)
    # reference quirk kept: a 4-segment key takes its FILENAME as the
    # version_code (key_parts[3] with len == 4, storage.py:466-469)
    b = got["apks/android/com.b/com.b.apk"]
    assert (b.store_id, b.version_code) == ("com.b", "com.b.apk")
    c = got["apks/android/com.c"]
    assert (c.store_id, c.version_code) == ("com.c", "unknown")
