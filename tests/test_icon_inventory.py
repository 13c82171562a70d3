"""Parity tests for operators/icon_inventory.py against python
restatements of the reference icon jobs
(/root/reference/adscrawler/packages/apks/cleanup_app_icons.py,
/root/reference/adscrawler/app_stores/process_icons.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from adscrawler_spark.operators import icon_inventory as II


def _ref_walk(rows):
    """cleanup_app_icons.py:56-96 fold, in listing (key) order."""
    result = {}
    for key, last_mod in sorted(rows):
        rel = key.removeprefix("app-icons/")
        parts = rel.split("/", 1)
        if len(parts) != 2:
            continue
        store_id, filename = parts
        if filename.endswith("_128.png"):
            size = "128"
        elif filename.endswith("_64.png"):
            size = "64"
        else:
            continue
        by_store = result.setdefault(store_id, {})
        ex = by_store.get(size)
        if ex is None or last_mod > ex[1]:
            by_store[size] = (filename, last_mod)
    return result


@pytest.fixture()
def listing_rows():
    rows = []
    for i in range(40):
        sid = f"com.app{i % 9}"
        ts = f"2026-01-{i % 7 + 1:02d}"
        rows.append((f"app-icons/{sid}/h{i % 4}_128.png", ts))
        if i % 3 == 0:
            rows.append((f"app-icons/{sid}/h{i % 4}_64.png", ts))
        if i % 11 == 0:
            rows.append((f"app-icons/{sid}/readme.txt", ts))  # skipped
    return rows


def test_latest_icon_variants_parity(spark, listing_rows):
    df = spark.createDataFrame(
        [(f"s3k/{k}" if False else k, ts) for k, ts in listing_rows],
        "s3_key string, last_modified string",
    )
    got = {
        r.store_id: (r.filename_128, r.filename_64)
        for r in II.latest_icon_variants(df).collect()
    }
    want = _ref_walk(listing_rows)
    assert set(got) == set(want)
    for sid, sizes in want.items():
        assert got[sid][0] == (sizes.get("128") or (None,))[0]
        assert got[sid][1] == (sizes.get("64") or (None,))[0]


def _ref_cross(apps_df, s3_map):
    to_restore, null_128, null_64 = [], [], []
    for _, row in apps_df.iterrows():
        sid = int(row["id"])
        entry = s3_map.get(row["store_id"])
        db_128, db_64 = row.get("icon_128"), row.get("icon_64")
        if entry is not None:
            upd, need = {"id": sid}, False
            if (pd.isna(db_128) or not db_128) and "128" in entry:
                upd["icon_128"] = entry["128"][0]
                need = True
            if (pd.isna(db_64) or not db_64) and "64" in entry:
                upd["icon_64"] = entry["64"][0]
                need = True
            if need:
                to_restore.append(upd)
        if pd.notna(db_128) and (entry is None or "128" not in entry):
            null_128.append(sid)
        if pd.notna(db_64) and (entry is None or "64" not in entry):
            null_64.append(sid)
    return to_restore, null_128, null_64


def test_cross_reference_parity(spark, listing_rows):
    s3 = II.latest_icon_variants(
        spark.createDataFrame(listing_rows, "s3_key string, last_modified string")
    )
    apps_rows = []
    for i in range(25):
        sid = f"com.app{i % 12}"  # some store_ids absent from S3
        icon_128 = None if i % 3 == 0 else ("" if i % 3 == 1 else f"x{i}_128.png")
        icon_64 = None if i % 2 == 0 else f"x{i}_64.png"
        apps_rows.append((i, sid, icon_128, icon_64))
    apps = spark.createDataFrame(
        apps_rows, "id long, store_id string, icon_128 string, icon_64 string"
    )
    restores, n128, n64 = II.icon_cross_reference(apps, s3)
    got_restore = {
        r.id: (r.icon_128, r.icon_64) for r in restores.collect()
    }
    got_n128 = {r.id for r in n128.collect()}
    got_n64 = {r.id for r in n64.collect()}
    want_restore, want_n128, want_n64 = _ref_cross(
        apps.toPandas(), _ref_walk(listing_rows)
    )
    assert got_n128 == set(want_n128)
    assert got_n64 == set(want_n64)
    assert got_restore == {
        u["id"]: (u.get("icon_128"), u.get("icon_64")) for u in want_restore
    }
    assert len(got_restore) > 0 and len(got_n128) > 0


def test_sanitize_icon_url(spark):
    df = spark.createDataFrame(
        [("http://x/a\n b\tc%20?q=1",)], "url string"
    ).select(II.sanitize_icon_url(F.col("url")).alias("u"))
    # control chars removed, plain spaces and URL punctuation kept
    assert df.collect()[0].u == "http://x/a bc%20?q=1"


def test_build_icon_updates(spark):
    apps = spark.createDataFrame(
        [(1, "com.a", "http://x/1.png", None, None),
         (2, "com.b", "http://x/2.png", "have_128.png", "have_64.png"),
         (3, "com.c", None, None, None),
         (4, "com.d", "http://x/4.png", "have_128.png", None)],
        "id long, store_id string, icon_url_512 string, "
        "icon_128 string, icon_64 string",
    )
    out = {r.id: r for r in II.build_icon_updates(apps).collect()}
    # app 2 complete, app 3 has no source -> excluded from the plan
    assert 2 not in out and 3 not in out
    assert set(out) <= {1, 4}
    for r in out.values():
        assert (r.icon_128 or "").endswith("_128.png") or r.icon_128 is None
    # deterministic across runs
    again = {r.id: (r.icon_128, r.icon_64)
             for r in II.build_icon_updates(apps).collect()}
    assert again == {k: (v.icon_128, v.icon_64) for k, v in out.items()}


def test_icon_crawl_log(spark):
    apps = spark.createDataFrame([(7, "com.a")], "id long, store_id string")
    r = II.icon_crawl_log(apps, "2026-07-09 12:00:00").collect()[0]
    assert r.store_app == 7 and str(r.crawled_at).startswith("2026-07-09")
