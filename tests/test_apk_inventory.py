"""Parity tests for operators/apk_inventory.py against a pandas
restatement of the reference cleanup job
(/root/reference/adscrawler/packages/apks/cleanup_apks.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from adscrawler_spark.operators import apk_inventory as AI


def _listing(spark, rows):
    return spark.createDataFrame(
        rows, "s3_key string, size_bytes long, last_modified string"
    )


def test_parse_apk_keys(spark):
    df = _listing(spark, [
        ("s3://adscrawler/apks/android/com.foo/123/com.foo.apk", 10, "2026-01-01"),
    ])
    r = AI.parse_apk_keys(df).collect()[0]
    assert (r.store_id, r.versionstr, r.file_path) == (
        "com.foo", "123", "com.foo.apk")


def _ref_copied(ldf: pd.DataFrame, tdf: pd.DataFrame) -> set:
    ldf = ldf.copy()
    ldf["store_id_count"] = ldf.groupby("store_id")["store_id"].transform("count")
    dup = (
        ldf[ldf["store_id_count"] > 1]
        .sort_values(["store_id", "last_modified", "s3_key"], ascending=False)
        .drop_duplicates(subset=["store_id"], keep="first")
    )
    merged = pd.merge(
        dup[["store_id", "versionstr", "s3_key"]],
        tdf[["store_id", "versionstr"]],
        on=["store_id", "versionstr"], how="inner")
    return set(merged["s3_key"].unique())


def test_copied_apk_deletions_parity(spark):
    lrows, trows = [], []
    for i in range(30):
        sid = f"com.app{i % 8}"
        ver = str(100 + i % 5)
        lrows.append((f"s3://a/apks/android/{sid}/{ver}/f.apk", i,
                      f"2026-01-{i % 9 + 1:02d}"))
        if i % 3 == 0:
            trows.append((f"s3://t/android/{sid}/{ver}/f.apk", i,
                          "2026-01-01"))
    ldf = AI.parse_apk_keys(_listing(spark, lrows))
    tdf = AI.parse_apk_keys(_listing(spark, trows))
    got = {r.s3_key for r in AI.copied_apk_deletions(ldf, tdf).collect()}
    want = _ref_copied(ldf.toPandas(), tdf.toPandas())
    assert got == want and len(want) > 0


def _ref_cleanup(sdf: pd.DataFrame, vcdf: pd.DataFrame):
    out = {}
    out["unrecorded"] = set(
        sdf[~sdf["store_id"].isin(vcdf["store_id"].unique())]["s3_key"].unique())
    out["incorrectly_recorded"] = set(
        sdf[~sdf["store_id"].isin(
            vcdf[vcdf["crawl_result"] == 1]["store_id"].unique())]
        ["s3_key"].unique())
    df = pd.merge(
        sdf, vcdf, left_on=["store_id", "versionstr"],
        right_on=["store_id", "version_code"], how="outer")
    out["no_version_code"] = set(
        df[(df["versionstr"].notna()) & (df["version_code"].isna())]
        ["s3_key"].unique())
    out["no_successful_crawl"] = set(
        df[(df["versionstr"].notna()) & (df["crawl_result"] != 1)]
        ["s3_key"].unique())
    fdf = df[(df["versionstr"].isna()) & (df["crawl_result"] == 1)]
    out["repairs"] = set(int(x) for x in fdf["id"])
    return out


@pytest.fixture()
def cleanup_inputs(spark):
    srows = []
    for i in range(40):
        sid = f"com.app{i % 12}"
        ver = str(100 + i % 6)
        srows.append((f"s3://a/apks/android/{sid}/{ver}/f.apk", i, "2026-01-01"))
    sdf = AI.parse_apk_keys(_listing(spark, srows)).dropDuplicates(["s3_key"])
    vcrows = []
    for j in range(50):
        vcrows.append((
            j, 1000 + j, f"com.app{j % 15}", str(100 + j % 8),
            (j % 3) + 0 if j % 4 else -1, f"2026-01-{j % 9 + 1:02d}"))
    vcdf = spark.createDataFrame(
        vcrows,
        "id long, store_app long, store_id string, version_code string, "
        "crawl_result int, created_at string",
    )
    return sdf, vcdf


def test_file_cleanup_classes_parity(spark, cleanup_inputs):
    sdf, vcdf = cleanup_inputs
    deletions, repairs = AI.file_cleanup_classes(sdf, vcdf)
    got = {}
    for r in deletions.collect():
        got.setdefault(r.reason, set()).add(r.s3_key)
    got["repairs"] = {r.id for r in repairs.collect()}
    want = _ref_cleanup(sdf.toPandas(), vcdf.toPandas())
    for k in ("unrecorded", "incorrectly_recorded", "no_version_code",
              "no_successful_crawl", "repairs"):
        assert got.get(k, set()) == want[k], k
    assert {r.crawl_result for r in repairs.collect()} <= {-2}


def test_package_inventory(spark, cleanup_inputs):
    sdf, vcdf = cleanup_inputs
    inv = AI.package_inventory(
        {"loki": sdf, "thirdgate": sdf.limit(5)}, vcdf, "2026-07-09"
    )
    rows = inv.collect()
    assert len(rows) > 0
    assert set(inv.columns) == {
        "store_app", "version_code_id", "versionstr", "myregion",
        "file_key", "last_modified", "batch_date"}
    assert all(r.version_code_id is not None for r in rows)
    assert {r.myregion for r in rows} == {"loki", "thirdgate"}
    assert str(rows[0].batch_date) == "2026-07-09"
