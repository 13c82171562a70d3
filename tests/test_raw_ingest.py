"""Tests for plans/raw_ingest.py — the S3 app-details/keywords lake
ingest (process/app_details.py) re-expressed as partitioned writes +
distributed resolves."""

import os

import pytest
from pyspark.sql import functions as F

from adscrawler_spark.plans import raw_ingest as RI
from adscrawler_spark.sources.catalog import Catalog
from adscrawler_spark.sources import ledger


def _details(spark, n=50, date="2026-07-09"):
    return spark.range(n).select(
        F.concat(F.lit("sid"), F.col("id")).alias("store_id"),
        F.lit(date).alias("crawled_date"),
        F.when(F.col("id") % 3 == 0, "US").otherwise("DE").alias("country"),
        (F.col("id") % 4 == 0).cast("int").alias("crawl_result"),
        F.when(F.col("id") % 5 != 0, F.col("id")).alias("store_app_db_id"),
        F.concat(F.lit("name"), F.col("id")).alias("name"),
        F.lit("http://x/icon").alias("icon_url_100"),
    )


def test_compact_incoming_roundtrip(spark, tmp_path):
    root = str(tmp_path)
    df = _details(spark)
    RI.write_raw_details(df, root, store=1)
    counts = RI.compact_incoming(spark, root, store=1,
                                 crawled_date="2026-07-09")
    # per-country counts match the source exactly
    assert counts == {"US": 17, "DE": 33}
    out = spark.read.parquet(
        f"{root}/{RI.DETAILS_PREFIX}/store=1/crawled_date=2026-07-09"
    )
    assert out.count() == 50
    # crawl_result is a physical partition column in the compacted
    # layout (app_details.py PARTITION_BY (crawl_result))
    base = f"{root}/{RI.DETAILS_PREFIX}/store=1/crawled_date=2026-07-09"
    assert any("crawl_result=" in d for d in os.listdir(f"{base}/country=US"))


def test_compact_incoming_schema_union(spark, tmp_path):
    # incoming files with differing schemas union by name
    root = str(tmp_path)
    RI.write_raw_details(_details(spark, 10), root, store=1)
    extra = _details(spark, 10).withColumn("rating", F.lit(4.5))
    RI.write_raw_details(extra, root, store=1)
    counts = RI.compact_incoming(spark, root, store=1,
                                 crawled_date="2026-07-09")
    out = spark.read.parquet(
        f"{root}/{RI.DETAILS_PREFIX}/store=1/crawled_date=2026-07-09"
    )
    assert "rating" in out.columns and out.count() == 20
    assert sum(counts.values()) == 20


def test_resolve_app_details(spark):
    out = RI.resolve_app_details(_details(spark)).collect()
    # crawl_result=1 rows: id%4==0 (13 ids); minus id%5==0 nulls
    # (ids 0,20,40 are both %4 and %5) -> 10 rows
    assert len(out) == 10
    assert all(r.store_app is not None for r in out)
    cols = RI.resolve_app_details(_details(spark)).columns
    assert "icon_url_100" not in cols and "store_app_db_id" not in cols


def test_latest_keyword_ranks_dedup(spark):
    rows = [
        # two crawls of the same (store,country,keyword,rank): later wins
        (1, "US", 7, 1, "2026-07-09 05:00:00", "2026-07-09", "sidA"),
        (1, "US", 7, 1, "2026-07-09 11:00:00", "2026-07-09", "sidB"),
        (1, "US", 7, 2, "2026-07-09 05:00:00", "2026-07-09", "sidC"),
        (2, "US", 7, 1, "2026-07-09 04:00:00", "2026-07-09", "sidD"),
        (1, "US", 7, 3, None and "", "2026-07-09", None),  # null sid drops
    ]
    raw = spark.createDataFrame(
        rows,
        "store int, country string, keyword_id int, rank int, "
        "crawled_at string, crawled_date string, store_id string",
    ).withColumn("crawled_at", F.to_timestamp("crawled_at"))
    got = {
        (r.store, r.keyword_id, r.app_rank): r.store_id
        for r in RI.latest_keyword_ranks(raw).collect()
    }
    assert got == {(1, 7, 1): "sidB", (1, 7, 2): "sidC", (2, 7, 1): "sidD"}


def test_resolve_keyword_ranks_surrogate_backfill(spark):
    kw = spark.createDataFrame(
        [("2026-07-09", "US", 1, 3, 9, "sidKnown"),
         ("2026-07-09", "US", 1, 4, 9, "sidNew")],
        "crawled_date string, country string, store int, app_rank int, "
        "keyword_id int, store_id string",
    )
    id_map = spark.createDataFrame([("sidKnown", 101)], "store_id string, id long")
    countries = spark.createDataFrame([("US", 5)], "alpha2 string, id int")
    out = {r.app_rank: r for r in
           RI.resolve_keyword_ranks(kw, id_map, countries, store=1).collect()}
    assert out[3].store_app == 101 and out[3].country == 5
    # unknown store_id gets a deterministic surrogate above the pk range
    assert out[4].store_app >= 2**31
    again = {r.app_rank: r.store_app for r in
             RI.resolve_keyword_ranks(kw, id_map, countries, store=1).collect()}
    assert again[4] == out[4].store_app


def test_keyword_ranks_delete_insert(spark):
    schema = ("country int, keyword_id int, store int, crawled_date string, "
              "store_app long, app_rank int")
    existing = spark.createDataFrame(
        [(5, 9, 1, "2026-07-08", 1, 1),
         (5, 9, 1, "2026-07-09", 2, 1),
         (5, 9, 2, "2026-07-09", 3, 1)], schema)
    incoming = spark.createDataFrame(
        [(5, 9, 1, "2026-07-09", 4, 1),
         (5, 9, 1, "2026-07-09", 5, 2)], schema)
    got = sorted(
        (r.store, r.crawled_date, r.store_app)
        for r in RI.keyword_ranks_delete_insert(existing, incoming).collect()
    )
    # the (1, 2026-07-09) day is replaced; other days/stores survive
    assert got == [(1, "2026-07-08", 1), (1, "2026-07-09", 4),
                   (1, "2026-07-09", 5), (2, "2026-07-09", 3)]


def test_import_is_ledger_gated(spark, tmp_path):
    """import_app_details_from_s3 skips files already recorded
    completed for the pipeline (app_details.py:197-249)."""
    cat = Catalog(str(tmp_path / "cat"))
    files = spark.createDataFrame(
        [("a.parquet",), ("b.parquet",)], "file_path string"
    )
    ledger.record(cat, spark, "import_app_details_from_s3",
                  [("a.parquet", "etag1")], "success", "2026-07-09 00:00:00")
    left = ledger.filter_unprocessed(
        cat, spark, "import_app_details_from_s3", files
    ).collect()
    assert [r.file_path for r in left] == ["b.parquet"]
