"""Tests for plans/live_details.py — the per-scrape upsert cascade
(app_stores/scrape_stores.py:443-1076)."""

import pytest
from pyspark.sql import functions as F

from adscrawler_spark.plans import live_details as LD


def md5sur(*cols):
    return F.xxhash64(*cols)


def test_developer_dim_upsert(spark):
    devs = spark.createDataFrame(
        [(1, 1, "dev1", "Dev One")], "id long, store int, developer_id string, name string"
    )
    apps = spark.createDataFrame(
        [(1, "dev1", "Dev One"), (1, "dev2", "Dev Two"),
         (1, "dev2", "Dev Two"), (1, None, None)],
        "store int, developer_id string, developer_name string",
    )
    out = LD.developer_dim_upsert(devs, apps)
    rows = {r.developer_id: r for r in out.collect()}
    assert set(rows) == {"dev1", "dev2"}  # dedup + null dropped
    assert rows["dev1"].id == 1  # existing row untouched
    assert rows["dev2"].name == "Dev Two"
    # deterministic surrogate
    again = {r.developer_id: r.id
             for r in LD.developer_dim_upsert(devs, apps).collect()}
    assert again["dev2"] == rows["dev2"].id


def test_domain_dim_upsert_roots_subs_backfill(spark):
    domains = spark.createDataFrame(
        [(10, "old.example.com", None)],
        "id long, domain_name string, root_domain_id long",
    )
    apps = spark.createDataFrame(
        [(1, "sub.example.com", "example.com"),
         (2, "example.com", "example.com"),
         (3, "another.org", "another.org")],
        "store_app long, url string, root_url string",
    )
    out = {r.domain_name: r for r in
           LD.domain_dim_upsert(domains, apps).collect()}
    # roots inserted
    assert "example.com" in out and "another.org" in out
    assert out["example.com"].root_domain_id is None
    # new subdomain linked to its root
    assert out["sub.example.com"].root_domain_id == out["example.com"].id
    # stale existing subdomain backfilled to the (new) root's id
    assert out["old.example.com"].root_domain_id == out["example.com"].id
    assert out["old.example.com"].id == 10


def test_app_urls_map_rows(spark):
    domains = spark.createDataFrame(
        [(5, "a.com", None), (6, "b.a.com", 5)],
        "id long, domain_name string, root_domain_id long",
    )
    apps = spark.createDataFrame(
        [(1, "b.a.com", "a.com"), (2, "a.com", "a.com"), (2, "a.com", "a.com")],
        "store_app long, url string, root_url string",
    )
    got = sorted((r.store_app, r.pub_domain)
                 for r in LD.app_urls_map_rows(apps, domains).collect())
    assert got == [(1, 6), (2, 5)]


def test_normalize_app_urls(spark):
    apps = spark.createDataFrame(
        [(1, "https://Sub.Example.com/path"), (2, "not a url !!"), (3, None)],
        "store_app long, url string",
    )
    out = {r.store_app: r for r in LD.normalize_app_urls(apps).collect()}
    assert 1 in out
    assert out[1].root_url == "example.com"
    assert 3 not in out


def test_live_details_updates_masks(spark):
    results = spark.createDataFrame(
        [("a1", 2, "2026-01-01", 1, 1, "desc-a", "u.a.com"),
         ("a2", 2, "2026-01-01", 1, 0, "desc-b", "u.b.com"),
         ("a3", 2, "2026-01-01", 3, 1, "desc-c", "u.c.com")],
        "store_id string, store int, crawled_at string, crawl_result int, "
        "additional_html_crawl_result int, description string, url string",
    )
    out = {r.store_id: r for r in
           LD.live_details_updates(results, store=2).collect()}
    # good row with good html keeps everything
    assert out["a1"].description == "desc-a" and out["a1"].url == "u.a.com"
    # good row with failed html NULLs html-dependent cols only
    assert out["a2"].description == "desc-b" and out["a2"].url is None
    # bad crawl keeps only the minimal projection
    assert out["a3"].description is None and out["a3"].url is None
    assert out["a3"].crawl_result == 3 and out["a3"].store == 2


def test_live_details_store1_forces_html_zero(spark):
    results = spark.createDataFrame(
        [("a1", 1, "2026-01-01", 1, 1, "2026-01-01 10:00")],
        "store_id string, store int, crawled_at string, crawl_result int, "
        "additional_html_crawl_result int, additional_html_crawled_at string",
    )
    r = LD.live_details_updates(results, store=1).collect()[0]
    # store 1 sets additional_html_crawl_result=0 -> dependent col NULLed
    assert r.additional_html_crawl_result == 0
    assert r.additional_html_crawled_at is None


def test_group_developer_resolution(spark):
    devs = spark.createDataFrame(
        [(100, 1, "d1", "D1"), (101, 1, "d2", "D2")],
        "id long, store int, developer_id string, name string",
    )
    updates = spark.createDataFrame(
        # group (1,1): all rows have developer_id -> resolve
        [("a1", 1, 1, 1, "d1"), ("a2", 1, 1, 1, "d2"),
         # group (1,0): one row missing developer_id -> whole group skipped
         ("a3", 1, 1, 0, "d1"), ("a4", 1, 1, 0, None),
         # bad crawl group never resolves
         ("a5", 1, 3, 1, "d1")],
        "store_id string, store int, crawl_result int, "
        "additional_html_crawl_result int, developer_id string",
    )
    out = {r.store_id: r.developer for r in
           LD.with_group_developer_resolution(updates, devs).collect()}
    assert out["a1"] == 100 and out["a2"] == 101
    assert out["a3"] is None and out["a4"] is None and out["a5"] is None


def test_merge_store_apps_preserves_on_null(spark):
    existing = spark.createDataFrame(
        [(1, "a1", "Good Name", 1, "2026-01-01"),
         (1, "a2", "Other Name", 1, "2026-01-01")],
        "store int, store_id string, name string, crawl_result int, "
        "crawled_at string",
    )
    updates = spark.createDataFrame(
        [(1, "a1", None, 4, "2026-02-02"),
         (1, "a2", "New Name", 1, "2026-02-02")],
        "store int, store_id string, name string, crawl_result int, "
        "crawled_at string",
    )
    out = {r.store_id: r for r in
           LD.merge_store_apps(existing, updates).collect()}
    # bad crawl: name preserved, crawl metadata updated
    assert out["a1"].name == "Good Name"
    assert out["a1"].crawl_result == 4
    assert out["a1"].crawled_at == "2026-02-02"
    # good crawl overwrites
    assert out["a2"].name == "New Name"


def test_descriptions_upsert_rows(spark):
    langs = spark.createDataFrame(
        [(1, "en"), (2, "de")], "id int, language_slug string")
    apps = spark.createDataFrame(
        [(10, "en", "hello"), (11, "xx", "dropped"), (12, "de", "hallo"),
         (10, "en", "hello")],
        "store_app long, store_language_code string, description string",
    )
    got = sorted((r.store_app, r.language_id, r.description, r.description_short)
                 for r in LD.descriptions_upsert_rows(apps, langs).collect())
    assert got == [(10, 1, "hello", ""), (12, 2, "hallo", "")]


def test_country_evidence_rows(spark):
    countries = spark.createDataFrame(
        [("US", 1), ("DE", 2)], "alpha2 string, id int")
    apps = spark.createDataFrame(
        [(1, "United States", None),
         (2, "", "Germany"),
         (3, "nan", "None"),
         (4, None, None)],
        "store_app long, developer_address string, "
        "developer_legal_address string",
    )
    got = {r.store_app: r for r in
           LD.country_evidence_rows(apps, countries).collect()}
    # addressless rows dropped entirely
    assert set(got) == {1, 2}
    assert got[1].raw_address == "United States" and got[1].country_id == 1
    # legal address used when primary blank
    assert got[2].raw_address == "Germany" and got[2].country_id == 2


def test_crawl_log_rows(spark):
    countries = spark.createDataFrame([("us", 1)], "alpha2 string, id int")
    apps = spark.createDataFrame(
        [(1, 10, "us", "2026-01-01")],
        "crawl_result int, store_app long, country string, crawled_at string",
    )
    r = LD.crawl_log_rows(apps, countries).collect()[0]
    assert (r.crawl_result, r.store_app, r.country_id) == (1, 10, 1)


def test_register_new_apps(spark):
    store_apps = spark.createDataFrame(
        [(100, 1, "com.a")], "id long, store int, store_id string")
    scraped = spark.createDataFrame(
        [("com.a",), ("com.b",), ("com.b",), ("com.c",)], "store_id string")
    updated, sources = LD.register_new_apps(
        store_apps, scraped, "rankings", store=1)
    ids = {r.store_id: r.id for r in updated.collect()}
    assert set(ids) == {"com.a", "com.b", "com.c"}
    assert ids["com.a"] == 100
    src = {r.store_app: r.crawl_source for r in sources.collect()}
    assert set(src) == {ids["com.b"], ids["com.c"]}
    assert set(src.values()) == {"rankings"}


def test_register_new_apps_rejects_bad_ios_ids(spark):
    store_apps = spark.createDataFrame(
        [(100, 2, "123456")], "id long, store int, store_id string")
    scraped = spark.createDataFrame(
        [("123456",), ("9com.bad.bundle",)], "store_id string")
    with pytest.raises(ValueError, match="bad store_ids"):
        LD.register_new_apps(store_apps, scraped, "rankings", store=2)
    with pytest.raises(ValueError, match="Invalid store"):
        LD.register_new_apps(store_apps, scraped, "rankings", store=3)


def test_resolve_app_ranks(spark):
    store_apps = spark.createDataFrame(
        [(100, 1, "com.a")], "id long, store int, store_id string")
    ranked = spark.createDataFrame(
        [(1, "com.a", "us", 3), (1, "com.x", "de", 4)],
        "store int, store_id string, country string, rank int")
    out = {r.store_id: r for r in
           LD.resolve_app_ranks(ranked, store_apps).collect()}
    assert out["com.a"].store_app == 100 and out["com.a"].country == "US"
    assert out["com.x"].store_app is None and out["com.x"].country == "DE"
