"""Tests for operators/store_pages.py — the store-page URL
classification, the get_developer_url ladder, and the developer app
harvest (app_stores/apple.py:150-303, google.py:310-323)."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from adscrawler_spark.operators import store_pages as SP

LINKS_SCHEMA = "store_id string, link_order int, text string, href string"


def test_classify_last_href_wins_and_privacy_excludes_apple(spark):
    links = spark.createDataFrame(
        [
            ("a", 0, "App Support", "https://one.com/support"),
            ("a", 1, "Developer Website", "https://dev.example.com"),
            ("a", 2, "App Support", "https://two.com/support"),  # overwrites
            ("a", 3, "Privacy Policy", "https://apple.com/privacy"),  # skipped
            ("a", 4, "Privacy Policy", "https://pp.example.com"),
            ("a", 5, "unrelated", "https://x.com"),
        ],
        LINKS_SCHEMA,
    )
    got = {r.url_type: (r.href, r.first_order)
           for r in SP.classify_store_page_urls(links).collect()}
    assert got["app_support"] == ("https://two.com/support", 0)
    assert got["developer_site"] == ("https://dev.example.com", 1)
    assert got["privacy_policy"] == ("https://pp.example.com", 4)


def _resolve(spark, apps_rows, links_rows):
    apps = spark.createDataFrame(apps_rows, "store_id string, seller_url string")
    links = spark.createDataFrame(links_rows, LINKS_SCHEMA)
    typed = SP.classify_store_page_urls(links)
    return {r.store_id: r
            for r in SP.resolve_developer_urls(apps, typed).collect()}


def test_resolve_developer_url_ladder(spark):
    got = _resolve(
        spark,
        [
            # good seller url -> kept verbatim, html ignored
            ("keep", "https://mygame.com/about"),
            # seller on ignore list + exactly one eligible html tld ->
            # the BARE registrable domain is returned
            ("single", "https://something.blogspot.com/x"),
            # seller missing + one candidate -> candidate
            ("nosell", None),
            # seller on ignore list + two eligible tlds -> seller kept
            ("multi", "https://multi.wixsite.com/me"),
            # seller missing + zero candidates -> resolve_failed
            ("fail", None),
        ],
        [
            ("keep", 0, "Developer Website", "https://other.com"),
            ("single", 0, "App Support", "https://realdev.io/help"),
            ("single", 1, "Privacy Policy", "https://realdev.io/privacy"),
            ("nosell", 0, "Developer Website", "https://founddev.net"),
            ("multi", 0, "App Support", "https://alpha.com/a"),
            ("multi", 1, "Developer Website", "https://beta.com/b"),
            ("fail", 0, "Privacy Policy", "https://sub.github.io/pp"),
        ],
    )
    assert got["keep"].developer_url == "https://mygame.com/about"
    assert not got["keep"].resolve_failed
    assert got["single"].developer_url == "realdev.io"
    assert got["nosell"].developer_url == "founddev.net"
    assert got["multi"].developer_url == "https://multi.wixsite.com/me"
    assert got["fail"].developer_url is None
    assert got["fail"].resolve_failed


FETCHED_SCHEMA = StructType(
    [
        StructField("developer_db_id", LongType()),
        StructField("store_id", StringType()),
        StructField("supported_devices", ArrayType(StringType())),
    ]
)


def test_harvest_developer_apps_ios_device_gate(spark):
    fetched = spark.createDataFrame(
        [
            (1, "111", ["iPhone5s-iPhone5s", "iPadAir-iPadAir"]),
            (1, "222", ["AppleTV3-AppleTV3"]),      # no iphone/ipad
            (2, "333", None),                        # no device list
            (2, "444", ["iPadMini5-iPadMini5"]),
            (2, "555", ["iPhoneX"]),                 # already known
        ],
        FETCHED_SCHEMA,
    )
    existing = spark.createDataFrame([("555",)], ["store_id"])
    got = {r.store_id: r for r in
           SP.harvest_developer_apps(fetched, existing, store=2).collect()}
    assert set(got) == {"111", "444"}
    assert all(r.store == 2 and r.crawl_result == 1 for r in got.values())
    assert got["111"].developer_db_id == 1


def test_harvest_developer_apps_android_no_gate(spark):
    fetched = spark.createDataFrame(
        [(7, "com.a", None), (7, "com.b", None), (8, "com.b", None)],
        FETCHED_SCHEMA,
    )
    existing = spark.createDataFrame([("com.a",)], ["store_id"])
    got = SP.harvest_developer_apps(fetched, existing, store=1).collect()
    assert {(r.store_id, r.developer_db_id) for r in got} == {
        ("com.b", 7), ("com.b", 8)}
    assert all(r.store == 1 for r in got)


def test_normalize_search_results(spark):
    rows = [
        # store_id, appId, url, store_link, title, name, developer, icon
        ("com.a", None, "https://u/a", None, "Title A", None, "Dev A", "i.png"),
        (None, "com.b", None, "https://sl/b", None, "Name B", None, None),
        (None, None, None, None, "skipped - no id", None, None, None),
        ("", "com.d", None, None, "D", None, None, None),  # falsy store_id
    ]
    df = spark.createDataFrame(
        rows,
        "store_id string, appId string, url string, store_link string, "
        "title string, name string, developer string, icon string",
    )
    got = {r.store_id: r for r in
           SP.normalize_search_results(df, "us", "en").collect()}
    assert set(got) == {"com.a", "com.b", "com.d"}
    a = got["com.a"]
    assert (a.id, a.store_link, a.name, a.developer_name, a.icon_url_512) == (
        "com.a", "https://u/a", "Title A", "Dev A", "i.png")
    b = got["com.b"]
    assert b.store_link == "https://sl/b" and b.name == "Name B"
    d = got["com.d"]
    assert d.store_link == (
        "https://play.google.com/store/apps/details?id=com.d")
    assert all(r.store == 1 and r.country == "us" and r.language == "en"
               for r in got.values())
