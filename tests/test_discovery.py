"""Tests for operators/discovery.py — AppBrain/APKCombo id harvest
parity with the reference's regex (app_stores/appbrain.py:66-115)."""

from __future__ import annotations

import re

from adscrawler_spark.operators import discovery as D


def test_probe_fanout(spark):
    probes = D.appbrain_probe_urls(spark).collect()
    # 4 collections x (1 bare + 47 categories)
    assert len(probes) == 4 * (1 + len(D.APPBRAIN_CATEGORIES))
    by_coll = {}
    for r in probes:
        by_coll.setdefault(r.collection, []).append(r)
    bare = [r for r in by_coll["hot"] if r.category is None]
    assert len(bare) == 1 and bare[0].url_part == "/hot/new"
    cat = [r for r in by_coll["hot-week"] if r.category == "puzzle"]
    assert cat[0].url_part == "/hot-week/puzzle/new"


PAGES = [
    # status, html
    (200, 'x <a href="/app/Some App/com.a.one">A</a> '
          '<a href="/app/Other/com.b.two">B</a>'),
    (200, '<a href="/app/Dup Name/com.a.one">dup across pages</a>'),
    (404, '<a href="/app/Should Not/com.miss.me">gone</a>'),
    (200, 'no links here'),
    # id segment may not contain / or " — deeper path keeps last segment
    (200, '<a href="/app/Deep/Path/com.c.three">C</a>'),
]


def test_harvest_parity_with_reference_regex(spark):
    want = set()
    for status, html in PAGES:
        if status == 200:
            want.update(re.findall(D.HTML_ID_PATTERN, html))
    df = spark.createDataFrame(PAGES, "status int, html string")
    got = {r.store_id for r in D.harvest_store_ids(df).collect()}
    assert got == want
    assert "com.miss.me" not in got
    assert "com.c.three" in got
    rows = D.harvest_store_ids(df).collect()
    assert all(r.store == 1 for r in rows)


def test_rss_guid_harvest_matches_reference_regex(spark):
    """apkcombo.py:22-31 parity: the reference's exact findall regex
    over both feeds, set-unioned; permalink guids excluded (the
    reference's golden page_source at
    tests/app_stores/test_apkcombo.py:15 is the first fixture row)."""
    feeds = [
        ("new-releases",
         '<guid isPermaLink="false">sample-app</guid>'),
        ("new-releases",
         '<item><guid isPermaLink="false">com.a.one</guid></item>'
         '<guid isPermaLink="true">https://apkcombo.com/x</guid>'),
        ("latest-updates",
         '<guid isPermaLink="false">com.a.one</guid>'
         '<guid isPermaLink="false">com.b.two</guid>'),
    ]
    want = set()
    for _, src in feeds:
        want.update(re.findall(D.RSS_GUID_PATTERN, src))
    df = spark.createDataFrame(feeds, "feed string, page_source string")
    out = D.harvest_rss_guids(df).collect()
    got = {r.store_id for r in out}
    assert got == want == {"sample-app", "com.a.one", "com.b.two"}
    assert len(out) == 3  # cross-feed union dedupes com.a.one
    assert all(r.store == 1 for r in out)
