"""New-app discovery from third-party catalogue listings — the
relational core of the reference's AppBrain / APKCombo scrapers
(app_stores/appbrain.py, app_stores/apkcombo.py).

The reference walks collection × category listing pages, regex-
harvests ``/app/.../{store_id}`` hrefs, set-unions the ids and emits
``{store: 1, store_id}`` seed dicts that check_and_insert_new_apps
registers (app_stores/utils.py:121-177 — ported as
plans/live_details.py::register_new_apps).  The HTTP fetch (and
APKCombo's Selenium session) stays outside the engine; the operator
consumes a fetched-pages table and emits the distinct seed rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from adscrawler_spark.session import local_df

# appbrain.py:12-64 — the probe space is part of the spec
APPBRAIN_COLLECTIONS = ["hot", "hot-week", "popular", "highest-rated"]
APPBRAIN_CATEGORIES = [
    "action", "adventure", "arcade", "art-and-design", "auto-and-vehicles",
    "beauty", "board", "books-and-reference", "business", "card", "casino",
    "casual", "comics", "communication", "dating", "education",
    "educational", "entertainment", "events", "finance", "food-and-drink",
    "health-and-fitness", "house-and-home", "libraries-and-demo",
    "lifestyle", "maps-and-navigation", "medical", "music",
    "music-and-audio", "news-and-magazines", "parenting",
    "personalization", "photography", "productivity", "puzzle", "racing",
    "role-playing", "simulation", "social", "sports", "sports-games",
    "strategy", "tools", "travel-and-local", "trivia",
    "video-players-and-editors", "weather", "word",
]

# appbrain.py:66 — ids are the trailing path segment of /app/ hrefs
HTML_ID_PATTERN = r'href="/app/.*?/([^"/]+)"'


def appbrain_probe_urls(spark) -> DataFrame:
    """loop_categories' probe fan-out (appbrain.py:90-109): every
    collection probes its bare '/new' page plus one per category.
    Emits (collection, category, url_part) — category NULL for the
    bare probe, matching scrape_for_ids' url build (:73-77)."""
    rows = []
    for coll in APPBRAIN_COLLECTIONS:
        rows.append((coll, None, f"/{coll}/new"))
        rows.extend(
            (coll, cat, f"/{coll}/{cat}/new") for cat in APPBRAIN_CATEGORIES
        )
    return local_df(spark,
        rows, "collection string, category string, url_part string"
    )


def harvest_store_ids(pages: DataFrame, store: int = 1) -> DataFrame:
    """scrape_for_ids + the set-union + dict mapping
    (appbrain.py:73-115, apkcombo.py:34-37): non-200 pages yield
    nothing, ids are regex-harvested and de-duplicated across every
    page.  ``pages``: (status, html, ...).  Returns distinct
    (store, store_id) seed rows for register_new_apps."""
    ids = pages.filter(F.col("status") == 200).select(
        F.explode(
            F.regexp_extract_all(F.col("html"), F.lit(HTML_ID_PATTERN), 1)
        ).alias("store_id")
    )
    return ids.distinct().select(F.lit(store).alias("store"), "store_id")


# apkcombo.py:24 — RSS guid entries carry the store ids
RSS_GUID_PATTERN = r'<guid isPermaLink="false">(.*?)</guid>'


def harvest_rss_guids(feeds: DataFrame, store: int = 1) -> DataFrame:
    """scrape_with_firefox's RSS harvest (apkcombo.py:22-31,
    golden-tested by the reference at
    tests/app_stores/test_apkcombo.py:9-19): findall the
    ``<guid isPermaLink="false">…</guid>`` entries over every fetched
    feed page (the reference pulls new-releases and latest-updates),
    set-union the ids across feeds, and emit the same distinct
    (store, store_id) seed rows as the catalogue harvest.  ``feeds``:
    (feed, page_source).  The Selenium driver lifecycle (headless
    session, quit-in-finally) is fetch plumbing outside the engine."""
    ids = feeds.select(
        F.explode(
            F.regexp_extract_all(
                F.col("page_source"), F.lit(RSS_GUID_PATTERN), 1
            )
        ).alias("store_id")
    )
    return ids.distinct().select(F.lit(store).alias("store"), "store_id")
