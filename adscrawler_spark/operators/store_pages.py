"""Store-page URL classification, developer-site resolution and
developer-catalogue app harvesting — the relational cores of the
reference's Apple/Google store scrapers that sit outside the
listing-cleaning operators (app_stores/apple.py:150-303,
app_stores/google.py:286-323).

The HTTP/iTunes/Selenium fetches stay outside the engine (the
fetch_sim pattern): operators consume fetched link/app tables and
emit the reference's decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from adscrawler_spark.functions.urls import IGNORE_TLDS, adstxt_registrable

# apple.py:252-269 — the per-link classification ladder.  Each link
# classifies to at most one type; within a type the LAST link wins
# (dict assignment), while the dict's key order — which drives the
# found_tlds walk below — is FIRST-assignment order.
URL_TYPES = ["app_support", "developer_site", "privacy_policy"]


def classify_store_page_urls(links: DataFrame) -> DataFrame:
    """get_urls_from_html (apple.py:252-269): link text routes each
    href to app_support / developer_site / privacy_policy (the
    privacy arm skips apple.com hosts).  ``links``: (store_id,
    link_order, text, href).  Returns one row per (store_id,
    url_type): the last-assigned href plus the first-assignment
    order."""
    text = F.lower(F.col("text"))
    typed = links.withColumn(
        "url_type",
        F.when(text.contains("app support"), "app_support")
        .when(text.contains("developer"), "developer_site")
        .when(
            text.contains("privacy policy")
            & ~F.col("href").contains("apple.com"),
            "privacy_policy",
        ),
    ).filter(F.col("url_type").isNotNull())
    return typed.groupBy("store_id", "url_type").agg(
        F.min("link_order").alias("first_order"),
        F.max_by("href", F.col("link_order")).alias("href"),
    )


def resolve_developer_urls(apps: DataFrame, typed_urls: DataFrame) -> DataFrame:
    """get_developer_url (apple.py:272-303): the seller-url decision
    ladder.

    * a present sellerUrl whose registrable domain is NOT on the
      hosted-platform ignore list is kept as-is;
    * otherwise the html urls are walked in first-assignment order,
      collecting registrable domains not ignored and not already
      seen — exactly one candidate resolves to that BARE domain
      string (the reference returns tld_str, not the full url);
      zero candidates fall back to sellerUrl, multiple candidates
      fall back to sellerUrl with a warning;
    * a fallback with no sellerUrl is the reference's raise /
      KeyError path — emitted as resolve_failed = true, never
      silently dropped.

    Membership against DEVLEOPER_IGNORE_TLDS is exact (config.py:209
    — unlike the ads.txt crawl's substring check, scrape.py:156).

    ``apps``: (store_id, seller_url).  ``typed_urls``:
    classify_store_page_urls output.  Returns (store_id,
    developer_url, resolve_failed).
    """
    cand = (
        typed_urls.withColumn("tld", adstxt_registrable(F.col("href")))
        .filter(~F.col("tld").isin(IGNORE_TLDS))
    )
    # dedup repeated tlds keeping the first-assigned type's position
    per_tld = cand.groupBy("store_id", "tld").agg(
        F.min("first_order").alias("first_order")
    )
    agg = per_tld.groupBy("store_id").agg(
        F.count("*").alias("n_found"),
        F.min_by("tld", F.col("first_order")).alias("single_tld"),
    )
    base = apps.select(
        "store_id",
        "seller_url",
        F.when(
            F.col("seller_url").isNotNull(),
            adstxt_registrable(F.col("seller_url")),
        ).alias("seller_tld"),
    )
    joined = base.join(agg, "store_id", "left").withColumn(
        "n_found", F.coalesce("n_found", F.lit(0))
    )
    should_crawl = F.col("seller_url").isNull() | F.col("seller_tld").isin(
        IGNORE_TLDS
    )
    final = (
        F.when(~should_crawl, F.col("seller_url"))
        .when(F.col("n_found") == 1, F.col("single_tld"))
        .otherwise(F.col("seller_url"))  # 0 or many -> sellerUrl (may be NULL)
    )
    return joined.select(
        "store_id",
        final.alias("developer_url"),
        (should_crawl & (F.col("n_found") != 1)
         & F.col("seller_url").isNull()).alias("resolve_failed"),
    )


MY_DEVICES = ["iphone", "ipad"]  # apple.py:165


def harvest_developer_apps(
    fetched: DataFrame, existing: DataFrame, store: int
) -> DataFrame:
    """crawl_apple_developers / crawl_google_developers
    (apple.py:150-187, google.py:310-323): developer-catalogue app
    lists anti-joined against known store_ids, stamped
    crawl_result=1.  For iOS the supportedDevices gate keeps apps
    whose concatenated device list mentions iphone/ipad
    (case-insensitive substring over the joined array, apple.py:
    164-172); rows with no device list are dropped there too.

    ``fetched``: (developer_db_id, store_id, supported_devices
    array<string> — ignored for store=1).  ``existing``:
    (store_id,).  Returns (store, store_id, developer_db_id,
    crawl_result) distinct new apps.
    """
    out = fetched
    if store == 2:
        devices = F.lower(F.concat_ws("", F.col("supported_devices")))
        gate = F.col("supported_devices").isNotNull() & (
            devices.contains("iphone") | devices.contains("ipad")
        )
        out = out.filter(gate)
    return (
        out.select("developer_db_id", F.col("store_id").cast("string")
                   .alias("store_id"))
        .join(existing.select("store_id"), "store_id", "left_anti")
        .distinct()
        .select(
            F.lit(store).alias("store"),
            "store_id",
            "developer_db_id",
            F.lit(1).alias("crawl_result"),
        )
    )


# ---------------------------------------------------------------------
# Play-store search normalization (google.py:17-56,324-377)
# ---------------------------------------------------------------------

_SEARCH_ALIASES = [
    # (canonical, scraper-alias) — the pop/get coalesce pairs of
    # normalize_google_search_results (google.py:31-48)
    ("name", "title"),
    ("developer_name", "developer"),
    ("icon_url_512", "icon"),
]


def normalize_search_results(
    results: DataFrame, country: str, language: str
) -> DataFrame:
    """normalize_google_search_results (google.py:17-56): rows
    without a store_id (or appId fallback) are skipped, scraper
    aliases coalesce into canonical columns, the store link defaults
    to the Play details URL, and store/country/language stamps ride
    along.  Absent columns are treated as NULL (the reference's
    dict .get)."""
    df = results
    for col in ("store_id", "appId", "url", "store_link", "name", "title",
                "developer_name", "developer", "icon_url_512", "icon"):
        if col not in df.columns:
            df = df.withColumn(col, F.lit(None).cast("string"))
    sid = F.coalesce(F.nullif(F.col("store_id"), F.lit("")),
                     F.nullif(F.col("appId"), F.lit("")))
    out = df.withColumn("store_id", sid).filter(F.col("store_id").isNotNull())
    link = F.coalesce(
        F.col("url"),
        F.col("store_link"),
        F.concat(
            F.lit("https://play.google.com/store/apps/details?id="),
            F.col("store_id"),
        ),
    )
    cols = [
        F.col("store_id"),
        F.col("store_id").alias("id"),
        link.alias("store_link"),
    ]
    for canonical, alias in _SEARCH_ALIASES:
        cols.append(F.coalesce(F.col(alias), F.col(canonical))
                    .alias(canonical))
    return out.select(
        *cols,
        F.lit(1).alias("store"),
        F.lit(country).alias("country"),
        F.lit(language).alias("language"),
    )
