"""Status / dimension matviews from the reference's pg-ddl dumps that
had no engine counterpart until round 5:

* category_mapping + mv_app_categories
  (/root/reference/pg-ddl/schema/public/category_mapping__matview.sql,
  mv_app_categories__matview.sql) — the category-normalization dim
  (distinct from the per-app listing cleaner in operators/listings.py:
  this is the standalone mapping table the frontend joins against);
* developer_store_apps
  (pg-ddl/schema/public/developer_store_apps__matview.sql) — per-app
  developer dim with the third-party-domain-aware root-domain pick;
* ad_network_sdk_keys
  (pg-ddl/schema/public/ad_network_sdk_keys__matview.sql) — AppLovin
  SDK keys harvested from decompiled manifests (regex) unioned with
  the version-strings path (xml_path pattern + exact 86-char length);
* app_status (pg-ddl/schema/logging/app_status__matview.sql) — the
  removed-app detector over the last two US crawl passes;
* tag_totals (pg-ddl/schema/adtech/tag_totals__matview.sql) —
  per-(store, category, tag) scanned-vs-universe install totals;
* total_count_overview
  (pg-ddl/schema/public/total_count_overview__matview.sql) — the
  single-row crawl-health dashboard (8 app counts, 8 SDK-scan counts,
  4 app-ads counts, as-of date).

Scale shape: every view is joins + keyed aggregations; the only
single-row outputs (total_count_overview's three CTE families) are
global aggregates — one partial-agg pass each, then a driver-side
1×1×1 cross join.  ``as_of`` replaces CURRENT_DATE so results are
deterministic and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# category_mapping__matview.sql:34 — mapped categories that prefix
# 'game_'
GAME_CATEGORIES = [
    "action", "casual", "adventure", "arcade", "board", "card",
    "casino", "puzzle", "racing", "simulation", "strategy", "trivia",
    "word",
]

# category_mapping__matview.sql:35-49 — the rename ladder
CATEGORY_RENAMES = {
    "news_and_magazines": "news",
    "educational": "education",
    "book": "books_and_reference",
    "navigation": "maps_and_navigation",
    "music": "music_and_audio",
    "photography": "photo_and_video",
    "reference": "books_and_reference",
    "role playing": "game_role_playing",
    "social": "social networking",
    "travel": "travel_and_local",
    "utilities": "tools",
    "video players_and_editors": "video_players",
    "graphics_and_design": "art_and_design",
    "parenting": "family",
}


def category_mapping(store_apps: DataFrame) -> DataFrame:
    """(original_category, mapped_category) dim
    (category_mapping__matview.sql:30-55): lowercase + ' & '→'_and_',
    then the game_ prefix / rename ladder, NULL → 'N/A'.

    Deviation (theoretical only): Postgres ``regexp_replace`` without
    the 'g' flag replaces the FIRST ' & '; Spark replaces all.  Store
    category names contain at most one ' & ' (e.g. 'Books &
    Reference'), so the outputs agree on every real and synthetic
    category; pinned by the battery oracle."""
    sub = store_apps.select(
        F.col("category").alias("original_category"),
        F.regexp_replace(
            F.lower(F.col("category")), " & ", "_and_"
        ).alias("m"),
    ).distinct()
    m = F.col("m")
    mapped = F.when(
        m.isin(GAME_CATEGORIES), F.concat(F.lit("game_"), m)
    )
    for src, dst in CATEGORY_RENAMES.items():
        mapped = mapped.when(m == src, F.lit(dst))
    mapped = mapped.when(m.isNull(), F.lit("N/A")).otherwise(m)
    return sub.select(
        "original_category", mapped.alias("mapped_category")
    ).distinct()


def mv_app_categories(
    store_apps: DataFrame, mapping: DataFrame
) -> DataFrame:
    """Per-(store, mapped category) successful-app counts
    (mv_app_categories__matview.sql:31-38).  The mapping dim is tiny —
    broadcast."""
    return (
        store_apps.filter(
            (F.col("crawl_result") == 1) & F.col("category").isNotNull()
        )
        .join(
            F.broadcast(mapping),
            F.col("category") == F.col("original_category"),
        )
        .groupBy("store", F.col("mapped_category").alias("category"))
        .agg(F.count("*").alias("app_count"))
    )


def developer_store_apps(
    store_apps: DataFrame,
    developers: DataFrame,
    app_urls_map: DataFrame,
    domains: DataFrame,
    domains_third_party: DataFrame,
) -> DataFrame:
    """Per-app developer dim (developer_store_apps__matview.sql:
    28-57): the app's pub domain resolves to its root domain UNLESS
    the root is a known third-party host (site builders etc.), in
    which case the pub domain itself stands.  Domain dims broadcast;
    the EXISTS is a broadcast left join + null test."""
    pd_ = domains.select(
        F.col("id").alias("_pd_id"),
        F.col("domain_name").alias("_pd_name"),
        F.col("root_domain_id").alias("_root_id"),
    )
    rd = domains.select(
        F.col("id").alias("_rd_id"),
        F.col("domain_name").alias("_rd_name"),
    )
    tp = domains_third_party.select(
        F.col("domain_id").alias("_tp_id")
    ).distinct()
    cleaned = (
        app_urls_map.join(
            F.broadcast(pd_),
            app_urls_map["pub_domain"] == F.col("_pd_id"),
            "left",
        )
        .join(
            F.broadcast(rd), F.col("_root_id") == F.col("_rd_id"), "left"
        )
        .join(F.broadcast(tp), F.col("_rd_id") == F.col("_tp_id"), "left")
        .select(
            "store_app",
            F.when(
                F.col("_tp_id").isNull(),
                F.coalesce(F.col("_rd_name"), F.col("_pd_name")),
            )
            .otherwise(F.col("_pd_name"))
            .alias("developer_url"),
            F.when(
                F.col("_tp_id").isNull(),
                F.coalesce(F.col("_rd_id"), F.col("_pd_id")),
            )
            .otherwise(F.col("_pd_id"))
            .alias("domain_id"),
        )
    )
    d = developers.select(
        F.col("id").alias("_dev_id"),
        F.col("name").alias("developer_name"),
        F.col("store").alias("developer_store"),
        "developer_id",
    )
    return (
        store_apps.join(
            F.broadcast(d),
            store_apps["developer"] == F.col("_dev_id"),
            "left",
        )
        .join(
            cleaned,
            store_apps["id"] == cleaned["store_app"],
            "left",
        )
        .select(
            store_apps["store"],
            store_apps["id"].alias("store_app"),
            "developer_name",
            "developer_store",
            "developer_id",
            "developer_url",
            "domain_id",
        )
    )


# ad_network_sdk_keys__matview.sql:33 — the manifest harvest pattern
APPLOVIN_MANIFEST_PATTERN = (
    r'applovin\.sdk\.key" android:value="([^"]+)"'
)


def ad_network_sdk_keys(
    version_manifests: DataFrame,
    version_codes: DataFrame,
    version_strings: DataFrame,
    version_details_map: DataFrame,
) -> DataFrame:
    """Distinct (store_app, applovin_sdk_key)
    (ad_network_sdk_keys__matview.sql:28-52): the manifest-regex
    harvest (dropping unresolved '@string%' references) unioned with
    the version-strings path (xml_path LIKE '%applovin%key%' or the
    exact settings path, value exactly 86 chars)."""
    vc = version_codes.select(
        F.col("id").alias("_vc_id"), F.col("store_app")
    )
    manifest = (
        version_manifests.withColumn(
            "applovin_sdk_key",
            F.nullif(
                F.regexp_extract(
                    "manifest_string", APPLOVIN_MANIFEST_PATTERN, 1
                ),
                F.lit(""),
            ),
        )
        .join(vc, version_manifests["version_code"] == F.col("_vc_id"), "left")
        .filter(
            F.col("applovin_sdk_key").isNotNull()
            & ~F.col("applovin_sdk_key").like("@string%")
        )
        .select("store_app", "applovin_sdk_key")
    )
    strings = (
        version_strings.filter(
            (
                F.lower("xml_path").like("%applovin%key%")
                | (F.col("xml_path") == "applovin_settings.sdk_key")
            )
            & (F.length("value_name") == 86)
        )
        .join(
            version_details_map,
            version_strings["id"] == version_details_map["string_id"],
            "left",
        )
        .join(vc, version_details_map["version_code"] == F.col("_vc_id"), "left")
        .select("store_app", F.col("value_name").alias("applovin_sdk_key"))
    )
    return manifest.unionByName(strings).distinct()


def app_status(
    app_country_crawls: DataFrame, us_country_id: int = 840
) -> DataFrame:
    """Removed-app detector (app_status__matview.sql:28-52): over each
    app's last two US crawl passes — removed iff exactly two passes
    were evaluated and neither succeeded.  One keyed window + one
    keyed aggregation."""
    w = Window.partitionBy("store_app").orderBy(F.desc("crawled_at"))
    recent = (
        app_country_crawls.filter(F.col("country_id") == us_country_id)
        .withColumn("crawl_rank", F.row_number().over(w))
        .filter(F.col("crawl_rank") <= 2)
    )
    ok = (F.col("crawl_result") == 1).cast("long")
    return recent.groupBy("store_app").agg(
        (
            (F.count("*") == 2) & (F.sum(ok) == 0)
        ).alias("is_removed"),
        F.max("crawled_at").alias("last_crawled_at"),
        F.sum(ok).alias("us_success_count_last_2_passes"),
        F.count("*").alias("total_us_passes_evaluated"),
    )


TAG_COLUMNS = [
    "sdk", "api_call", "publisher", "app_ads_direct", "app_ads_reseller"
]


def tag_totals(
    combined_app_companies: DataFrame, store_apps_overview: DataFrame
) -> DataFrame:
    """Per-(store, category, tag) scanned totals against the
    store+category universe (tag_totals__matview.sql:28-58).  The
    LATERAL VALUES unpivot is a stack(); both aggregations key on
    (store, category[, tag])."""
    pairs = ", ".join(f"'{t}', {t}" for t in TAG_COLUMNS)
    dag = (
        combined_app_companies.select(
            "store_app",
            F.expr(
                f"stack({len(TAG_COLUMNS)}, {pairs})"
                " as (tag_source, present)"
            ),
        )
        .filter(F.col("present"))
        .select("store_app", "tag_source")
        .distinct()
    )
    sao = store_apps_overview
    universes = sao.filter(F.col("id").isNotNull()).groupBy(
        "store", F.col("category").alias("app_category")
    ).agg(
        F.count("id").alias("active_apps_universe"),
        F.sum("installs").alias("universe_installs_total"),
        F.sum("installs_sum_4w").alias("universe_installs_d30"),
    )
    joined = dag.join(sao, dag["store_app"] == sao["id"]).select(
        sao["store"],
        sao["category"].alias("app_category"),
        "tag_source",
        dag["store_app"],
        "installs",
        "installs_sum_4w",
    )
    return (
        joined.join(universes, ["store", "app_category"], "left")
        .groupBy("store", "app_category", "tag_source")
        .agg(
            F.countDistinct("store_app").alias(
                "total_active_scanned_apps_with_tag"
            ),
            F.sum("installs").alias("total_scanned_installs_with_tag"),
            F.sum("installs_sum_4w").alias(
                "total_scanned_installs_d30_with_tag"
            ),
            F.max("active_apps_universe").alias("active_apps_universe"),
            F.max("universe_installs_total").alias(
                "universe_installs_total"
            ),
            F.max("universe_installs_d30").alias("universe_installs_d30"),
        )
    )


def total_count_overview(
    store_apps_overview: DataFrame,
    version_codes: DataFrame,
    scan_results: DataFrame,
    domains: DataFrame,
    adstxt_crawl_results: DataFrame,
    as_of: str,
) -> DataFrame:
    """The single-row crawl-health dashboard
    (total_count_overview__matview.sql:29-152): per-store app counts
    (all / not-removed / crawled-in-7d), SDK-scan coverage off the
    per-app latest scan and latest SUCCESSFUL scan (the reference's
    DISTINCT ON with the dotted-version bigint-array tie-break), and
    app-ads.txt URL coverage.  ``as_of`` stands in for CURRENT_DATE."""
    as_of_c = F.to_date(F.lit(as_of))
    week_ago = F.date_sub(as_of_c, 7)
    sao = store_apps_overview

    def cnt(cond):
        return F.count(F.when(cond, 1))

    store, removed, crawled = (
        F.col("store"), F.col("is_removed"), F.col("last_crawled_at")
    )
    app_count = sao.agg(
        cnt(store == 1).alias("android_apps"),
        cnt(store == 2).alias("ios_apps"),
        cnt((store == 1) & ~removed).alias("success_android_apps"),
        cnt((store == 2) & ~removed).alias("success_ios_apps"),
        cnt((store == 1) & (crawled >= week_ago)).alias(
            "weekly_scanned_android_apps"
        ),
        cnt((store == 2) & (crawled >= week_ago)).alias(
            "weekly_scanned_ios_apps"
        ),
        cnt((store == 1) & ~removed & (crawled >= week_ago)).alias(
            "weekly_success_scanned_android_apps"
        ),
        cnt((store == 2) & ~removed & (crawled >= week_ago)).alias(
            "weekly_success_scanned_ios_apps"
        ),
    )

    vc = version_codes.select(
        F.col("id").alias("_vc_id"), "store_app", "version_code"
    )
    w_last = Window.partitionBy("store_app").orderBy(
        F.desc("scanned_at"), F.desc("version_code_id")
    )
    last_scan = (
        scan_results.join(
            vc, scan_results["version_code_id"] == F.col("_vc_id"), "left"
        )
        .withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select("store_app", F.col("scanned_at").alias("ls_scanned_at"))
    )
    vparts = F.transform(
        F.split("version_code", r"\."), lambda x: x.cast("long")
    )
    w_ok = Window.partitionBy("store_app").orderBy(
        F.desc("scanned_at"), vparts.desc()
    )
    last_ok = (
        vc.join(
            scan_results,
            F.col("_vc_id") == scan_results["version_code_id"],
        )
        .filter(F.col("scan_result") == 1)
        .withColumn("_rn", F.row_number().over(w_ok))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("store_app").alias("ok_store_app"),
            F.col("scanned_at").alias("ok_scanned_at"),
        )
    )
    ls = (
        last_scan.join(
            last_ok, last_scan["store_app"] == F.col("ok_store_app"), "left"
        )
        .join(
            sao.select(F.col("id").alias("_sa_id"), F.col("store").alias("_sa_store")),
            last_scan["store_app"] == F.col("_sa_id"),
            "left",
        )
    )

    def dcnt(cond, col):
        return F.countDistinct(F.when(cond, F.col(col)))

    st = F.col("_sa_store")
    sdk_count = ls.agg(
        dcnt(st == 1, "store_app").alias("sdk_android_apps"),
        dcnt(st == 2, "store_app").alias("sdk_ios_apps"),
        dcnt(st == 1, "ok_store_app").alias("sdk_success_android_apps"),
        dcnt(st == 2, "ok_store_app").alias("sdk_success_ios_apps"),
        dcnt(
            (st == 1) & (F.col("ok_scanned_at") >= week_ago), "ok_store_app"
        ).alias("sdk_weekly_success_android_apps"),
        dcnt(
            (st == 2) & (F.col("ok_scanned_at") >= week_ago), "ok_store_app"
        ).alias("sdk_weekly_success_ios_apps"),
        dcnt(
            (st == 1) & (F.col("ls_scanned_at") >= week_ago), "store_app"
        ).alias("sdk_weekly_android_apps"),
        dcnt(
            (st == 2) & (F.col("ls_scanned_at") >= week_ago), "store_app"
        ).alias("sdk_weekly_ios_apps"),
    )

    ad = domains.select(
        F.col("id").alias("_dom_id"), "domain_name"
    ).join(
        adstxt_crawl_results,
        F.col("_dom_id") == adstxt_crawl_results["domain_id"],
        "left",
    )
    ok1 = F.col("crawl_result") == 1
    fresh = F.col("updated_at") >= week_ago
    appads_count = ad.agg(
        F.countDistinct("domain_name").alias("appads_urls"),
        dcnt(ok1, "domain_name").alias("appads_success_urls"),
        dcnt(ok1 & fresh, "domain_name").alias(
            "appads_weekly_success_urls"
        ),
        dcnt(fresh, "domain_name").alias("appads_weekly_urls"),
    )
    return (
        app_count.crossJoin(sdk_count)
        .crossJoin(appads_count)
        .withColumn("on_date", as_of_c)
    )
