"""Secondary frontier-selection queries — the reference's scheduled-
scan SQL family re-expressed as distributed plans.

Each function ports one query under /root/reference/adscrawler/dbcon/
sql/ (cited per function).  They are siblings of the O1–O6 claim-order
operators in operators/frontier.py: SELECT-shaped priority queries over
the crawl state tables that decide WHAT to fetch/scan next.  The
battery entries in plans/benchmarks.py verify each against a DuckDB
oracle on synthesized state tables.

Scale shape shared by the family:
* every ``DISTINCT ON (key) ... ORDER BY ts DESC`` becomes a
  row_number window partitioned on the key — distributes across keys;
* ``IN (subquery)`` membership becomes a left-semi join;
* curated dims (country config, user-requested scans) are broadcast;
* ordered LIMITs compile to TakeOrderedAndProject (distributed top-k,
  no single-partition sort); ordered non-LIMIT outputs leave ordering
  to the consumer (the claim stage ranks them) since a global sort of
  an unbounded result is wasted work at scale.

Determinism pins over the reference (documented per function): the
reference's DISTINCT ON / row_number tie-breaks under equal timestamps
are planner-order; each port adds the natural unique id as a trailing
tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apps_to_update_secondary(
    store_apps: DataFrame,
    app_global_metrics: DataFrame,
    apps_in_latest_rankings: DataFrame,
    country_config: DataFrame,
    countries: DataFrame,
    app_country_crawls: DataFrame,
    store: int,
    country_crawl_priority: int,
    year_ago_ts: str,
    max_recrawl_ts: str,
    long_update_ts: str,
    limit: int,
) -> DataFrame:
    """query_apps_to_update_secondary.sql:1-127 — the secondary
    country-tier recrawl frontier: target apps are successful crawls,
    ranked apps, or recently-updated listings; the latest crawl over
    the tier's countries (after ``max_recrawl_ts``) drives the long-
    update / at-least-annual conditions (:72-88); claim order is
    never-crawled first, then overdue, then max(installs, ratings)
    (:89-116, the tier's thresholds); the LIMIT'd app set fans out
    across the tier countries (:117-127 CROSS JOIN).

    ``app_country_crawls`` carries a unique ``crawl_id`` used as the
    DISTINCT ON tie-break under equal ``crawled_at``."""
    # IN (subquery) is pure membership — dedup so a rankings frame
    # carrying repeated store_apps can never multiply target rows.
    ranked = apps_in_latest_rankings.select("store_app").distinct()
    target = (
        store_apps.filter(F.col("store") == store)
        .join(
            app_global_metrics.select(
                F.col("store_app").alias("id"),
                F.col("total_installs").alias("installs"),
                F.col("total_ratings").alias("rating_count"),
            ),
            "id", "left",
        )
        .join(
            ranked.select(F.col("store_app").alias("id"))
            .withColumn("_ranked", F.lit(True)),
            "id", "left",
        )
        .filter(
            (F.col("crawl_result") == 1)
            | F.col("_ranked")
            | (F.col("store_last_updated") > F.lit(year_ago_ts).cast(
                "timestamp"
            ))
        )
        .select(
            "store", F.col("id").alias("store_app"), "store_id",
            "icon_url_100", "updated_at", "store_last_updated",
            "installs", "rating_count",
        )
    )
    mycountries = F.broadcast(
        country_config.filter(
            (F.col("priority") == country_crawl_priority)
            & (F.col("scenario_id") == 1)
        )
        .join(
            countries.select(
                F.col("id").alias("country_id"),
                F.col("alpha2").alias("country_code"),
            ),
            "country_id", "left",
        )
        .select("country_code", "country_id")
        .distinct()
    )
    w = Window.partitionBy("store_app").orderBy(
        F.col("crawled_at").desc(), F.col("crawl_id").desc()
    )
    last_crawled = (
        app_country_crawls.join(mycountries, "country_id")
        .filter(
            F.col("crawled_at") > F.lit(max_recrawl_ts).cast("timestamp")
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "store_app",
            F.col("crawled_at").alias("last_crawled_at"),
            F.col("crawl_result").alias("last_crawl_result"),
        )
    )
    max_recrawl = F.lit(max_recrawl_ts).cast("timestamp")
    long_update = F.lit(long_update_ts).cast("timestamp")
    year_ago = F.lit(year_ago_ts).cast("timestamp")
    to_crawl = (
        target.join(last_crawled, "store_app", "left")
        .filter(
            (
                (F.col("last_crawled_at") <= long_update)
                & (F.col("store_last_updated") >= year_ago)
            )
            | (
                (F.col("last_crawled_at") <= max_recrawl)
                | F.col("last_crawl_result").isNull()
            )
        )
        .orderBy(
            F.when(F.col("last_crawl_result").isNull(), 0).otherwise(1),
            F.when(F.col("last_crawled_at") < max_recrawl, 0).otherwise(1),
            F.greatest(
                F.coalesce(F.col("installs"), F.lit(0)),
                F.coalesce(F.col("rating_count").cast("long"), F.lit(0)),
            ).desc(),
            F.col("store_app"),  # total-order pin for the LIMIT
        )
        .limit(limit)
        .select(
            "store", "store_app", "store_id", "icon_url_100",
            F.col("updated_at").alias("app_updated_at"),
            "last_crawled_at",
        )
    )
    return to_crawl.crossJoin(mycountries.select("country_code"))


def apps_to_update_any_new(
    store_apps: DataFrame, store: int, limit: int
) -> DataFrame:
    """query_apps_to_update_any_new.sql — never-crawled apps, US-only
    fan-out.  (The reference's bare LIMIT without ORDER is pinned to
    store-app order for determinism.)"""
    return (
        store_apps.filter(
            (F.col("store") == store) & F.col("crawl_result").isNull()
        )
        .orderBy("id")
        .limit(limit)
        .select(
            "store", F.col("id").alias("store_app"), "store_id",
            F.lit("US").alias("country_code"), "icon_url_100",
            F.col("updated_at").alias("app_updated_at"),
        )
    )


def _latest_version_codes(
    version_codes: DataFrame, s3_file_keys: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """all_version_codes + latest_version_codes CTEs shared by the sdk
    and api scan queries: version codes that actually have a stored
    binary, newest per app (id tie-break pin)."""
    all_vc = version_codes.join(
        s3_file_keys.select(
            F.col("version_code_id").alias("id"), "myregion", "file_key"
        ),
        "id",
    ).select(
        "id", "store_app", "version_code", "myregion", "file_key",
        F.col("created_at").alias("downloaded_at"),
    )
    w = Window.partitionBy("store_app").orderBy(
        F.col("downloaded_at").desc(), F.col("id").desc()
    )
    latest = (
        all_vc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return all_vc, latest


def apps_to_sdk_scan(
    version_codes: DataFrame,
    s3_file_keys: DataFrame,
    sdk_scan_results: DataFrame,
    apps_overview: DataFrame,
    store_apps: DataFrame,
    app_global_metrics: DataFrame,
    user_requested: DataFrame,
    store: int,
    as_of: str,
) -> DataFrame:
    """query_apps_to_sdk_scan.sql:1-231 — the SDK-scan frontier:
    scheduled branch rescans a version code when never scanned, or on
    the 180-day success ladder, or on the 90-day failed ladder (result
    codes 2/3/4) with a 5-day cooldown (:100-137); the user-requested
    branch retriggers stale or newly-downloaded codes (:139-196);
    UNION ALL.  ``sdk_scan_results`` carries a unique ``scan_id``
    tie-break; the column name ``last_scuccess_scanned_at`` preserves
    the reference's own output alias (:151 [sic])."""
    all_vc, latest_vc = _latest_version_codes(version_codes, s3_file_keys)
    cur = F.lit(as_of).cast("date").cast("timestamp")

    def last_scan(filtered: DataFrame) -> DataFrame:
        w = Window.partitionBy("version_code_id").orderBy(
            F.col("scanned_at").desc(), F.col("scan_id").desc()
        )
        return (
            filtered.join(
                all_vc.select(F.col("id").alias("version_code_id")),
                "version_code_id",
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("version_code_id", "scanned_at", "scan_result")
        )

    ls = last_scan(sdk_scan_results)
    lsvc = last_scan(sdk_scan_results.filter(F.col("scan_result") == 1))
    scheduled = (
        all_vc.join(
            apps_overview.select(
                F.col("id").alias("store_app"), "store", "store_id",
                "name", "installs", "rating_count",
            ),
            "store_app", "left",
        )
        .join(
            ls.select(
                F.col("version_code_id").alias("id"),
                F.col("scanned_at").alias("last_scanned_at"),
                F.col("scan_result").alias("last_analyzed_result"),
            ),
            "id", "left",
        )
        .join(
            lsvc.select(
                F.col("version_code_id").alias("id"),
                F.col("scanned_at").alias("last_scuccess_scanned_at"),
                F.col("scan_result").alias("_succ_result"),
            ),
            "id", "left",
        )
        .filter(
            (F.col("store") == store)
            & (
                F.col("last_scanned_at").isNull()
                | (
                    (F.col("_succ_result") == 1)
                    & (F.col("last_scuccess_scanned_at")
                       < cur - F.expr("INTERVAL 180 DAYS"))
                    & (F.col("last_scanned_at")
                       < cur - F.expr("INTERVAL 5 DAYS"))
                )
                | (
                    F.col("last_analyzed_result").isin(2, 3, 4)
                    & (
                        (F.col("last_scuccess_scanned_at")
                         < cur - F.expr("INTERVAL 90 DAYS"))
                        | F.col("last_scuccess_scanned_at").isNull()
                    )
                    & (F.col("last_scanned_at")
                       < cur - F.expr("INTERVAL 5 DAYS"))
                )
            )
        )
        .select(
            "store_app",
            F.col("id").alias("version_code_db_id"),
            F.col("version_code").alias("version_code_str"),
            "store_id", "name", "installs", "rating_count",
            F.lit("regular").alias("mysource"),
            "last_analyzed_result", "last_scanned_at",
            "last_scuccess_scanned_at",
        )
    )
    wu = Window.partitionBy("id").orderBy(
        F.col("user_requested_at").desc(), F.col("request_id").desc()
    )
    user = (
        F.broadcast(user_requested.select(
            "store_id",
            F.col("created_at").alias("user_requested_at"),
            "request_id",
        ))
        .join(
            store_apps.select("id", "store_id", "store", "name"),
            "store_id", "left",
        )
        .join(
            app_global_metrics.select(
                F.col("store_app").alias("id"),
                F.col("total_installs").alias("installs"),
                F.col("total_ratings").alias("rating_count"),
            ),
            "id", "left",
        )
        .join(
            latest_vc.select(
                F.col("store_app").alias("id"),
                F.col("id").alias("version_code_db_id"),
                F.col("version_code").alias("version_code_str"),
                "downloaded_at",
            ),
            "id",
        )
        .join(
            ls.select(
                F.col("version_code_id").alias("version_code_db_id"),
                F.col("scanned_at").alias("last_scanned_at"),
                F.col("scan_result").alias("last_analyzed_result"),
            ),
            "version_code_db_id", "left",
        )
        .join(
            lsvc.select(
                F.col("version_code_id").alias("version_code_db_id"),
                F.col("scanned_at").alias("last_scuccess_scanned_at"),
            ),
            "version_code_db_id", "left",
        )
        .filter(
            (
                (F.col("last_scuccess_scanned_at")
                 < F.col("user_requested_at"))
                | F.col("last_scuccess_scanned_at").isNull()
                | (F.col("downloaded_at") > F.col("last_scanned_at"))
            )
            & (F.col("store") == store)
        )
        .withColumn("_rn", F.row_number().over(wu))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("id").alias("store_app"),
            "version_code_db_id", "version_code_str", "store_id",
            "name", "installs", "rating_count",
            F.lit("user").alias("mysource"),
            "last_analyzed_result", "last_scanned_at",
            "last_scuccess_scanned_at",
        )
    )
    return user.unionByName(scheduled)


def apps_to_api_scan(
    version_codes: DataFrame,
    s3_file_keys: DataFrame,
    api_scan_results: DataFrame,
    api_scan_log: DataFrame,
    store_apps: DataFrame,
    app_global_metrics: DataFrame,
    user_requested: DataFrame,
    store: int,
    as_of: str,
) -> DataFrame:
    """query_apps_to_api_scan.sql:1-149 — the API-scan frontier:
    latest stored version code per app, last / last-successful scan
    per app (:19-43), a 10-day failed-attempt throttle from the scan
    log (:44-53), the 120-day recrawl window (:54-82), plus the
    user-requested branch (:83-117); UNION ALL with mysource tags.
    ``api_scan_results`` carries a unique ``run_seq`` tie-break."""
    all_vc, latest_vc = _latest_version_codes(version_codes, s3_file_keys)
    cur = F.lit(as_of).cast("date").cast("timestamp")

    def last_run(filtered: DataFrame, by_app: bool) -> DataFrame:
        joined = filtered.join(
            version_codes.select(
                F.col("id").alias("version_code_id"), "store_app"
            ),
            "version_code_id", "left",
        )
        key = "store_app" if by_app else "version_code_id"
        w = Window.partitionBy(key).orderBy(
            F.col("run_at").desc(), F.col("run_seq").desc()
        )
        return (
            joined.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("version_code_id", "store_app", "run_at", "run_result")
        )

    ls = last_run(api_scan_results, by_app=True)
    lss = last_run(
        api_scan_results.filter(F.col("run_result") == 1), by_app=True
    )
    failed = (
        api_scan_log.filter(
            (F.col("crawl_result") != 1)
            & (F.col("updated_at") >= cur - F.expr("INTERVAL 10 DAYS"))
        )
        .groupBy("store_app")
        .agg(F.count("*").alias("failed_attempts"))
    )
    sa = store_apps.select(F.col("id").alias("store_app"), "store",
                           "store_id", "name")
    agm = app_global_metrics.select(
        "store_app", F.col("total_installs").alias("installs")
    )
    not_throttled = (
        (F.col("failed_attempts") < 1) | F.col("failed_attempts").isNull()
    )
    scheduled = (
        latest_vc.join(
            ls.select(
                "store_app",
                F.col("run_at").alias("last_run_at"),
                F.col("run_result").alias("last_run_result"),
            ),
            "store_app", "left",
        )
        .join(
            lss.select(
                F.col("version_code_id").alias("id"),
                F.col("run_at").alias("last_succesful_run_at"),
            ),
            "id", "left",
        )
        .join(sa, "store_app", "left")
        .join(agm, "store_app", "left")
        .join(failed, "store_app", "left")
        .filter(
            (
                (F.col("last_run_at") <= cur - F.expr("INTERVAL 120 DAYS"))
                | F.col("last_run_at").isNull()
            )
            & (F.col("store") == store)
            & not_throttled
        )
        .select(
            "store_app", "store_id", "name",
            F.col("version_code").alias("version_string"),
            F.col("id").alias("version_code_id"),
            "installs", "last_run_at", "failed_attempts",
            "last_run_result", "last_succesful_run_at",
            F.lit(None).cast("timestamp").alias("user_requested_at"),
            F.lit("scheduled").alias("mysource"),
        )
    )
    wu = Window.partitionBy("store_app").orderBy(
        F.col("user_requested_at").desc(), F.col("request_id").desc()
    )
    user = (
        F.broadcast(user_requested.select(
            "store_id",
            F.col("created_at").alias("user_requested_at"),
            "request_id",
        ))
        .join(
            store_apps.select(
                F.col("id").alias("store_app"), "store_id", "store", "name"
            ),
            "store_id", "left",
        )
        .join(agm, "store_app", "left")
        .join(
            latest_vc.select(
                "store_app",
                F.col("id").alias("version_code_id"),
                F.col("version_code").alias("version_string"),
            ),
            "store_app",
        )
        .join(
            ls.select(
                F.col("version_code_id"),
                F.col("run_at").alias("last_run_at"),
                F.col("run_result").alias("last_run_result"),
            ),
            "version_code_id", "left",
        )
        .join(
            lss.select(
                F.col("version_code_id"),
                F.col("run_at").alias("last_succesful_run_at"),
            ),
            "version_code_id", "left",
        )
        .join(failed, "store_app", "left")
        .filter(
            (
                (F.col("last_run_at") < F.col("user_requested_at"))
                | F.col("last_run_at").isNull()
            )
            & (F.col("store") == store)
            & not_throttled
        )
        .withColumn("_rn", F.row_number().over(wu))
        .filter(F.col("_rn") == 1)
        .select(
            "store_app", "store_id", "name", "version_string",
            "version_code_id", "installs", "last_run_at",
            "failed_attempts", "last_run_result", "last_succesful_run_at",
            "user_requested_at", F.lit("user").alias("mysource"),
        )
    )
    return user.unionByName(scheduled)


_CREATIVE_MIME_RE = (
    r"(?i)(image|video)/(jpeg|jpg|png|gif|webp|webm|mp4|avi|quicktime)"
)


def apps_to_creative_scan(
    api_calls: DataFrame,
    store_apps: DataFrame,
    creative_scan_log: DataFrame,
    earliest_date: str,
    as_of: str,
) -> DataFrame:
    """query_apps_to_creative_scan.sql:1-54 — runs holding creative
    media (mime-typed image/video responses over 80 kB, settled for an
    hour) ordered stalest-first by their last creative-scan time."""
    mime_ok = (
        F.col("request_mime_type").rlike(_CREATIVE_MIME_RE)
        | F.col("response_mime_type").rlike(_CREATIVE_MIME_RE)
    )
    cutoff = (
        F.lit(as_of).cast("timestamp") - F.expr("INTERVAL 1 HOUR")
    )
    my_runs = (
        api_calls.filter(
            mime_ok
            & (F.col("status_code") == 200)
            & (F.col("response_size_bytes") > 80000)
            & (F.col("called_at") >= F.lit(earliest_date).cast("timestamp"))
            & (F.col("called_at") <= cutoff)
        )
        .join(
            store_apps.select(F.col("id").alias("store_app"), "store_id"),
            "store_app", "left",
        )
        .select("run_id", "store_id")
        .distinct()
    )
    last_runs = (
        creative_scan_log.join(
            my_runs.select("run_id").distinct(), "run_id", "left_semi"
        )
        .groupBy("run_id")
        .agg(F.max("inserted_at").alias("last_run_at"))
    )
    return my_runs.join(last_runs, "run_id", "left").select(
        "run_id", "store_id", "last_run_at"
    )


def apps_missing_icon_variants(
    store_apps: DataFrame,
    icons_crawled: DataFrame,
    store_filter: int | None,
    as_of: str,
    limit: int,
) -> DataFrame:
    """query_apps_missing_icon_variants.sql:1-30 — successfully-crawled
    apps that have a source 512px icon but are missing a derived 128/64
    variant and were not icon-crawled in the last 3 days; both-missing
    first, then freshest listing, LIMIT'd.  (store_app appended as the
    LIMIT's total-order pin.)"""
    cur = F.lit(as_of).cast("date").cast("timestamp")
    base = store_apps.filter(
        (F.col("icon_128").isNull() | F.col("icon_64").isNull())
        & F.col("icon_url_512").isNotNull()
        & (F.col("crawl_result") == 1)
    )
    if store_filter is not None:
        base = base.filter(F.col("store") == store_filter)
    missing_rank = (
        F.when(F.col("icon_128").isNull() & F.col("icon_64").isNull(), 0)
        .when(F.col("icon_128").isNull() | F.col("icon_64").isNull(), 1)
        .otherwise(2)
    )
    return (
        base.join(
            icons_crawled.select(
                F.col("store_app").alias("id"),
                F.col("crawled_at").alias("_icon_crawled_at"),
            ),
            "id", "left",
        )
        .filter(
            F.col("_icon_crawled_at").isNull()
            | (F.col("_icon_crawled_at") < cur - F.expr("INTERVAL 3 DAYS"))
        )
        .orderBy(
            missing_rank, F.col("updated_at").desc(), F.col("id")
        )
        .limit(limit)
        .select("id", "store_id", "store", "icon_url_512", "icon_128",
                "icon_64")
    )


def apps_mitm_in_s3(
    api_scan_results: DataFrame,
    version_codes: DataFrame,
    store_apps: DataFrame,
    store: int = 1,
) -> DataFrame:
    """query_apps_mitm_in_s3.sql:1-19 — every successful API-scan run
    flattened to (run_id, store_id, store_app, version_str)."""
    return (
        api_scan_results.filter(F.col("run_result") == 1)
        .select(
            F.col("run_seq").alias("run_id"),
            "version_code_id", "run_at",
        )
        .join(
            version_codes.select(
                F.col("id").alias("version_code_id"), "store_app",
                F.col("version_code").alias("version_str"),
            ),
            "version_code_id", "left",
        )
        .join(
            store_apps.select(
                F.col("id").alias("store_app"), "store_id", "store"
            ),
            "store_app", "left",
        )
        .filter(F.col("store") == store)
        .select("run_id", "store_id", "store_app", "version_str")
    )


def apps_to_sdk_scan_fix(
    version_codes: DataFrame,
    store_apps: DataFrame,
    sdk_scan_results: DataFrame,
    app_sdk_strings: DataFrame,
    store: int,
    as_of: str,
) -> DataFrame:
    """query_apps_to_sdk_scan_fix.sql:1-59 — repair pass: apps whose
    LATEST settled version code (≥3 days old, code != '-1') has a
    stale-or-absent sdk scan AND which have no extracted sdk strings
    at all (anti-join)."""
    cur = F.lit(as_of).cast("date").cast("timestamp")
    w = Window.partitionBy("store_app").orderBy(
        F.col("created_at").desc(), F.col("id").desc()
    )
    latest = (
        version_codes.filter(
            (F.col("version_code") != "-1")
            & (F.col("created_at") < cur - F.expr("INTERVAL 3 DAYS"))
        )
        .join(
            store_apps.select(
                F.col("id").alias("store_app"), "store", "store_id"
            ),
            "store_app", "left",
        )
        .filter(F.col("store") == store)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    ws = Window.partitionBy("version_code_id").orderBy(
        F.col("scanned_at").desc(), F.col("scan_id").desc()
    )
    last_scan = (
        sdk_scan_results.join(
            latest.select(F.col("id").alias("version_code_id")),
            "version_code_id",
        )
        .withColumn("_rn", F.row_number().over(ws))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("version_code_id").alias("id"),
            F.col("scanned_at"),
        )
    )
    return (
        latest.join(last_scan, "id", "left")
        .filter(
            F.col("scanned_at").isNull()
            | (F.col("scanned_at") < cur - F.expr("INTERVAL 3 DAYS"))
        )
        .join(
            app_sdk_strings.select("store_app").distinct(),
            "store_app", "left_anti",
        )
        .select(
            "store_app", "store", "store_id",
            F.col("id").alias("latest_version_code_db_id"),
            F.col("version_code").alias("version_code_str"),
        )
    )


def apps_to_api_scan_ads(
    version_codes: DataFrame,
    s3_file_keys: DataFrame,
    api_scan_results: DataFrame,
    api_scan_log: DataFrame,
    store_apps: DataFrame,
    app_global_metrics: DataFrame,
    creative_publishers: DataFrame,
    store: int,
    as_of: str,
) -> DataFrame:
    """query_apps_to_api_scan_ads.sql:1-106 — the monthly ads-focused
    API-scan variant of apps_to_api_scan: 10-day recrawl (vs 120),
    3-day failed-attempt window (vs 10), restricted to free
    ad-supported apps that have previously served creatives (semi-join
    on the creative-record publisher set), no user branch, tagged
    'scheduled_ads'.  ``creative_publishers``: one column store_app."""
    _all_vc, latest_vc = _latest_version_codes(version_codes, s3_file_keys)
    cur = F.lit(as_of).cast("date").cast("timestamp")

    def last_run(filtered: DataFrame) -> DataFrame:
        joined = filtered.join(
            version_codes.select(
                F.col("id").alias("version_code_id"), "store_app"
            ),
            "version_code_id", "left",
        )
        w = Window.partitionBy("store_app").orderBy(
            F.col("run_at").desc(), F.col("run_seq").desc()
        )
        return (
            joined.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("version_code_id", "store_app", "run_at", "run_result")
        )

    ls = last_run(api_scan_results)
    lss = last_run(api_scan_results.filter(F.col("run_result") == 1))
    failed = (
        api_scan_log.filter(
            (F.col("crawl_result") != 1)
            & (F.col("updated_at") >= cur - F.expr("INTERVAL 3 DAYS"))
        )
        .groupBy("store_app")
        .agg(F.count("*").alias("failed_attempts"))
    )
    return (
        latest_vc.join(
            ls.select(
                "store_app",
                F.col("run_at").alias("last_run_at"),
                F.col("run_result").alias("last_run_result"),
            ),
            "store_app", "left",
        )
        .join(
            lss.select(
                F.col("version_code_id").alias("id"),
                F.col("run_at").alias("last_succesful_run_at"),
            ),
            "id", "left",
        )
        .join(
            store_apps.select(
                F.col("id").alias("store_app"), "store", "store_id",
                "name", "ad_supported", "free",
            ),
            "store_app", "left",
        )
        .join(
            app_global_metrics.select(
                "store_app", F.col("total_installs").alias("installs")
            ),
            "store_app", "left",
        )
        .join(failed, "store_app", "left")
        .join(
            creative_publishers.select("store_app").distinct(),
            "store_app", "left_semi",
        )
        .filter(
            (
                (F.col("last_run_at") <= cur - F.expr("INTERVAL 10 DAYS"))
                | F.col("last_run_at").isNull()
            )
            & (F.col("store") == store)
            & F.col("ad_supported")
            & F.col("free")
            & (
                (F.col("failed_attempts") < 1)
                | F.col("failed_attempts").isNull()
            )
        )
        .select(
            "store_app", "store_id", "name",
            F.col("version_code").alias("version_string"),
            F.col("id").alias("version_code_id"),
            "installs", "last_run_at", "failed_attempts",
            "last_run_result", "last_succesful_run_at",
            F.lit(None).cast("timestamp").alias("user_requested_at"),
            F.lit("scheduled_ads").alias("mysource"),
        )
    )
