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


def apps_to_update_primary(
    store_apps: DataFrame,
    app_global_metrics: DataFrame,
    apps_in_latest_rankings: DataFrame,
    country_config: DataFrame,
    countries: DataFrame,
    scenarios: DataFrame,
    app_country_crawls: DataFrame,
    store: int,
    now_ts: str,
    short_update_ts: str,
    short_update_installs: int,
    short_update_ratings: int,
    long_update_ts: str,
    max_recrawl_ts: str,
    year_ago_ts: str,
    limit: int,
) -> DataFrame:
    """query_apps_to_update_primary.sql:1-147 — the PRIMARY country-
    tier recrawl frontier (the main store-listing crawl; dispatched by
    dbcon/queries.py::query_store_apps_to_update for
    country_priority_group=1).  Structure:

    * countries_to_crawl (:1-19): scenario 'app_details', enabled,
      priority=1 — a curated one-row-ish dim, broadcast;
    * target_apps (:25-58): every app of the store (no eligibility
      pre-filter, unlike the secondary) with crawl_result_null /
      ranked_app flags and agm installs+ratings carried in;
    * latest_crawls (:59-84): DISTINCT ON (store_app, country_id)
      over the tier countries, newest first — a per-(app,country)
      window, crawl_id as the tie-break pin;
    * final (:85-147): target × countries_to_crawl, left-join the
      watermark, the three-branch eligibility nest, claim order
      new-first → ranked-first → staleness-weighted size
      ``greatest(installs, ratings) * 100 * days(now - crawled_at)``
      DESC.  Postgres sorts that NULL score (never-crawled rows)
      first under DESC — pinned with desc_nulls_first; trailing
      (store_app, country_id) makes the LIMIT total-order
      deterministic.

    ``now_ts`` replaces the SQL's NOW() so plans are replayable; the
    30-day recent-release window and the EXTRACT(DAY FROM interval)
    staleness (full days, floor of the epoch difference) derive from
    it."""
    now = F.lit(now_ts).cast("timestamp")
    short_u = F.lit(short_update_ts).cast("timestamp")
    long_u = F.lit(long_update_ts).cast("timestamp")
    max_r = F.lit(max_recrawl_ts).cast("timestamp")
    year_ago = F.lit(year_ago_ts).cast("timestamp")

    ctc = F.broadcast(
        country_config.filter(
            F.col("enabled") & (F.col("priority") == 1)
        )
        .join(
            scenarios.filter(F.col("name") == "app_details").select(
                F.col("id").alias("scenario_id")
            ),
            "scenario_id",
        )
        .join(
            countries.select(
                F.col("id").alias("country_id"),
                F.col("alpha2").alias("country_code"),
            ),
            "country_id",
        )
        .select("country_id", "country_code", "priority")
        .distinct()
    )
    ranked = (
        apps_in_latest_rankings.select("store_app")
        .distinct()
        .withColumnRenamed("store_app", "id")
        .withColumn("_ranked", F.lit(1))
    )
    target = (
        store_apps.filter(F.col("store") == store)
        .join(ranked, "id", "left")
        .join(
            app_global_metrics.select(
                F.col("store_app").alias("id"),
                "total_installs", "total_ratings",
            ),
            "id", "left",
        )
        .select(
            "store", F.col("id").alias("store_app"), "store_id",
            "store_last_updated", "crawl_result", "updated_at",
            "created_at", "release_date", "icon_url_100",
            "additional_html_scraped_at",
            F.when(F.col("crawl_result").isNull(), 1)
            .otherwise(0).alias("crawl_result_null"),
            F.coalesce(F.col("_ranked"), F.lit(0)).alias("ranked_app"),
            F.coalesce(F.col("total_installs"), F.lit(0)).alias(
                "total_installs"
            ),
            F.coalesce(F.col("total_ratings"), F.lit(0)).alias(
                "total_ratings"
            ),
        )
    )
    w = Window.partitionBy("store_app", "country_id").orderBy(
        F.col("crawled_at").desc(), F.col("crawl_id").desc()
    )
    latest = (
        app_country_crawls.join(
            ctc.select("country_id").distinct(), "country_id"
        )
        .join(
            target.select("store_app").distinct(), "store_app", "left_semi"
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "store_app", "country_id",
            F.col("crawled_at").alias("country_crawled_at"),
        )
    )
    joined = (
        target.crossJoin(ctc)
        .join(latest, ["store_app", "country_id"], "left")
    )
    cr = F.col("crawl_result")
    crawled = F.col("country_crawled_at")
    eligible = (
        cr.isNull()
        | (
            (
                (F.col("total_installs") >= short_update_installs)
                | (F.col("total_ratings") >= short_update_ratings)
                | (F.col("ranked_app") == 1)
                | (
                    F.col("release_date").cast("timestamp")
                    > now - F.expr("INTERVAL 30 DAYS")
                )
            )
            & (crawled <= short_u)
            & (
                (cr == 1)
                | cr.isNull()
                | (F.col("created_at") >= long_u)
                | (F.col("store_last_updated") >= year_ago)
            )
        )
        | (
            (crawled <= long_u)
            & (
                (cr == 1)
                | cr.isNull()
                | (F.col("store_last_updated") >= year_ago)
            )
        )
        | (crawled <= max_r)
        | crawled.isNull()
    )
    staleness = (
        F.greatest(F.col("total_installs"), F.col("total_ratings"))
        * 100
        * F.floor(
            (F.unix_timestamp(now) - F.unix_timestamp(crawled)) / 86400
        )
    )
    return (
        joined.filter((crawled.isNull() | (crawled < short_u)) & eligible)
        .orderBy(
            F.col("crawl_result_null").desc(),
            F.col("ranked_app").desc(),
            staleness.desc_nulls_first(),
            F.col("store_app"),       # total-order pin for the LIMIT
            F.col("country_id"),
        )
        .limit(limit)
        .select(
            "store", "store_app", "store_id", "country_id",
            "country_code", "priority", "icon_url_100",
            F.coalesce(
                F.col("additional_html_scraped_at") >= year_ago,
                F.lit(False),
            ).alias("html_recently_scraped"),
            F.col("updated_at").alias("app_updated_at"),
            "country_crawled_at",
        )
    )


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


def _days_since(as_of_date, ts: F.Column) -> F.Column:
    """Postgres ``date_part('day', current_date - ts)`` — the day
    field of the interval between the (midnight) current date and a
    timestamp.  The interval's day field truncates toward zero (a
    -12h interval has day 0), so this is a long cast of the
    epoch-second difference / 86400, not a floor."""
    return (
        (
            F.unix_timestamp(as_of_date.cast("timestamp"))
            - F.unix_timestamp(ts)
        )
        / 86_400
    ).cast("long")


def apps_to_download(
    store_apps: DataFrame,
    version_codes: DataFrame,
    s3_file_keys: DataFrame,
    store_app_downloads: DataFrame,
    apps_in_latest_rankings: DataFrame,
    growth_store_ids: DataFrame,
    user_requested: DataFrame,
    app_global_metrics: DataFrame,
    store: int,
    as_of: str,
    now_ts: str,
) -> DataFrame:
    """query_apps_to_download.sql:1-310 — the APK/IPA download
    frontier, full port (the O3 score formula in
    operators/frontier.py:136-151 is this query's :265-291 ranking
    term).

    Branches: the scheduled branch (:81-150) walks the latest ranked
    apps with the never-downloaded / stale-success+recent-store-update
    / failing-retry eligibility nest (:111-149, literal port of the
    OR/AND precedence); the user-requested branch (:151-202) takes the
    newest request per app for free, named apps whose last download
    predates the request.  Failed-attempt caps gate the union
    (:218-219 month<4 user, :244-246 month<3 and quarter<6 scheduled)
    plus the 120-day redownload window (:247-250); growth apps
    (frontend z_scores_top_apps, :72-80) promote the scheduled source
    label to ``top_scheduled``.  ``app_rank`` is the no-LIMIT global
    row_number (:275-291) — assigned by the range-partition +
    prefix-sum ranker (operators/frontier.py::global_rank), never a
    single-partition window.

    Inputs: ``store_apps`` (id, store_id, name, store, free,
    store_last_updated), ``version_codes`` (id, store_app,
    version_code, created_at, updated_at, crawl_result),
    ``s3_file_keys`` (version_code_id), ``store_app_downloads``
    (store_app, crawl_result, updated_at), ``apps_in_latest_rankings``
    (store_app, store_id, name, installs, rating_count, store — the
    frontend matview), ``growth_store_ids`` (store_id — frontend
    z_scores_top_apps output), ``user_requested`` (store_id,
    created_at), ``app_global_metrics`` (store_app, total_installs,
    total_ratings).

    Determinism pins over the reference: DISTINCT ON tie-breaks get
    the natural unique id trailing (version id, request created_at),
    and the rank order appends (mysource, store_app) after the score
    so equal-score rows rank identically in any engine."""
    as_of_d = F.lit(as_of).cast("date")

    # latest_version_codes (:6-19) — newest code per app, any result.
    w_vc = Window.partitionBy("store_app").orderBy(
        F.col("created_at").desc(), F.col("id").desc()
    )
    latest_vc = (
        version_codes.withColumn("_rn", F.row_number().over(w_vc))
        .filter(F.col("_rn") == 1)
        .select(
            "store_app",
            F.col("updated_at").alias("last_download_attempt"),
            F.col("crawl_result").alias("vc_crawl_result"),
        )
    )
    # latest_success_version_codes (:20-36) — newest code that has a
    # stored binary (INNER JOIN s3_file_keys).
    latest_success_vc = (
        version_codes.join(
            s3_file_keys.select(F.col("version_code_id").alias("id")),
            "id", "left_semi",
        )
        .withColumn("_rn", F.row_number().over(w_vc))
        .filter(F.col("_rn") == 1)
        .select(
            "store_app",
            F.col("version_code").alias("last_downloaded_version_code"),
        )
    )
    # apps_last_downloaded (:37-47)
    last_downloaded = (
        store_app_downloads.filter(F.col("crawl_result") == 1)
        .groupBy("store_app")
        .agg(F.max("updated_at").alias("last_downloaded_at"))
    )
    # faily_downloads_monthly / _quarter (:48-71)
    def failed_since(days: int) -> DataFrame:
        return (
            store_app_downloads.filter(
                (F.col("crawl_result") != 1)
                & (
                    F.col("updated_at")
                    >= F.date_sub(as_of_d, days).cast("timestamp")
                )
            )
            .groupBy("store_app")
            .agg(F.count(F.lit(1)).alias("attempt_count"))
        )

    failed_month = failed_since(30)
    failed_quarter = failed_since(90)

    sa = store_apps.select(
        F.col("id").alias("store_app"),
        F.col("store_id").alias("sa_store_id"),
        F.col("name").alias("sa_name"),
        F.col("store").alias("sa_store"),
        "free", "store_last_updated",
    )

    # scheduled_apps_crawl (:81-150).  fd/fdq join on the *version
    # code's* store_app (:102-107) — an app with no version_codes row
    # keeps NULL attempt counts by construction, exactly like the
    # reference's join through vc.
    slu_recent = (
        F.col("store_last_updated")
        > F.date_sub(as_of_d, 90).cast("timestamp")
    ) | F.col("store_last_updated").isNull()
    stale_120 = F.col("last_downloaded_at") < F.date_sub(
        as_of_d, 120
    ).cast("timestamp")
    never_dl = F.col("last_downloaded_at").isNull()
    failing_retry = F.col("vc_crawl_result").isin(2, 3, 4) & (
        F.col("last_download_attempt")
        < F.date_sub(as_of_d, 2).cast("timestamp")
    )
    scheduled = (
        apps_in_latest_rankings.filter(F.col("store") == store)
        .join(latest_vc, "store_app", "left")
        .join(last_downloaded, "store_app", "left")
        .join(latest_success_vc, "store_app", "left")
        .join(
            latest_vc.select(
                "store_app", F.lit(True).alias("_has_vc")
            ).join(failed_month, "store_app", "left")
            .select("store_app", F.col("attempt_count").alias("_fm")),
            "store_app", "left",
        )
        .join(
            latest_vc.select("store_app")
            .join(failed_quarter, "store_app", "left")
            .select("store_app", F.col("attempt_count").alias("_fq")),
            "store_app", "left",
        )
        .join(sa, "store_app", "left")
        .filter(
            F.col("free")
            & (
                F.col("last_download_attempt").isNull()
                | (
                    # :118-130 never/stale-success branch
                    (never_dl | (stale_120 & slu_recent))
                    # :132-147 failing-retry branch — AND binds
                    # tighter than OR, literal precedence port
                    | (never_dl | (stale_120 & slu_recent & failing_retry))
                )
            )
        )
        .select(
            "store_app", "store_id", "name", "installs", "rating_count",
            "last_download_attempt", "last_downloaded_at",
            "last_downloaded_version_code",
            F.coalesce(F.col("_fm"), F.lit(0)).alias(
                "failed_attempts_month"
            ),
            F.coalesce(F.col("_fq"), F.lit(0)).alias(
                "failed_attempts_quarter"
            ),
        )
    )

    # user_requested_apps_crawl (:151-202) — newest request per app.
    w_req = Window.partitionBy("store_app").orderBy(
        F.col("user_last_requested").desc()
    )
    user_req = (
        user_requested.select(
            F.col("store_id").alias("sa_store_id"),
            F.col("created_at").alias("user_last_requested"),
        )
        .join(sa, "sa_store_id", "left")
        .join(
            app_global_metrics.select(
                "store_app",
                F.col("total_installs").alias("installs"),
                F.col("total_ratings").alias("rating_count"),
            ),
            "store_app", "left",
        )
        .join(last_downloaded, "store_app", "left")
        .join(latest_success_vc, "store_app", "left")
        .join(latest_vc, "store_app", "left")
        .join(failed_month.withColumnRenamed("attempt_count", "_fm"),
              "store_app", "left")
        .join(failed_quarter.withColumnRenamed("attempt_count", "_fq"),
              "store_app", "left")
        .filter(
            (
                (F.col("last_downloaded_at") < F.col("user_last_requested"))
                | F.col("last_downloaded_at").isNull()
            )
            & (
                (
                    F.col("last_download_attempt")
                    < F.lit(now_ts).cast("timestamp")
                    - F.expr("INTERVAL 1 HOUR")
                )
                | F.col("last_download_attempt").isNull()
            )
            & (F.col("sa_store") == store)
            & (F.col("free") | F.col("free").isNull())
            & F.col("sa_name").isNotNull()
        )
        .withColumn("_rn", F.row_number().over(w_req))
        .filter(F.col("_rn") == 1)
        .select(
            "store_app",
            F.col("sa_store_id").alias("store_id"),
            F.col("sa_name").alias("name"),
            "installs", "rating_count",
            "last_download_attempt", "last_downloaded_at",
            "last_downloaded_version_code",
            F.coalesce(F.col("_fm"), F.lit(0)).alias(
                "failed_attempts_month"
            ),
            F.coalesce(F.col("_fq"), F.lit(0)).alias(
                "failed_attempts_quarter"
            ),
        )
    )

    # combined (:203-251).  growth_apps (:72-80) maps the z-scores
    # store_ids to app ids THROUGH store_apps, like the reference —
    # membership, so the dedup is free of fan-out risk.
    growth = (
        growth_store_ids.select(F.col("store_id").alias("sa_store_id"))
        .distinct()
        .join(sa.select("store_app", "sa_store_id"), "sa_store_id")
        .select("store_app")
    )
    out_cols = [
        "store_app", "store_id", "name", "installs", "rating_count",
        "failed_attempts_month", "failed_attempts_quarter", "mysource",
        "last_download_attempt", "last_downloaded_at",
        "last_downloaded_version_code",
    ]
    user_branch = (
        user_req.filter(F.col("failed_attempts_month") < 4)
        .withColumn("mysource", F.lit("user"))
        .select(*out_cols)
    )
    sched_branch = (
        scheduled.filter(
            (F.col("failed_attempts_month") < 3)
            & (F.col("failed_attempts_quarter") < 6)
            & (never_dl | stale_120)
        )
        .join(
            growth.withColumn("_growth", F.lit(True)).distinct(),
            "store_app", "left",
        )
        .withColumn(
            "mysource",
            F.when(F.col("_growth"), F.lit("top_scheduled")).otherwise(
                F.lit("scheduled")
            ),
        )
        .select(*out_cols)
    )
    combined = user_branch.unionByName(sched_branch)

    # final_selection (:252-294) — score + global rank.
    mynum = (
        (
            F.coalesce(
                _days_since(as_of_d, F.col("last_download_attempt")),
                F.lit(10_000),
            )
            + F.coalesce(
                _days_since(as_of_d, F.col("last_downloaded_at")),
                F.lit(100),
            )
        )
        / 2
        * F.greatest(
            F.coalesce(F.col("installs"), F.lit(0)).cast("double"),
            F.coalesce(F.col("rating_count"), F.lit(0)).cast("double")
            * 50,
        )
    )
    from adscrawler_spark.operators.frontier import global_rank

    ranked = global_rank(
        combined.withColumn("mynum", mynum),
        [
            F.col("mysource").desc(),
            F.col("mynum").desc_nulls_last(),
            F.col("store_app").asc(),
        ],
        rank_col="app_rank",
    )
    return ranked.select(*out_cols, "app_rank")


def apps_to_process_keywords(
    descriptions: DataFrame,
    keyword_extractions: DataFrame,
    app_global_metrics: DataFrame,
    now_ts: str,
    limit: int,
) -> DataFrame:
    """query_apps_to_process_keywords.sql:1-64 — the O5 keyword-
    extraction frontier: latest English description per app (:1-15,
    language_id=1, DISTINCT ON store_app by updated_at), latest
    extraction per description (:16-27), keep descriptions never
    extracted / updated since extraction / extracted >31 days ago
    (:28-44), require a global-metrics row (:53 INNER JOIN), order
    new-first then ``installs * 10 * days_since_extraction`` (:55-63)
    and take the top ``limit`` via the distributed top-n ranker (no
    TakeOrderedAndProject driver merge).

    ``descriptions``: (id, store_app, language_id, description_short,
    description, updated_at); ``keyword_extractions``:
    (description_id, store_app, extracted_at);
    ``app_global_metrics``: (store_app, total_installs).  Determinism
    pins: description id / extracted_at trailing tie-breaks on the
    DISTINCT ONs, store_app trailing on the claim order."""
    from adscrawler_spark.operators.frontier import ranked_top_n

    w_d = Window.partitionBy("store_app").orderBy(
        F.col("updated_at").desc(), F.col("id").desc()
    )
    latest_desc = (
        descriptions.filter(F.col("language_id") == 1)
        .withColumn("_rn", F.row_number().over(w_d))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("id").alias("description_id"),
            "store_app", "description_short", "description",
            F.col("updated_at").alias("description_last_updated"),
        )
    )
    w_e = Window.partitionBy("description_id").orderBy(
        F.col("extracted_at").desc()
    )
    latest_ext = (
        keyword_extractions.withColumn("_rn", F.row_number().over(w_e))
        .filter(F.col("_rn") == 1)
        .select(
            "description_id",
            F.col("extracted_at").alias("app_keywords_extracted_at"),
        )
    )
    now_c = F.lit(now_ts).cast("timestamp")
    base = (
        latest_desc.join(latest_ext, "description_id", "left")
        .filter(
            F.col("app_keywords_extracted_at").isNull()
            | (
                F.col("description_last_updated")
                > F.col("app_keywords_extracted_at")
            )
            | (
                F.col("app_keywords_extracted_at")
                <= now_c - F.expr("INTERVAL 31 DAYS")
            )
        )
        .join(
            app_global_metrics.select(
                "store_app", F.col("total_installs").alias("_installs")
            ),
            "store_app",
        )
    )
    # EXTRACT(DAY FROM now() - extracted_at), COALESCE(..., 1) (:57-62)
    days = F.coalesce(
        _days_since(now_c, F.col("app_keywords_extracted_at")),
        F.lit(1),
    )
    score = F.coalesce(F.col("_installs"), F.lit(0)).cast("double") * (
        10 * days
    )
    is_new = F.when(
        F.col("app_keywords_extracted_at").isNull(), 1
    ).otherwise(0)
    picked = ranked_top_n(
        base.withColumn("_new", is_new).withColumn("_score", score),
        [
            F.col("_new").desc(),
            F.col("_score").desc(),
            F.col("store_app").asc(),
        ],
        limit,
    )
    return picked.select(
        "store_app", "description_id", "app_keywords_extracted_at",
        "description_short", "description",
    )
