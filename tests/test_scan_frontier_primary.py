"""Hand-computed pin for plans/scan_frontier.apps_to_update_primary
(query_apps_to_update_primary.sql:1-147).

The battery oracle restates the same SQL in DuckDB, so a shared
misreading would pass it; this fixture is small enough that the
expected rows and their exact claim order were derived by hand from
the reference SQL:

* A (id 2)  never crawled, crawl_result NULL  → crawl_result_null=1,
            first.
* H (id 16) ranked app, cr=1, crawled 01-25   → short-update branch
            via ranked_app; ranked DESC puts it next.
* G (id 14) cr=1, never crawled (no log rows) → eligible via the
            trailing crawled-IS-NULL OR; staleness NULL sorts FIRST
            under DESC (Postgres default), so before B.
* B (id 4)  cr=1, crawled 01-30, installs over threshold → short-
            update branch; staleness = 5000*100*2.
* D (id 8)  cr=2, crawled 01-10 ≤ max_recrawl → catch-all branch;
            no metrics → staleness 0, last.
* C (id 6)  cr=2, crawled 01-20: fails every eligibility branch —
            must be absent.
* F (id 12) crawled 01-31 12:00, not < short_update_ts — filtered.
* E (id 10) store 2 — filtered.
"""

from pyspark.sql import functions as F


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_primary_recrawl_hand_case(spark):
    from adscrawler_spark.plans import scan_frontier as sfr

    TS = "timestamp"
    sapps = _df(
        spark,
        [
            # id, store, crawl_result, store_last_updated, updated_at,
            # created_at, release_date, additional_html_scraped_at
            (2, 1, None, "2023-06-01", "2024-01-05", "2023-12-01",
             "2023-01-01", None),
            (4, 1, 1, "2023-06-01", "2024-01-06", "2023-12-01",
             "2023-01-01", "2023-06-01"),
            (6, 1, 2, "2022-05-01", "2024-01-07", "2022-04-01",
             "2022-01-01", None),
            (8, 1, 2, "2023-06-01", "2024-01-08", "2023-12-01",
             "2023-01-01", None),
            (10, 2, 1, "2023-06-01", "2024-01-09", "2023-12-01",
             "2023-01-01", None),
            (12, 1, 1, "2023-06-01", "2024-01-10", "2023-12-01",
             "2023-01-01", None),
            (14, 1, 1, "2023-06-01", "2024-01-11", "2023-12-01",
             "2023-01-01", None),
            (16, 1, 1, "2023-06-01", "2024-01-12", "2023-12-01",
             "2023-01-01", None),
        ],
        "id long, store int, crawl_result int, _slu string, _ua string,"
        " _ca string, _rd string, _ahs string",
    ).select(
        "id", "store", "crawl_result",
        F.col("_slu").cast(TS).alias("store_last_updated"),
        F.col("_ua").cast(TS).alias("updated_at"),
        F.col("_ca").cast(TS).alias("created_at"),
        F.col("_rd").cast("date").alias("release_date"),
        F.col("_ahs").cast(TS).alias("additional_html_scraped_at"),
        F.concat(F.lit("sid"), F.col("id")).alias("store_id"),
        F.concat(F.lit("icon"), F.col("id")).alias("icon_url_100"),
    )
    agm = _df(
        spark,
        [(4, 5000, 10), (16, 10, 5), (6, 100, 50)],
        "store_app long, total_installs long, total_ratings long",
    )
    ranked = _df(spark, [(16,)], "store_app long")
    ccfg = _df(
        spark, [(1, 1, 1, True)],
        "country_id int, priority int, scenario_id int, enabled boolean",
    )
    countries = _df(spark, [(1, "US")], "id int, alpha2 string")
    scen = _df(spark, [(1, "app_details")], "id int, name string")
    acc = _df(
        spark,
        [
            (1, 4, 1, "2024-01-30 00:00:00"),
            (2, 6, 1, "2024-01-20 00:00:00"),
            (3, 8, 1, "2024-01-10 00:00:00"),
            (4, 12, 1, "2024-01-31 12:00:00"),
            # an older duplicate for app 4 that the per-(app,country)
            # window must discard
            (5, 4, 1, "2024-01-02 00:00:00"),
        ],
        "crawl_id long, store_app long, country_id int, _ts string",
    ).select(
        "crawl_id", "store_app", "country_id",
        F.col("_ts").cast(TS).alias("crawled_at"),
    )
    out = sfr.apps_to_update_primary(
        sapps, agm, ranked, ccfg, countries, scen, acc,
        store=1,
        now_ts="2024-02-01 00:00:00",
        short_update_ts="2024-01-31 00:00:00",
        short_update_installs=1000,
        short_update_ratings=100,
        long_update_ts="2024-01-29 00:00:00",
        max_recrawl_ts="2024-01-17 00:00:00",
        year_ago_ts="2023-02-01 00:00:00",
        limit=10,
    ).collect()
    got = [(r["store_app"], r["country_code"]) for r in out]
    assert got == [(2, "US"), (16, "US"), (14, "US"), (4, "US"),
                   (8, "US")], got
    flags = {r["store_app"]: r["html_recently_scraped"] for r in out}
    assert flags[2] is False and flags[4] is True
    watermark = {r["store_app"]: r["country_crawled_at"] for r in out}
    assert watermark[2] is None and watermark[14] is None
    assert str(watermark[4]) == "2024-01-30 00:00:00"
