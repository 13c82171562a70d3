"""Dependency-ordered derived-product refresh over the engine's OWN
crawl output — the analog of the reference's materialized-view DAG
(/root/reference/adscrawler/tools/recreate_all_mvs.py:231-313 refreshes
~39 frontend views in dump order; /root/reference/adscrawler/process/
app_metrics_history.py:142-336 chains daily→weekly→interpolated→
country-share as one orchestrated flow over intermediate tables).

``refresh_all(spark, cat)`` materializes each derived table through the
snapshot catalog IN ORDER, and every downstream step reads the
*committed* upstream table back (not the in-memory lineage) — exactly
how the reference's REFRESH MATERIALIZED VIEW chain consumes previously
refreshed views.  That makes each step restartable and keeps any one
step's plan shallow.

The DAG (step → reference analog):

  crawl_log  → latest_crawl_state        (A1 latest-row dedup)
             → weekly_host_metrics       (weekly rollup)
             → densified_metrics         (calendar + ffill)
             → zscored_metrics           (trailing z-scores)
             → host_changes              (lag/lead churn)
  crawl_log ⋈ frontier
             → app_metrics_history       (app_global_metrics_history)
             → app_metrics_interpolated  (app_metrics_history.py:694-809)
             → app_global_metrics_latest (app_global_metrics_latest MV)
  documents  → store_apps_overview       (apps dim: latest title per app)
             → app_keywords_extracted    (process_keywords.py TF-IDF)
             → keyword_scores            (keyword_scores MV)
             → z_scores_top_apps         (z_scores_top_apps MV)
  documents  → app_country_metrics       (country-share grouped-map)
  adstxt_entries ⋈ crawl_log
             → adstxt_domain_entries     (staleness-windowed entries MV)
  apps ⋈ frontier ⋈ crawl_log
             → apps_new_weekly           (new-app leaderboard MV)
  rankings   → store_app_ranks_latest    (latest best-rank MV)
             → store_app_ranks_weekly    (DOW retention compaction)
             → store_app_ranks_best_monthly (30-day best-rank rollup)

Scale shape: every step is a hash-distributed DataFrame plan keyed on
url_canon / store_app / host — no driver loops, no global sorts; the
catalog commit is an atomic parquet fileset swap per table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from adscrawler_spark.operators import dedup as dedup_ops
from adscrawler_spark.operators.adstxt import entries_from_spans  # noqa: F401
from adscrawler_spark.operators.estimates import country_share_model
from adscrawler_spark.plans import app_metrics as appm
from adscrawler_spark.plans import frontend as fe
from adscrawler_spark.plans import metrics_history as mh
from adscrawler_spark.sources.catalog import Catalog

LISTING_KINDS = ["listing_play", "listing_ios"]


def _r(col: F.Column, k: int) -> F.Column:
    m = float(10**k)
    return F.floor(col * m + F.lit(0.5)) / m


def _span_text(kind: str) -> F.Column:
    """First span text of the given kind from a documents row."""
    return F.get(
        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit(kind)), 0
    )["text"]


def app_metrics_history(crawl_log: DataFrame, frontier: DataFrame) -> DataFrame:
    """Weekly per-app install observations from successful listing
    fetches — the engine's app_global_metrics_history: each ok fetch
    observes the app's (installs, rating_count) dim that week; running
    totals accumulate per app (hist schema consumed by
    appm.global_metrics_latest)."""
    dim = (
        frontier.filter(F.col("doc_kind").isin(LISTING_KINDS))
        .groupBy("url_canon")
        .agg(
            F.max("installs").alias("installs"),
            F.max("rating_count").alias("rating_count"),
            F.max(
                F.when(F.col("doc_kind") == "listing_play", 1).otherwise(2)
            ).alias("store"),
        )
    )
    obs = (
        crawl_log.filter(
            F.col("fetched")
            & (F.col("crawl_result") == 1)
            & F.col("doc_kind").isin(LISTING_KINDS)
        )
        .select("url_canon", "fetched_at")
        .join(dim, "url_canon")
    )
    weekly = obs.groupBy(
        F.col("url_canon").alias("store_app"),
        F.date_trunc("week", "fetched_at").cast("date").alias("week_start"),
    ).agg(
        F.max("installs").alias("weekly_installs"),
        F.max("rating_count").alias("weekly_ratings"),
        F.max("store").alias("store"),
    )
    w_run = (
        Window.partitionBy("store_app")
        .orderBy("week_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        weekly.withColumn("total_installs", F.sum("weekly_installs").over(w_run))
        .withColumn("total_ratings", F.sum("weekly_ratings").over(w_run))
        .withColumn(
            "rating",
            _r(1.0 + F.pmod(F.xxhash64("store_app"), F.lit(40)) / 10.0, 1),
        )
    )


def store_apps_overview(documents: DataFrame) -> DataFrame:
    """Apps dim from the latest listing document per app: store_app =
    canonical URL (doc_id minus the kind prefix), name = title span,
    category bucketed deterministically (the reference's genre dim is a
    store attribute; the synthetic listings carry it in the title)."""
    listings = documents.filter(F.col("store").isin(1, 2))
    w = Window.partitionBy("doc_id").orderBy(F.desc("crawled_date"))
    latest = (
        listings.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
    store_app = F.expr("substring(doc_id, instr(doc_id, '::') + 2)")
    return latest.select(
        store_app.alias("store_app"),
        F.col("store"),
        F.lower(F.coalesce(_span_text("title"), F.lit(""))).alias("name"),
        F.concat(
            F.lit("cat"), F.pmod(F.xxhash64("doc_id"), F.lit(7)).cast("string")
        ).alias("category"),
        F.col("country"),
        F.col("crawled_date").alias("store_last_crawled"),
    )


def app_keywords_extracted(documents: DataFrame, k: int = 5) -> DataFrame:
    """Per-app keywords via TF-IDF over title+description span text —
    the app_keywords_extracted analog (reference process_keywords.py
    via operators/dedup.py::tfidf_top_terms)."""
    listings = documents.filter(F.col("store").isin(1, 2))
    text = F.concat_ws(
        " ",
        F.coalesce(_span_text("title"), F.lit("")),
        F.coalesce(_span_text("description"), F.lit("")),
    )
    store_app = F.expr("substring(doc_id, instr(doc_id, '::') + 2)")
    corpus = listings.select(
        store_app.alias("store_app"), text.alias("text")
    ).dropDuplicates(["store_app"])
    scored = dedup_ops.tfidf_top_terms(
        corpus, k=k, text_col="text", id_col="store_app"
    )
    return scored.select(
        "store_app", F.col("term").alias("keyword_text"), "score", "rnk"
    )


def search_postings(documents: DataFrame) -> DataFrame:
    """GIN-analogue inverted index over the latest listing text per
    app (functions/textsearch.py::build_postings over title +
    description span text) — maintained as a derived table like the
    other matviews so ranked full-text search reads committed
    postings instead of re-tokenizing the corpus per query (the
    reference's tsvector GIN index is maintained by trigger /
    REFRESH, pg-ddl search columns)."""
    from adscrawler_spark.functions import textsearch as ts

    listings = documents.filter(F.col("store").isin(1, 2))
    text = F.concat_ws(
        " ",
        F.coalesce(_span_text("title"), F.lit("")),
        F.coalesce(_span_text("description"), F.lit("")),
    )
    store_app = F.expr("substring(doc_id, instr(doc_id, '::') + 2)")
    corpus = listings.select(
        store_app.alias("store_app"), text.alias("text")
    ).dropDuplicates(["store_app"])
    return ts.build_postings(corpus, "store_app", "text")


def adstxt_domain_entries(
    adstxt_entries: DataFrame, crawl_log: DataFrame
) -> DataFrame:
    """Staleness-windowed ads.txt entries over the engine's own crawl
    log: an entry is fresh while the latest crawl of its publisher
    domain is within 1h of the entry's own fetch (the
    adstxt_domain_entries MV's interval predicate re-keyed to engine
    tables)."""
    ad_log = crawl_log.filter(F.col("doc_kind") == "adstxt").select(
        "url_canon", "host", "fetched_at"
    )
    entries = adstxt_entries.withColumn(
        "url_canon", F.expr("substring(doc_id, 9)")
    ).join(ad_log.select("url_canon", "fetched_at"), "url_canon")
    latest = ad_log.groupBy(F.col("host").alias("pub_domain_id")).agg(
        F.max("fetched_at").alias("crawled_at")
    )
    ent = entries.select(
        F.substring_index("url_canon", "/", 1).alias("pub_domain_id"),
        F.col("ad_domain").alias("ad_domain_id"),
        F.concat_ws("|", "doc_id", "ad_domain", "publisher_id").alias(
            "app_ad_entry_id"
        ),
        F.col("fetched_at").alias("updated_at"),
    )
    return appm.adstxt_fresh_entries(
        ent, latest.withColumnRenamed("pub_domain_id", "domain_id")
    )


def app_country_metrics(documents: DataFrame) -> DataFrame:
    """Country-share estimates over the documents lake: weekly per-app
    per-country fetch counts feed the grouped-map model
    (operators/estimates.py — app_metrics_history.py:413-534)."""
    listings = documents.filter(
        F.col("store").isin(1, 2) & F.col("country").isNotNull()
    )
    weekly = listings.groupBy(
        F.pmod(F.xxhash64(F.expr("substring(doc_id, instr(doc_id, '::') + 2)")),
               F.lit(2**31)).cast("int").alias("store_app"),
        F.pmod(F.xxhash64("country"), F.lit(2**31)).cast("int").alias("country"),
        F.date_trunc("week", "crawled_date").cast("date").alias("week_start"),
    ).agg(
        F.count("*").alias("review_count"),
        (F.count("*") * 1000).alias("installs"),
    )
    # many small per-app groups at crawl scale -> bucketed
    # grouped-map (one pandas call models a bucket of apps)
    return country_share_model(weekly, buckets=256)


def store_app_ranks_latest(rankings: DataFrame) -> DataFrame:
    """Best (lowest) rank per app per scenario on the scenario's latest
    crawled date — the store_app_ranks_latest matview analog
    (/root/reference/pg-ddl/schema/frontend/store_app_ranks_latest__matview.sql;
    feeds the rankings_latest_dedup battery pipeline shape)."""
    scenario = ["store", "country", "collection", "category"]
    w_date = Window.partitionBy(*scenario)
    w_best = Window.partitionBy(*scenario, "store_id").orderBy(
        "rank", "crawled_date"
    )
    return (
        rankings.withColumn("max_date", F.max("crawled_date").over(w_date))
        .filter(F.col("crawled_date") == F.col("max_date"))
        .drop("max_date")
        .withColumn("rn", F.row_number().over(w_best))
        .filter("rn = 1")
        .select(*scenario, "crawled_date", "store_id",
                F.col("rank").alias("best_rank"))
    )


def apps_overview_enriched(
    apps: DataFrame, frontier: DataFrame, crawl_log: DataFrame
) -> DataFrame:
    """store_apps_overview widened with the columns the apps_new
    leaderboards filter on: installs / rating_count from the frontier
    dim, first-seen fetch date standing in for release_date/created_at
    (the engine's "new app" = newly discovered), crawl_result = 1 when
    the app ever fetched ok."""
    dim = (
        frontier.filter(F.col("doc_kind").isin(LISTING_KINDS))
        .groupBy(F.col("url_canon").alias("store_app"))
        .agg(
            F.max("installs").alias("installs"),
            F.max("rating_count").alias("rating_count"),
        )
    )
    logd = (
        crawl_log.filter(F.col("doc_kind").isin(LISTING_KINDS))
        .groupBy(F.col("url_canon").alias("store_app"))
        .agg(
            F.min(F.col("fetched_at").cast("date")).alias("release_date"),
            F.max(
                F.when(F.col("fetched") & (F.col("crawl_result") == 1), 1)
                .otherwise(0)
            ).alias("crawl_result"),
        )
    )
    return (
        apps.join(dim, "store_app", "left")
        .join(logd, "store_app", "left")
        .withColumn("created_at", F.col("release_date"))
    )


def refresh_all(
    spark: SparkSession, cat: Catalog, max_parallel: int = 6
) -> dict[str, int]:
    """Materialize the derived-product chain in dependency order.

    Returns {table: row_count}.  Each step commits through the snapshot
    catalog and the next step reads the committed table back, so the
    chain is restartable mid-way and no step's plan compounds its
    ancestors' lineage (the reference's REFRESH ... ordering).

    Tables are grouped into dependency LEVELS; within a level they are
    independent and commit concurrently from a small thread pool
    (Spark's scheduler interleaves the jobs — the same shape as
    submitting independent REFRESH statements in parallel sessions,
    and the multi-tenant reality of a shared cluster).  Sequential
    wall-clock was the sum of 18 per-table latencies; now it is the
    sum over levels of each level's slowest table."""
    from concurrent.futures import ThreadPoolExecutor

    counts: dict[str, int] = {}
    out_dfs: dict[str, DataFrame] = {}

    def commit(name: str, build) -> DataFrame:
        df = build() if callable(build) else build
        cat.table(name).overwrite(df, {"refresh": name})
        out = cat.table(name).read(spark)
        counts[name] = out.count()
        out_dfs[name] = out
        return out

    def run_level(tasks: list[tuple[str, object]]) -> None:
        if not tasks:
            return
        with ThreadPoolExecutor(
            max_workers=min(len(tasks), max_parallel)
        ) as ex:
            futs = [ex.submit(commit, n, b) for n, b in tasks]
            for f in futs:
                f.result()

    crawl_log = cat.table("crawl_log").read(spark)
    frontier = cat.table("frontier").read(spark)
    documents = cat.table("documents").read(spark)
    adstxt = cat.table("adstxt_entries").read(spark)
    rankings = cat.table("rankings").read(spark)

    # ---- level 1: source tables only --------------------------------
    level1 = [
        ("mv_latest_crawl_state", lambda: mh.latest_crawl_state(crawl_log)),
        ("mv_weekly_host_metrics", lambda: mh.weekly_host_metrics(crawl_log)),
        ("mv_app_metrics_history",
         lambda: app_metrics_history(crawl_log, frontier)),
        ("mv_store_apps_overview", lambda: store_apps_overview(documents)),
        ("mv_app_keywords_extracted",
         lambda: app_keywords_extracted(documents)),
        ("mv_search_postings", lambda: search_postings(documents)),
        ("mv_app_country_metrics", lambda: app_country_metrics(documents)),
        ("mv_adstxt_domain_entries",
         lambda: adstxt_domain_entries(adstxt, crawl_log)),
    ]
    if rankings is not None:
        level1.append(
            ("mv_store_app_ranks_latest",
             lambda: store_app_ranks_latest(rankings))
        )
    run_level(level1)
    weekly_host = out_dfs["mv_weekly_host_metrics"]
    hist = out_dfs["mv_app_metrics_history"]
    apps = out_dfs["mv_store_apps_overview"]
    ake = out_dfs["mv_app_keywords_extracted"]

    # ---- level 2: consumers of level-1 products ----------------------
    level2 = [
        ("mv_densified_metrics", lambda: mh.densified_metrics(weekly_host)),
        ("mv_host_changes", lambda: mh.host_changes(weekly_host)),
        ("mv_app_metrics_interpolated", lambda: mh.interpolate_weekly(
            hist.select(
                "store_app",
                "week_start",
                F.col("weekly_installs").cast("double").alias("val"),
            ),
            ["store_app"],
            week_col="week_start",
            val_col="val",
        )),
        ("mv_app_global_metrics_latest", lambda: appm.global_metrics_latest(
            hist.select(
                "store_app", "week_start", "weekly_installs",
                "weekly_ratings", "total_installs", "total_ratings",
                "rating",
            )
        )),
    ]
    # category-normalization dim over the apps dim (the crontab
    # refreshes public.category_mapping every 8h,
    # pg-ddl/schema/example_contab.txt)
    from adscrawler_spark.plans import status_views as SV

    level2.append(
        ("mv_category_mapping", lambda: SV.category_mapping(apps))
    )
    # new-app leaderboard over the enriched apps dim (apps_new_weekly
    # MV; engine virtual time compresses generations into one day, so
    # the 7-day release window admits every discovered app)
    as_of_row = crawl_log.agg(
        F.max(F.col("fetched_at").cast("date")).alias("d")
    ).first()
    if as_of_row and as_of_row["d"] is not None:
        as_of = str(as_of_row["d"])
        level2.append(
            ("mv_apps_new_weekly", lambda: fe.apps_new(
                apps_overview_enriched(apps, frontier, crawl_log),
                as_of, 7, 11,
            ).select(
                "store_app", "store", "app_category", "name", "installs",
                "rating_count", "release_date", "created_at",
                "crawl_result", "rn",
            ))
        )
    rank_as_of = None
    if rankings is not None:
        rank_as_of = rankings.agg(F.max("crawled_date").alias("d")).first()
        level2.append(
            ("mv_store_app_ranks_weekly", lambda: fe.ranks_weekly_retention(
                rankings, str(rank_as_of["d"])
            ))
        )
    run_level(level2)

    # ---- level 3: consumers of level-2 products ----------------------
    dense = out_dfs["mv_densified_metrics"]
    latest = out_dfs["mv_app_global_metrics_latest"]
    mapping = out_dfs["mv_category_mapping"]
    level3 = [
        # successful-apps-per-category rollup off the committed mapping
        # dim (crontab: public.mv_app_categories, refreshed with it)
        ("mv_app_categories", lambda: SV.mv_app_categories(
            apps_overview_enriched(apps, frontier, crawl_log), mapping
        )),
        ("mv_zscored_metrics", lambda: mh.zscored_metrics(dense)),
        ("mv_keyword_scores", lambda: appm.keyword_scores(
            ake.select("store_app", "keyword_text"),
            apps.select("store_app", "store", "name"),
            latest,
        )),
        ("mv_z_scores_top_apps", lambda: appm.z_scores_top_apps(
            latest,
            apps.select("store_app", "store", "category", "name"),
            # synthetic crawl installs are small; thresholds scaled to
            # the synthetic dim ranges (reference: 50k/1k absolute)
            min_installs=0,
            min_weekly=0,
        )),
    ]
    if rankings is not None:
        weekly = out_dfs["mv_store_app_ranks_weekly"]
        level3.append(
            ("mv_store_app_ranks_best_monthly",
             lambda: fe.store_app_ranks_best_monthly(
                 weekly,
                 str(rank_as_of["d"]),
                 days=30,
                 rank_col="rank",
                 scenario=(
                     "store", "store_id", "country", "collection",
                     "category",
                 ),
             ))
        )
    run_level(level3)
    return counts
