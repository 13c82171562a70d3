"""The composed derived-product layer: run the crawl job, then the
dependency-ordered refresh (plans/refresh.py — the recreate_all_mvs
analog), and verify (a) every derived table materializes with sane
cross-table invariants, (b) the TERMINAL keyword_scores table equals a
DuckDB oracle computed from the engine's own materialized intermediate
tables, and (c) the refresh is idempotent (re-run → same counts)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from adscrawler_spark.plans import app_metrics as appm
from adscrawler_spark.plans import refresh
from adscrawler_spark.sources.catalog import Catalog
from adscrawler_spark.streaming import job


@pytest.fixture(scope="module")
def crawl_and_refresh(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("refresh_run") / "lake")
    job.run(
        spark, out,
        frontier_size=6000, generations=2,
        listing_batch=600, adstxt_batch=600,
    )
    cat = Catalog(out)
    counts = refresh.refresh_all(spark, cat)
    return cat, counts


def _files(cat, name):
    return cat.table(name).snapshot()["files"]


def test_chain_materializes_in_order(spark, crawl_and_refresh):
    cat, counts = crawl_and_refresh
    non_empty = [
        "mv_latest_crawl_state", "mv_weekly_host_metrics",
        "mv_densified_metrics", "mv_zscored_metrics", "mv_host_changes",
        "mv_app_metrics_history", "mv_app_metrics_interpolated",
        "mv_app_global_metrics_latest", "mv_store_apps_overview",
        "mv_app_keywords_extracted", "mv_keyword_scores",
        "mv_z_scores_top_apps", "mv_app_country_metrics",
        "mv_store_app_ranks_latest", "mv_apps_new_weekly",
        "mv_store_app_ranks_weekly", "mv_store_app_ranks_best_monthly",
        "mv_search_postings",
    ]
    for name in non_empty:
        assert counts.get(name, 0) > 0, f"{name} empty: {counts}"
    # latest = exactly one row per app seen in history
    hist = cat.table("mv_app_metrics_history").read(spark)
    n_apps = hist.select("store_app").distinct().count()
    assert counts["mv_app_global_metrics_latest"] == n_apps
    # interpolation covers at least the observed weeks per app
    assert counts["mv_app_metrics_interpolated"] >= counts[
        "mv_app_metrics_history"
    ]
    # the apps dim keys the frontend views
    apps = cat.table("mv_store_apps_overview").read(spark)
    top = cat.table("mv_z_scores_top_apps").read(spark)
    missing = top.join(apps, "store_app", "left_anti").count()
    assert missing == 0


def test_keyword_scores_terminal_oracle(spark, crawl_and_refresh):
    """DuckDB recomputes keyword_scores FROM THE ENGINE'S OWN
    materialized ake/apps/latest tables — this checks the composition
    wiring, not just the per-operator math the battery already covers."""
    cat, _ = crawl_and_refresh
    con = duckdb.connect()
    for name, view in [
        ("mv_app_keywords_extracted", "ake"),
        ("mv_store_apps_overview", "apps"),
        ("mv_app_global_metrics_latest", "agml"),
    ]:
        # snapshot filesets are directories of part files
        globs = [f"{f}/*.parquet" for f in _files(cat, name)]
        con.sql(
            f"CREATE VIEW {view} AS SELECT * FROM read_parquet({globs!r})"
        )
    oracle = con.sql(
        f"""
        WITH kbase AS (
            SELECT ak.store_app, ak.keyword_text, ap.store, ap.name,
                   g.total_installs, g.weekly_installs, g.rating,
                   g.installs_z_score_4w
            FROM ake ak
            LEFT JOIN apps ap ON ap.store_app = ak.store_app
            LEFT JOIN agml g ON g.store_app = ak.store_app
        ),
        {appm.KEYWORD_SCORES_SQL_TAIL}
        """
    ).df()
    got = cat.table("mv_keyword_scores").read(spark).toPandas()
    assert len(got) == len(oracle) > 0
    cols = sorted(got.columns)
    assert cols == sorted(oracle.columns)
    g = sorted(map(tuple, got[cols].astype(str).values.tolist()))
    o = sorted(map(tuple, oracle[cols].astype(str).values.tolist()))
    assert g == o


def test_rank_rollups_over_engine_rankings(spark, crawl_and_refresh):
    """The retention-compacted weekly table is a subset of rankings,
    and best_monthly is exactly the per-scenario min rank over it."""
    cat, counts = crawl_and_refresh
    rankings = cat.table("rankings").read(spark)
    weekly = cat.table("mv_store_app_ranks_weekly").read(spark)
    best = cat.table("mv_store_app_ranks_best_monthly").read(spark)
    assert weekly.count() <= rankings.count()
    scenario = ["store", "store_id", "country", "collection", "category"]
    expect = weekly.groupBy(*scenario).agg(
        F.min("rank").cast("long").alias("best_rank")
    )
    assert best.exceptAll(expect).count() == 0
    assert expect.exceptAll(best).count() == 0


def test_apps_new_weekly_over_engine_apps(spark, crawl_and_refresh):
    """Leaderboard rows key into the apps dim, respect the top-100
    truncation, and only rank apps that ever fetched ok."""
    cat, counts = crawl_and_refresh
    newapps = cat.table("mv_apps_new_weekly").read(spark)
    apps = cat.table("mv_store_apps_overview").read(spark)
    assert newapps.join(apps, "store_app", "left_anti").count() == 0
    assert newapps.agg(F.max("rn")).first()[0] <= 100
    assert newapps.filter(F.col("crawl_result") != 1).count() == 0


def test_refresh_idempotent(spark, crawl_and_refresh):
    cat, counts = crawl_and_refresh
    again = refresh.refresh_all(spark, cat)
    assert again == counts


def test_search_postings_index_consistency(spark, crawl_and_refresh):
    """The committed postings invert the SAME corpus the apps dim is
    built from: one row per (lexeme, app), nentry sums back to each
    app's doc_len, and a ranked search over the index returns apps
    that exist in the dim."""
    cat, counts = crawl_and_refresh
    postings = cat.table("mv_search_postings").read(spark)
    apps = cat.table("mv_store_apps_overview").read(spark)
    assert counts["mv_search_postings"] == postings.count()
    # (lexeme, app) is the index key
    assert postings.groupBy("lexeme", "store_app").count().filter(
        "count > 1"
    ).count() == 0
    # per-app occurrence mass equals the denormalized doc_len
    mass = postings.groupBy("store_app", "doc_len").agg(
        F.sum("nentry").alias("m")
    )
    assert mass.filter("m <> doc_len").count() == 0
    # every indexed app keys into the dim
    assert postings.select("store_app").distinct().join(
        apps, "store_app", "left_anti"
    ).count() == 0


def test_adstxt_staleness_over_engine_log(spark, crawl_and_refresh):
    """Entries from a domain whose LATEST crawl is >1h after the
    entry's own fetch are stale and excluded (the generations are 1
    virtual hour apart, so re-crawled domains age out)."""
    cat, counts = crawl_and_refresh
    fresh = cat.table("mv_adstxt_domain_entries").read(spark)
    entries = cat.table("adstxt_entries").read(spark)
    assert counts["mv_adstxt_domain_entries"] <= entries.count()
    # freshness invariant: every kept entry's pub domain latest crawl
    # is within 1h of the entry's fetch
    log = cat.table("crawl_log").read(spark).filter(
        F.col("doc_kind") == "adstxt"
    )
    latest = log.groupBy(F.col("host").alias("pub_domain_id")).agg(
        F.max("fetched_at").alias("crawled_at")
    )
    ent_times = (
        entries.withColumn("url_canon", F.expr("substring(doc_id, 9)"))
        .join(log.select("url_canon", "fetched_at"), "url_canon")
        .select(
            F.substring_index("url_canon", "/", 1).alias("pub_domain_id"),
            F.concat_ws("|", "doc_id", "ad_domain", "publisher_id").alias(
                "app_ad_entry_id"
            ),
            "fetched_at",
        )
    )
    joined = fresh.join(ent_times, ["pub_domain_id", "app_ad_entry_id"]).join(
        latest, "pub_domain_id"
    )
    bad = joined.filter(
        (F.col("crawled_at").cast("double") - F.col("fetched_at").cast("double"))
        >= 3600.0
    ).count()
    assert bad == 0
