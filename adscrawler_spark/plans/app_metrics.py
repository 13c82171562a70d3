"""App-metrics matview ports — the reference's user-facing derived
layer re-expressed as DataFrame pipelines.

Sources (cited per function):
* ``global_metrics_latest`` —
  /root/reference/pg-ddl/schema/public/app_global_metrics_latest__matview.sql:30-115
* ``z_scores_top_apps`` —
  /root/reference/pg-ddl/schema/frontend/z_scores_top_apps__matview.sql:30-95
* ``keyword_scores`` —
  /root/reference/pg-ddl/schema/frontend/keyword_scores__matview.sql:30-137
* ``adstxt_fresh_entries`` —
  /root/reference/pg-ddl/schema/frontend/adstxt_domain_entries__matview.sql:29-38

Scale shape: every window partitions by store_app (millions of small
groups — a plain hash distribution); the per-(store,category) top-100
is a window over thousands of groups, never a global sort; keyword
aggregates shuffle on (store, keyword) and join the per-store totals
broadcast (the totals table is O(stores) = tiny by construction).

Cross-engine determinism: every rounded output uses the portable
``floor(x·10^k + 0.5)/10^k`` formulation (identical in Spark and
DuckDB, unlike round()'s half-even/half-away split), and natural-log /
log10 usage follows the reference exactly (competitiveness uses ln,
opportunity uses log10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _r(col: F.Column, k: int) -> F.Column:
    """Portable round-half-up-at-+inf: floor(x·10^k + 0.5)/10^k."""
    m = float(10**k)
    return F.floor(col * m + F.lit(0.5)) / m


# DuckDB oracle twin of ``keyword_scores`` below, shared by the battery
# entry (over synthetic tables) and the refresh-DAG test (over the
# engine's own materialized tables).  Expects a preceding
# ``WITH ..., kbase AS (SELECT store_app, keyword_text, store, name,
# total_installs, weekly_installs, rating, installs_z_score_4w ...)``.
KEYWORD_SCORES_SQL_TAIL = """
    kac AS (
        SELECT store, keyword_text,
               cast(count(DISTINCT store_app) AS BIGINT) AS app_count,
               floor(avg(nullif(total_installs, 0)) + 0.5)
                   AS avg_installs_r,
               floor(avg(nullif(weekly_installs, 0)) + 0.5)
                   AS avg_weekly_installs,
               max(nullif(total_installs, 0)) AS max_installs,
               quantile_cont(cast(nullif(total_installs, 0) AS DOUBLE), 0.5)
                   AS median_installs,
               avg(rating) AS avg_rating,
               avg(installs_z_score_4w) AS avg_z4,
               cast(sum(CASE WHEN nullif(total_installs, 0) > 1000000
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS apps_over_1m_installs,
               cast(sum(CASE WHEN contains(lower(name), keyword_text)
                             THEN 1 ELSE 0 END) AS BIGINT) AS title_matches
        FROM kbase GROUP BY 1, 2
    ),
    tac AS (
        SELECT store, cast(count(DISTINCT store_app) AS BIGINT)
                   AS total_apps
        FROM kbase GROUP BY 1
    ),
    km AS (
        SELECT k.store, k.keyword_text, k.app_count,
               k.avg_installs_r AS avg_installs,
               k.avg_weekly_installs,
               t.total_apps,
               floor(100.0 * k.app_count / nullif(t.total_apps, 0) * 100
                     + 0.5) / 100 AS market_penetration_pct,
               floor(100.0 * (1.0
                     - ln(t.total_apps / cast(k.app_count + 1 AS DOUBLE))
                       / ln(cast(t.total_apps AS DOUBLE))) * 100 + 0.5)
                   / 100 AS competitiveness_score,
               cast(len(string_split(k.keyword_text, ' ')) AS INT)
                   AS word_count,
               CASE WHEN len(string_split(k.keyword_text, ' ')) = 1
                        THEN 'short_tail'
                    WHEN len(string_split(k.keyword_text, ' ')) = 2
                        THEN 'medium_tail'
                    ELSE 'long_tail' END AS keyword_type,
               cast(length(k.keyword_text) AS INT) AS char_length,
               cast(floor(coalesce(k.avg_installs_r, 0.0) + 0.5) AS BIGINT)
                   AS avg_competitor_installs,
               cast(coalesce(k.max_installs, 0) AS BIGINT)
                   AS top_competitor_installs,
               cast(floor(coalesce(k.median_installs, 0.0) + 0.5) AS BIGINT)
                   AS median_competitor_installs,
               floor(coalesce(k.avg_rating, 0.0) * 10000 + 0.5) / 10000
                   AS avg_competitor_rating,
               floor(coalesce(k.avg_z4, 0.0) * 10000 + 0.5) / 10000
                   AS avg_competitor_z_score,
               coalesce(k.apps_over_1m_installs, 0) AS major_competitors,
               coalesce(k.title_matches, 0) AS title_matches,
               floor(100.0 * coalesce(k.title_matches, 0)
                     / nullif(k.app_count, 0) * 100 + 0.5) / 100
                   AS title_relevance_pct
        FROM kac k JOIN tac t ON t.store = k.store
    )
    SELECT km.*,
           floor(least(100.0, app_count * 10.0
                 * (100.0 - competitiveness_score) / 100.0) * 100 + 0.5)
               / 100 AS volume_competition_score,
           floor(least(100.0, competitiveness_score * 0.6
                 + least(100.0, avg_competitor_installs / 100000.0) * 0.4)
                 * 100 + 0.5) / 100 AS keyword_difficulty,
           floor((CASE
               WHEN app_count < 10 THEN 0.0
               WHEN major_competitors > app_count * 0.25 THEN 20.0
               ELSE least(40.0, log10(app_count + 1.0) * 10.0)
                    + (100.0 - competitiveness_score) * 0.4
                    + CASE WHEN median_competitor_installs < 100000 THEN 20
                           WHEN median_competitor_installs < 1000000 THEN 15
                           WHEN median_competitor_installs < 10000000 THEN 10
                           ELSE 5 END
               END) + 0.5) AS opportunity_score,
           floor((CASE WHEN app_count > 0
               THEN app_count * 1000.0
                    * (1.0 / (1.0 + competitiveness_score / 50.0))
                    * CASE WHEN word_count = 1 THEN 2.0
                           WHEN word_count = 2 THEN 1.0
                           ELSE 0.5 END
               ELSE 0.0 END) + 0.5) AS estimated_monthly_searches,
           floor((100.0 - least(100.0, major_competitors * 10.0
                 + median_competitor_installs / 100000.0
                 + competitiveness_score * 0.3)) * 100 + 0.5) / 100
               AS ranking_feasibility
    FROM km
"""


def global_metrics_latest(hist: DataFrame) -> DataFrame:
    """The app_global_metrics_latest matview: one latest-week row per
    store_app with 2w/4w trailing aggregates, a fixed baseline band
    (global_max_week − 112d … − 28d) and z-scores against it
    (app_global_metrics_latest__matview.sql:30-115).

    ``hist`` columns: store_app, week_start (date), weekly_installs,
    weekly_ratings, total_installs, total_ratings, rating.

    The matview's CURRENT_DATE anchor becomes max(week_start) — an agg
    + broadcast scalar, so the plan stays one hash distribution on
    store_app (the reference's ``date_trunc('week', CURRENT_DATE-2d)``
    is non-deterministic for an engine test)."""
    anchor = hist.agg(F.max("week_start").alias("global_max_week"))
    h = hist.crossJoin(F.broadcast(anchor))
    w_ord = Window.partitionBy("store_app").orderBy(F.desc("week_start"))
    w_app = Window.partitionBy("store_app")
    w_4w = w_ord.rowsBetween(0, 3)
    w_2w = w_ord.rowsBetween(0, 1)
    pos_installs = F.when(
        F.col("weekly_installs") > 0, F.col("weekly_installs")
    )
    in_baseline = F.col("week_start").between(
        F.date_sub("global_max_week", 112), F.date_sub("global_max_week", 28)
    )
    base_installs = F.when(in_baseline, F.col("weekly_installs"))
    wm = (
        h.withColumn("rn", F.row_number().over(w_ord))
        .withColumn(
            "monthly_installs",
            F.coalesce(F.sum(pos_installs).over(w_4w), F.lit(0)),
        )
        .withColumn("installs_avg_2w", F.avg(pos_installs).over(w_2w))
        .withColumn("installs_avg_4w", F.avg(pos_installs).over(w_4w))
        .withColumn("b_avg", F.avg(base_installs).over(w_app))
        .withColumn("b_std", F.stddev_samp(base_installs).over(w_app))
    )
    z2 = (F.col("installs_avg_2w") - F.col("b_avg")) / F.nullif(
        F.col("b_std"), F.lit(0.0)
    )
    z4 = (F.col("installs_avg_4w") - F.col("b_avg")) / F.nullif(
        F.col("b_std"), F.lit(0.0)
    )
    accel = (
        F.col("installs_avg_2w") - F.col("installs_avg_4w")
    ) / F.nullif(F.col("installs_avg_4w"), F.lit(0.0))
    return wm.filter("rn = 1").select(
        "store_app",
        "week_start",
        "weekly_installs",
        "weekly_ratings",
        "total_installs",
        "total_ratings",
        "rating",
        "monthly_installs",
        _r(F.col("installs_avg_2w"), 4).alias("installs_avg_2w"),
        _r(F.col("installs_avg_4w"), 4).alias("installs_avg_4w"),
        _r(z2, 4).alias("installs_z_score_2w"),
        _r(z4, 4).alias("installs_z_score_4w"),
        _r(accel, 4).alias("installs_acceleration"),
        (F.col("b_std").isNotNull() & (F.col("b_avg") > 0)).alias(
            "has_reliable_baseline"
        ),
    )


def z_scores_top_apps(
    latest: DataFrame,
    apps: DataFrame,
    top_n: int = 100,
    min_installs: int = 50_000,
    min_weekly: int = 1_000,
) -> DataFrame:
    """Top-N apps per (store, category, metric-kind) by 2-week installs
    z-score (z_scores_top_apps__matview.sql:62-94): metric-kind is
    'rating' for store 2 (iOS has no install counts) else 'installs';
    thresholds filter to apps with a real installed base.

    A deterministic (z DESC NULLS LAST, store_app) order replaces the
    reference's non-total z-only order so ranks are engine-independent.
    The window partitions by (store, category, kind) — thousands of
    groups, never a global sort."""
    j = latest.join(apps, "store_app")
    kind = F.when(F.col("store") == 2, F.lit("rating")).otherwise(
        F.lit("installs")
    )
    w = Window.partitionBy("store", "category", kind).orderBy(
        F.desc_nulls_last("installs_z_score_2w"), F.asc("store_app")
    )
    return (
        j.filter(
            (F.col("store").isin(1, 2))
            & (F.col("total_installs") > min_installs)
            & (F.col("weekly_installs") > min_weekly)
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .select(
            "store",
            "store_app",
            F.col("name").alias("app_name"),
            F.col("category").alias("app_category"),
            F.col("total_installs").alias("installs"),
            F.col("weekly_installs").alias("installs_sum_1w"),
            "monthly_installs",
            "installs_avg_2w",
            "installs_avg_4w",
            "installs_acceleration",
            "has_reliable_baseline",
            "installs_z_score_2w",
            "installs_z_score_4w",
        )
    )


def keyword_scores(
    ake: DataFrame, apps: DataFrame, latest: DataFrame
) -> DataFrame:
    """The keyword_scores matview (keyword_scores__matview.sql:30-137):
    per (store, keyword) market stats, competitor install distribution
    (avg / max / interpolated median / FILTER counts / ILIKE title
    matches) and the derived opportunity metrics.

    ``ake``: (store_app, keyword_text) — the app_keywords_extracted
    analog.  ``apps``: (store_app, store, name).  ``latest``:
    global_metrics_latest output.

    Joins: ake⋈apps⋈latest all key on store_app (one hash
    distribution); keyword aggregates shuffle on (store, keyword); the
    per-store totals join is a broadcast of an O(stores) table."""
    base = (
        ake.join(apps.select("store_app", "store", "name"), "store_app", "left")
        .join(
            latest.select(
                "store_app",
                "total_installs",
                "weekly_installs",
                "rating",
                "installs_z_score_4w",
            ),
            "store_app",
            "left",
        )
    )
    nz_installs = F.nullif(F.col("total_installs"), F.lit(0))
    kac = base.groupBy("store", "keyword_text").agg(
        F.countDistinct("store_app").alias("app_count"),
        _r(F.avg(nz_installs), 0).alias("avg_installs_r"),
        _r(F.avg(F.nullif(F.col("weekly_installs"), F.lit(0))), 0).alias(
            "avg_weekly_installs"
        ),
        F.max(nz_installs).alias("max_installs"),
        F.expr(
            "percentile(nullif(total_installs, 0), 0.5)"
        ).alias("median_installs"),
        F.avg("rating").alias("avg_rating"),
        F.avg("installs_z_score_4w").alias("avg_z4"),
        F.sum((nz_installs > 1_000_000).cast("long")).alias(
            "apps_over_1m_installs"
        ),
        F.sum(
            F.contains(F.lower("name"), F.col("keyword_text")).cast("long")
        ).alias("title_matches"),
    ).withColumn("word_count", F.size(F.split("keyword_text", " ")))
    tac = base.groupBy("store").agg(
        F.countDistinct("store_app").alias("total_apps")
    )
    km = kac.join(F.broadcast(tac), "store").select(
        "store",
        "keyword_text",
        "app_count",
        F.col("avg_installs_r").alias("avg_installs"),
        "avg_weekly_installs",
        "total_apps",
        _r(
            100.0 * F.col("app_count") / F.nullif(F.col("total_apps"), F.lit(0)),
            2,
        ).alias("market_penetration_pct"),
        _r(
            100.0
            * (
                1.0
                - F.log(
                    F.col("total_apps")
                    / (F.col("app_count") + 1).cast("double")
                )
                / F.log(F.col("total_apps").cast("double"))
            ),
            2,
        ).alias("competitiveness_score"),
        "word_count",
        F.when(F.col("word_count") == 1, "short_tail")
        .when(F.col("word_count") == 2, "medium_tail")
        .otherwise("long_tail")
        .alias("keyword_type"),
        F.length("keyword_text").alias("char_length"),
        # integer casts go through floor(x+0.5): a bare double→bigint
        # cast truncates in Spark but ROUNDS in DuckDB/PG — a .5-exact
        # interpolated median would differ by 1 between engines
        F.floor(F.coalesce(F.col("avg_installs_r"), F.lit(0.0)) + 0.5)
        .cast("bigint")
        .alias("avg_competitor_installs"),
        F.coalesce("max_installs", F.lit(0)).alias("top_competitor_installs"),
        F.floor(F.coalesce("median_installs", F.lit(0.0)) + 0.5)
        .cast("bigint")
        .alias("median_competitor_installs"),
        _r(F.coalesce("avg_rating", F.lit(0.0)), 4).alias(
            "avg_competitor_rating"
        ),
        _r(F.coalesce("avg_z4", F.lit(0.0)), 4).alias(
            "avg_competitor_z_score"
        ),
        F.coalesce("apps_over_1m_installs", F.lit(0)).alias(
            "major_competitors"
        ),
        F.coalesce("title_matches", F.lit(0)).alias("title_matches"),
        _r(
            100.0
            * F.coalesce("title_matches", F.lit(0))
            / F.nullif(F.col("app_count"), F.lit(0)),
            2,
        ).alias("title_relevance_pct"),
    )
    cs = F.col("competitiveness_score")
    med = F.coalesce(F.col("median_competitor_installs"), F.lit(0))
    return km.select(
        "*",
        _r(
            F.least(
                F.lit(100.0), F.col("app_count") * 10.0 * (100.0 - cs) / 100.0
            ),
            2,
        ).alias("volume_competition_score"),
        _r(
            F.least(
                F.lit(100.0),
                cs * 0.6
                + F.least(
                    F.lit(100.0),
                    F.col("avg_competitor_installs") / 100_000.0,
                )
                * 0.4,
            ),
            2,
        ).alias("keyword_difficulty"),
        _r(
            F.when(F.col("app_count") < 10, F.lit(0.0))
            .when(
                F.col("major_competitors") > F.col("app_count") * 0.25,
                F.lit(20.0),
            )
            .otherwise(
                F.least(
                    F.lit(40.0), F.log10(F.col("app_count") + 1.0) * 10.0
                )
                + (100.0 - cs) * 0.4
                + F.when(med < 100_000, 20)
                .when(med < 1_000_000, 15)
                .when(med < 10_000_000, 10)
                .otherwise(5)
            ),
            0,
        ).alias("opportunity_score"),
        _r(
            F.when(
                F.col("app_count") > 0,
                F.col("app_count")
                * 1000.0
                * (1.0 / (1.0 + cs / 50.0))
                * F.when(F.col("word_count") == 1, 2.0)
                .when(F.col("word_count") == 2, 1.0)
                .otherwise(0.5),
            ).otherwise(F.lit(0.0)),
            0,
        ).alias("estimated_monthly_searches"),
        _r(
            100.0
            - F.least(
                F.lit(100.0),
                F.col("major_competitors") * 10.0
                + med / 100_000.0
                + cs * 0.3,
            ),
            2,
        ).alias("ranking_feasibility"),
    )


def adstxt_fresh_entries(
    entries: DataFrame, crawl_results: DataFrame, max_age_hours: int = 1
) -> DataFrame:
    """The adstxt_domain_entries staleness view
    (adstxt_domain_entries__matview.sql:29-38): keep only entries whose
    publisher domain was (re)crawled within ``max_age_hours`` of the
    entry's update — interval arithmetic between two event times.

    ``entries``: (pub_domain_id, ad_domain_id, app_ad_entry_id,
    updated_at).  ``crawl_results``: (domain_id, crawled_at)."""
    j = entries.join(
        crawl_results.select(
            F.col("domain_id").alias("pub_domain_id"), "crawled_at"
        ),
        "pub_domain_id",
        "left",
    )
    # genuine interval arithmetic (T1 family): timestamp difference
    # compared against a day-time interval, NULL-crawled rows fall out
    # of the < predicate exactly like the reference's WHERE
    age = F.col("crawled_at") - F.col("updated_at")
    return (
        j.filter(age < F.expr(f"INTERVAL {int(max_age_hours)} HOUR"))
        .select("ad_domain_id", "app_ad_entry_id", "pub_domain_id")
        .distinct()
    )


def retention_benchmarks(
    app_categories: DataFrame, global_benchmarks: DataFrame
) -> DataFrame:
    """Per-(store, category) retention benchmarks with the games/apps
    global fallback — port of dbcon/queries.py:1611-1658
    get_retention_benchmarks: each of d1/d7/d30 coalesces the
    category-specific benchmark with the global 'games' default when
    the category starts with 'game', else the global 'apps' default.
    The reference's fallback is a bare correlated ``LIMIT 1`` scalar
    subquery; the port aggregates the fallback rows with ``min`` (a
    determinism pin — identical when the global rows are unique, as
    the reference schema keeps them).

    ``app_categories``: (store, category); ``global_benchmarks``:
    (store, app_category, d1, d7, d30)."""
    fallback = F.broadcast(
        global_benchmarks.filter(
            F.col("app_category").isin("games", "apps")
        )
        .groupBy("app_category")
        .agg(
            F.min("d1").alias("g_d1"),
            F.min("d7").alias("g_d7"),
            F.min("d30").alias("g_d30"),
        )
        .withColumnRenamed("app_category", "fallback_key")
    )
    specific = global_benchmarks.select(
        F.col("store"), F.col("app_category").alias("category"),
        F.col("d1").alias("s_d1"), F.col("d7").alias("s_d7"),
        F.col("d30").alias("s_d30"),
    )
    key = F.when(
        F.col("category").startswith("game"), F.lit("games")
    ).otherwise(F.lit("apps"))
    return (
        app_categories.join(
            F.broadcast(specific), ["store", "category"], "left"
        )
        .withColumn("fallback_key", key)
        .join(fallback, "fallback_key", "left")
        .select(
            "store",
            F.col("category").alias("app_category"),
            F.coalesce(F.col("s_d1"), F.col("g_d1")).alias("d1"),
            F.coalesce(F.col("s_d7"), F.col("g_d7")).alias("d7"),
            F.coalesce(F.col("s_d30"), F.col("g_d30")).alias("d30"),
        )
    )


def ecpm_benchmarks(
    ecpm: DataFrame, tiers: DataFrame, ad_formats: DataFrame
) -> DataFrame:
    """eCPM benchmark flattening — port of dbcon/queries.py:1659-1670
    get_ecpm_benchmarks: (store, tier slug, ad-format name, ecpm) via
    two broadcast dim hops."""
    return (
        ecpm.join(
            F.broadcast(tiers.select(
                F.col("id").alias("tier_id"), "tier_slug"
            )),
            "tier_id", "left",
        )
        .join(
            F.broadcast(ad_formats.select(
                F.col("id").alias("ad_format_id"),
                F.col("name").alias("ad_format"),
            )),
            "ad_format_id", "left",
        )
        .select("store", "tier_slug", "ad_format", "ecpm")
    )
