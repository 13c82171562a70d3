"""Deterministic synthetic frontier generator (FIXTURES.md F2).

Pure function of (seed, row-id) built from JVM expressions only
(``spark.range`` + ``xxhash64`` arithmetic), so it generates 10^6–10^10
rows without touching the driver.  Host distribution is Zipf-skewed
with explicit hotspots: ~33% of URLs on two store hosts
(google-play-store.com / apple-app-store.com) to exercise the salted
repartitioning the north_rule demands; the long tail is log-uniform
over N developer domains.  ~8% of rows duplicate an earlier row's URL
to exercise the seen-set dedup path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOT_PLAY = "google-play-store.com"
HOT_IOS = "apple-app-store.com"
TAIL_DOMAINS = 2000
BASE_TS = "2026-08-01 00:00:00"
# storefront countries each app fans out across (the reference's
# countries_to_crawl dimension, query_apps_to_update_primary.sql:97-99)
COUNTRIES = ["us", "gb", "de", "jp", "br"]
# ranked-list dimensions (the reference crawls one ranked list per
# (store, country, collection, category) daily — app_rankings.py:60-162)
RANK_COLLECTIONS = ["topselling_free", "topgrossing"]
RANK_CATEGORIES = ["TOOLS", "GAME_PUZZLE", "SOCIAL", "FINANCE"]


def _h(seed: int, salt: int) -> F.Column:
    return F.xxhash64(F.lit(seed), F.col("id"), F.lit(salt))


def synth_frontier(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    df = spark.range(n)
    # ~8% duplicates: those rows take an earlier row's identity
    dup = F.pmod(_h(seed, 0), F.lit(12)) == 0
    eff = F.when(
        dup, F.greatest(F.lit(0), F.col("id") - 1 - F.pmod(_h(seed, 1), F.lit(500)))
    ).otherwise(F.col("id"))

    he = F.xxhash64(F.lit(seed), eff, F.lit(2))
    r = F.pmod(he, F.lit(1000))
    # log-uniform tail index 0..TAIL_DOMAINS-1 (Zipf-ish mass on low idx)
    u = F.pmod(F.xxhash64(F.lit(seed), eff, F.lit(3)), F.lit(1_000_000)) / 1_000_000.0
    tail_idx = F.pow(F.lit(float(TAIL_DOMAINS)), u).cast("long") - 1
    sub_r = F.pmod(F.xxhash64(F.lit(seed), eff, F.lit(4)), F.lit(10))
    sub = (
        F.when(sub_r == 0, "www.")
        .when(sub_r == 1, "m.")
        .when(sub_r == 2, "dev.")
        .when(sub_r == 3, "shop.")
        .otherwise("")
    )
    tail_host = F.concat(F.lit("pub"), tail_idx.cast("string"), F.lit("-dev.com"))

    host = (
        F.when(r < 180, HOT_PLAY).when(r < 330, HOT_IOS).otherwise(tail_host)
    )
    doc_kind = (
        F.when(r < 180, "listing_play")
        .when(r < 330, "listing_ios")
        .otherwise("adstxt")
    )
    # apps × countries fan-out (J4, query_apps_to_update_primary.sql:97-99):
    # ~3 frontier rows per app id, each with its own storefront country
    # baked into the URL (&gl=.. / /cc/app/..), so per-country listings
    # are distinct canonical URLs exactly as in the reference stores.
    app = F.floor(eff / 3).cast("long")
    cidx = F.pmod(F.xxhash64(F.lit(seed), eff, F.lit(12)), F.lit(len(COUNTRIES)))
    cc = F.get(F.array(*[F.lit(c) for c in COUNTRIES]), cidx.cast("int"))
    url = (
        F.when(
            r < 180,
            F.concat(
                F.lit("https://" + HOT_PLAY + "/store/apps/details?id=com.app"),
                app.cast("string"),
                F.lit("&gl="),
                cc,
            ),
        )
        .when(
            r < 330,
            F.concat(
                F.lit("https://" + HOT_IOS + "/"), cc, F.lit("/app/id"),
                app.cast("string"),
            ),
        )
        .otherwise(
            F.concat(F.lit("https://"), sub, tail_host, F.lit("/app-ads.txt"))
        )
    )
    country = F.when(r < 330, F.upper(cc)).otherwise(
        F.lit(None).cast("string")
    )

    installs = F.pow(
        F.lit(10.0),
        (F.pmod(F.xxhash64(F.lit(seed), eff, F.lit(5)), F.lit(700)) / 100.0),
    ).cast("long")
    ratings = (installs / (1 + F.pmod(F.xxhash64(F.lit(seed), eff, F.lit(6)), F.lit(50)))).cast("long")
    crawled_never = F.pmod(F.xxhash64(F.lit(seed), eff, F.lit(7)), F.lit(10)) < 4
    last_crawled = F.when(
        crawled_never, F.lit(None).cast("timestamp")
    ).otherwise(
        F.to_timestamp(F.lit(BASE_TS))
        - F.make_dt_interval(
            F.pmod(F.xxhash64(F.lit(seed), eff, F.lit(8)), F.lit(30)).cast("int")
        )
    )

    return df.select(
        url.alias("url"),
        host.alias("host"),
        doc_kind.alias("doc_kind"),
        F.when(crawled_never, F.lit(None).cast("int"))
        .otherwise(F.lit(1))
        .alias("crawl_result"),
        (F.pmod(F.xxhash64(F.lit(seed), eff, F.lit(9)), F.lit(10)) == 0).alias(
            "ranked"
        ),
        (F.pmod(F.xxhash64(F.lit(seed), eff, F.lit(10)), F.lit(3)) == 0).alias(
            "ad_supported"
        ),
        installs.alias("installs"),
        ratings.alias("rating_count"),
        country.alias("country"),
        last_crawled.alias("last_crawled_at"),
        F.lit("pending").alias("state"),
        F.lit(None).cast("timestamp").alias("leased_until"),
        F.concat(F.lit("seed"), F.pmod(he, F.lit(20)).cast("string")).alias(
            "seed_id"
        ),
    )


def synth_rankings_frontier(spark: SparkSession) -> DataFrame:
    """One frontier row per (store, country, collection, category)
    ranked list — the reference's rankings crawl universe
    (/root/reference/adscrawler/app_stores/app_rankings.py:60-162:
    ingests one ranked list per scenario per day).  Deterministic and
    tiny (stores × countries × collections × categories); rows share
    the hot store hosts, so the rankings fetch exercises the salted
    lanes like listings do."""
    n_c, n_col, n_cat = len(COUNTRIES), len(RANK_COLLECTIONS), len(RANK_CATEGORIES)
    n = 2 * n_c * n_col * n_cat
    df = spark.range(n)
    store_idx = F.pmod(F.col("id"), F.lit(2))
    cc = F.get(
        F.array(*[F.lit(c) for c in COUNTRIES]),
        F.pmod(F.floor(F.col("id") / 2), F.lit(n_c)).cast("int"),
    )
    coll = F.get(
        F.array(*[F.lit(c) for c in RANK_COLLECTIONS]),
        F.pmod(F.floor(F.col("id") / (2 * n_c)), F.lit(n_col)).cast("int"),
    )
    cat = F.get(
        F.array(*[F.lit(c) for c in RANK_CATEGORIES]),
        F.pmod(F.floor(F.col("id") / (2 * n_c * n_col)), F.lit(n_cat)).cast("int"),
    )
    host = F.when(store_idx == 0, HOT_PLAY).otherwise(HOT_IOS)
    url = F.when(
        store_idx == 0,
        F.concat(
            F.lit("https://" + HOT_PLAY + "/rankings/"), coll, F.lit("/"),
            cat, F.lit("?gl="), cc,
        ),
    ).otherwise(
        F.concat(
            F.lit("https://" + HOT_IOS + "/"), cc, F.lit("/rankings/"),
            coll, F.lit("/"), cat,
        )
    )
    return df.select(
        url.alias("url"),
        host.alias("host"),
        F.lit("rankings").alias("doc_kind"),
        F.lit(None).cast("int").alias("crawl_result"),
        F.lit(False).alias("ranked"),
        F.lit(False).alias("ad_supported"),
        F.lit(0).cast("long").alias("installs"),
        F.lit(0).cast("long").alias("rating_count"),
        F.upper(cc).alias("country"),
        F.lit(None).cast("timestamp").alias("last_crawled_at"),
        F.lit("pending").alias("state"),
        F.lit(None).cast("timestamp").alias("leased_until"),
        F.lit("rankings").alias("seed_id"),
    )
