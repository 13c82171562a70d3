"""Live app-details persistence — the relational core of the
reference's per-scrape upsert cascade
(app_stores/scrape_stores.py:443-1076): developer and domain
dimension upserts, the store_apps merge that never overwrites good
data with bad-crawl rows, description and country-evidence upserts,
and the crawl-result log.

Spark-first re-expression of the reference's per-(crawl_result,
additional_html_crawl_result) driver loop: the group conditions are
row- or window-level predicates, so the whole cascade is one plan —
bad-crawl rows carry NULLs outside the minimal projection and the
merge layer preserves existing values for exactly those columns,
which is what the reference's column-dropping before
``update_from_df`` achieved.

Scale notes: dimension tables (developers, domains, languages,
countries) are broadcast; the store_apps merge shuffles once on
(store, store_id); surrogate ids for new dimension rows are
deterministic functions of the natural key (injectable, J10), so
concurrent partitions mint identical ids with no sequence
coordination.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from adscrawler_spark.functions.urls import canonical_host, root_domain
from adscrawler_spark.functions.country import resolve_country

# process_live_app_details (scrape_stores.py:877-886): the minimal
# projection saved for failed crawls.
MINIMAL_COLUMNS = ["store_id", "store", "crawled_at", "crawl_result"]

# columns whose values depend on the additional-HTML crawl
# (scrape_stores.py:897-911)
HTML_DEPENDENT_COLUMNS = {
    1: ["additional_html_crawled_at"],
    2: ["additional_html_crawled_at", "ad_supported", "in_app_purchases",
        "url"],
}


def _default_surrogate(*cols: Column) -> Column:
    return F.xxhash64(*cols)


# ---------------------------------------------------------------------
# Developer dimension (scrape_stores.py:539-563, 847-868)
# ---------------------------------------------------------------------

def developer_dim_upsert(
    developers: DataFrame,
    apps: DataFrame,
    surrogate: Callable[..., Column] = _default_surrogate,
) -> DataFrame:
    """check_and_insert_developers: append rows for (store,
    developer_id) pairs seen in the scrape but absent from the
    dimension.  ``developers`` carries (id, store, developer_id,
    name)."""
    missing = (
        apps.filter(F.col("developer_id").isNotNull())
        .select("store", "developer_id",
                F.col("developer_name").alias("name"))
        .dropDuplicates(["store", "developer_id"])
        .join(
            developers.select("store", "developer_id"),
            ["store", "developer_id"],
            "left_anti",
        )
        .withColumn("id", surrogate(F.col("store"), F.col("developer_id")))
    )
    return developers.unionByName(
        missing.select(*developers.columns), allowMissingColumns=True
    )


def resolve_developers(apps: DataFrame, developers: DataFrame) -> DataFrame:
    """save_developer_info's m:1 join: attach the ``developer`` fk."""
    dim = developers.select(
        "store", "developer_id", F.col("id").alias("developer")
    )
    return apps.join(F.broadcast(dim), ["store", "developer_id"], "left")


# ---------------------------------------------------------------------
# Domain dimension + app_urls_map (scrape_stores.py:565-692)
# ---------------------------------------------------------------------

def normalize_app_urls(apps: DataFrame) -> DataFrame:
    """save_app_domains' URL normalization (scrape_stores.py:658-665):
    url → host-with-subdomain, root_url → registrable domain, rows
    without either dropped (IPs / malformed)."""
    return (
        apps.withColumn("url", canonical_host(F.col("url")))
        .withColumn("root_url", root_domain(F.col("url")))
        .filter(F.col("root_url").isNotNull() & F.col("url").isNotNull())
    )


def domain_dim_upsert(
    domains: DataFrame,
    apps: DataFrame,
    surrogate: Callable[..., Column] = _default_surrogate,
) -> DataFrame:
    """check_and_insert_domains: three passes kept in the reference's
    order — insert missing root domains, backfill root_domain_id on
    stale subdomain rows, insert missing subdomains linked to their
    roots.  ``domains`` carries (id, domain_name, root_domain_id);
    the reference's in-memory domain_id_map becomes a self-join."""
    rdi_type = dict(domains.dtypes)["root_domain_id"]
    roots = (
        apps.select(F.col("root_url").alias("domain_name"))
        .filter(F.col("domain_name").isNotNull())
        .dropDuplicates()
        .join(domains.select("domain_name"), "domain_name", "left_anti")
        .select(
            surrogate(F.col("domain_name")).alias("id"),
            "domain_name",
            F.lit(None).cast(rdi_type).alias("root_domain_id"),
        )
    )
    d1 = domains.unionByName(roots, allowMissingColumns=True)
    # backfill: stale subdomain rows get their root's id where the
    # root now exists and differs from the row itself
    lookup = d1.select(
        F.col("domain_name").alias("_root_name"), F.col("id").alias("_root_id")
    )
    stale = (
        d1.filter(F.col("root_domain_id").isNull())
        .withColumn("_root", root_domain(F.col("domain_name")))
    )
    backfilled = (
        stale.filter(
            F.col("_root").isNotNull() & (F.col("_root") != F.col("domain_name"))
        )
        .join(F.broadcast(lookup), F.col("_root") == F.col("_root_name"), "left")
        .withColumn("root_domain_id", F.col("_root_id"))
        .drop("_root", "_root_name", "_root_id")
    )
    untouched = d1.join(
        backfilled.select("domain_name"), "domain_name", "left_anti"
    )
    d2 = untouched.unionByName(backfilled.select(*untouched.columns))
    # missing subdomains, linked to their (now present) roots
    subs = (
        apps.filter(
            F.col("url").isNotNull()
            & F.col("root_url").isNotNull()
            & (F.col("url") != F.col("root_url"))
        )
        .select(F.col("url").alias("domain_name"),
                F.col("root_url").alias("_root"))
        .dropDuplicates(["domain_name"])
        .join(d2.select("domain_name"), "domain_name", "left_anti")
        .join(
            F.broadcast(
                d2.select(F.col("domain_name").alias("_root_name"),
                          F.col("id").alias("_root_id"))
            ),
            F.col("_root") == F.col("_root_name"),
            "left",
        )
        .select(
            surrogate(F.col("domain_name")).alias("id"),
            "domain_name",
            F.col("_root_id").alias("root_domain_id"),
        )
    )
    return d2.unionByName(subs, allowMissingColumns=True)


def app_urls_map_rows(apps: DataFrame, domains: DataFrame) -> DataFrame:
    """save_app_domains' final map (scrape_stores.py:673-691): one
    (store_app, pub_domain) row per app, joined m:1 on the full
    host."""
    dim = domains.select(
        F.col("domain_name").alias("url"), F.col("id").alias("pub_domain")
    )
    return (
        apps.join(F.broadcast(dim), "url", "left")
        .select("store_app", "pub_domain")
        .dropDuplicates(["store_app", "pub_domain"])
    )


# ---------------------------------------------------------------------
# store_apps merge (scrape_stores.py:870-951)
# ---------------------------------------------------------------------

def live_details_updates(
    results: DataFrame,
    store: int,
    clean: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """process_live_app_details' per-group preparation as one plan:

    * store 1 rows get additional_html_crawl_result = 0;
    * crawl_result ≠ 1 rows carry NULL outside MINIMAL_COLUMNS (the
      reference's minimal projection — the merge layer preserves
      existing values for NULLed columns);
    * additional_html_crawl_result ≠ 1 rows NULL the HTML-dependent
      columns for this store;
    * ``clean`` (the store's listing cleaner) applies to good rows
      before masking.
    """
    if store == 1:
        results = results.withColumn(
            "additional_html_crawl_result", F.lit(0)
        )
    good = results.filter(F.col("crawl_result") == 1)
    if clean is not None:
        good = clean(good)
    bad = results.filter(F.col("crawl_result") != 1)
    good_types = dict(good.dtypes)
    bad_cols = set(bad.columns)
    bad_min = bad.select(
        *[
            F.col(c).cast(good_types[c]).alias(c)
            if c in MINIMAL_COLUMNS and c in bad_cols
            else F.lit(None).cast(good_types[c]).alias(c)
            for c in good.columns
        ]
    )
    merged = good.unionByName(bad_min, allowMissingColumns=True)
    html_cols = [
        c for c in HTML_DEPENDENT_COLUMNS.get(store, []) if c in merged.columns
    ]
    for c in html_cols:
        merged = merged.withColumn(
            c,
            F.when(F.col("additional_html_crawl_result") == 1, F.col(c)),
        )
    return merged


def with_group_developer_resolution(
    updates: DataFrame, developers: DataFrame
) -> DataFrame:
    """The reference resolves developer fks only for batches where
    every row is a good crawl with a developer_id
    (scrape_stores.py:913-918 — a batch-shaped artifact kept
    faithfully as a window predicate over the (crawl_result,
    additional_html_crawl_result) group)."""
    w = Window.partitionBy("crawl_result", "additional_html_crawl_result")
    flagged = updates.withColumn(
        "_resolve",
        (F.col("crawl_result") == 1)
        & F.min(F.col("developer_id").isNotNull().cast("int")).over(w).cast(
            "boolean"
        ),
    )
    resolved = resolve_developers(
        flagged, developers
    ).withColumn(
        "developer", F.when(F.col("_resolve"), F.col("developer"))
    )
    return resolved.drop("_resolve")


def merge_store_apps(
    existing: DataFrame, updates: DataFrame
) -> DataFrame:
    """update_from_df on (store, store_id) with preserve-on-NULL:
    every non-key column coalesces new over old, which reproduces the
    reference's drop-columns-before-update discipline for bad-crawl
    and missing-HTML rows."""
    keys = ["store", "store_id"]
    upd = updates.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        *[
            F.col(c).alias(f"_v_{c}")
            for c in updates.columns
            if c not in keys
        ],
    ).dropDuplicates([f"_k_{k}" for k in keys])
    cond = [existing[k] == upd[f"_k_{k}"] for k in keys]
    joined = existing.join(upd, cond, "left")
    return joined.select(
        *[
            F.coalesce(F.col(f"_v_{c}"), existing[c]).alias(c)
            if c not in keys and f"_v_{c}" in joined.columns
            else existing[c]
            for c in existing.columns
        ]
    )


# ---------------------------------------------------------------------
# Descriptions / country evidence / crawl log
# (scrape_stores.py:953-1076)
# ---------------------------------------------------------------------

def descriptions_upsert_rows(
    apps: DataFrame, languages: DataFrame
) -> DataFrame:
    """upsert_store_apps_descriptions: join language_slug →
    language_id, drop unknown codes, default description_short to
    '', dedup on the full key (the reference's on-conflict-nothing
    with md5 key columns)."""
    out = apps.join(
        F.broadcast(
            languages.select(
                F.col("language_slug").alias("store_language_code"),
                F.col("id").alias("language_id"),
            )
        ),
        "store_language_code",
        "left",
    ).filter(F.col("language_id").isNotNull())
    if "description_short" not in out.columns:
        out = out.withColumn("description_short", F.lit(""))
    return out.select(
        "store_app", "language_id", "description", "description_short"
    ).dropDuplicates()


def country_evidence_rows(
    apps: DataFrame,
    countries: DataFrame,
    resolver: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """upsert_app_country_evidence: prefer developer_address over
    developer_legal_address ('', 'nan', 'None' count as missing),
    drop addressless rows, resolve the address to a country id.
    ``resolver`` maps the address column to alpha2 (default: the
    engine's P11 resolver); ``countries`` carries (alpha2, id)."""
    out = apps
    for c in ("developer_address", "developer_legal_address"):
        if c not in out.columns:
            out = out.withColumn(c, F.lit(None).cast("string"))

    def blank_to_null(col):
        t = F.trim(col)
        return F.when(~t.isin("", "nan", "None"), t)

    out = out.withColumn(
        "raw_address",
        F.coalesce(
            blank_to_null(F.col("developer_address")),
            blank_to_null(F.col("developer_legal_address")),
        ),
    ).filter(F.col("raw_address").isNotNull())
    alpha2 = (
        resolver(F.col("raw_address"))
        if resolver is not None
        else resolve_country(F.col("raw_address"))
    )
    return (
        out.withColumn("_alpha2", alpha2)
        .join(
            F.broadcast(
                countries.select(
                    F.col("alpha2").alias("_alpha2"),
                    F.col("id").alias("country_id"),
                )
            ),
            "_alpha2",
            "left",
        )
        .select("store_app", "raw_address", "country_id")
    )


def crawl_log_rows(apps: DataFrame, countries: DataFrame) -> DataFrame:
    """log_crawl_results: alpha2 → country_id and the append-only
    logging projection."""
    return apps.join(
        F.broadcast(
            countries.select(
                F.col("alpha2").alias("country"),
                F.col("id").alias("country_id"),
            )
        ),
        "country",
        "left",
    ).select("crawl_result", "store_app", "country_id", "crawled_at")


# ---------------------------------------------------------------------
# New-app registration (app_stores/utils.py:121-177) and rank resolve
# (scrape_stores.py:468-493)
# ---------------------------------------------------------------------

BAD_IOS_ID_PATTERN = r"^[0-9].*\."


def invalid_store_ids(scraped: DataFrame) -> DataFrame:
    """check_and_insert_new_apps' fail-fast guard: store-2 ids that
    look like bundle ids with a leading digit and a dot
    (utils.py:135-138).  Returns the offending rows — the caller
    raises if any exist, mirroring the reference's ValueError."""
    return scraped.filter(
        (F.col("store") == 2)
        & F.col("store_id").rlike(BAD_IOS_ID_PATTERN)
    ).select("store", "store_id")


def register_new_apps(
    store_apps: DataFrame,
    scraped: DataFrame,
    crawl_source: str,
    store: int,
    surrogate: Callable[..., Column] = _default_surrogate,
    validate: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """check_and_insert_new_apps: stamp the store, reject bad ios
    ids, insert (store, store_id) pairs not yet registered, and log
    each insert's crawl_source.  Returns (updated store_apps,
    store_app_sources log rows).

    The reference collects the scraped ids to the driver and anti-
    joins in Postgres; here both sides stay distributed and the new
    pk is a deterministic surrogate."""
    if store not in (1, 2):
        raise ValueError(f"Invalid store: {store}")
    scraped = scraped.withColumn("store", F.lit(store))
    if validate and invalid_store_ids(scraped).limit(1).count() > 0:
        raise ValueError("Found bad store_ids")
    new_apps = (
        scraped.select("store", "store_id")
        .dropDuplicates()
        .join(
            store_apps.select("store", "store_id"),
            ["store", "store_id"],
            "left_anti",
        )
        .withColumn("id", surrogate(F.col("store"), F.col("store_id")))
    )
    updated = store_apps.unionByName(
        new_apps.select(*store_apps.columns), allowMissingColumns=True
    )
    sources = new_apps.select(
        "store",
        F.col("id").alias("store_app"),
        F.lit(crawl_source).alias("crawl_source"),
    )
    return updated, sources


def resolve_app_ranks(ranked: DataFrame, store_apps: DataFrame) -> DataFrame:
    """save_app_ranks' resolve (scrape_stores.py:468-487): m:1 join
    the store_app pk onto the scraped rank rows and uppercase the
    country — the rankings ingestion (plans/app_metrics /
    process_store_rankings counterpart) consumes the result."""
    dim = store_apps.select("store", "store_id",
                            F.col("id").alias("store_app"))
    return (
        ranked.join(dim, ["store", "store_id"], "left")
        .withColumn("country", F.upper(F.col("country")))
    )


def descriptions_latest(
    descriptions: DataFrame, languages: DataFrame, language_slug: str
) -> DataFrame:
    """query_all_store_app_descriptions (dbcon/queries.py:966-981):
    the newest description per app for one language — DISTINCT ON
    (store_app) ... ORDER BY store_app, updated_at DESC, filtered on
    the language slug.  The reference's tie under equal updated_at is
    planner-order; ``desc_id`` (the row's unique key) pins it.  Emits
    store_app alongside description (the reference projects the text
    alone; the key makes the result a usable relation and the
    comparison total)."""
    lang = F.broadcast(
        languages.filter(F.col("language_slug") == language_slug).select(
            F.col("id").alias("language_id")
        )
    )
    w = Window.partitionBy("store_app").orderBy(
        F.col("updated_at").desc(), F.col("desc_id").desc()
    )
    return (
        descriptions.join(lang, "language_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("store_app", "description")
    )
