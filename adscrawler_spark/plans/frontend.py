"""Frontend matview ports — the reference's user-facing derived views
re-expressed as distributed DataFrame plans.

Each function is the Spark twin of one materialized view under
/root/reference/pg-ddl/schema/frontend/ (file:line cited per function)
and is exercised both by a battery entry in plans/benchmarks.py (DuckDB
oracle) and, where the engine's own crawl lake produces the input
shape, by a step in plans/refresh.py::refresh_all.

Scale notes common to the family:
* every "top-N per group" is a row_number window partitioned on the
  group key — work distributes across groups, no global sort;
* dims (countries / collections / categories / pattern tables) are
  broadcast — they are O(100) rows in the reference schema;
* multi-count-distinct aggregations ride Spark's expand operator —
  one shuffle keyed on the group-by columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apps_new(
    apps: DataFrame,
    as_of: str,
    release_days: int,
    created_days: int,
    top_n: int = 100,
) -> DataFrame:
    """New-app leaderboards: top-N per (store, category) of apps whose
    release_date falls within ``release_days`` of ``as_of`` (and whose
    row was created within ``created_days`` — the reference's guard
    against backfilled old apps), ordered installs DESC NULLS LAST then
    rating_count DESC NULLS LAST.

    Port of frontend.apps_new_weekly / _monthly / _yearly
    (apps_new_weekly__matview.sql:31-62: rankedapps CTE + rn <= 100;
    the three views differ only in the 7/11, 30/41, 365/380 windows).
    A deterministic store_app tie-break is appended so ranks are
    engine-independent."""
    eligible = apps.filter(
        (F.col("release_date") >= F.date_sub(F.lit(as_of).cast("date"), release_days))
        & (F.col("created_at") >= F.date_sub(F.lit(as_of).cast("date"), created_days))
        & (F.col("crawl_result") == 1)
    )
    w = Window.partitionBy("store", "category").orderBy(
        F.desc_nulls_last("installs"),
        F.desc_nulls_last("rating_count"),
        F.asc("store_app"),
    )
    return (
        eligible.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .withColumn("app_category", F.col("category"))
    )


def ranks_weekly_retention(
    ranks: DataFrame,
    as_of: str,
    keep_all_days: int = 14,
    max_days: int = 200,
    date_col: str = "crawled_date",
) -> DataFrame:
    """Rank-history age-out: keep every row from the trailing
    ``keep_all_days``, only Monday rows between that and ``max_days``,
    nothing older.  Port of clean_app_ranks_weekly_table
    (reference dbcon/queries.py:479-511 — two batched DELETEs:
    `crawled_date < CURRENT_DATE - 14 days AND EXTRACT(DOW) != 1`,
    then `< CURRENT_DATE - 200 days`), expressed as the retained-set
    filter (a lake rewrite keeps, it does not delete).

    Pure partition-prunable filter — at 100 TB this is a metadata-only
    scan when the table is partitioned by crawled_date."""
    d = F.col(date_col)
    as_of_d = F.lit(as_of).cast("date")
    recent = d >= F.date_sub(as_of_d, keep_all_days)
    monday = F.weekday(d) == 0  # Spark weekday(): Monday = 0
    within = d >= F.date_sub(as_of_d, max_days)
    return ranks.filter(within & (recent | monday))


def store_app_ranks_best_monthly(
    ranks: DataFrame,
    as_of: str,
    days: int = 30,
    rank_col: str = "best_rank",
    scenario: tuple[str, ...] = ("store_id", "country", "collection", "category"),
) -> DataFrame:
    """Best (minimum) rank each app reached per scenario over the
    trailing ``days``.  Port of frontend.store_app_ranks_best_monthly
    (store_app_ranks_best_monthly__matview.sql:31-46: min(best_rank)
    GROUP BY store_id, country, collection, category over the 30-day
    window; the dim joins resolve ids→names — the engine's rankings
    table is already name-keyed so callers pass resolved columns)."""
    windowed = ranks.filter(
        F.col("crawled_date")
        >= F.date_sub(F.lit(as_of).cast("date"), days)
    )
    return windowed.groupBy(*scenario).agg(
        F.min(rank_col).cast("long").alias("best_rank")
    )


TAG_SOURCES = (
    "sdk",
    "api_call",
    "publisher",
    "app_ads_direct",
    "app_ads_reseller",
)


def category_tag_stats(app_companies: DataFrame, apps: DataFrame) -> DataFrame:
    """Per-(store, category, tag_source) app counts and install sums.
    Port of frontend.category_tag_stats
    (category_tag_stats__matview.sql:29-46: CROSS JOIN LATERAL VALUES
    unpivot of the five boolean tag columns → DISTINCT (store_app,
    tag_source) → LEFT JOIN store_apps_overview → grouped count
    DISTINCT + install sums).

    The lateral-VALUES unpivot is a `stack` projection (row count ×5
    before the distinct — no shuffle until the distinct's hash agg)."""
    stack_expr = "stack({n}, {pairs}) as (tag_source, present)".format(
        n=len(TAG_SOURCES),
        pairs=", ".join(f"'{t}', {t}" for t in TAG_SOURCES),
    )
    tagged = (
        app_companies.select("store_app", F.expr(stack_expr))
        .filter(F.col("present"))
        .select("store_app", "tag_source")
        .distinct()
    )
    joined = tagged.join(apps, "store_app", "left")
    return joined.groupBy("store", "category", "tag_source").agg(
        F.countDistinct("store_app").alias("app_count"),
        F.sum("installs_d30").alias("installs_d30"),
        F.sum("installs_total").alias("installs_total"),
    )


def latest_sdk_scanned_apps(
    scan_results: DataFrame,
    apps: DataFrame,
    as_of: str,
    top_n: int = 100,
) -> DataFrame:
    """Most-recently SDK-scanned apps, top-N per (store, crawl_result).
    Port of frontend.latest_sdk_scanned_apps
    (latest_sdk_scanned_apps__matview.sql:29-55: DISTINCT ON
    (store_app) ORDER BY run_at DESC picks each app's last scan; apps
    scanned up to ``as_of`` - 1 day are ranked per (store, run_result)
    by recency, keeping 100).

    ``scan_results`` columns: store_app, version_code, crawl_result,
    run_at, scan_id (deterministic tie-break for equal run_at)."""
    w_last = Window.partitionBy("store_app").orderBy(
        F.desc("run_at"), F.desc("scan_id")
    )
    last = (
        scan_results.withColumn("rn", F.row_number().over(w_last))
        .filter("rn = 1")
        .drop("rn")
        .filter(
            F.col("run_at") <= F.date_sub(F.lit(as_of).cast("date"), 1)
        )
    )
    joined = last.join(apps, "store_app", "left")
    w_rank = Window.partitionBy("store", "crawl_result").orderBy(
        F.desc("run_at"), F.asc("store_app")
    )
    return (
        joined.withColumn("updated_rank", F.row_number().over(w_rank))
        .filter(F.col("updated_rank") <= top_n)
        .select(
            F.col("run_at").alias("sdk_crawled_at"),
            "version_code",
            "crawl_result",
            "store",
            "store_app",
            "name",
            "installs",
            "rating_count",
            "updated_rank",
        )
    )


def _pd_sets(rows: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per-``key_cols`` group, the sorted distinct set of pub_domain_id
    values as ONE array column ``_pdset`` (a NULL pub_domain_id is kept
    as a trailing NULL element so downstream left joins reproduce the
    no-match null-store row).  The array is the group's exact identity:
    groups sharing a pd-set share every downstream rollup."""
    pd_type = rows.schema["pub_domain_id"].dataType
    return rows.groupBy(*key_cols).agg(
        F.when(
            F.max(F.col("pub_domain_id").isNull()),
            F.concat(
                F.sort_array(F.collect_set("pub_domain_id")),
                F.array(F.lit(None).cast(pd_type)),
            ),
        )
        .otherwise(F.sort_array(F.collect_set("pub_domain_id")))
        .alias("_pdset")
    )


def _adstxt_chain_rollup(
    domain_entries: DataFrame,
    app_urls_map: DataFrame,
    apps: DataFrame,
    ad_entries: DataFrame,
    per_publisher: bool,
) -> DataFrame:
    """Decomposed exact equivalent of the reference's four-way LEFT
    join chain + count-DISTINCT rollup:

        chained = de ⟕ aum(pub_domain_id) ⟕ apps(store_app)
                     ⟕ ae(app_ad_entry_id)
        chained.groupBy(ad_domain_url, relationship, store
                        [, publisher_id]).agg(countDistinct ...)

    The naive chain explodes on pub_domain_id (|de| × apps-per-domain
    rows — quadratic in capture volume for a fixed domain dimension;
    the r6 driver measured 60-75× wall-clock for 10× rows).  Because
    every aggregate is a count-DISTINCT, row multiplicity is
    irrelevant — only the distinct value sets matter — so the chain
    is decomposed (guide §2.3 "aggregate before you shuffle"):

    * the de⋈ae side reduces to its distinct (pub_domain_id,
      ad_domain_url, relationship[, publisher_id]) combos — bounded by
      attribute cardinality, not row count;
    * the aum⋈apps side reduces to per-domain distinct projections
      (store), (store, developer), (store, store_app);
    * each group's identity is its exact pd-set (``_pd_sets``), so
      groups sharing a set — the common case: publishers list the
      same ad systems — compute their store/developer/app rollup once
      and join it back (arrays are exact join keys; no hash-collision
      risk);
    * the pd-set array itself never rides the heavy fan-out: each
      distinct set gets an exact compact representative ``_rep`` (the
      MIN group-key struct over the groups owning the set — 1:1
      because every group owns exactly one set, so min keys of
      disjoint group collections cannot collide), and the expanded
      (set × pub_domain) frame carries only that small struct
      (carrying the array through the join+dedup was ~75% of the
      rollup's executor time at the 10× profile — r7 stage capture);
    * counts fold per SET first (``countDistinct`` per ``(_rep,
      store)``) and only the folded counts join back to groups —
      the per-group row expansion never materializes;
    * the expanded frame is explicitly repartitioned before the
      fan-out join: its pre-join byte size is tiny, so AQE coalesces
      it to ~3 partitions and the join's 150× row fan-out would run
      nearly serial (guide §2.5 — the coalesce decision cannot see
      the downstream multiplication).

    All steps are linear in input size.  Memory note: one group's
    pd-set array scales with the pub-domain dimension (the reference's
    ~1e5), not with capture rows; millions-of-elements sets with
    millions of groups would need the array split, which the adstxt
    shape does not approach."""
    de = domain_entries.select(
        "pub_domain_id", "ad_domain_url", "app_ad_entry_id"
    )
    d4 = (
        de.join(ad_entries, "app_ad_entry_id", "left")
        .select(
            "pub_domain_id", "ad_domain_url", "relationship",
            "publisher_id",
        )
        .dropDuplicates()
    )
    a = app_urls_map.join(apps, "store_app", "left").select(
        "pub_domain_id", "store", "developer", "store_app"
    )
    width = de.sparkSession.sparkContext.defaultParallelism

    def family(sets: DataFrame, keys: list[str]):
        """(group keys + _rep) map and the set-expanded pub-domain
        frame for one group family."""
        reps = sets.groupBy("_pdset").agg(
            F.min(F.struct(*keys)).alias("_rep")
        )
        gp = sets.join(reps, "_pdset").drop("_pdset")
        exp = reps.select(
            "_rep", F.explode("_pdset").alias("pub_domain_id")
        ).repartition(width, "pub_domain_id")
        return gp, exp

    def set_counts(exp: DataFrame, attr: str, out: str) -> DataFrame:
        """Per-(set, store) distinct count of ``attr`` over the union
        of the set's pub-domains (left join keeps the no-match null
        store rows the reference's LEFT chain produces)."""
        return (
            exp.join(
                a.select("pub_domain_id", "store", attr)
                .dropDuplicates(),
                "pub_domain_id", "left",
            )
            .groupBy("_rep", "store")
            .agg(F.countDistinct(attr).alias(out))
        )

    zero = F.lit(0).cast("long")
    sets_pub = _pd_sets(
        d4, ["ad_domain_url", "relationship", "publisher_id"]
    )
    if per_publisher:
        gp, exp = family(
            sets_pub, ["ad_domain_url", "relationship", "publisher_id"]
        )
        counts = set_counts(exp, "developer", "developer_count").join(
            set_counts(exp, "store_app", "app_count"),
            ["_rep", "store"], "full_outer",
        )
        return gp.join(counts, "_rep").select(
            "ad_domain_url", "relationship", "store", "publisher_id",
            F.coalesce("developer_count", zero).alias("developer_count"),
            F.coalesce("app_count", zero).alias("app_count"),
        )
    sets_e = _pd_sets(
        d4.select(
            "pub_domain_id", "ad_domain_url", "relationship"
        ).dropDuplicates(),
        ["ad_domain_url", "relationship"],
    )
    gp_p, exp_p = family(
        sets_pub, ["ad_domain_url", "relationship", "publisher_id"]
    )
    gp_e, exp_e = family(sets_e, ["ad_domain_url", "relationship"])
    # publisher counts span groups (each publisher contributes its OWN
    # set's stores), so they fold per (adu, rel, store) directly —
    # the per-group frame is #groups × stores-per-set, tiny
    set_stores = (
        exp_p.join(
            a.select("pub_domain_id", "store").dropDuplicates(),
            "pub_domain_id", "left",
        )
        .select("_rep", "store")
        .dropDuplicates()
    )
    pub_counts = (
        gp_p.join(set_stores, "_rep")
        .groupBy("ad_domain_url", "relationship", "store")
        .agg(F.countDistinct("publisher_id").alias("publisher_id_count"))
    )
    counts_e = set_counts(exp_e, "developer", "developer_count").join(
        set_counts(exp_e, "store_app", "app_count"),
        ["_rep", "store"], "full_outer",
    )
    da = gp_e.join(counts_e, "_rep").select(
        "ad_domain_url", "relationship", "store",
        "developer_count", "app_count",
    )
    return pub_counts.join(
        da, ["ad_domain_url", "relationship", "store"], "full_outer"
    ).select(
        "ad_domain_url", "relationship", "store",
        F.coalesce("publisher_id_count", zero).alias("publisher_id_count"),
        F.coalesce("developer_count", zero).alias("developer_count"),
        F.coalesce("app_count", zero).alias("app_count"),
    )


def adstxt_ad_domain_overview(
    domain_entries: DataFrame,
    app_urls_map: DataFrame,
    apps: DataFrame,
    ad_entries: DataFrame,
) -> DataFrame:
    """Supply-chain rollup per (ad domain, relationship, store): how
    many distinct publisher ids, developers and apps each ad system
    reaches.  Port of frontend.adstxt_ad_domain_overview
    (adstxt_ad_domain_overview__matview.sql:29-42: the four-way LEFT
    join chain off adstxt_domain_entries with three count-DISTINCTs),
    computed via the decomposed rollup (``_adstxt_chain_rollup``) —
    same result set, linear instead of quadratic in capture volume.

    ``domain_entries``: pub_domain_id, ad_domain_url, app_ad_entry_id;
    ``app_urls_map``: pub_domain_id, store_app; ``apps``: store_app,
    store, developer; ``ad_entries``: app_ad_entry_id, relationship,
    publisher_id."""
    return _adstxt_chain_rollup(
        domain_entries, app_urls_map, apps, ad_entries,
        per_publisher=False,
    )


def companies_category_stats(
    app_companies: DataFrame,
    companies: DataFrame,
    domains: DataFrame,
    apps: DataFrame,
) -> DataFrame:
    """Per-(store, category, company) reach: distinct apps and install
    sums, with the company's own domain preferred over the matched ad
    domain.  Port of frontend.companies_category_stats
    (companies_category_stats__matview.sql:29-44: LEFT joins to
    domains/companies, COALESCE(company domain, ad domain), grouped
    count DISTINCT + sums).

    ``app_companies``: store_app, domain_id, company_id; ``companies``:
    company_id, company_name, company_domain; ``domains``: domain_id,
    domain_name; ``apps``: store_app, store, category, installs,
    installs_d30."""
    chained = (
        app_companies.join(F.broadcast(domains), "domain_id", "left")
        .join(F.broadcast(companies), "company_id", "left")
        .join(apps, "store_app", "left")
        .withColumn(
            "company_domain",
            F.coalesce(F.col("company_domain"), F.col("domain_name")),
        )
    )
    return chained.groupBy(
        "store",
        F.col("category").alias("app_category"),
        "company_domain",
        "company_name",
    ).agg(
        F.countDistinct("store_app").alias("app_count"),
        F.sum("installs").alias("installs_total"),
        F.sum("installs_d30").alias("installs_d30"),
    )


def company_top_apps(
    app_companies: DataFrame, apps: DataFrame, top_n: int = 20
) -> DataFrame:
    """Top apps per company (and per company × category): apps tagged
    by any of the four company-association booleans, double-ranked by
    how many tag kinds associate them (sdk + api_call + publisher)
    then by 30-day installs.  Port of frontend.company_parent_top_apps
    (company_parent_top_apps__matview.sql:31-71: two row_number
    windows over the same ordering — per (store, company_domain) and
    per (store, app_category, company_domain) — keeping category rank
    <= 20).  A store_app tie-break keeps ranks engine-independent.

    ``app_companies``: store_app, company_domain, sdk, api_call,
    publisher, app_ads_direct (booleans); ``apps``: store_app, store,
    name, app_category, installs_d30."""
    tagged = app_companies.filter(
        F.col("sdk")
        | F.col("api_call")
        | F.col("app_ads_direct")
        | F.col("publisher")
    ).join(apps, "store_app", "left")
    tag_count = (
        F.coalesce(F.col("sdk").cast("int"), F.lit(0))
        + F.coalesce(F.col("api_call").cast("int"), F.lit(0))
        + F.coalesce(F.col("publisher").cast("int"), F.lit(0))
    )
    installs = F.coalesce(F.col("installs_d30").cast("double"), F.lit(0.0))
    order = [
        tag_count.desc(),
        installs.desc(),
        F.asc("store_app"),
    ]
    w_company = Window.partitionBy("store", "company_domain").orderBy(*order)
    w_cat = Window.partitionBy(
        "store", "app_category", "company_domain"
    ).orderBy(*order)
    return (
        tagged.withColumn("app_company_rank", F.row_number().over(w_company))
        .withColumn(
            "app_company_category_rank", F.row_number().over(w_cat)
        )
        .filter(F.col("app_company_category_rank") <= top_n)
    )


def companies_open_source_percent(
    sdks: DataFrame, companies: DataFrame, domains: DataFrame
) -> DataFrame:
    """Share of each company's SDKs that are open source.  Port of
    frontend.companies_open_source_percent
    (companies_open_source_percent__matview.sql:29-40: avg(CASE) over
    the sdks→companies→domains LEFT-join chain, grouped by company
    domain).

    ``sdks``: sdk_id, company_id, is_open_source; ``companies``:
    company_id, domain_id; ``domains``: domain_id, domain_name."""
    chained = sdks.join(F.broadcast(companies), "company_id", "left").join(
        F.broadcast(domains), "domain_id", "left"
    )
    ratio = F.avg(F.when(F.col("is_open_source"), 1).otherwise(0))
    # portable half-up at 4dp (floor(x*10^4 + 0.5)/10^4) — JVM round()
    # and SQL-engine round() disagree on boundary doubles (the repo
    # rounding convention, see operators/estimates.py)
    return chained.groupBy(F.col("domain_name").alias("company_domain")).agg(
        (F.floor(ratio * 10000 + F.lit(0.5)) / 10000).alias(
            "percent_open_source"
        )
    )


def short_url(url: F.Column) -> F.Column:
    """The reference's three-step URL shortener: strip scheme, strip
    query, keep at most the first three path segments
    (api_call_countries__matview.sql:33-39 cleaned_calls CTE).
    Spark group refs are ``$1`` where PG/DuckDB use ``\\1`` — same
    first-occurrence replace semantics."""
    no_scheme = F.regexp_replace(url, r"^https?://", "")
    no_query = F.regexp_replace(no_scheme, r"\?.*$", "")
    return F.regexp_replace(no_query, r"^(([^/]+/){0,2}[^/]+).*$", "$1")


def api_call_countries(
    calls: DataFrame, domain_company: DataFrame, countries: DataFrame
) -> DataFrame:
    """Where apps' API traffic terminates, by endpoint TLD, geo country
    and owning company: keep only each app's LATEST scan run, clean the
    endpoint URL, resolve the TLD to company and parent-company domains
    (double COALESCE fallback to the raw TLD), count distinct apps.
    Port of frontend.api_call_countries
    (api_call_countries__matview.sql:29-59).

    ``calls``: store_app, run_id, run_at, tld_url, url, country_id,
    org; ``domain_company``: tld_url, company_domain (nullable),
    parent_company_domain (nullable); ``countries``: country_id,
    alpha2."""
    w_last = Window.partitionBy("store_app").orderBy(
        F.desc("run_at"), F.desc("run_id")
    )
    latest = (
        calls.filter(F.col("country_id").isNotNull())
        .withColumn("lr", F.first("run_id").over(w_last))
        .filter(F.col("run_id") == F.col("lr"))
    )
    cleaned = latest.withColumn("short_url", short_url(F.col("url")))
    resolved = (
        cleaned.join(F.broadcast(domain_company), "tld_url", "left")
        .join(F.broadcast(countries), "country_id", "left")
        .withColumn(
            "company_domain",
            F.coalesce(F.col("company_domain"), F.col("tld_url")),
        )
        .withColumn(
            "parent_company_domain",
            F.coalesce(
                F.col("parent_company_domain"), F.col("company_domain")
            ),
        )
    )
    return resolved.groupBy(
        "tld_url",
        F.col("alpha2").alias("country"),
        "org",
        "company_domain",
        "parent_company_domain",
    ).agg(F.countDistinct("store_app").alias("store_app_count"))


def app_keyword_rank_stats(
    ranks_daily: DataFrame, as_of: str, days: int = 30
) -> DataFrame:
    """Per-(country, app, keyword): best rank over the trailing 30
    days LEFT-joined with the latest observed rank.  Port of
    frontend.app_keyword_rank_stats
    (app_keyword_rank_stats__matview.sql:29-66: d30_keywords grouped
    min + DISTINCT ON latest_ranks + left join).  ``app_rank`` ASC is
    the deterministic tie-break when several rows share the latest
    crawled_date."""
    keys = ["country", "store_app", "keyword_id"]
    d30 = (
        ranks_daily.filter(
            F.col("crawled_date")
            >= F.date_sub(F.lit(as_of).cast("date"), days)
        )
        .groupBy(*keys)
        .agg(F.min("app_rank").alias("d30_best_rank"))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.desc("crawled_date"), F.asc("app_rank")
    )
    latest = (
        ranks_daily.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(*keys, F.col("app_rank").alias("latest_app_rank"))
    )
    return d30.join(latest, keys, "left")


def companies_sdks_overview(
    companies: DataFrame,
    domains: DataFrame,
    sdks: DataFrame,
    sdk_packages: DataFrame,
    sdk_paths: DataFrame,
) -> DataFrame:
    """Flattened company→SDK→pattern catalogue with the parent-company
    self-join.  Port of frontend.companies_sdks_overview
    (companies_sdks_overview__matview.sql:29-45: companies LEFT JOIN
    companies (parent) LEFT JOIN domains ×2 LEFT JOIN sdks LEFT JOIN
    sdk_packages LEFT JOIN sdk_paths, COALESCE parent name).

    All dims are broadcast — this is a catalogue view, small by
    construction; the fan-out (one row per package × path pattern)
    mirrors the reference's join multiplicity."""
    parents = companies.select(
        F.col("company_id").alias("parent_company_id"),
        F.col("company_name").alias("_parent_name"),
        F.col("domain_id").alias("_parent_domain_id"),
    )
    base = (
        companies.join(F.broadcast(parents), "parent_company_id", "left")
        .join(F.broadcast(domains), "domain_id", "left")
        .join(
            F.broadcast(
                domains.select(
                    F.col("domain_id").alias("_parent_domain_id"),
                    F.col("domain_name").alias("parent_company_domain"),
                )
            ),
            "_parent_domain_id",
            "left",
        )
        .join(F.broadcast(sdks), "company_id", "left")
        .join(F.broadcast(sdk_packages), "sdk_id", "left")
        .join(F.broadcast(sdk_paths), "sdk_id", "left")
    )
    return base.select(
        "company_name",
        F.col("domain_name").alias("company_domain"),
        "parent_company_domain",
        "sdk_name",
        "package_pattern",
        "path_pattern",
        F.coalesce(F.col("_parent_name"), F.col("company_name")).alias(
            "parent_company_name"
        ),
    )


def company_domain_country(api_calls_by_country: DataFrame) -> DataFrame:
    """Each company's most common API-traffic country — parent domains
    roll up their children; child domains that ARE parents defer to the
    parent rollup.  Port of frontend.company_domain_country
    (company_domain_country__matview.sql:29-68: dual company/parent
    country totals, rank-1 per domain, NOT-IN anti-join, UNION dedupe).
    ``country`` ASC is the deterministic tie-break on equal totals.

    Input is the api_call_countries view (plans/frontend.py::
    api_call_countries) — a composed two-stage pipeline."""
    ct = api_calls_by_country.groupBy("company_domain", "country").agg(
        F.sum("store_app_count").alias("total_app_count")
    )
    pt = api_calls_by_country.groupBy(
        "parent_company_domain", "country"
    ).agg(F.sum("store_app_count").alias("total_app_count"))
    w_c = Window.partitionBy("company_domain").orderBy(
        F.desc("total_app_count"), F.asc("country")
    )
    w_p = Window.partitionBy("parent_company_domain").orderBy(
        F.desc("total_app_count"), F.asc("country")
    )
    crc = ct.withColumn("rn", F.row_number().over(w_c))
    prc = pt.withColumn("rn", F.row_number().over(w_p))
    parents = prc.select(
        F.col("parent_company_domain").alias("company_domain")
    ).distinct()
    own = (
        crc.filter("rn = 1")
        .join(parents, "company_domain", "left_anti")
        .select(
            "company_domain",
            F.col("country").alias("most_common_country"),
            "total_app_count",
        )
    )
    rolled = prc.filter("rn = 1").select(
        F.col("parent_company_domain").alias("company_domain"),
        F.col("country").alias("most_common_country"),
        "total_app_count",
    )
    return own.union(rolled).distinct()


def adstxt_publishers_overview(
    domain_entries: DataFrame,
    app_urls_map: DataFrame,
    apps: DataFrame,
    ad_entries: DataFrame,
    top_n: int = 50,
) -> DataFrame:
    """Top publisher accounts per (ad domain, relationship, store),
    ranked by distinct-app reach — a row_number over an AGGREGATED
    relation (rank of count-distinct), not over raw rows.  Port of
    frontend.adstxt_publishers_overview
    (adstxt_publishers_overview__matview.sql:29-54: ranked_data CTE
    groups by publisher_id inside the (ad domain, relationship, store)
    scenario, then pubrank <= 50).  ``publisher_id`` ASC is the
    deterministic tie-break on equal app counts.  The LEFT-join chain
    + count-DISTINCT rollup runs through the decomposed
    ``_adstxt_chain_rollup`` — same result set, linear instead of
    quadratic in capture volume."""
    grouped = _adstxt_chain_rollup(
        domain_entries, app_urls_map, apps, ad_entries,
        per_publisher=True,
    )
    w = Window.partitionBy("ad_domain_url", "relationship", "store").orderBy(
        F.desc("app_count"), F.asc("publisher_id")
    )
    return grouped.withColumn("pubrank", F.row_number().over(w)).filter(
        F.col("pubrank") <= top_n
    )


def category_tag_type_stats(
    app_companies: DataFrame,
    apps: DataFrame,
    company_categories: DataFrame,
    categories: DataFrame,
    app_sdks: DataFrame,
    sdk_categories: DataFrame,
) -> DataFrame:
    """Per-(store, category, tag-source, company-type) app counts and
    installs: the four non-sdk tag kinds classified through each
    company's minimum category (with the app-ads/publisher slug
    overrides), UNION ALL the sdk branch classified through SDK
    categories.  Port of frontend.category_tag_type_stats
    (category_tag_type_stats__matview.sql:29-96)."""
    mcc = company_categories.groupBy("company_id").agg(
        F.min("category_id").alias("category_id")
    )
    tag_sources = ["api_call", "publisher", "app_ads_direct", "app_ads_reseller"]
    stack_expr = "stack({n}, {pairs}) as (tag_source, present)".format(
        n=len(tag_sources),
        pairs=", ".join(f"'{t}', {t}" for t in tag_sources),
    )
    slug = (
        F.when(F.col("tag_source").startswith("app_ads"), F.lit("ad-networks"))
        .when(F.col("tag_source") == "publisher", F.lit("app-publishers"))
        .otherwise(F.col("url_slug"))
    )
    branch_tags = (
        app_companies.select("store_app", "company_id", F.expr(stack_expr))
        .filter(F.col("present"))
        .join(apps, "store_app")  # sa.id IS NOT NULL -> inner
        .join(mcc, "company_id")
        .join(F.broadcast(categories), "category_id", "left")
        .select(
            "store_app",
            "store",
            F.col("category").alias("app_category"),
            "tag_source",
            slug.alias("type_url_slug"),
            "installs_d30",
        )
        .distinct()
        .groupBy("store", "app_category", "tag_source", "type_url_slug")
        .agg(
            F.count("*").alias("app_count"),
            F.sum("installs_d30").alias("installs_d30"),
        )
    )
    branch_sdk = (
        app_sdks.filter(F.col("sdk_id").isNotNull())
        .join(apps, "store_app")
        .join(F.broadcast(sdk_categories), "sdk_id", "left")
        .join(F.broadcast(categories), "category_id", "left")
        .select(
            "store_app",
            "store",
            F.col("category").alias("app_category"),
            F.col("url_slug").alias("type_url_slug"),
            "installs_d30",
        )
        .distinct()
        .groupBy("store", "app_category", "type_url_slug")
        .agg(
            F.count("*").alias("app_count"),
            F.sum("installs_d30").alias("installs_d30"),
        )
        .select(
            "store", "app_category", F.lit("sdk").alias("tag_source"),
            "type_url_slug", "app_count", "installs_d30",
        )
    )
    cols = [
        "store", "app_category", "tag_source", "type_url_slug",
        "app_count", "installs_d30",
    ]
    return branch_tags.select(*cols).unionByName(branch_sdk.select(*cols))


def mediation_adapter_app_counts(
    version_strings: DataFrame,
    mediation_patterns: DataFrame,
    adapter_patterns: DataFrame,
    app_sdk_strings: DataFrame,
    apps: DataFrame,
) -> DataFrame:
    """How many apps carry each mediation adapter: SDK strings prefix-
    matched against mediation patterns (broadcast nested-loop on a tiny
    pattern dim), the adapter token regexp-extracted from the remainder,
    prefix-matched again against adapter patterns, self-mediation
    dropped, then distinct-app counts per adapter × app category.  Port
    of frontend.mediation_adapter_app_counts
    (mediation_adapter_app_counts__matview.sql:29-96; the reference's
    `<>` filter after the LEFT JOIN drops unmatched adapters via
    NULL-comparison semantics — kept bug-for-bug).

    ``version_strings``: string_id, value_name; ``mediation_patterns``:
    mediation_pattern, mediation_company_id; ``adapter_patterns``:
    adapter_pattern, adapter_company_id; ``app_sdk_strings``:
    store_app, string_id; ``apps``: store_app, app_category."""
    fms = version_strings.join(
        F.broadcast(mediation_patterns),
        F.lower("value_name").startswith(
            F.concat(F.lower("mediation_pattern"), F.lit("."))
        ),
    ).select(
        "string_id",
        "mediation_company_id",
        F.col("value_name").alias("full_sdk"),
        # PG/DuckDB regexp_replace replaces only the FIRST occurrence;
        # Spark's replaces ALL.  The prefix join guarantees the
        # leftmost match is at position 0, so anchoring with '^' makes
        # Spark's replace-all hit exactly that one occurrence — a
        # value repeating the pattern ('max.max.adapter...') strips
        # only the leading copy, as the reference does.
        F.regexp_replace(
            F.regexp_replace(
                F.col("value_name"),
                F.concat(
                    F.lit("^"), F.col("mediation_pattern"), F.lit(".")
                ),
                F.lit(""),
            ),
            F.lit(r"\..*$"),
            F.lit(""),
        ).alias("adapter_string"),
    )
    ms = (
        fms.join(
            F.broadcast(adapter_patterns),
            F.lower("adapter_string").startswith(F.lower("adapter_pattern")),
            "left",
        )
        # reference WHERE fms.mediation_company_id <> cma.company_id:
        # NULL adapter company compares unknown and is dropped
        .filter(F.col("mediation_company_id") != F.col("adapter_company_id"))
        .select(
            "string_id", "mediation_company_id", "adapter_company_id",
            "adapter_string", "full_sdk",
        )
    )
    return (
        app_sdk_strings.join(ms, "string_id")
        .join(apps, "store_app", "left")
        .groupBy(
            "mediation_company_id",
            "adapter_string",
            "adapter_company_id",
            "app_category",
        )
        .agg(F.countDistinct("store_app").alias("app_count"))
    )


def store_apps_in_latest_rankings(
    latest_metrics: DataFrame,
    apps: DataFrame,
    ranks: DataFrame,
    as_of: str,
    collections: list,
    countries: list,
    top_growth: int = 500,
    max_rank: int = 150,
    days: int = 15,
) -> DataFrame:
    """The re-crawl priority pool: the global top-``top_growth`` apps
    by 2-week install z-score (free apps only) UNION the apps that
    appeared under ``max_rank`` in the tracked collections/countries in
    the trailing ``days``.  Port of
    public.store_apps_in_latest_rankings
    (store_apps_in_latest_rankings__matview.sql:29-76: growth_apps
    LIMIT 500 over z-scores + DISTINCT ON ranked_apps with IN-list
    filters, UNION dedupe).

    The global LIMIT is a TakeOrdered (per-partition top-500 merged on
    the driver — bounded by 500×partitions rows); the ranked branch is
    a per-app DISTINCT-ON window.  ``store_app`` ASC tie-breaks both."""
    out_cols = ["store_app", "store", "name", "installs", "rating_count"]
    growth = (
        latest_metrics.join(apps, "store_app")
        .filter(F.col("free"))
        .orderBy(
            F.desc_nulls_last("installs_z_score_2w"), F.asc("store_app")
        )
        .limit(top_growth)
        .select(*out_cols)
    )
    w = Window.partitionBy("store_app").orderBy(
        F.desc("crawled_date"), F.asc("rank")
    )
    ranked = (
        ranks.filter(
            F.col("collection").isin(collections)
            & F.col("country").isin(countries)
            & (
                F.col("crawled_date")
                > F.date_sub(F.lit(as_of).cast("date"), days)
            )
            & (F.col("rank") < max_rank)
        )
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .join(apps, "store_app")
        .select(*out_cols)
    )
    return growth.union(ranked).distinct()


def latest_ok_version_codes(
    version_codes: DataFrame,
    scan_results: DataFrame,
    start: str,
    end: str,
) -> DataFrame:
    """Each app's newest successfully-scanned version code within the
    reporting period — the latest_version_codes CTE of the combined-
    domains report (dbcon/sql/query_report_combined_domains.sql:1-21:
    DISTINCT ON (store_app) ORDER BY created_at DESC over codes with a
    scan_result = 1 scan).  ``vc_id`` DESC tie-breaks equal
    created_at."""
    ok = version_codes.join(
        scan_results.filter(F.col("scan_result") == 1).select("vc_id"),
        "vc_id",
    ).filter(
        (F.col("created_at") >= F.lit(start).cast("timestamp"))
        & (F.col("created_at") < F.lit(end).cast("timestamp"))
    )
    w = Window.partitionBy("store_app").orderBy(
        F.desc("created_at"), F.desc("vc_id")
    )
    return (
        ok.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )


def combined_domain_tags(
    api_companies: DataFrame,
    sdk_companies: DataFrame,
    adstxt_companies: DataFrame,
) -> DataFrame:
    """The (domain, app) evidence pivot that PRODUCES the company-tag
    booleans every *_tag_stats rollup consumes: three evidence branches
    UNION ALL'd then bool_or-pivoted per (domain_id, store_app).  Port
    of the combined-domains report
    (dbcon/sql/query_report_combined_domains.sql:80-108 combined_sources
    + final bool_or GROUP BY; queries.py:1251-1270 streams it
    chunked — here it is one distributed plan).

    ``api_companies`` / ``sdk_companies``: (store_app, domain_id);
    ``adstxt_companies``: (store_app, domain_id, tag_source in
    {'app_ads_direct','app_ads_reseller'})."""
    cs = (
        api_companies.select(
            "domain_id", "store_app", F.lit("api_call").alias("tag_source")
        )
        .unionByName(
            sdk_companies.select(
                "domain_id", "store_app", F.lit("sdk").alias("tag_source")
            )
        )
        .unionByName(
            adstxt_companies.select("domain_id", "store_app", "tag_source")
        )
    )
    return cs.groupBy("domain_id", "store_app").agg(
        F.max(F.col("tag_source") == "sdk").alias("sdk"),
        F.max(F.col("tag_source") == "api_call").alias("api_call"),
        F.max(F.col("tag_source") == "app_ads_direct").alias(
            "app_ads_direct"
        ),
        F.max(F.col("tag_source") == "app_ads_reseller").alias(
            "app_ads_reseller"
        ),
    )


def adstxt_ad_domain_parent_overview(
    domain_entries: DataFrame,
    app_urls_map: DataFrame,
    apps: DataFrame,
    ad_entries: DataFrame,
    company_map: DataFrame,
    companies: DataFrame,
) -> DataFrame:
    """Supply-chain rollup at the PARENT-company level: ad domains
    resolve to their owning company; companies with a parent roll up
    into it, companies without a parent appear only if they themselves
    HAVE children (the reference's correlated EXISTS — a pure holding
    test), and the same three count-DISTINCTs aggregate per parent
    domain.  Port of frontend.adstxt_ad_domain_parent_overview
    (adstxt_ad_domain_parent_overview__matview.sql:29-60: the
    child_companies / parent_companies_direct branch union).

    ``company_map``: ad_domain_url → company_id; ``companies``:
    company_id, parent_company_id (nullable), company_domain (the
    company's own domain, the output key)."""
    return _adstxt_chain_rollup(
        _parent_resolved_entries(domain_entries, company_map, companies),
        app_urls_map, apps, ad_entries, per_publisher=False,
    )


def _parent_resolved_entries(
    domain_entries: DataFrame,
    company_map: DataFrame,
    companies: DataFrame,
) -> DataFrame:
    """The child/direct parent-resolution of the two parent-level
    adstxt rollups applied to the ``domain_entries`` side ALONE, with
    the parent company's domain as ``ad_domain_url``
    (adstxt_ad_domain_parent_overview__matview.sql child_companies /
    parent_companies_direct CTEs).  The company joins, the
    parent-null branch filters and the has-children semi-join are all
    functions of ``ad_domain_url`` only, so they commute with the
    app_urls_map/apps/ad_entries joins — resolving the parent BEFORE
    the chain keeps the decomposed rollup's linear shape."""
    joined = (
        domain_entries.select(
            "pub_domain_id", "ad_domain_url", "app_ad_entry_id"
        )
        .join(F.broadcast(company_map), "ad_domain_url", "left")
        .join(F.broadcast(companies), "company_id")
    )
    child = joined.filter(F.col("parent_company_id").isNotNull()).select(
        F.col("parent_company_id").alias("parent_id"),
        "pub_domain_id", "app_ad_entry_id",
    )
    has_children = (
        companies.filter(F.col("parent_company_id").isNotNull())
        .select(F.col("parent_company_id").alias("company_id"))
        .distinct()
    )
    direct = (
        joined.filter(F.col("parent_company_id").isNull())
        .join(F.broadcast(has_children), "company_id", "left_semi")
        .select(
            F.col("company_id").alias("parent_id"),
            "pub_domain_id", "app_ad_entry_id",
        )
    )
    parent_dom = companies.select(
        F.col("company_id").alias("parent_id"),
        F.col("company_domain").alias("ad_domain_url"),
    )
    return (
        child.unionByName(direct)
        .join(F.broadcast(parent_dom), "parent_id", "left")
        .select("pub_domain_id", "ad_domain_url", "app_ad_entry_id")
    )


def adstxt_publishers_parent_overview(
    domain_entries: DataFrame,
    app_urls_map: DataFrame,
    apps: DataFrame,
    ad_entries: DataFrame,
    company_map: DataFrame,
    companies: DataFrame,
    top_n: int = 50,
) -> DataFrame:
    """Top publisher accounts per PARENT-company ad domain — the
    publishers ranking over the parent-resolved union
    (adstxt_publishers_parent_overview__matview.sql: the
    adstxt_publishers_overview shape keyed by the parent domain)."""
    grouped = _adstxt_chain_rollup(
        _parent_resolved_entries(domain_entries, company_map, companies),
        app_urls_map, apps, ad_entries, per_publisher=True,
    )
    w = Window.partitionBy("ad_domain_url", "relationship", "store").orderBy(
        F.desc("app_count"), F.asc("publisher_id")
    )
    return grouped.withColumn("pubrank", F.row_number().over(w)).filter(
        F.col("pubrank") <= top_n
    )


def resolve_parent_companies(
    app_companies: DataFrame, companies: DataFrame
) -> DataFrame:
    """combined_app_companies → combined_app_parent_companies: each
    association re-keyed to the company's parent when it has one
    (adtech.combined_app_parent_companies is the parent-coalesced twin
    the companies_parent_* matviews consume).  ``companies``:
    company_id, parent_company_id (nullable)."""
    parent_of = companies.select(
        "company_id",
        F.coalesce(F.col("parent_company_id"), F.col("company_id")).alias(
            "resolved_company_id"
        ),
    )
    return (
        app_companies.join(F.broadcast(parent_of), "company_id", "left")
        .withColumn(
            "company_id",
            F.coalesce(F.col("resolved_company_id"), F.col("company_id")),
        )
        .drop("resolved_company_id")
    )


def companies_category_tag_stats(
    app_companies: DataFrame,
    companies: DataFrame,
    domains: DataFrame,
    apps: DataFrame,
) -> DataFrame:
    """The company × tag-source × category rollup — category_tag_stats
    with the company dimension kept in the group key.  Port of
    frontend.companies_category_tag_stats
    (companies_category_tag_stats__matview.sql:29-54: lateral-VALUES
    unpivot of all five tag booleans, COALESCE of company domain over
    matched ad domain, then count DISTINCT apps + install sums per
    (store, category, tag, company)).  NB the reference CTE named
    distinct_apps_group has NO DISTINCT — duplicates are absorbed by
    the count(DISTINCT) but can double-count the sums; kept
    bug-for-bug."""
    stack_expr = "stack({n}, {pairs}) as (tag_source, present)".format(
        n=len(TAG_SOURCES),
        pairs=", ".join(f"'{t}', {t}" for t in TAG_SOURCES),
    )
    tagged = (
        app_companies.select(
            "store_app", "domain_id", "company_id", F.expr(stack_expr)
        )
        .filter(F.col("present"))
        .join(F.broadcast(domains), "domain_id", "left")
        .join(F.broadcast(companies), "company_id", "left")
        .select(
            "store_app",
            "tag_source",
            F.coalesce(F.col("company_domain"), F.col("domain_name")).alias(
                "company_domain"
            ),
            "company_name",
        )
    )
    return (
        tagged.join(apps, "store_app", "left")
        .groupBy(
            "store",
            F.col("category").alias("app_category"),
            "tag_source",
            "company_domain",
            "company_name",
        )
        .agg(
            F.countDistinct("store_app").alias("app_count"),
            F.sum("installs_d30").alias("installs_d30"),
            F.sum("installs_total").alias("installs_total"),
        )
    )


def companies_secondary_domain_category_tag_stats(
    app_companies: DataFrame, companies: DataFrame, domains: DataFrame,
    apps: DataFrame,
) -> DataFrame:
    """Reach attributed to companies' SECONDARY domains: the tag
    unpivot restricted to associations whose matched ad domain is NOT
    the company's primary domain, keyed by that ad domain.  Port of
    frontend.companies_secondary_domain_category_tag_stats
    (companies_secondary_domain_category_tag_stats__matview.sql:29-50:
    the `csac.domain_id <> c.domain_id` predicate — NULL company drops
    rows, inner semantics kept bug-for-bug).

    ``companies``: company_id, primary_domain_id."""
    stack_expr = "stack({n}, {pairs}) as (tag_source, present)".format(
        n=len(TAG_SOURCES),
        pairs=", ".join(f"'{t}', {t}" for t in TAG_SOURCES),
    )
    tagged = (
        app_companies.select(
            "store_app", "domain_id", "company_id", F.expr(stack_expr)
        )
        .filter(F.col("present"))
        .join(F.broadcast(companies), "company_id", "left")
        .filter(F.col("domain_id") != F.col("primary_domain_id"))
        .join(F.broadcast(domains), "domain_id", "left")
        .select("store_app", "tag_source", "domain_name")
    )
    return (
        tagged.join(apps, "store_app", "left")
        .groupBy(
            "store",
            F.col("category").alias("app_category"),
            "domain_name",
            "tag_source",
        )
        .agg(
            F.countDistinct("store_app").alias("app_count"),
            F.sum("installs_d30").alias("installs_d30"),
            F.sum("installs_total").alias("installs_total"),
        )
    )


def companies_apps_overview(
    app_sdks: DataFrame,
    sdks: DataFrame,
    sdk_categories: DataFrame,
    apps: DataFrame,
    companies: DataFrame,
    domains: DataFrame,
    categories: DataFrame,
) -> DataFrame:
    """Per-app company/category detail rows from SDK evidence: the
    distinct (app, company, sdk-category) triples flattened through the
    dims.  Port of frontend.companies_apps_overview
    (companies_apps_overview__matview.sql:29-49: DISTINCT over the
    app_sdks→sdks→sdk_categories chain, WHERE company_id IS NOT
    NULL)."""
    triples = (
        app_sdks.join(F.broadcast(sdks), "sdk_id", "left")
        .join(F.broadcast(sdk_categories), "sdk_id")
        .select("store_app", "company_id", "category_id")
        .distinct()
        .filter(F.col("company_id").isNotNull())
    )
    return (
        triples.join(apps, "store_app", "left")
        .join(F.broadcast(companies), "company_id", "left")
        .join(F.broadcast(domains), "domain_id", "left")
        .join(F.broadcast(categories), "category_id", "left")
        .select(
            "store_id",
            "company_id",
            "company_name",
            F.col("domain_name").alias("company_domain"),
            F.col("url_slug").alias("category_slug"),
        )
    )


def resolve_country_evidence(
    evidence: DataFrame, countries: DataFrame
) -> DataFrame:
    """Company country from prioritized evidence: manual > linkedin >
    domain_tld > app_store > anything, latest update wins within a
    source (companies_overview__matview.sql country_resolved CTE —
    the company-level analog of the crawl job's per-app country
    evidence order).  ``evidence_id`` DESC tie-breaks equal
    timestamps."""
    priority = (
        F.when(F.col("source") == "manual", 1)
        .when(F.col("source") == "linkedin", 2)
        .when(F.col("source") == "domain_tld", 3)
        .when(F.col("source") == "app_store", 4)
        .otherwise(5)
    )
    w = Window.partitionBy("company_id").orderBy(
        priority.asc(), F.desc("updated_at"), F.desc("evidence_id")
    )
    return (
        evidence.filter(F.col("country_id").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .join(F.broadcast(countries), "country_id")
        .select("company_id", F.col("alpha2").alias("country"))
    )


def companies_overview(
    app_companies: DataFrame,
    companies: DataFrame,
    domains: DataFrame,
    creatives: DataFrame,
    trends: DataFrame,
    changes: DataFrame,
    sdk_counts: DataFrame,
    mediation: DataFrame,
    adstxt_direct: DataFrame,
    adstxt_parent: DataFrame,
    country_evidence: DataFrame,
    countries: DataFrame,
    ip_country: DataFrame,
    open_source: DataFrame,
) -> DataFrame:
    """The company profile page: one row per matched ad domain carrying
    the five evidence signals plus every side aggregation, with parent
    companies absorbing their children's rollups (sums, and GREATEST
    for sdk_count) and dual direct/parent-coalesced columns.  Port of
    frontend.companies_overview (companies_overview__matview.sql:
    domain_base + 9 side CTEs + 4 parent rollups + the 19-way LEFT
    join; cosmetic columns logo/linkedin/github omitted).

    Side inputs are the OUTPUTS of the other ported views (the
    reference joins frontend.* views the same way): ``creatives``
    (company_domain, creatives_app_count), ``trends``
    (company_domain), ``changes`` (company_domain + 4 counts),
    ``sdk_counts`` (company_domain, sdk_count), ``mediation``
    (company_domain, mediation_adapter_count), ``adstxt_direct`` /
    ``adstxt_parent`` (ad_domain_url, *_app_count),
    ``country_evidence`` (company_id, country_id, source, updated_at,
    evidence_id), ``ip_country`` (company_domain,
    api_ip_resolved_country), ``open_source`` (company_domain,
    percent_open_source)."""
    parents = companies.select(
        F.col("company_id").alias("parent_company_id"),
        F.col("domain_id").alias("_p_domain_id"),
    )
    base = (
        app_companies.groupBy("domain_id", "company_id")
        .agg(
            F.max("sdk").alias("has_sdk_signal"),
            F.max("api_call").alias("has_api_signal"),
            F.max("publisher").alias("has_publisher_signal"),
            F.max("app_ads_direct").alias("has_app_ads_direct"),
            F.max("app_ads_reseller").alias("has_app_ads_reseller"),
        )
        .join(F.broadcast(domains), "domain_id")
        .withColumnRenamed("domain_name", "company_domain")
        .join(
            F.broadcast(
                companies.select(
                    "company_id", "company_name", "parent_company_id"
                )
            ),
            "company_id",
            "left",
        )
        .join(F.broadcast(parents), "parent_company_id", "left")
        .join(
            F.broadcast(
                domains.select(
                    F.col("domain_id").alias("_p_domain_id"),
                    F.col("domain_name").alias("parent_domain"),
                )
            ),
            "_p_domain_id",
            "left",
        )
        .drop("_p_domain_id")
    )
    parent_ids = (
        companies.filter(F.col("parent_company_id").isNotNull())
        .select(F.col("parent_company_id").alias("company_id"))
        .distinct()
        .withColumn("_isp", F.lit(True))
    )
    base = base.join(F.broadcast(parent_ids), "company_id", "left").withColumn(
        "is_parent",
        F.col("company_id").isNotNull() & F.coalesce("_isp", F.lit(False)),
    ).drop("_isp")

    def parent_roll(side: DataFrame, aggs: list) -> DataFrame:
        return (
            base.select("company_domain", "parent_domain")
            .filter(F.col("parent_domain").isNotNull())
            .join(side, "company_domain")
            .groupBy("parent_domain")
            .agg(*aggs)
        )

    p_cr = parent_roll(
        creatives, [F.sum("creatives_app_count").alias("p_creatives")]
    )
    p_ch = parent_roll(
        changes,
        [
            F.sum("apps_sdk_added_count").alias("p_sdk_added"),
            F.sum("apps_sdk_lost_count").alias("p_sdk_lost"),
            F.sum("apps_adstxt_direct_added_count").alias("p_ad_added"),
            F.sum("apps_adstxt_direct_lost_count").alias("p_ad_lost"),
        ],
    )
    p_sd = parent_roll(sdk_counts, [F.max("sdk_count").alias("p_sdk_max")])
    p_me = parent_roll(
        mediation, [F.sum("mediation_adapter_count").alias("p_mediation")]
    )
    resolved = resolve_country_evidence(country_evidence, countries)
    trends_m = trends.select("company_domain").distinct().withColumn(
        "has_trends_v", F.lit(1)
    )

    out = (
        base.join(creatives, "company_domain", "left")
        .join(trends_m, "company_domain", "left")
        .join(
            trends_m.select(
                F.col("company_domain").alias("parent_domain"),
                F.col("has_trends_v").alias("p_has_trends"),
            ),
            "parent_domain",
            "left",
        )
        .join(changes, "company_domain", "left")
        .join(sdk_counts, "company_domain", "left")
        .join(mediation, "company_domain", "left")
        .join(
            adstxt_direct.withColumnRenamed(
                "ad_domain_url", "company_domain"
            ),
            "company_domain",
            "left",
        )
        .join(
            adstxt_parent.withColumnRenamed(
                "ad_domain_url", "company_domain"
            ),
            "company_domain",
            "left",
        )
        .join(
            p_cr.withColumnRenamed("parent_domain", "company_domain"),
            "company_domain",
            "left",
        )
        .join(
            p_ch.withColumnRenamed("parent_domain", "company_domain"),
            "company_domain",
            "left",
        )
        .join(
            p_sd.withColumnRenamed("parent_domain", "company_domain"),
            "company_domain",
            "left",
        )
        .join(
            p_me.withColumnRenamed("parent_domain", "company_domain"),
            "company_domain",
            "left",
        )
        .join(resolved, "company_id", "left")
        .join(
            resolved.select(
                F.col("company_id").alias("parent_company_id"),
                F.col("country").alias("p_country"),
            ),
            "parent_company_id",
            "left",
        )
        .join(ip_country, "company_domain", "left")
        .join(
            ip_country.select(
                F.col("company_domain").alias("parent_domain"),
                F.col("api_ip_resolved_country").alias("p_ip_country"),
            ),
            "parent_domain",
            "left",
        )
        .join(open_source, "company_domain", "left")
        .join(
            open_source.select(
                F.col("company_domain").alias("parent_domain"),
                F.col("percent_open_source").alias("p_open_source"),
            ),
            "parent_domain",
            "left",
        )
    )

    def z(c):
        return F.coalesce(F.col(c), F.lit(0)).cast("long")

    def plus_parent(direct_col, parent_col):
        return F.when(
            F.col("is_parent"), z(direct_col) + z(parent_col)
        ).otherwise(z(direct_col))

    return out.select(
        "company_domain",
        "domain_id",
        "company_id",
        "company_name",
        "parent_company_id",
        "parent_domain",
        "has_sdk_signal",
        "has_api_signal",
        "has_publisher_signal",
        "has_app_ads_direct",
        "has_app_ads_reseller",
        F.coalesce(F.col("country"), F.col("p_country")).alias("country"),
        F.col("country").alias("country_direct"),
        F.coalesce(
            F.col("api_ip_resolved_country"), F.col("p_ip_country")
        ).alias("api_ip_resolved_country"),
        F.col("api_ip_resolved_country").alias(
            "api_ip_resolved_country_direct"
        ),
        F.coalesce(
            F.col("percent_open_source"), F.col("p_open_source")
        ).alias("percent_open_source"),
        F.col("percent_open_source").alias("percent_open_source_direct"),
        plus_parent("creatives_app_count", "p_creatives").alias(
            "creatives_app_count"
        ),
        F.coalesce(
            F.col("has_trends_v"), F.col("p_has_trends"), F.lit(0)
        ).alias("has_trends"),
        plus_parent("apps_sdk_added_count", "p_sdk_added").alias(
            "apps_sdk_added_count"
        ),
        plus_parent("apps_sdk_lost_count", "p_sdk_lost").alias(
            "apps_sdk_lost_count"
        ),
        plus_parent("apps_adstxt_direct_added_count", "p_ad_added").alias(
            "apps_adstxt_direct_added_count"
        ),
        plus_parent("apps_adstxt_direct_lost_count", "p_ad_lost").alias(
            "apps_adstxt_direct_lost_count"
        ),
        F.when(
            F.col("is_parent"),
            F.greatest(z("sdk_count"), z("p_sdk_max")),
        )
        .otherwise(z("sdk_count"))
        .alias("sdk_count"),
        plus_parent("mediation_adapter_count", "p_mediation").alias(
            "mediation_adapter_count"
        ),
        z("creatives_app_count").alias("creatives_app_count_direct"),
        F.coalesce(F.col("has_trends_v"), F.lit(0)).alias(
            "has_trends_direct"
        ),
        z("apps_sdk_added_count").alias("apps_sdk_added_count_direct"),
        z("apps_sdk_lost_count").alias("apps_sdk_lost_count_direct"),
        z("apps_adstxt_direct_added_count").alias(
            "apps_adstxt_direct_added_count_direct"
        ),
        z("apps_adstxt_direct_lost_count").alias(
            "apps_adstxt_direct_lost_count_direct"
        ),
        z("sdk_count").alias("sdk_count_direct"),
        z("mediation_adapter_count").alias(
            "mediation_adapter_count_direct"
        ),
        z("adstxt_direct_app_count").alias("adstxt_direct_app_count"),
        z("adstxt_parent_app_count").alias("adstxt_parent_app_count"),
        F.col("is_parent").cast("int").alias("is_parent_domain"),
    )


def companies_creative_rankings(
    creative_records: DataFrame,
    creative_assets: DataFrame,
    api_calls: DataFrame,
    company_map: DataFrame,
    companies: DataFrame,
    domains: DataFrame,
    apps: DataFrame,
) -> DataFrame:
    """Ad-creative catalogue per company: every creative attributed to
    ALL the domains it touched (initial + host + the additional-domains
    array, exploded, UNION-deduped), visually deduplicated by
    vhash = COALESCE(phash, md5) — perceptually identical variants
    collapse, keeping min(md5) / the latest sighting — then flattened
    through company/advertiser/publisher dims.  Port of
    frontend.companies_creative_rankings
    (companies_creative_rankings__matview.sql:29-95; icon-URL
    cosmetics omitted).  The creative DATA comes from the reference's
    mitm capture (out-of-scope surface); the engine's multimodal
    operators (operators/multimodal.py phash) produce the same asset
    shape.

    ``creative_records``: record_id, creative_asset_id, api_call_id,
    advertiser_store_app_id, advertiser_domain_id,
    creative_initial_domain_id, creative_host_domain_id,
    additional_ad_domain_ids (array<int>); ``creative_assets``:
    creative_asset_id, md5_hash, phash, file_extension; ``api_calls``:
    api_call_id, store_app, run_at; ``company_map``: domain_id,
    company_id; ``apps``: store_app, name, store, store_id, installs,
    rating_count.

    Join-strategy note (guide §3.1, applies to every creative matview
    port here): creative_assets / api_calls / scan_runs scale with
    the capture volume, so their joins carry NO forced broadcast —
    the planner auto-broadcasts them while their stats fit the
    threshold (the bench shape is unchanged) and falls back to a
    shuffle join at production scale, where a forced broadcast would
    collect an unbounded table to the driver.  The curated dims
    (domains, companies, company_map, category maps) stay explicit
    broadcasts."""
    cr = (
        creative_records.join(
            creative_assets, "creative_asset_id", "left"
        )
        .join(api_calls, "api_call_id", "left")
        .withColumn("vhash", F.coalesce(F.col("phash"), F.col("md5_hash")))
    )
    proj = [
        "api_call_id", "vhash", "md5_hash", "file_extension",
        "advertiser_store_app_id", "advertiser_domain_id", "run_at",
    ]
    combined = (
        cr.select(
            *proj,
            F.col("creative_initial_domain_id").alias("domain_id"),
        )
        .union(
            cr.select(
                *proj,
                F.col("creative_host_domain_id").alias("domain_id"),
            )
        )
        .union(
            cr.select(
                *proj,
                F.explode("additional_ad_domain_ids").alias("domain_id"),
            )
        )
        .distinct()
    )
    vd = (
        combined.join(F.broadcast(company_map), "domain_id", "left")
        .groupBy(
            "company_id", "file_extension", "advertiser_store_app_id",
            "advertiser_domain_id", "vhash",
        )
        .agg(
            F.min("md5_hash").alias("md5_hash"),
            F.max("api_call_id").alias("last_api_call_id"),
            F.max("run_at").alias("last_seen"),
        )
    )
    adv_apps = apps.select(
        F.col("store_app").alias("advertiser_store_app_id"),
        F.col("name").alias("advertiser_name"),
        "store",
        F.col("store_id").alias("advertiser_store_id"),
        F.col("installs"),
        F.col("rating_count"),
    )
    pub_apps = apps.select(
        F.col("store_app").alias("_pub_app"),
        F.col("store_id").alias("publisher_store_id"),
        F.col("name").alias("publisher_name"),
    )
    return (
        vd.join(
            F.broadcast(
                api_calls.select(
                    F.col("api_call_id").alias("last_api_call_id"),
                    F.col("store_app").alias("_pub_app"),
                )
            ),
            "last_api_call_id",
            "left",
        )
        .join(F.broadcast(companies), "company_id")  # c.id IS NOT NULL
        .join(
            F.broadcast(
                domains.select(
                    F.col("domain_id").alias("_c_dom"),
                    F.col("domain_name").alias("company_domain"),
                )
            ),
            F.col("domain_id") == F.col("_c_dom"),
            "left",
        )
        .join(
            F.broadcast(
                domains.select(
                    F.col("domain_id").alias("advertiser_domain_id"),
                    F.col("domain_name").alias("advertiser_domain_name"),
                )
            ),
            "advertiser_domain_id",
            "left",
        )
        .join(adv_apps, "advertiser_store_app_id", "left")
        .join(F.broadcast(pub_apps), "_pub_app", "left")
        .select(
            "company_id", "md5_hash", "file_extension", "company_domain",
            "advertiser_name", "store", "advertiser_store_id",
            "advertiser_domain_name", "publisher_store_id",
            "publisher_name", "installs", "rating_count", "last_seen",
        )
    )


def companies_category_tag_type_stats(
    app_companies: DataFrame,
    companies: DataFrame,
    domains: DataFrame,
    apps: DataFrame,
    company_categories: DataFrame,
    categories: DataFrame,
    app_sdks: DataFrame,
    sdks: DataFrame,
    sdk_categories: DataFrame,
) -> DataFrame:
    """Company × category × tag-source × company-type rollup — the
    company-dimension variant of category_tag_type_stats.  Port of
    frontend.companies_category_tag_type_stats
    (companies_category_tag_type_stats__matview.sql:31-115): the four
    non-sdk tag booleans lateral-unpivoted and classified through each
    company's minimum category (slug overrides for app-ads/publisher
    kinds), UNION ALL an sdk branch restricted to each app's LATEST
    version code (max version_code_created_at per store_app) and
    classified through SDK categories.  All joins LEFT per the
    reference — rows without an app overview keep NULL store/category;
    ``companies`` arrives pre-flattened with its own registered
    ``company_domain`` (the reference's c→cd hop).  installs are
    summed without row dedup while apps are count-DISTINCT — kept
    bug-for-bug with the matview."""
    mcc = company_categories.groupBy("company_id").agg(
        F.min("category_id").alias("category_id")
    )
    tag_sources = ["api_call", "publisher", "app_ads_direct",
                   "app_ads_reseller"]
    stack_expr = "stack({n}, {pairs}) as (tag_source, present)".format(
        n=len(tag_sources),
        pairs=", ".join(f"'{t}', {t}" for t in tag_sources),
    )
    slug = (
        F.when(F.col("tag_source").startswith("app_ads"),
               F.lit("ad-networks"))
        .when(F.col("tag_source") == "publisher", F.lit("app-publishers"))
        .otherwise(F.col("url_slug"))
    )
    out_cols = [
        "store", "app_category", "tag_source", "company_domain",
        "company_name", "type_url_slug", "app_count", "installs_d30",
    ]
    branch_tags = (
        app_companies.select(
            "store_app", "domain_id", "company_id", F.expr(stack_expr)
        )
        .filter(F.col("present"))
        .join(F.broadcast(domains), "domain_id", "left")
        .join(F.broadcast(companies), "company_id", "left")
        .join(apps, "store_app", "left")
        .join(F.broadcast(mcc), "company_id", "left")
        .join(F.broadcast(categories), "category_id", "left")
        .groupBy(
            "store",
            F.col("category").alias("app_category"),
            "tag_source",
            F.coalesce(F.col("company_domain"), F.col("domain_name")).alias(
                "company_domain"
            ),
            "company_name",
            slug.alias("type_url_slug"),
        )
        .agg(
            F.countDistinct("store_app").alias("app_count"),
            F.sum("installs_d30").alias("installs_d30"),
        )
    )
    latest = app_sdks.groupBy("store_app").agg(
        F.max("version_code_created_at").alias("version_code_created_at")
    )
    store_app_sdks = (
        app_sdks.join(latest, ["store_app", "version_code_created_at"])
        .select("store_app", "sdk_id")
        .distinct()
    )
    branch_sdk = (
        store_app_sdks
        .join(F.broadcast(sdks), "sdk_id", "left")
        .join(F.broadcast(companies), "company_id", "left")
        .join(apps, "store_app", "left")
        .join(F.broadcast(sdk_categories), "sdk_id", "left")
        .join(F.broadcast(categories), "category_id", "left")
        .groupBy(
            "store",
            F.col("category").alias("app_category"),
            F.col("company_domain"),
            "company_name",
            F.col("url_slug").alias("type_url_slug"),
        )
        .agg(
            F.countDistinct("store_app").alias("app_count"),
            F.sum("installs_d30").alias("installs_d30"),
        )
        .withColumn("tag_source", F.lit("sdk"))
    )
    return branch_tags.select(*out_cols).unionByName(
        branch_sdk.select(*out_cols)
    )


def advertiser_creatives(
    creative_records: DataFrame,
    creative_assets: DataFrame,
    api_calls: DataFrame,
    scan_runs: DataFrame,
    company_map: DataFrame,
    companies: DataFrame,
    domains: DataFrame,
    apps: DataFrame,
) -> DataFrame:
    """Flat creative catalogue row per creative record — every dim
    (publisher app, advertiser app, host/initial-domain companies, MMP
    company, asset hashes) flattened onto the record.  Port of
    frontend.advertiser_creatives (advertiser_creatives__matview.sql:
    31-77).  The correlated additional-domain array subselect becomes
    an explode → broadcast dim join → re-aggregate keyed on record_id;
    the re-collected array is SORTED (the reference's array_agg order
    is planner-dependent — sorting pins a deterministic refinement).

    ``creative_records``: record_id, creative_asset_id, api_call_id,
    advertiser_store_app_id, creative_host_domain_id,
    creative_initial_domain_id, mmp_domain_id, mmp_urls,
    additional_ad_domain_ids (array<int>); ``api_calls``: api_call_id,
    store_app, run_id; ``scan_runs``: run_id, run_at; ``company_map``:
    domain_id, company_id; ``companies``: company_id, company_name,
    domain_id; ``apps``: store_app, name, store_id, icon_128,
    icon_url_512."""
    def dom(alias_id: str, alias_name: str) -> DataFrame:
        return F.broadcast(domains.select(
            F.col("domain_id").alias(alias_id),
            F.col("domain_name").alias(alias_name),
        ))

    def co(alias_id: str, pfx: str) -> DataFrame:
        return F.broadcast(
            company_map.select(
                F.col("domain_id").alias(alias_id),
                F.col("company_id").alias(f"{pfx}_company_id"),
            ).join(
                companies.select(
                    F.col("company_id").alias(f"{pfx}_company_id"),
                    F.col("company_name").alias(f"{pfx}_company_name"),
                    F.col("domain_id").alias(f"{pfx}_co_domain_id"),
                ),
                f"{pfx}_company_id", "left",
            )
        )

    # the matview's correlated subselect scans domains WHERE id =
    # ANY(array) — one row per MATCHING DOMAIN, so duplicate ids in
    # the array contribute once; dedup (record_id, domain_id) before
    # the join to match.
    extra = (
        creative_records.select(
            "record_id", F.explode("additional_ad_domain_ids").alias(
                "domain_id"
            )
        )
        .distinct()
        .join(F.broadcast(domains), "domain_id")
        .groupBy("record_id")
        .agg(F.array_sort(F.collect_list("domain_name")).alias(
            "additional_ad_domain_urls"
        ))
    )
    out = (
        creative_records
        .join(creative_assets, "creative_asset_id", "left")
        .join(api_calls, "api_call_id", "left")
        .join(scan_runs, "run_id", "left")
        .join(dom("creative_host_domain_id", "host_domain"),
              "creative_host_domain_id", "left")
        .join(dom("creative_initial_domain_id", "ad_domain"),
              "creative_initial_domain_id", "left")
        .join(co("creative_host_domain_id", "host"),
              "creative_host_domain_id", "left")
        .join(co("creative_initial_domain_id", "ad"),
              "creative_initial_domain_id", "left")
        .join(dom("host_co_domain_id", "host_co_domain"),
              "host_co_domain_id", "left")
        .join(dom("ad_co_domain_id", "ad_co_domain"),
              "ad_co_domain_id", "left")
        .join(
            F.broadcast(company_map.select(
                F.col("domain_id").alias("mmp_domain_id"),
                F.col("company_id").alias("mmp_company_id"),
            ).join(
                companies.select(
                    F.col("company_id").alias("mmp_company_id"),
                    F.col("company_name").alias("mmp_name"),
                ),
                "mmp_company_id", "left",
            )),
            "mmp_domain_id", "left",
        )
        .join(dom("mmp_domain_id", "mmp_domain"), "mmp_domain_id", "left")
        .join(
            F.broadcast(apps.select(
                F.col("store_app"),
                F.col("name").alias("pub_name"),
                F.col("store_id").alias("pub_store_id"),
                F.col("icon_128").alias("pub_icon_url_100"),
                F.col("icon_url_512").alias("pub_icon_url_512"),
            )),
            "store_app", "left",
        )
        .join(
            F.broadcast(apps.select(
                F.col("store_app").alias("advertiser_store_app_id"),
                F.col("name").alias("adv_name"),
                F.col("store_id").alias("adv_store_id"),
                F.col("icon_128").alias("adv_icon_url_100"),
                F.col("icon_url_512").alias("adv_icon_url_512"),
            )),
            "advertiser_store_app_id", "left",
        )
        .join(extra, "record_id", "left")
    )
    return out.select(
        "record_id",
        F.col("adv_store_id").alias("advertiser_store_id"),
        "run_id", "run_at", "pub_name", "adv_name", "pub_store_id",
        "adv_store_id", "host_domain",
        F.col("host_company_name").alias("host_domain_company_name"),
        "ad_domain",
        F.col("ad_company_name").alias("ad_domain_company_name"),
        "md5_hash", "file_extension",
        "pub_icon_url_100", "adv_icon_url_100",
        "pub_icon_url_512", "adv_icon_url_512",
        "mmp_name", "mmp_domain", "mmp_urls",
        F.coalesce(F.col("host_co_domain"), F.col("host_domain")).alias(
            "host_domain_company_domain"
        ),
        F.coalesce(F.col("ad_co_domain"), F.col("ad_domain")).alias(
            "ad_domain_company_domain"
        ),
        F.coalesce(F.col("phash"), F.col("md5_hash")).alias("vhash"),
        F.coalesce(
            F.col("additional_ad_domain_urls"),
            F.array().cast("array<string>"),
        ).alias("additional_ad_domain_urls"),
    )


def advertiser_creative_rankings_recent_month(
    creative_records: DataFrame,
    creative_assets: DataFrame,
    api_calls: DataFrame,
    scan_runs: DataFrame,
    company_map: DataFrame,
    companies: DataFrame,
    domains: DataFrame,
    apps: DataFrame,
    as_of: str,
) -> DataFrame:
    """Per-advertiser creative-activity rollup over the trailing month
    (records whose scan ``run_at`` ≥ ``as_of`` − 1 month).  Port of
    frontend.advertiser_creative_rankings_recent_month
    (advertiser_creative_rankings_recent_month__matview.sql:31-116):
    MMP domains per advertiser, parent-resolved ad-network domains from
    the initial+host legs (UNION-deduped), count-distinct creatives /
    publishers, first/last sighting, and the 5 most recent creative
    md5s in recency order.  Two determinism pins over the reference:
    the top-5 window adds md5_hash as a tie-break under equal run_at
    (the matview's bare ``ORDER BY run_at DESC`` row_number is
    planner-order under ties), and collected arrays are emitted
    sorted-distinct without SQL NULL elements (Postgres array_agg
    DISTINCT would keep a NULL; invisible through array_to_string,
    which skips NULLs).  avg_publisher_installs keeps the matview's
    join-fanout weighting bug-for-bug.

    ``companies`` here carries (company_id, company_name, domain_id,
    parent_company_id); other inputs as in ``advertiser_creatives``.
    ``apps`` carries store_app, name, store_id, icon_128, icon_url_512,
    category, installs, rating, rating_count, installs_sum_1w,
    installs_sum_4w."""
    cutoff = F.to_timestamp(F.lit(as_of)) - F.expr("INTERVAL 1 MONTH")
    runs = scan_runs
    cr = (
        creative_records
        .join(api_calls, "api_call_id", "left")
        .join(runs, "run_id", "left")
    )
    # `recent` feeds four independent plan branches (both ad-network
    # legs, the top-5 window, and the base aggregation); without
    # truncation each branch re-reads and re-joins the records table.
    # localCheckpoint materializes the month window once — bounded
    # state (one month of creative records) — and the ContextCleaner
    # reclaims the blocks (same pattern as operators/chains.py).
    recent = cr.filter(F.col("run_at") >= cutoff).localCheckpoint(
        eager=False
    )
    # the matview's LEFT JOIN carries `AND advertiser IS NOT NULL` in
    # the join condition — a null advertiser keeps its row but loses
    # the domain name; expressed as a post-join null-out.
    adv_mmp = (
        creative_records.filter(F.col("mmp_domain_id").isNotNull())
        .join(
            F.broadcast(domains.select(
                F.col("domain_id").alias("mmp_domain_id"),
                F.col("domain_name").alias("_mmp_domain"),
            )),
            "mmp_domain_id", "left",
        )
        .select(
            "advertiser_store_app_id",
            F.when(
                F.col("advertiser_store_app_id").isNotNull(),
                F.col("_mmp_domain"),
            ).alias("mmp_domain"),
        )
        .distinct()
    )
    parent_dom = F.broadcast(
        company_map.join(
            companies.select("company_id", "domain_id", "parent_company_id")
            .withColumnRenamed("domain_id", "own_domain_id"),
            "company_id", "left",
        )
        .join(
            companies.select(
                F.col("company_id").alias("parent_company_id"),
                F.col("domain_id").alias("parent_domain_id"),
            ),
            "parent_company_id", "left",
        )
        .select(
            "domain_id",
            F.coalesce(
                F.col("parent_domain_id"), F.col("own_domain_id")
            ).alias("resolved_domain_id"),
        )
    )
    def network_leg(id_col: str) -> DataFrame:
        return (
            recent.join(
                parent_dom.withColumnRenamed("domain_id", id_col),
                id_col,
            )
            .select("advertiser_store_app_id", "resolved_domain_id")
        )

    ad_network_domains = (
        network_leg("creative_initial_domain_id")
        .union(network_leg("creative_host_domain_id"))
        .distinct()
        .join(
            F.broadcast(domains.select(
                F.col("domain_id").alias("resolved_domain_id"),
                F.col("domain_name").alias("ad_network_domain"),
            )),
            "resolved_domain_id", "left",
        )
        .select("advertiser_store_app_id", "ad_network_domain")
    )
    w = Window.partitionBy("advertiser_store_app_id").orderBy(
        F.col("run_at").desc(), F.col("md5_hash")
    )
    top5 = (
        recent.join(creative_assets, "creative_asset_id", "left")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("advertiser_store_app_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "md5_hash"))),
                lambda x: x["md5_hash"],
            ).alias("top_md5_hashes")
        )
    )
    # The matview LEFT-joins adv_mmp and ad_network_domains onto every
    # record row, fanning each advertiser's rows by n_mmp × n_domains
    # before aggregating (a ~100×+ row blowup).  Both fan-outs are
    # keyed on the advertiser ALONE, so the multiplier is uniform
    # within every group — which makes every aggregate here provably
    # fanout-invariant: count(DISTINCT …), min/max and collect_set
    # trivially, and avg(pub_installs) because repeating every row of
    # a group k times leaves its mean unchanged.  The decomposition
    # below (aggregate the record rows, collect the mmp/domain arrays
    # separately, join per advertiser) is therefore semantically
    # identical to the matview INCLUDING its weighting — not a pin —
    # while shuffling |records| + |domains| rows instead of their
    # product.
    # The matview groups on the OVERVIEW columns (saa.*, including
    # saa.id), so advertisers absent from the apps overview all carry
    # NULL keys and merge into ONE all-NULL output group whose
    # correlated top-5 array is empty.  Split: advertisers present in
    # the overview take the decomposed fast path (one group each —
    # identical either way); the (rare) missing slice runs the
    # matview's literal fanout joins so the merged group's aggregates
    # — including the fanout-weighted avg, whose multiplier is NOT
    # uniform across a merged group — are exact.
    base = (
        recent.filter(F.col("advertiser_store_app_id").isNotNull())
        .join(creative_assets, "creative_asset_id", "left")
        .join(
            F.broadcast(apps.select(
                F.col("store_app"),
                F.col("installs").alias("pub_installs"),
            )),
            "store_app", "left",
        )
    )
    known_advs = F.broadcast(
        apps.select(
            F.col("store_app").alias("advertiser_store_app_id")
        ).distinct()
    )
    missing = base.join(known_advs, "advertiser_store_app_id", "left_anti")
    base = base.join(known_advs, "advertiser_store_app_id", "left_semi")
    adtypes = dict(apps.dtypes)
    merged = (
        missing.join(adv_mmp, "advertiser_store_app_id", "left")
        .join(ad_network_domains, "advertiser_store_app_id", "left")
        .groupBy(F.lit(1).alias("_g"))
        .agg(
            F.countDistinct("md5_hash").alias("unique_creatives"),
            F.countDistinct("store_app").alias("unique_publishers"),
            F.min("run_at").alias("first_seen"),
            F.max("run_at").alias("last_seen"),
            F.array_sort(F.collect_set("file_extension")).alias(
                "file_types"
            ),
            F.array_sort(F.collect_set("ad_network_domain")).alias(
                "ad_network_domains"
            ),
            F.avg("pub_installs").alias("avg_publisher_installs"),
            F.array_sort(F.collect_set("mmp_domain")).alias("mmp_domains"),
        )
        .select(
            F.lit(None).cast(adtypes["name"]).alias("advertiser_name"),
            F.lit(None).cast(adtypes["store_id"]).alias(
                "advertiser_store_id"
            ),
            F.lit(None).cast(adtypes["icon_128"]).alias(
                "advertiser_icon_url_100"
            ),
            F.lit(None).cast(adtypes["icon_url_512"]).alias(
                "advertiser_icon_url_512"
            ),
            F.lit(None).cast(adtypes["category"]).alias(
                "advertiser_category"
            ),
            F.lit(None).cast(adtypes["installs"]).alias(
                "advertiser_installs"
            ),
            F.lit(None).cast(adtypes["rating"]).alias("rating"),
            F.lit(None).cast(adtypes["rating_count"]).alias("rating_count"),
            F.lit(None).cast(adtypes["installs_sum_1w"]).alias(
                "installs_sum_1w"
            ),
            F.lit(None).cast(adtypes["installs_sum_4w"]).alias(
                "installs_sum_4w"
            ),
            "unique_creatives", "unique_publishers",
            "first_seen", "last_seen", "file_types", "ad_network_domains",
            "avg_publisher_installs",
            F.when(F.size("mmp_domains") > 0, F.col("mmp_domains")).alias(
                "mmp_domains"
            ),
            F.array().cast("array<string>").alias("top_md5_hashes"),
        )
    )
    agg = base.groupBy("advertiser_store_app_id").agg(
        F.countDistinct("md5_hash").alias("unique_creatives"),
        F.countDistinct("store_app").alias("unique_publishers"),
        F.min("run_at").alias("first_seen"),
        F.max("run_at").alias("last_seen"),
        F.array_sort(F.collect_set("file_extension")).alias("file_types"),
        F.avg("pub_installs").alias("avg_publisher_installs"),
    )
    mmp_arrays = adv_mmp.groupBy("advertiser_store_app_id").agg(
        F.array_sort(F.collect_set("mmp_domain")).alias("mmp_domains")
    )
    net_arrays = ad_network_domains.groupBy("advertiser_store_app_id").agg(
        F.array_sort(F.collect_set("ad_network_domain")).alias(
            "ad_network_domains"
        )
    )
    agg = (
        agg.join(mmp_arrays, "advertiser_store_app_id", "left")
        .join(net_arrays, "advertiser_store_app_id", "left")
        .withColumn(
            "mmp_domains",
            F.coalesce(F.col("mmp_domains"), F.array().cast("array<string>")),
        )
        .withColumn(
            "ad_network_domains",
            F.coalesce(
                F.col("ad_network_domains"), F.array().cast("array<string>")
            ),
        )
    )
    return (
        agg.join(
            F.broadcast(apps.select(
                F.col("store_app").alias("advertiser_store_app_id"),
                F.col("name").alias("advertiser_name"),
                F.col("store_id").alias("advertiser_store_id"),
                F.col("icon_128").alias("advertiser_icon_url_100"),
                F.col("icon_url_512").alias("advertiser_icon_url_512"),
                F.col("category").alias("advertiser_category"),
                F.col("installs").alias("advertiser_installs"),
                "rating", "rating_count",
                "installs_sum_1w", "installs_sum_4w",
            )),
            "advertiser_store_app_id", "left",
        )
        .join(top5, "advertiser_store_app_id", "left")
        .select(
            "advertiser_name", "advertiser_store_id",
            "advertiser_icon_url_100", "advertiser_icon_url_512",
            "advertiser_category", "advertiser_installs",
            "rating", "rating_count", "installs_sum_1w", "installs_sum_4w",
            "unique_creatives", "unique_publishers",
            "first_seen", "last_seen", "file_types", "ad_network_domains",
            "avg_publisher_installs",
            F.when(F.size("mmp_domains") > 0, F.col("mmp_domains")).alias(
                "mmp_domains"
            ),
            F.coalesce(
                F.col("top_md5_hashes"), F.array().cast("array<string>")
            ).alias("top_md5_hashes"),
        )
        .unionByName(merged)
    )
