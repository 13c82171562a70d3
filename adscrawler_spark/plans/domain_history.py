"""Quarterly domain↔app churn + trend products — the engine analog of
the reference's combined-domain-history DAG
(/root/reference/adscrawler/process/app_domain_history.py:51-128;
dbcon/sql/duckdb/domain_app_changes.sql, trend_domains.sql).

Input: a quarterly activity table with one row per
(domain_id, store_app, year, quarter) carrying boolean tag columns
(sdk / api_call / app_ads_direct), plus per-app (store, release_date)
dims.  Outputs:

* ``domain_app_changes`` — per (domain, app, tag_source, quarter):
  'added' / 'added_initial' (first-ever appearance not explained by the
  app's own release quarter) / 'removed' (emitted on the quarter AFTER
  the last active one, capped at the last observed period);
* ``trend_domains`` — per (domain, quarter, store, tag_source): app
  counts, market-share %, and added/lost churn %.

Scale shape: every window partitions by (domain, app, tag) or
(app, tag); the one global scalar (max observed quarter) is an agg +
broadcast, never a whole-table window; the trend joins key on
(domain, year, quarter, store, tag) — plain hash shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TAGS = ["sdk", "api_call", "app_ads_direct"]


def unpivot_tags(quarterly: DataFrame) -> DataFrame:
    """(domain_id, store_app, year, quarter, tag_source) for active
    tags — the reference's UNPIVOT (domain_app_changes.sql:14-15)."""
    pairs = ", ".join(f"'{t}', {t}" for t in TAGS)
    return quarterly.select(
        "domain_id",
        "store_app",
        "year",
        "quarter",
        F.expr(f"stack({len(TAGS)}, {pairs}) as (tag_source, is_active)"),
    ).filter("is_active").drop("is_active")


def enrich_windowed(active: DataFrame, apps: DataFrame) -> DataFrame:
    """Attach store/release_date dims and the quarter-adjacency window
    columns (domain_app_changes.sql:18-38): yq = year*10 + quarter with
    the Q4→Q1 delta of 7, prev/next yq per (domain, app, tag), first
    appearance per (app, tag), and the global max observed yq (an agg +
    broadcast, not a whole-table window).

    The dim join is a LEFT join, matching the reference's
    ``LEFT JOIN store_app_store`` (domain_app_changes.sql:36-38):
    activity rows whose app is missing from the dim keep flowing with
    null store/release_date — the added/removed CASE logic already
    treats a null release_date as "not explained by release", instead
    of silently dropping the row.  max_yq is computed over ``active``,
    which under a left join equals the post-join max exactly."""
    yq = F.col("year") * 10 + F.col("quarter")
    w = Window.partitionBy("domain_id", "store_app", "tag_source").orderBy(
        "year", "quarter"
    )
    w_first = Window.partitionBy("store_app", "tag_source")
    e = (
        active.join(F.broadcast(apps), "store_app", "left")
        .withColumn("yq", yq)
        .withColumn(
            "quarter_start",
            F.make_date(
                F.col("year"), (F.col("quarter") - 1) * 3 + 1, F.lit(1)
            ),
        )
        .withColumn(
            "prev_delta", F.when(F.col("quarter") == 1, 7).otherwise(1)
        )
        .withColumn(
            "next_delta", F.when(F.col("quarter") == 4, 7).otherwise(1)
        )
        .withColumn("prev_yq", F.lag("yq").over(w))
        .withColumn("next_yq", F.lead("yq").over(w))
        .withColumn("first_seen_key", F.min("yq").over(w_first))
    )
    max_yq = active.agg(
        F.max(F.col("year") * 10 + F.col("quarter")).alias("max_yq")
    )
    return e.crossJoin(F.broadcast(max_yq))


def domain_app_changes(enriched: DataFrame) -> DataFrame:
    """added / added_initial / removed rows
    (domain_app_changes.sql:40-78).

    Same materialize-once rationale as :func:`trend_domains`: the
    added and removed branches each re-derive the windowed tower
    otherwise."""
    enriched = enriched.localCheckpoint(eager=False)
    added = enriched.filter(
        F.col("prev_yq").isNull()
        | (F.col("prev_yq") != F.col("yq") - F.col("prev_delta"))
    ).select(
        "domain_id",
        "store_app",
        "tag_source",
        "year",
        "quarter",
        F.when(
            (F.col("yq") == F.col("first_seen_key"))
            & ~(
                (F.col("release_date") >= F.col("quarter_start"))
                & (
                    F.col("release_date")
                    < F.add_months(F.col("quarter_start"), 3)
                )
            ),
            F.lit("added_initial"),
        )
        .otherwise(F.lit("added"))
        .alias("status"),
    )
    removed = enriched.filter(
        (
            F.col("next_yq").isNull()
            | (F.col("next_yq") != F.col("yq") + F.col("next_delta"))
        )
        & ((F.col("yq") + F.col("next_delta")) <= F.col("max_yq"))
    ).select(
        "domain_id",
        "store_app",
        "tag_source",
        F.when(F.col("quarter") == 4, F.col("year") + 1)
        .otherwise(F.col("year"))
        .alias("year"),
        F.when(F.col("quarter") == 4, F.lit(1))
        .otherwise(F.col("quarter") + 1)
        .alias("quarter"),
        F.lit("removed").alias("status"),
    )
    return added.unionByName(removed)


def trend_domains(enriched: DataFrame) -> DataFrame:
    """Per-(domain, quarter, store, tag) market share and churn rates
    (trend_domains.sql).

    ``enriched`` is consumed FOUR times (pre_agg / current / churned /
    added); its subtrees prune to different column sets, so exchange
    reuse does not fire and the whole derive+window tower executed
    once per consumer (duplicate 139MB map stages at the 10× profile).
    One localCheckpoint materializes it exactly once — mirroring the
    reference, whose trend matviews read the STORED
    combined-domain-history table rather than recomputing it per CTE."""
    enriched = enriched.localCheckpoint(eager=False)
    keys = ["year", "quarter", "store", "tag_source"]
    pre_agg = enriched.groupBy(*keys).agg(
        F.countDistinct("store_app").alias("total_apps_in_quarter")
    )
    current = (
        enriched.groupBy("domain_id", *keys)
        .agg(F.count("*").alias("total_apps"))
        .join(pre_agg, keys)
    )
    churned = (
        enriched.filter(
            F.col("next_yq").isNull()
            | (F.col("next_yq") != F.col("yq") + F.col("next_delta"))
        )
        .groupBy(
            "domain_id",
            "store",
            "tag_source",
            F.when(F.col("quarter") == 4, F.col("year") + 1)
            .otherwise(F.col("year"))
            .alias("year"),
            F.when(F.col("quarter") == 4, F.lit(1))
            .otherwise(F.col("quarter") + 1)
            .alias("quarter"),
        )
        .agg(F.count("*").alias("apps_lost"))
    )
    added = (
        enriched.filter(
            F.col("prev_yq").isNull()
            | (F.col("prev_yq") != F.col("yq") - F.col("prev_delta"))
        )
        .groupBy("domain_id", *keys)
        .agg(F.count("*").alias("apps_added"))
    )
    join_keys = ["domain_id", *keys]
    out = (
        current.join(churned, join_keys, "left")
        .join(added, join_keys, "left")
        .withColumn("apps_lost", F.coalesce("apps_lost", F.lit(0)))
        .withColumn("apps_added", F.coalesce("apps_added", F.lit(0)))
    )
    return out.select(
        *join_keys,
        "total_apps",
        "total_apps_in_quarter",
        "apps_lost",
        "apps_added",
        F.round(
            F.col("total_apps")
            * 100.0
            / F.when(
                F.col("total_apps_in_quarter") != 0,
                F.col("total_apps_in_quarter"),
            ),
            5,
        ).alias("pct_market_share"),
        F.round(
            F.col("apps_added")
            * 100.0
            / F.when(
                F.col("total_apps") - F.col("apps_added") != 0,
                F.col("total_apps") - F.col("apps_added"),
            ),
            2,
        ).alias("pct_apps_added"),
        F.round(
            F.col("apps_lost")
            * 100.0
            / F.when(
                F.col("total_apps") + F.col("apps_lost") != 0,
                F.col("total_apps") + F.col("apps_lost"),
            ),
            2,
        ).alias("pct_apps_lost"),
    )


def map_to_entity(
    active: DataFrame, mapping: DataFrame, entity_col: str = "company_id"
) -> DataFrame:
    """Remap the active (domain, app, quarter, tag) set onto a coarser
    entity — company or parent company — before windowing: the only
    difference between trend_domains and trend_companies /
    trend_parent_companies (reference dbcon/sql/duckdb/
    trend_companies.sql:1-11 joins company_domain_mapping and GROUPs
    the duplicates an app reaches via several of a company's domains).
    The output keeps the ``domain_id`` column name so the whole
    windowed/churn pipeline downstream is reused unchanged; the column
    carries entity ids."""
    return (
        active.join(F.broadcast(mapping), "domain_id")
        .select(
            F.col(entity_col).alias("domain_id"),
            "store_app",
            "year",
            "quarter",
            "tag_source",
        )
        .distinct()
    )

def parent_rollup_mapping(
    cmap: DataFrame, companies: DataFrame
) -> DataFrame:
    """domain_id → parent entity id, the one extra hop that turns
    trend_companies into trend_parent_companies (reference
    dbcon/sql/duckdb/trend_parent_companies.sql:1-13):
    ``COALESCE(co.parent_company_id, cdm.company_id)`` — a company with
    no parent rolls up to itself.  ``cmap`` is the
    company_domain_mapping dim (domain_id, company_id); ``companies``
    is the (id, domain_id, parent_company_id) dim.  Both are small
    dims — broadcast, no shuffle."""
    co = companies.select(
        F.col("id").alias("company_id"), "parent_company_id"
    )
    return cmap.join(F.broadcast(co), "company_id", "left").select(
        "domain_id",
        F.coalesce("parent_company_id", "company_id").alias("company_id"),
    )


def attach_company_domain(
    trends: DataFrame, companies: DataFrame, domains: DataFrame
) -> DataFrame:
    """Map the entity ids riding in the ``domain_id`` column back to
    the owning company's domain name (trend_parent_companies.sql:
    115-126: parent id → companies.domain_id → domains.domain_name,
    both LEFT joins — an entity whose company or domain row is missing
    keeps its stats with a NULL ``company_domain``).  Dims broadcast."""
    co = companies.select(
        F.col("id").alias("_entity_id"),
        F.col("domain_id").alias("_co_domain_id"),
    )
    dd = domains.select(
        F.col("id").alias("_co_domain_id"),
        F.col("domain_name").alias("company_domain"),
    )
    stat_cols = [c for c in trends.columns if c != "domain_id"]
    return (
        trends.join(
            F.broadcast(co),
            trends["domain_id"] == co["_entity_id"],
            "left",
        )
        .join(F.broadcast(dd), "_co_domain_id", "left")
        .select("company_domain", *stat_cols)
    )
