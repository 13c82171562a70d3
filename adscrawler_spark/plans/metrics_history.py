"""Derived-table pipelines over the crawl's own tables — the engine's
analog of the reference's metrics-history ELT DAG (SURVEY.md §3.3:
raw → daily dedup → weekly → calendar interpolation → models).

The reference runs this as a 256-bucket DuckDB loop
(/root/reference/adscrawler/process/app_metrics_history.py:142-336,
694-947); here the whole DAG is one DataFrame lineage — bucketing
becomes ordinary shuffle partitioning and the per-bucket loop
disappears.

Pipelines (each is a pure DataFrame → DataFrame function; the driver
materializes them in dependency order like the reference's MV refresh
at tools/recreate_all_mvs.py:231-259):

  crawl_log → latest_crawl_state   (A1 latest-row dedup)
            → weekly_host_metrics  (weekly aggregation)
            → densified_metrics    (W12 calendar + W11 ffill)
            → zscored_metrics      (W7 trailing baseline z-scores)
            → host_changes         (W3 lag/lead appearance churn)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_crawl_state(crawl_log: DataFrame) -> DataFrame:
    """Latest row per canonical URL (app_metrics_history.py:1152-1156
    QUALIFY row_number pattern)."""
    w = Window.partitionBy("url_canon").orderBy(
        F.desc("fetched_at"), F.desc("batch_id")
    )
    return (
        crawl_log.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )


def weekly_host_metrics(crawl_log: DataFrame) -> DataFrame:
    """Per (host, week): fetch counts and ok-rate."""
    wk = F.date_trunc("week", "fetched_at").cast("date").alias("week_start")
    return crawl_log.filter("fetched").groupBy("host", wk).agg(
        F.count("*").alias("fetches"),
        F.sum((F.col("crawl_result") == 1).cast("int")).alias("ok"),
        F.round(
            F.sum((F.col("crawl_result") == 1).cast("int")) / F.count("*"), 4
        ).alias("ok_rate"),
    )


def densified_metrics(weekly: DataFrame) -> DataFrame:
    """Calendar densification + forward-fill per host (W12 + W11;
    sequence/explode instead of the reference's cross join at
    app_metrics_history.py:910-927)."""
    bounds = weekly.groupBy("host").agg(
        F.min("week_start").alias("wmin"), F.max("week_start").alias("wmax")
    )
    calendar = bounds.select(
        "host",
        F.explode(F.expr("sequence(wmin, wmax, interval 7 days)")).alias(
            "week_start"
        ),
    )
    w = (
        Window.partitionBy("host")
        .orderBy("week_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = calendar.join(weekly, ["host", "week_start"], "left")
    return joined.select(
        "host",
        "week_start",
        F.coalesce("fetches", F.lit(0)).alias("fetches"),
        F.last("ok_rate", ignorenulls=True).over(w).alias("ok_rate_filled"),
    )


def zscored_metrics(dense: DataFrame, baseline_weeks: int = 8) -> DataFrame:
    """Trailing-baseline z-score of weekly fetches (W7 —
    app_global_metrics_latest__matview.sql:68-110 shape)."""
    wb = (
        Window.partitionBy("host")
        .orderBy("week_start")
        .rowsBetween(-baseline_weeks, -1)
    )
    return dense.select(
        "host",
        "week_start",
        "fetches",
        "ok_rate_filled",
        F.round(
            (F.col("fetches") - F.avg("fetches").over(wb))
            / F.nullif(F.stddev_samp("fetches").over(wb), F.lit(0.0)),
            4,
        ).alias("fetches_z"),
    )


def host_changes(weekly: DataFrame) -> DataFrame:
    """Appearance churn per host (W3 lag/lead gap detection —
    duckdb/domain_app_changes.sql:30-70 shape): a host is `added` on
    its first active week or after a gap, `removed` on the week before
    a gap or its last active week."""
    w = Window.partitionBy("host").orderBy("week_start")
    prev_wk = F.lag("week_start").over(w)
    next_wk = F.lead("week_start").over(w)
    return weekly.select(
        "host",
        "week_start",
        (
            prev_wk.isNull() | (F.datediff("week_start", prev_wk) > 7)
        ).alias("added"),
        (
            next_wk.isNull() | (F.datediff(next_wk, F.col("week_start")) > 7)
        ).alias("removed"),
    )


def interpolate_weekly(
    obs: DataFrame,
    group_cols: list[str],
    week_col: str = "week_start",
    val_col: str = "val",
    clamp_non_negative: bool = False,
) -> DataFrame:
    """Weekly linear interpolation between observation anchors — the
    reference's core metrics product (J6 + W5/W6;
    /root/reference/adscrawler/process/app_metrics_history.py:694-809):
    for every calendar week m, value = exact observation if one exists,
    else prev + days(prev→m) · (next−prev) / days(prev→next) using the
    nearest anchors around m.  No extrapolation: weeks before a group's
    first anchor or after its last are dropped (the reference's WHERE
    on a_exact/a_prev/x2).  ``clamp_non_negative`` reproduces the
    installs variant (GREATEST(slope, 0),
    app_metrics_history.py:657-663).

    Shape: next-anchor columns via lead (the reference's MIN_BY OVER
    w_future on one-row-per-observation data), then a calendar grid and
    ONE carry-forward struct window instead of the reference's
    correlated MAX(observed_at < m) subquery — the grid join and both
    windows partition by the group key, so the whole pipeline is a
    single hash-distribution with no driver involvement.

    The grid is derived PER GROUP (sequence from the group's own min
    to max week, step 7 days), so each group's anchors land on its own
    grid by construction.  A global calendar would require every
    group's weeks to share the same modulo-7 phase — when they don't,
    anchors silently miss the grid join keys and whole groups vanish.
    Groups whose weeks are internally 7-aligned (the reference's
    calendar weeks always are) get identical output either way."""
    gcols = list(group_cols)
    w_next = Window.partitionBy(*gcols).orderBy(week_col)
    anchors = obs.select(
        *gcols,
        week_col,
        val_col,
        F.lead(week_col).over(w_next).alias("_x2"),
        F.lead(val_col).over(w_next).alias("_y2"),
    )
    grid = (
        obs.groupBy(*gcols)
        .agg(F.min(week_col).alias("_lo"), F.max(week_col).alias("_hi"))
        .select(
            *gcols,
            F.explode(F.expr("sequence(_lo, _hi, interval 7 days)")).alias(
                week_col
            ),
        )
    )
    j = grid.join(anchors, gcols + [week_col], "left")
    wp = (
        Window.partitionBy(*gcols)
        .orderBy(week_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the latest anchor ATOMICALLY (one struct) — carrying fields
    # with separate ignorenulls windows would mix anchors when the last
    # anchor's next-pointer (_x2) is null.
    anchor = F.when(
        F.col(val_col).isNotNull(),
        F.struct(
            F.col(week_col).alias("wk"),
            F.col(val_col).alias("v"),
            F.col("_x2").alias("x2"),
            F.col("_y2").alias("y2"),
        ),
    )
    p = F.col("_prev")
    rise = p["y2"] - p["v"]
    if clamp_non_negative:
        rise = F.greatest(rise, F.lit(0.0))
    days_to_m = F.datediff(F.col(week_col), p["wk"]).cast("double")
    span = F.datediff(p["x2"], p["wk"]).cast("double")
    interp = p["v"] + days_to_m * rise / F.when(span != 0, span)
    return (
        j.withColumn("_prev", F.last(anchor, ignorenulls=True).over(wp))
        .filter(
            F.col(val_col).isNotNull()
            | (p.isNotNull() & p["x2"].isNotNull())
        )
        .select(
            *gcols,
            week_col,
            F.coalesce(F.col(val_col), interp).alias(val_col),
        )
    )


def build_all(crawl_log: DataFrame) -> dict[str, DataFrame]:
    """Dependency-ordered derived tables (the MV refresh list)."""
    weekly = weekly_host_metrics(crawl_log)
    dense = densified_metrics(weekly)
    return {
        "latest_crawl_state": latest_crawl_state(crawl_log),
        "weekly_host_metrics": weekly,
        "densified_metrics": dense,
        "zscored_metrics": zscored_metrics(dense),
        "host_changes": host_changes(weekly),
    }


def retention_delete_batches(
    history: DataFrame,
    cutoff_ts: str,
    batch_size: int,
    week_col: str = "week_start",
    row_key: str = "row_id",
) -> DataFrame:
    """clean_app_metrics_history_table (dbcon/queries.py:131-149): the
    400-day retention sweep, which the reference runs as a loop of
    ``DELETE ... WHERE ctid IN (SELECT ctid ... LIMIT batch)`` until
    no rows remain.  The lake restatement is deterministic instead of
    ctid-ordered: every expired row gets a global position over
    (week_col, row_key) — computed with the range-partitioned
    prefix-sum ranker, never a single-partition window — and batches
    of ``batch_size`` are emitted as a manifest (batch_id, n_rows,
    first/last week) for the delete executor to consume
    oldest-first.  ``row_key`` must be unique (the ctid stand-in) so
    batch boundaries are total-order stable."""
    from adscrawler_spark.operators.frontier import global_rank

    expired = history.filter(
        F.col(week_col) < F.lit(cutoff_ts).cast("date")
    )
    ranked = global_rank(
        expired,
        [F.col(week_col).asc(), F.col(row_key).asc()],
        rank_col="_pos",
    )
    return (
        ranked.withColumn(
            "batch_id",
            F.floor((F.col("_pos") - 1) / F.lit(batch_size)).cast("long"),
        )
        .groupBy("batch_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(week_col).alias("first_week"),
            F.max(week_col).alias("last_week"),
        )
    )
