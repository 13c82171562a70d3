"""Politeness: robots rules + per-(host, lane) crawl budgets (T1–T7).

The reference throttles with wall-clock sleeps and queue caps
(/root/reference/adscrawler/app_stores/scrape_stores.py:220-222,275-278;
dramatiq/dispatcher.py:62,176-187).  Wall-clock state cannot give a
deterministic, parallelism-independent schedule, so the engine uses
*virtual time*: the i-th fetch of a (host, lane) in a generation costs
``i * crawl_delay`` virtual seconds, and a generation grants each lane
``budget_seconds``.  Rows beyond the budget are deferred (stay
pending) — the dispatcher's queue-depth throttle (T7) expressed as a
pure function of the claim order, so ``local[8]`` and ``local[32]``
produce the identical schedule.

Robots rules are an engine-side table (FIXTURES.md F9 — no reference
analog, the north_star adds them): (host, disallow array<string> of
path prefixes, crawl_delay double).  Denied rows are recorded with
state='denied' and never fetched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adscrawler_spark.session import local_df

DEFAULT_CRAWL_DELAY = 0.5
DEFAULT_BUDGET_SECONDS = 3600.0


def default_robots(spark: SparkSession) -> DataFrame:
    """Deterministic robots fixture: the two hot hosts allow fast
    crawl; selected pub domains disallows
    /app-ads.txt (exercises the denied path); pub0 is slow."""
    rows = [
        ("google-play-store.com", [], 0.05),
        ("apple-app-store.com", [], 0.05),
        ("pub0-dev.com", [], 5.0),
        ("pub7-dev.com", ["/app-ads.txt"], 1.0),
        ("pub17-dev.com", ["/app-ads.txt"], 1.0),
        ("pub27-dev.com", ["/private", "/app-ads.txt"], 1.0),
    ]
    return local_df(spark,
        rows, "host string, disallow array<string>, crawl_delay double"
    )


def apply_robots(claimed: DataFrame, robots: DataFrame) -> DataFrame:
    """Broadcast-join robots onto the claimed batch; adds
    ``crawl_delay`` (default when no rule) and ``robots_denied``."""
    rules = F.broadcast(robots.select("host", "disallow", "crawl_delay"))
    path = F.parse_url(F.col("url"), F.lit("PATH"))
    denied = F.exists(
        F.coalesce(F.col("disallow"), F.array().cast("array<string>")),
        lambda p: path.startswith(p),
    )
    return (
        claimed.join(rules, "host", "left")
        .withColumn(
            "crawl_delay", F.coalesce("crawl_delay", F.lit(DEFAULT_CRAWL_DELAY))
        )
        .withColumn("robots_denied", F.coalesce(denied, F.lit(False)))
        .drop("disallow")
    )


def with_virtual_schedule(
    claimed: DataFrame, budget_seconds: float = DEFAULT_BUDGET_SECONDS
) -> DataFrame:
    """Virtual fetch time per (host, lane, claim family) from the claim
    order; rows whose start time exceeds the lane budget are deferred.

    robots-denied rows do NOT consume budget: lane_rank counts only
    fetchable rows (a running sum over the claim order, which keeps the
    schedule a pure function of the claim log at any parallelism).

    The window partitions by claim FAMILY as well as (host, lane):
    rankings share the hot store hosts with listings, and the
    reference runs those crawls as separate dramatiq worker queues
    with independent throughput (dispatcher.py queues) — so each
    family gets its own per-lane budget, and claim_rank (unique only
    within a family) stays a total order inside every window."""
    from pyspark.sql import Window

    fam = (
        F.when(F.col("doc_kind") == "adstxt", "adstxt")
        .when(F.col("doc_kind") == "rankings", "rankings")
        .otherwise("listing")
    )
    claimed = claimed.withColumn("_fam", fam)
    w = (
        Window.partitionBy("host", "lane", "_fam")
        .orderBy("claim_rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fetchable_rank = F.sum(
        F.when(~F.col("robots_denied"), 1).otherwise(0)
    ).over(w)
    lane_rank = F.when(~F.col("robots_denied"), fetchable_rank)
    vt = (lane_rank - 1) * F.col("crawl_delay")
    return (
        claimed.withColumn("lane_rank", lane_rank)
        .withColumn("virtual_time", F.coalesce(vt, F.lit(-1.0)))
        .withColumn(
            "within_budget", F.coalesce(vt < F.lit(budget_seconds), F.lit(False))
        )
        .drop("_fam")
    )


def parse_robots_txt(df, host_col: str = "host", body_col: str = "body",
                     agent: str = "*"):
    """Raw robots.txt bodies → the rules table ``apply_robots`` consumes
    (host, disallow array<string>, crawl_delay double).

    Fully relational section parser (north_star: "robots.txt rules,
    crawl-delay budgets"): lines explode with their position, and RFC
    9309 *groups* are reconstructed relationally — a group starts at
    the first User-agent line of a consecutive UA run (stacked
    ``User-agent: foo`` / ``User-agent: *`` lines share one rule set),
    rules attach to EVERY agent named in the run, and the
    most-specific-group-wins rule applies: if any group names the
    requested agent exactly, only those groups count; otherwise the
    ``*`` groups do.  Comment stripping, blank-line tolerance, and
    case-insensitive keys follow the robots.txt grammar.  No Python on
    the hot path: one explode, two windows, one aggregation."""
    from pyspark.sql import Window

    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(body_col, "\n")).alias("ln", "raw"),
    )
    clean = lines.withColumn(
        "line", F.trim(F.regexp_replace("raw", "#.*", ""))
    ).filter(F.col("line") != "")
    kv = clean.select(
        "host",
        "ln",
        F.lower(F.trim(F.substring_index("line", ":", 1))).alias("key"),
        F.trim(F.expr("substring(line, instr(line, ':') + 1)")).alias("val"),
    ).filter(F.instr("line", ":") > 0)
    w_seq = Window.partitionBy("host").orderBy("ln")
    w_run = (
        Window.partitionBy("host")
        .orderBy("ln")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_ua = F.col("key") == "user-agent"
    # group id = running count of UA-run starts (a UA line whose
    # predecessor is not a UA line opens a new group)
    grouped = kv.withColumn(
        "grp",
        F.sum(
            (
                is_ua & ~F.coalesce(F.lag(is_ua).over(w_seq), F.lit(False))
            ).cast("int")
        ).over(w_run),
    )
    agents = (
        grouped.filter(is_ua)
        .groupBy("host", "grp")
        .agg(F.collect_set(F.lower("val")).alias("agents"))
    )
    # rules before any User-agent line (grp with no agents) are outside
    # every group and ignored, per RFC 9309.
    rules = (
        grouped.filter(~is_ua)
        .join(agents, ["host", "grp"])
        .withColumn("exact", F.array_contains("agents", agent.lower()))
        .withColumn("wild", F.array_contains("agents", "*"))
    )
    host_has_exact = F.max(F.col("exact").cast("int")).over(
        Window.partitionBy("host")
    )
    mine = rules.withColumn("_hx", host_has_exact).filter(
        F.when(F.col("_hx") == 1, F.col("exact")).otherwise(F.col("wild"))
    )
    return (
        mine.groupBy("host")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        (F.col("key") == "disallow") & (F.col("val") != ""),
                        F.col("val"),
                    )
                )
            ).alias("disallow"),
            F.min(
                F.when(
                    F.col("key") == "crawl-delay",
                    F.expr("try_cast(val AS DOUBLE)"),
                )
            ).alias("crawl_delay"),
        )
        .withColumn(
            "crawl_delay",
            F.coalesce("crawl_delay", F.lit(DEFAULT_CRAWL_DELAY)),
        )
    )
