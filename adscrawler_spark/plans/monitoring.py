"""Crawl-health telemetry — the reference's cron snapshot functions
and the store-apps audit trigger re-expressed as lake operators.

The reference appends per-group freshness stats to logging tables on a
schedule (pg-ddl/schema/full_db_dump.sql:155-219 ``snapshot_apps``,
:219-278 ``snapshot_pub_domains``, :278-342 ``snapshot_store_apps``)
and keeps a row-level audit changelog via a trigger (:101-155
``process_store_app_audit``).  On the lake the same telemetry is a
grouped aggregation over the state table appended per run, and the
changelog is a snapshot diff between consecutive table versions (the
CDC-native equivalent of the per-statement trigger — documented
refinement: per-statement firings that change nothing are not
reconstructible from snapshots, so U rows require an actual value
change).

Staleness day counts use ``EXTRACT(DAY FROM now() - updated_at)`` —
the INTERVAL's whole-day component (full 24-hour periods, truncating),
matched exactly by Spark's day-time-interval EXTRACT and DuckDB's
interval extract (parity verified in the battery oracles).

Scale shape: one hash aggregation keyed on the group columns; the
audit diff is a single full-outer join hashed on the key — both plans
scale with the state table and never touch the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _days_since(col: str, as_of: str):
    return F.expr(
        f"extract(DAY FROM (cast('{as_of}' as timestamp_ntz)"
        f" - cast({col} as timestamp_ntz)))"
    )


def freshness_snapshot(
    table: DataFrame,
    group_cols: list[str],
    as_of: str,
    updated_col: str = "updated_at",
    stale_days: int = 15,
    coalesce_max: bool = False,
) -> DataFrame:
    """Per-group freshness stats: row counts, avg/max whole-day
    staleness, and the count of rows older than ``stale_days``.

    Port of ``snapshot_apps`` (group_cols=[store, crawl_result],
    coalesce_max=False), ``snapshot_pub_domains``
    (group_cols=[crawl_result], coalesce_max=True) and
    ``snapshot_store_apps`` (store+crawl_result, coalesce_max=True) —
    one parameterized operator, three reference signatures.

    Bug-for-bug: the reference LEFT JOINs the stale-count CTE back on
    the group columns with plain ``=``, so a group whose key contains
    SQL NULL (crawl_result IS NULL — never-crawled apps) gets
    ``rows_older_than15 = NULL`` even when stale rows exist; the port
    reproduces that with a null-unsafe join."""
    days = _days_since(updated_col, as_of)
    max_days = F.max(days)
    if coalesce_max:
        max_days = F.coalesce(max_days, F.lit(0))
    alldata = table.groupBy(*group_cols).agg(
        F.count("*").alias("total_rows"),
        F.avg(days).alias("avg_days"),
        max_days.alias("max_days"),
    )
    constb = (
        table.filter(days > stale_days)
        .groupBy(*group_cols)
        .agg(F.count("*").alias(f"rows_older_than{stale_days}"))
    )
    cond = None
    for c in group_cols:
        eq = alldata[c] == constb[c]  # null-unsafe, per the reference
        cond = eq if cond is None else (cond & eq)
    return alldata.join(constb, cond, "left").select(
        *[alldata[c] for c in group_cols],
        "total_rows", "avg_days", "max_days",
        f"rows_older_than{stale_days}",
    )


def audit_changelog(
    old: DataFrame,
    new: DataFrame,
    key: str = "id",
    carry_cols: tuple[str, ...] = ("store", "store_id"),
    update_cols: tuple[str, ...] = ("crawl_result",),
) -> DataFrame:
    """Snapshot-diff changelog of a state table — the lake equivalent
    of the ``process_store_app_audit`` trigger
    (full_db_dump.sql:101-155): 'D' rows for keys present only in the
    old snapshot, 'I' for keys only in the new one, 'U' for keys in
    both whose tracked columns changed (null-safe compare).  Mirrors
    the trigger's column quirk: D/I rows carry only the identity
    columns, U rows additionally carry the new ``crawl_result``."""
    o = old.select(
        F.col(key).alias("_k"),
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in carry_cols],
        *[F.col(c).alias(f"_ou_{c}") for c in update_cols],
    )
    n = new.select(
        F.col(key).alias("_k"),
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in carry_cols],
        *[F.col(c).alias(f"_nu_{c}") for c in update_cols],
    )
    j = o.join(n, "_k", "full_outer")
    in_old = F.coalesce(F.col("_in_old"), F.lit(False))
    in_new = F.coalesce(F.col("_in_new"), F.lit(False))
    changed = F.lit(False)
    for c in update_cols:
        changed = changed | ~F.col(f"_ou_{c}").eqNullSafe(F.col(f"_nu_{c}"))
    op = (
        F.when(in_old & ~in_new, F.lit("D"))
        .when(~in_old & in_new, F.lit("I"))
        .when(in_old & in_new & changed, F.lit("U"))
    )
    out = j.select(
        op.alias("op"),
        F.col("_k").alias(key),
        # D rows carry the OLD identity columns, I/U the NEW ones
        # (the trigger reads OLD.* on delete, NEW.* otherwise)
        *[
            F.when(op == "D", F.col(f"_o_{c}"))
            .otherwise(F.col(f"_n_{c}"))
            .alias(c)
            for c in carry_cols
        ],
        *[
            F.when(op == "U", F.col(f"_nu_{c}")).alias(c)
            for c in update_cols
        ],
    )
    return out.filter(F.col("op").isNotNull())


def extract_scheme(col) -> F.Column:
    """public.extract_scheme (full_db_dump.sql:82-95): lowercase URL
    scheme before '://', NULL when absent."""
    return F.lower(F.nullif(F.regexp_extract(col, r"^([^:]+)://", 1),
                            F.lit("")))
