"""MERGE-style sinks over the snapshot catalog (SURVEY.md S4/S6/S7).

The reference's Postgres sinks — ``upsert_df`` (INSERT … ON CONFLICT,
/root/reference/adscrawler/dbcon/queries.py:334-476), ``update_from_df``
(queries.py:163-276) and ``delete_and_insert`` (queries.py:533-579) —
collapse onto one Iceberg-shaped operation: read the current snapshot,
resolve key conflicts deterministically, atomically overwrite.  On real
Iceberg these are literal ``MERGE INTO`` / ``replaceWhere``; the
snapshot catalog reproduces the semantics (and the atomicity) with a
copy-on-write commit, which is also exactly what Iceberg CoW does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from adscrawler_spark.sources.catalog import SnapshotTable


def upsert(
    spark: SparkSession,
    table: SnapshotTable,
    src: DataFrame,
    keys: list[str],
    update: bool = True,
    touch_col: str | None = None,
    touch_value: str | None = None,
) -> int:
    """INSERT … ON CONFLICT(keys) DO UPDATE (update=True) / DO NOTHING
    (update=False). Source rows win on conflict when updating; within
    the source, duplicates resolve to an arbitrary-but-deterministic
    single row (xxhash64 tie-break), mirroring the reference's
    drop_duplicates-before-upsert discipline.

    ``touch_col``/``touch_value`` reproduce the reference's
    ``update_modified_column()`` BEFORE UPDATE triggers (pg-ddl:
    ``*_updated_at`` on store_apps, developers, version_codes,
    app_ads_entrys/map, app_urls_map): a source row that REPLACES an
    existing keyed row gets touch_col stamped to touch_value (a
    deterministic timestamp string the caller supplies — the trigger's
    CURRENT_TIMESTAMP, parameterized); fresh inserts keep their source
    value, matching the trigger firing only on UPDATE."""
    current = table.read(spark)
    src = src.withColumn("_pri", F.lit(1 if update else 0))
    if current is None:
        merged = src
    else:
        merged = current.withColumn("_pri", F.lit(0 if update else 1)).unionByName(
            src, allowMissingColumns=True
        )
    w = Window.partitionBy(*keys).orderBy(
        F.desc("_pri"), F.xxhash64(*[F.col(c) for c in merged.columns])
    )
    resolved = merged.withColumn("_rn", F.row_number().over(w))
    if touch_col is not None and update and current is not None:
        # a key is "matched" when a CURRENT row (_pri=0 in update mode)
        # carries it too — source-internal duplicates are inserts and
        # must not be stamped
        n_current = F.sum(
            F.when(F.col("_pri") == 0, 1).otherwise(0)
        ).over(Window.partitionBy(*keys))
        resolved = resolved.withColumn(
            touch_col,
            F.when(
                (F.col("_pri") == 1) & (n_current > 0),
                F.to_timestamp(F.lit(touch_value)),
            ).otherwise(F.col(touch_col)),
        )
    resolved = resolved.filter("_rn = 1").drop("_rn", "_pri")
    return table.overwrite(resolved, {"op": "upsert", "keys": keys})


def update_matched(
    spark: SparkSession,
    table: SnapshotTable,
    src: DataFrame,
    keys: list[str],
    set_cols: list[str],
) -> int:
    """UPDATE … SET set_cols WHERE keys match (matched-only MERGE)."""
    current = table.read(spark)
    if current is None:
        raise ValueError(f"{table.name}: update on empty table")
    upd = src.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        *[F.col(c).alias(f"_v_{c}") for c in set_cols],
    ).dropDuplicates([f"_k_{k}" for k in keys])
    cond = [current[k] == upd[f"_k_{k}"] for k in keys]
    joined = current.join(upd, cond, "left")
    out = joined.select(
        *[
            F.coalesce(F.col(f"_v_{c}"), current[c]).alias(c)
            if c in set_cols
            else current[c]
            for c in current.columns
        ]
    )
    return table.overwrite(out, {"op": "update", "keys": keys})


def delete_and_insert(
    spark: SparkSession,
    table: SnapshotTable,
    src: DataFrame,
    keys: list[str],
) -> int:
    """Partition-replace by key values (queries.py:533-579): drop every
    current row whose key appears in src, then insert src."""
    current = table.read(spark)
    if current is None:
        return table.overwrite(src, {"op": "delete_insert", "keys": keys})
    key_set = src.select(*keys).dropDuplicates()
    kept = current.join(key_set, keys, "left_anti")
    return table.overwrite(
        kept.unionByName(src, allowMissingColumns=True),
        {"op": "delete_insert", "keys": keys},
    )
