"""Object-store maintenance decisions — the relational cores of the
reference's storage helpers (process/storage.py).

The reference drives boto3 against live buckets; the engine computes
the same decisions as plans over listing tables (the
apk_inventory.py pattern) and leaves the API calls to the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

S3_DELETE_CHUNK = 1000  # storage.py:194 — the S3 batch-delete API limit


def weekly_monday_prefixes(ranges: DataFrame) -> DataFrame:
    """delete_s3_objects_by_date_range's prefix build
    (process/storage.py:163-183): one ``{prefix}/week_start=%Y-%m-%d/``
    per weekly Monday inside [start_date_mon, end_date] — the
    pd.date_range(freq='W-MON') anchor yields every Monday in the
    closed interval.  ``ranges``: (prefix, start_date, end_date)."""
    days = F.explode(
        F.sequence(
            F.col("start_date"), F.col("end_date"), F.expr("interval 1 day")
        )
    )
    return (
        ranges.select("prefix", days.alias("day"))
        .filter(F.dayofweek("day") == 2)  # Spark: 1=Sunday, 2=Monday
        .select(
            "prefix",
            F.concat(
                F.col("prefix"), F.lit("/week_start="),
                F.date_format("day", "yyyy-MM-dd"), F.lit("/"),
            ).alias("delete_prefix"),
        )
    )


def date_range_delete_plan(
    listing: DataFrame, ranges: DataFrame, chunk_size: int = S3_DELETE_CHUNK
) -> DataFrame:
    """delete_s3_objects_by_date_range (process/storage.py:163-200):
    keys under any weekly-Monday prefix are deleted in batches of
    1000 (the S3 API limit).  The reference walks prefixes in Monday
    order collecting keys, then chunks the flat list — the engine
    reproduces that order as (delete_prefix asc, s3_key asc) and
    emits (s3_key, chunk_idx) decision rows.

    The prefix probe is an equi-join on the extracted
    ``week_start=`` partition token, not a prefix-LIKE theta join —
    partition-prunable at any listing size."""
    keyed = listing.withColumn(
        "_wk_prefix",
        F.regexp_extract(F.col("s3_key"), r"^(.*/week_start=\d{4}-\d{2}-\d{2}/)", 1),
    ).filter(F.col("_wk_prefix") != "")
    matched = keyed.join(
        F.broadcast(ranges.select(F.col("delete_prefix").alias("_wk_prefix"))),
        "_wk_prefix",
    )
    # global chunk index without a single-partition global sort: a
    # per-prefix row_number plus a prefix-offset prefix-sum (the
    # offsets table is one row per weekly prefix — tiny, so its
    # unpartitioned running-sum window is O(#prefixes), the same
    # two-phase shape as frontier.ranked_top_n)
    w_in = Window.partitionBy("_wk_prefix").orderBy(F.asc("s3_key"))
    w_off = Window.orderBy(F.asc("_wk_prefix")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        matched.groupBy("_wk_prefix")
        .agg(F.count("*").alias("_n"))
        .withColumn("_offset", F.coalesce(F.sum("_n").over(w_off), F.lit(0)))
        .select("_wk_prefix", "_offset")
    )
    return (
        matched.withColumn("_rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "_wk_prefix")
        .select(
            "s3_key",
            F.floor((F.col("_offset") + F.col("_rn") - 1) / chunk_size)
            .alias("chunk_idx"),
        )
    )


def mitm_upload_reconciliation(
    local_files: DataFrame, latest_scans: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """get_downloaded_mitm_files (process/storage.py:315-333): local
    ``traffic_{store_id}.log`` captures split into the uploadable set
    (a latest api-scan row exists → run attribution is known) and the
    missing set (no scan row — surfaced, not silently dropped).
    ``local_files``: (file_name,); ``latest_scans``: per-store_id
    scan rows carrying at least (store_id,)."""
    stems = local_files.filter(
        F.col("file_name").rlike(r"^traffic_.+\.log$")
    ).select(
        F.regexp_extract(F.col("file_name"), r"^traffic_(.+)\.log$", 1)
        .alias("store_id")
    )
    uploadable = stems.join(latest_scans, "store_id", "inner")
    missing = stems.join(latest_scans.select("store_id"), "store_id",
                         "left_anti")
    return uploadable, missing


def apk_keys_with_version(listing: DataFrame) -> DataFrame:
    """get_store_id_apk_s3_keys' key parse (process/storage.py:
    447-482): version_code is the 4th path segment, ``unknown`` when
    the key is too shallow; size and last_modified ride along."""
    parts = F.split(F.col("s3_key"), "/")
    return listing.select(
        "s3_key",
        F.element_at(parts, 3).alias("store_id"),
        F.when(F.size(parts) >= 4, F.element_at(parts, 4))
        .otherwise(F.lit("unknown")).alias("version_code"),
        "size",
        "last_modified",
    )
