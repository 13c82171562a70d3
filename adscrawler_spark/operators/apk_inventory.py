"""APK/IPA object-store inventory reconciliation — the relational
core of the reference's cleanup job (packages/apks/cleanup_apks.py).

The reference lists two object stores (primary "loki", archive
"thirdgate"), parses store_id/versionstr out of each key path,
deletes primary copies already archived, classifies S3↔DB
disagreements into four delete classes plus one crawl_result
repair, and atomically swaps the day's merged inventory partition.

Spark-first: the key parsing is JVM ``split``/``element_at``; the
"latest duplicate per store_id" is a window dedup; every class is an
anti-/semi-join returning *decision rows* (which keys to delete,
which version_codes to repair) — the engine computes the plan, an
external actuator applies object deletions, exactly as the
reference separates list/classify from ``delete_s3_apks``.

Scale notes: inventories join on (store_id, versionstr) — high
cardinality, hash-shuffle both sides; no driver-side key lists (the
reference's ``unique().tolist()`` becomes a distinct DataFrame that
feeds the deletion actuator as a stream of batches).

Determinism deviation (documented): the reference's duplicate pick
sorts by last_modified desc with pandas quicksort and keeps the
first row, leaving equal-timestamp order unspecified
(cleanup_apks.py:95-100); the engine breaks ties by s3_key desc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_apk_keys(listing: DataFrame) -> DataFrame:
    """get_s3_apk_paths key parsing (cleanup_apks.py:47-49): the last
    three path segments are file_path / versionstr / store_id."""
    parts = F.split(F.col("s3_key"), "/")
    return (
        listing.withColumn("file_path", F.element_at(parts, -1))
        .withColumn("versionstr", F.element_at(parts, -2))
        .withColumn("store_id", F.element_at(parts, -3))
    )


def copied_apk_deletions(ldf: DataFrame, tdf: DataFrame) -> DataFrame:
    """delete_copied_apks (cleanup_apks.py:93-112): among primary
    keys duplicated per store_id, take the latest copy; if that
    (store_id, versionstr) is already archived, the key is
    deletable.  Returns distinct s3_key rows."""
    w = Window.partitionBy("store_id")
    wo = w.orderBy(F.col("last_modified").desc(), F.col("s3_key").desc())
    latest_dupes = (
        ldf.withColumn("store_id_count", F.count("*").over(w))
        .withColumn("rn", F.row_number().over(wo))
        .filter((F.col("store_id_count") > 1) & (F.col("rn") == 1))
        .select("store_id", "versionstr", "s3_key")
    )
    return (
        latest_dupes.join(
            tdf.select("store_id", "versionstr").dropDuplicates(),
            ["store_id", "versionstr"],
            "inner",
        )
        .select("s3_key")
        .dropDuplicates()
    )


def file_cleanup_classes(
    sdf: DataFrame, vcdf: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """file_cleanup (cleanup_apks.py:114-178): classify S3↔DB
    disagreements.  Returns (deletions, repairs):

    * deletions — distinct (s3_key, reason) rows for the four delete
      classes: ``unrecorded`` (store_id never in DB),
      ``incorrectly_recorded`` (store_id has no crawl_result=1 row),
      ``no_version_code`` (key's versionstr matches no DB
      version_code for that store_id), ``no_successful_crawl``
      (matched row's crawl_result ≠ 1);
    * repairs — DB rows with crawl_result=1 but no file in S3, to be
      upserted with crawl_result=-2.
    """
    s = sdf.select("s3_key", "store_id", "versionstr")
    vc = vcdf.select(
        "id", "store_app", "store_id", "version_code", "crawl_result",
        "created_at",
    )
    recorded_ids = vc.select("store_id").dropDuplicates()
    success_ids = (
        vc.filter(F.col("crawl_result") == 1).select("store_id").dropDuplicates()
    )
    unrecorded = s.join(recorded_ids, "store_id", "left_anti").select(
        "s3_key", F.lit("unrecorded").alias("reason")
    )
    incorrect = s.join(success_ids, "store_id", "left_anti").select(
        "s3_key", F.lit("incorrectly_recorded").alias("reason")
    )
    joined = s.join(
        vc,
        (s["store_id"] == vc["store_id"])
        & (s["versionstr"] == vc["version_code"]),
        "full_outer",
    )
    no_vc = (
        joined.filter(
            F.col("versionstr").isNotNull() & F.col("version_code").isNull()
        )
        .select("s3_key", F.lit("no_version_code").alias("reason"))
    )
    # pandas `NaN != 1` is True, so the reference's class includes the
    # unmatched rows too (they are also in no_version_code — the
    # reference deletes both lists; the labels overlap identically)
    no_success = (
        joined.filter(
            F.col("versionstr").isNotNull()
            & (F.col("crawl_result").isNull() | (F.col("crawl_result") != 1))
        )
        .select("s3_key", F.lit("no_successful_crawl").alias("reason"))
    )
    deletions = (
        unrecorded.unionByName(incorrect)
        .unionByName(no_vc)
        .unionByName(no_success)
        .dropDuplicates()
    )
    repairs = (
        joined.filter(
            F.col("versionstr").isNull() & (F.col("crawl_result") == 1)
        )
        .select(
            "id", "store_app", "version_code", "created_at",
            F.lit(-2).cast("int").alias("crawl_result"),
        )
    )
    return deletions, repairs


def package_inventory(
    listings: dict[str, DataFrame],
    version_codes: DataFrame,
    batch_date: str,
) -> DataFrame:
    """run_cleanup's inventory build (cleanup_apks.py:232-287):
    region-tag each store's listing, union, left-join version_codes
    on (store_id, versionstr = version_code), drop unmatched keys
    and emit the s3_package_inventory partition for ``batch_date``
    (the write side uses the engine's atomic partition swap, S8)."""
    tagged = None
    for region, df in listings.items():
        t = df.withColumn("myregion", F.lit(region))
        tagged = t if tagged is None else tagged.unionByName(t)
    vc = version_codes.select(
        F.col("id").alias("version_code_id"), "store_app", "store_id",
        "version_code",
    )
    return (
        tagged.join(
            vc,
            (tagged["store_id"] == vc["store_id"])
            & (tagged["versionstr"] == vc["version_code"]),
            "left",
        )
        .filter(F.col("version_code_id").isNotNull())
        .select(
            F.col("store_app").cast("long"),
            F.col("version_code_id").cast("long"),
            "versionstr", "myregion",
            F.col("s3_key").alias("file_key"),
            "last_modified",
            F.lit(batch_date).cast("date").alias("batch_date"),
        )
    )
