"""Package-download management: the source ladder, version gate,
result-code mapping and persistence rows of the reference's APK/IPA
download flows (packages/apks/download_apk.py,
packages/ipas/download_ipa.py, packages/utils.py,
dbcon/queries.py:641-681, process/storage.py:276-314).

The downloads themselves (gplaydl/apkpure/apkmirror fetches, apktool
decode, ipatool) are external binaries and network I/O — outside the
engine, exactly like the multimodal codec plug-point.  The engine
plans over *attempt outcome* tables (per (store_id, source) download
results and per-store_id unpack results, synthesized deterministically
in tests/battery) and emits the decision rows the reference persists:
version_codes upsert rows, store_app_downloads log rows, S3 upload
keys, and main-dir routing.

Spark-first: the reference's per-app try/except ladder
(download_apk.py:281-319 ``external_download``) becomes a first-
success window over source-ordered attempts; the
ExistingOrOlderVersionError short-circuit (the gplaydl version gate,
:246-254) becomes a gate column that overrides the whole ladder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# download_apk.py:36 — ladder order is part of the spec
APK_SOURCES = ["gplaydl", "apkpure", "apkmirror"]
FAILED_VERSION_STR = "-1"  # download_apk.py:41


def coerce_version_code(col: Column) -> Column:
    """_coerce_version_code (download_apk.py:60-66): strip, then
    digits-only strings parse, anything else is NULL."""
    t = F.trim(col)
    return F.when(t.rlike("^[0-9]+$"), t.cast("long"))


def _source_rank() -> Column:
    m = F.create_map(
        *[x for i, s in enumerate(APK_SOURCES) for x in (F.lit(s), F.lit(i))]
    )
    return m[F.col("source")]


def android_download_results(
    frontier: DataFrame, attempts: DataFrame, post: DataFrame
) -> DataFrame:
    """manage_apk_download + external_download
    (download_apk.py:122-180,281-319) as one plan.

    ``frontier``: (store_app, store_id, last_downloaded_version_code).
    ``attempts``: per (store_id, source) download outcomes —
    (store_id, source, download_ok, available_version_code, ext);
    available_version_code is the gplaydl info probe (:74-85).
    ``post``: per-store_id unpack outcomes for downloaded files —
    (store_id, unzip_class ∈ ok|unzip_missing|unzip_error|other,
    version_str, md5_hash).

    Result-code spec (:144-168):
    * version gate hit (available <= last, gplaydl) → crawl_result 1
      with version_str = str(last_code), nothing downloaded;
    * every source failed → HTTPError → 2;
    * downloaded, apktool ok → 1 with version + md5;
    * downloaded, apktool.yml missing (FileNotFoundError) → 1 with
      the FAILED version and no hash;
    * downloaded, apktool non-zero (CalledProcessError) → 3;
    * anything else → 3.
    error_count (:161-166): 2 → 2, 3/4 → 1, 1 → 0.
    """
    last_code = coerce_version_code(F.col("last_downloaded_version_code"))
    f = frontier.select(
        "store_app", "store_id", last_code.alias("last_code")
    )

    gate = (
        attempts.filter(F.col("source") == "gplaydl")
        .join(f.select("store_id", "last_code"), "store_id")
        .filter(
            F.col("last_code").isNotNull()
            & F.col("available_version_code").isNotNull()
            & (F.col("available_version_code") <= F.col("last_code"))
        )
        .select("store_id", F.lit(True).alias("gate_hit"))
        .distinct()
    )

    w = Window.partitionBy("store_id").orderBy(F.asc("rank"))
    winner = (
        attempts.filter(F.col("download_ok"))
        .withColumn("rank", _source_rank())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("store_id", F.col("source").alias("won_source"), "ext")
    )

    joined = (
        f.join(gate, "store_id", "left")
        .join(winner, "store_id", "left")
        .join(post, "store_id", "left")
    )
    gated = F.col("gate_hit").isNotNull()
    # the gate raises before any source runs, so a gated app never
    # downloads even when a later source would have succeeded
    downloaded = ~gated & F.col("won_source").isNotNull()
    cls = F.col("unzip_class")
    crawl_result = (
        F.when(gated, 1)
        .when(~downloaded, 2)
        .when(cls == "ok", 1)
        .when(cls == "unzip_missing", 1)
        .otherwise(3)
    )
    version_str = (
        F.when(gated, F.col("last_code").cast("string"))
        .when(downloaded & (cls == "ok"), F.col("version_str"))
        .otherwise(F.lit(FAILED_VERSION_STR))
    )
    md5 = F.when(downloaded & (cls == "ok"), F.col("md5_hash"))
    path_ext = F.when(downloaded, F.col("ext"))
    error_count = (
        F.when(crawl_result == 2, 2)
        .when(crawl_result.isin(3, 4), 1)
        .otherwise(0)
    )
    return joined.select(
        "store_app",
        "store_id",
        F.lit(1).alias("store"),
        crawl_result.alias("crawl_result"),
        version_str.alias("version_str"),
        md5.alias("md5_hash"),
        path_ext.alias("ext"),
        error_count.alias("error_count"),
    )


def ios_download_results(frontier: DataFrame, attempts: DataFrame) -> DataFrame:
    """manage_ipa_download (download_ipa.py:32-86): single-source
    ladder with its own code map — ok → 1; HTTP/connection errors →
    3; unpack/download failures (FileNotFoundError, RuntimeError) →
    2; anything else → 3.  error_count: 3/4 → 3, 2 → 1, 1 → 0.  A
    missing plist version logs FAILED (-1) but stays crawl_result 1
    (:55-58).

    ``attempts``: (store_id, outcome_class ∈
    ok|http_error|conn_error|unpack_fail|other, version_str,
    md5_hash).
    """
    joined = frontier.select("store_app", "store_id").join(
        attempts, "store_id", "left"
    )
    cls = F.col("outcome_class")
    crawl_result = (
        F.when(cls == "ok", 1)
        .when(cls.isin("http_error", "conn_error"), 3)
        .when(cls == "unpack_fail", 2)
        .otherwise(3)
    )
    version_str = F.when(
        cls == "ok", F.coalesce(F.col("version_str"), F.lit(FAILED_VERSION_STR))
    ).otherwise(F.lit(FAILED_VERSION_STR))
    md5 = F.when(cls == "ok", F.col("md5_hash"))
    error_count = (
        F.when(crawl_result.isin(3, 4), 3)
        .when(crawl_result == 2, 1)
        .otherwise(0)
    )
    downloaded = cls == "ok"
    return joined.select(
        "store_app",
        "store_id",
        F.lit(2).alias("store"),
        crawl_result.alias("crawl_result"),
        version_str.alias("version_str"),
        md5.alias("md5_hash"),
        F.when(downloaded, F.lit("ipa")).alias("ext"),
        error_count.alias("error_count"),
    )


def version_code_rows(results: DataFrame) -> DataFrame:
    """insert_version_code's upsert rows (dbcon/queries.py:641-672):
    keyed (store_app, version_code), apk_hash carried when present;
    the version string falls back to FAILED before insert
    (manual_process_download, download_apk.py:88-104)."""
    return results.select(
        "store_app",
        F.coalesce("version_str", F.lit(FAILED_VERSION_STR)).alias(
            "version_code"
        ),
        "crawl_result",
        F.col("md5_hash").alias("apk_hash"),
    )


def download_log_rows(results: DataFrame) -> DataFrame:
    """log_download_crawl_results (dbcon/queries.py:675-681): the
    logging.store_app_downloads append — version_code fillna('-1'),
    exactly [store_app, version_code, crawl_result]."""
    return results.select(
        "store_app",
        F.coalesce("version_str", F.lit(FAILED_VERSION_STR)).alias(
            "version_code"
        ),
        "crawl_result",
    )


def s3_upload_keys(results: DataFrame) -> DataFrame:
    """upload_apk_to_s3's key layout (process/storage.py:276-314)
    under manual_process_download's gate (download_apk.py:105-117):
    uploaded iff a file was downloaded, crawl_result ∈ {1, 3} and an
    md5 exists.  Key = apks/{android|ios}/{store_id}/{version}/
    {store_id}_{md5}.{ext} — the exact layout
    operators/apk_inventory.py::parse_apk_keys parses back."""
    store_dir = F.when(F.col("store") == 1, "android").otherwise("ios")
    return (
        results.filter(
            F.col("ext").isNotNull()
            & F.col("crawl_result").isin(1, 3)
            & F.col("md5_hash").isNotNull()
        )
        .select(
            "store_app",
            F.concat(
                F.lit("apks/"), store_dir, F.lit("/"),
                F.col("store_id"), F.lit("/"),
                F.col("version_str"), F.lit("/"),
                F.col("store_id"), F.lit("_"), F.col("md5_hash"),
                F.lit("."), F.col("ext"),
            ).alias("s3_key"),
        )
    )


def main_dir_routing(results: DataFrame) -> DataFrame:
    """move_downloaded_app_to_main_dir (packages/utils.py:51-66):
    downloaded files route to the per-extension main directory."""
    dest = (
        F.when(F.col("ext") == "apk", "apks")
        .when(F.col("ext") == "xapk", "xapks")
        .when(F.col("ext") == "ipa", "ipas")
    )
    return results.filter(F.col("ext").isNotNull()).select(
        "store_app", "store_id", "ext", dest.alias("dest_dir")
    )


MAX_TOTAL_ERRORS = 11  # process_files.py:139 — the loop's break guard


def download_backoff_walk(results: DataFrame, order_col: str = "seq") -> DataFrame:
    """download_apps' sequential error-backoff accumulator
    (packages/process_files.py:116-141) as window algebra.  The loop
    keeps ``total_errors``: a clean app decrements it (floored at 0)
    and sleeps ``total+10``; a failing app adds its error_count and
    sleeps ``total²·5``; past 11 accumulated errors the loop breaks
    and later apps go unprocessed.

    The floored running total is the classic clamped prefix sum:
    with per-row delta d = error_count if >0 else −1,
    total_i = s_i − min(0, min_{j≤i} s_j) over prefix sums s —
    clamping only ever binds on decrements, so clamping at every
    step equals the reference's clamp-on-decrement.  The window is
    global by construction — the reference walks its top-N batch
    (20 apps) on one worker; this is the batch-orchestration shape,
    not a corpus-sized scan.

    Emits (order, error_count, total_errors, sleep_sec, processed).
    """
    o = F.col(order_col)
    w = Window.orderBy(o).rowsBetween(Window.unboundedPreceding, 0)
    w_prev = Window.orderBy(o).rowsBetween(
        Window.unboundedPreceding, -1
    )
    delta = F.when(F.col("error_count") > 0, F.col("error_count")).otherwise(
        F.lit(-1)
    )
    stepped = results.withColumn("_s", F.sum(delta).over(w))
    total = F.col("_s") - F.least(F.lit(0), F.min("_s").over(w))
    out = stepped.withColumn("total_errors", total).withColumn(
        "sleep_sec",
        F.when(
            F.col("error_count") > 0,
            F.col("total_errors") * F.col("total_errors") * 5,
        ).otherwise(F.col("total_errors") + 10),
    )
    broke_before = F.coalesce(
        F.max(
            F.when(F.col("total_errors") > MAX_TOTAL_ERRORS, 1).otherwise(0)
        ).over(w_prev),
        F.lit(0),
    )
    return out.withColumn("processed", broke_before == 0).drop("_s")
