"""App-icon inventory: variant refresh planning and S3↔DB
reconciliation — the relational cores of the reference's icon jobs
(app_stores/process_icons.py, packages/apks/cleanup_app_icons.py).

The reference walks the ``app-icons/`` prefix into a per-store_id
{128, 64} latest-file map, cross-references every store_apps row in
both directions (restore DB from S3 files; nullify DB columns whose
files vanished), and separately refreshes missing 128/64 variants by
downloading the 512px source and resizing.

Spark-first: the S3 walk's "keep the most recent per (store_id,
size)" fold becomes a window dedup + pivot; the per-row Python
cross-reference loop becomes one left join emitting three decision
sets; the refresh becomes a filter + pluggable fetch stage (the
download/resize/phash is the engine's multimodal codec plug-point —
network and PIL stay outside the plan, exactly like
operators/multimodal.py).

Determinism note: the reference's walk keeps the FIRST-seen file on
equal last_modified because S3 lists keys lexicographically and the
fold only replaces on strictly-greater timestamps
(cleanup_app_icons.py:92-94); the engine pins the same rule as
(last_modified desc, s3_key asc).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ICON_PREFIX = "app-icons"

# process_app_icon (process_icons.py:126-130): control characters are
# stripped from stored URLs.  Python's isprintable() excludes Unicode
# category C (control/format) and Z (separators) except the allowlist
# keeps a plain space — Java char-class intersection expresses that.
_CONTROL_CHARS = r"[\p{C}\p{Z}&&[^ ]]"


def sanitize_icon_url(col):
    """Strip non-printable/control characters embedded in stored
    icon URLs (process_icons.py:126-130) — JVM regexp, no UDF."""
    return F.regexp_replace(col, _CONTROL_CHARS, "")


def latest_icon_variants(listing: DataFrame) -> DataFrame:
    """list_all_icons_from_s3 (cleanup_app_icons.py:56-96): parse
    ``app-icons/{store_id}/{phash}_{size}.png`` keys, keep the most
    recent file per (store_id, size), and pivot to one row per
    store_id with (filename_128, filename_64) — absent variants are
    NULL, exactly the reference's missing dict keys."""
    parts = F.split(F.col("s3_key"), "/")
    parsed = (
        listing.withColumn("filename", F.element_at(parts, -1))
        .withColumn("store_id", F.element_at(parts, -2))
        .withColumn(
            "size_key",
            F.when(F.col("filename").endswith("_128.png"), "128")
            .when(F.col("filename").endswith("_64.png"), "64"),
        )
        .filter(F.col("size_key").isNotNull())
    )
    w = Window.partitionBy("store_id", "size_key").orderBy(
        F.col("last_modified").desc(), F.col("s3_key").asc()
    )
    latest = (
        parsed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("store_id", "size_key", "filename")
    )
    return (
        latest.groupBy("store_id")
        .pivot("size_key", ["128", "64"])
        .agg(F.first("filename"))
        .withColumnRenamed("128", "filename_128")
        .withColumnRenamed("64", "filename_64")
    )


def _blankish(col):
    # pd.isna(x) or not x — NULL and empty string both count as missing
    return col.isNull() | (col == "")


def icon_cross_reference(
    apps: DataFrame, s3_icons: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """cross_reference (cleanup_app_icons.py:124-177) as one left
    join emitting three decision sets:

    * restores — (id, icon_128, icon_64) where the DB column is
      NULL/empty but S3 has the variant (unset side stays NULL);
    * null_128 / null_64 — ids whose DB filename has no S3 file.

    ``apps`` carries (id, store_id, icon_128, icon_64);
    ``s3_icons`` is latest_icon_variants' output.
    """
    joined = apps.join(
        s3_icons.select(
            "store_id", "filename_128", "filename_64",
            F.lit(True).alias("_has_entry"),
        ),
        "store_id",
        "left",
    )
    restore_128 = _blankish(F.col("icon_128")) & F.col("filename_128").isNotNull()
    restore_64 = _blankish(F.col("icon_64")) & F.col("filename_64").isNotNull()
    restores = (
        joined.filter(F.col("_has_entry").isNotNull() & (restore_128 | restore_64))
        .select(
            "id",
            F.when(restore_128, F.col("filename_128")).alias("icon_128"),
            F.when(restore_64, F.col("filename_64")).alias("icon_64"),
        )
    )
    null_128 = (
        joined.filter(
            F.col("icon_128").isNotNull() & F.col("filename_128").isNull()
        ).select("id")
    )
    null_64 = (
        joined.filter(
            F.col("icon_64").isNotNull() & F.col("filename_64").isNull()
        ).select("id")
    )
    return restores, null_128, null_64


def apps_needing_icon_variants(apps: DataFrame) -> DataFrame:
    """build_icon_update_df's needs-update filter
    (process_icons.py:240-247): a 512px source exists and at least
    one small variant is missing."""
    out = apps
    for col in ("icon_128", "icon_64"):
        if col not in out.columns:
            out = out.withColumn(col, F.lit(None).cast("string"))
    return out.filter(
        F.col("icon_url_512").isNotNull()
        & (F.col("icon_128").isNull() | F.col("icon_64").isNull())
    )


def default_icon_fetcher(url_col):
    """Deterministic stand-in for process_app_icon's download +
    resize + phash (process_icons.py:113-221): the real path needs
    network and PIL (outside this environment — see
    operators/multimodal.py's documented codec plug-point).  The
    fake derives the phash from the sanitized URL so the filename
    pair is stable; a deterministic residue models fetch failure.
    Returns (icon_128, icon_64) columns (NULL pair on failure)."""
    clean = sanitize_icon_url(url_col)
    ok = F.pmod(F.abs(F.xxhash64(clean)), F.lit(5)) != 0
    phash = F.md5(clean)
    return (
        F.when(ok, F.concat(phash, F.lit("_128.png"))),
        F.when(ok, F.concat(phash, F.lit("_64.png"))),
    )


def build_icon_updates(
    apps: DataFrame,
    fetcher: Callable = default_icon_fetcher,
) -> DataFrame:
    """build_icon_update_df (process_icons.py:222-271): fetch/resize
    each app needing variants, keep rows where at least one variant
    was produced.  ``fetcher`` maps the icon_url_512 column to an
    (icon_128, icon_64) column pair — swap in an Arrow-UDF-backed
    real fetcher outside tests."""
    todo = apps_needing_icon_variants(apps)
    f128, f64 = fetcher(F.col("icon_url_512"))
    return (
        todo.select(
            F.col("id").cast("long").alias("id"),
            f128.alias("icon_128"),
            f64.alias("icon_64"),
        )
        .filter(F.col("icon_128").isNotNull() | F.col("icon_64").isNotNull())
    )


def icon_crawl_log(apps: DataFrame, now: str) -> DataFrame:
    """refresh_app_icons' logging upsert rows
    (process_icons.py:306-316): every queried app gets a crawled_at
    stamp regardless of fetch success."""
    return apps.select(
        F.col("id").alias("store_app"),
        F.to_timestamp(F.lit(now)).alias("crawled_at"),
    )
