"""SDK version-details pipeline — the reference's S3/DuckDB batch
artifacts (process/version_details.py) as distributed plans.

The reference compacts per-version string maps into bucket-partitioned
parquet, pattern-matches the string dictionary against the SDK pattern
dims (the three-branch scan already ported as the ``sdk_pattern_scan``
battery entry), joins the map with the matches into
``matched-sdk-strings`` (:385-442), and derives the per-app latest
slice (:442-508).  Here each artifact is one DataFrame plan; the
string-bucket CASE (:60-77) becomes a column function so writers can
``partitionBy`` the same layout.

Scale notes: the map→codes join hashes on version_code_id and the
matches join on string_id — both keys the artifacts are already
sorted/bucketed by in the reference layout, which on Spark is bucketed
writes reusing the shuffle; the latest slice is a dense_rank window
per store_app (distributes across apps)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# process/version_details.py:49-57
BUCKET_BOUNDARIES = [0, 50_000_000, 100_000_000, 200_000_000,
                     500_000_000, 1_000_000_000, 2_000_000_000]


def string_bucket(col, boundaries: list[int] | None = None) -> Column:
    """The width-4 zero-padded million-bucket label
    (process/version_details.py:60-77): '0000M-0050M' …, ids past the
    last boundary land in '2000M-plus'."""
    bs = boundaries or BUCKET_BOUNDARIES

    def label(lo: int, hi: int) -> str:
        return f"{lo // 1_000_000:04d}M-{hi // 1_000_000:04d}M"

    expr = F.lit(f"{bs[-1] // 1_000_000:04d}M-plus")
    for lo, hi in reversed(list(zip(bs[:-1], bs[1:]))):
        expr = F.when(
            (F.col(col) >= lo) & (F.col(col) < hi), F.lit(label(lo, hi))
        ).otherwise(expr)
    return expr


def matched_app_sdk_strings(
    version_details_map: DataFrame,
    version_codes: DataFrame,
    pattern_matches: DataFrame,
) -> DataFrame:
    """version-details map × version codes × pattern matches →
    (store_app, version_code_id, string_id, sdk_id,
    version_code_created_at); unmatched strings keep NULL sdk_id
    (process/version_details.py:385-442 build_matched_app_sdk_strings:
    inner join on the codes lookup, LEFT join on the matches)."""
    return (
        version_details_map.select("version_code_id", "string_id")
        .join(
            version_codes.select(
                F.col("id").alias("version_code_id"), "store_app",
                F.col("created_at").alias("version_code_created_at"),
            ),
            "version_code_id",
        )
        .join(
            pattern_matches.select("string_id", "sdk_id"),
            "string_id", "left",
        )
        .select(
            "store_app", "version_code_id", "string_id", "sdk_id",
            "version_code_created_at",
        )
    )


def matched_app_sdk_strings_latest(
    matched: DataFrame, version_codes: DataFrame
) -> DataFrame:
    """Per-app latest slice: keep only rows of each app's newest
    version code — DENSE_RANK over (created_at DESC, id DESC) = 1,
    exactly the reference's QUALIFY
    (process/version_details.py:442-508)."""
    w = Window.partitionBy("store_app").orderBy(
        F.col("created_at").desc(), F.col("id").desc()
    )
    latest_vc = (
        version_codes.withColumn("_dr", F.dense_rank().over(w))
        .filter(F.col("_dr") == 1)
        .select("store_app", F.col("id").alias("version_code_id"))
    )
    return matched.join(
        latest_vc, ["store_app", "version_code_id"]
    ).select("store_app", "string_id", "sdk_id")
