"""Processed-file ledger (SURVEY.md S14/S15).

The reference records every imported S3 object in
``s3_processed_files`` and left-anti-joins new listings against it
(/root/reference/adscrawler/process/storage.py:702-765,
app_details.py:196-249); failed imports stay status='failed' and are
retried next run.  Same semantics here over a snapshot table:
``filter_unprocessed`` is a broadcast-able anti-join on
(pipeline, file_path) restricted to succeeded entries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adscrawler_spark.sources.catalog import Catalog

LEDGER_SCHEMA = (
    "pipeline string, file_path string, status string, etag string, "
    "processed_at timestamp"
)


def record(
    cat: Catalog, spark: SparkSession, pipeline: str,
    files: list[tuple[str, str]], status: str, now: str,
) -> None:
    """Append (file, etag) outcomes for a pipeline run."""
    rows = [(pipeline, f, status, etag) for f, etag in files]
    df = spark.createDataFrame(
        rows, "pipeline string, file_path string, status string, etag string"
    ).withColumn("processed_at", F.to_timestamp(F.lit(now)))
    cat.table("ledger").append(df, {"pipeline": pipeline, "status": status})


def filter_unprocessed(
    cat: Catalog, spark: SparkSession, pipeline: str, candidates: DataFrame,
    path_col: str = "file_path",
) -> DataFrame:
    """Candidates not yet successfully processed (failed rows are
    retried, mirroring app_details.py:240-249)."""
    ledger = cat.table("ledger").read(spark)
    if ledger is None:
        return candidates
    done = (
        ledger.filter(
            (F.col("pipeline") == pipeline) & (F.col("status") == "success")
        )
        .select(F.col("file_path").alias(path_col))
        .dropDuplicates()
    )
    return candidates.join(done, path_col, "left_anti")
