"""Structured Streaming surface (SURVEY.md §2.10 note).

The reference is batch-cron; its "windows" are calendar weeks computed
in batch, so streaming is optional sugar for this engine.  This module
provides the micro-batch streaming shape anyway for completeness: a
file-stream source over an events directory, watermarked tumbling-
window aggregation, and a ``foreachBatch`` sink that commits each
micro-batch through the snapshot catalog (the same atomic-commit
discipline as the crawl loop).

Run with ``trigger(availableNow=True)`` in tests: processes everything
currently in the directory as micro-batches, then stops — equivalent
results to the batch groupBy, which the test asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adscrawler_spark.sources.catalog import Catalog


def windowed_event_counts_stream(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream → watermark → tumbling-window counts per event_type.

    The watermark bounds state: late rows beyond it are dropped, so
    executor state stays O(active windows), which is what makes this
    viable on an unbounded 100TB/day stream."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_available_now(
    agg: DataFrame, out_dir: str, checkpoint_dir: str, table: str = "event_windows"
) -> None:
    """Drain the stream with availableNow, committing each micro-batch
    atomically via the snapshot catalog (foreachBatch sink)."""
    cat = Catalog(out_dir)

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # complete output mode re-emits the full result per micro-batch;
        # the atomic snapshot overwrite makes the last commit the table.
        cat.table(table).overwrite(batch_df, {"stream_batch": batch_id})

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def batch_equivalent(spark: SparkSession, events_dir: str, schema: str,
                     window: str = "1 hour") -> DataFrame:
    """The batch twin of the streaming aggregation (for parity tests)."""
    ev = spark.read.schema(schema).parquet(events_dir)
    return (
        ev.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
