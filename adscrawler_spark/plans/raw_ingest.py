"""Raw app-details / keywords lake pipeline — the relational core of
the reference's S3 parquet ingest (process/app_details.py:1-414).

The reference uploads per-(store, crawled_date, country) parquet files
to an ``_incoming/`` prefix, compacts them per country with DuckDB
into ``raw-data/app_details/`` partitioned by crawl_result, then
imports the ``country=US/crawl_result=1`` slice chunk-wise into
Postgres; keywords follow the same upload path and import through a
latest-per-(store, country, keyword, rank) dedup query.

Spark-first re-expression: the upload fan-out is a single
``partitionBy(store, crawled_date, country)`` write (no driver-side
groupby loops); the compaction is a partitioned rewrite with the
reference's copied==source row-count verification; the chunked import
becomes one distributed resolve plan (the chunking existed only to
bound driver memory); the keyword dedup is a groupBy + equi-join.

Scale notes: every step shuffles on the partition columns it writes,
so the 100 TB layout (store=2 × dates × ~50 countries) parallelizes
per partition; the compaction reads/writes only one (store, date)
subtree and never lists the whole lake; the keyword latest-dedup is
a partial-agg-friendly groupBy on low-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# process/__init__.py prefixes (RAW_DATA_*)
INCOMING_PREFIX = "raw-data/_incoming/app_details"
DETAILS_PREFIX = "raw-data/app_details"
KEYWORDS_PREFIX = "raw-data/keywords"

# process_chunk (app_details.py:262-266): new-app-only columns are
# dropped before the live-details upsert.
NEW_APP_ONLY_COLUMNS = ("icon_url_100", "icon_128", "icon_64")


def write_raw_details(df: DataFrame, root: str, store: int) -> None:
    """app_details_to_s3 (app_details.py:62-84) as one partitioned
    write: the reference's nested groupby(crawled_date)/groupby(
    country) upload loop is the partition layout itself."""
    (
        df.withColumn("store", F.lit(store))
        .withColumn("store_id", F.col("store_id").cast("string"))
        .repartition("crawled_date", "country")
        .write.mode("append")
        .partitionBy("store", "crawled_date", "country")
        .option("compression", "zstd")
        .parquet(f"{root}/{INCOMING_PREFIX}")
    )


def compact_incoming(
    spark: SparkSession, root: str, store: int, crawled_date: str
) -> dict[str, int]:
    """compact_incoming_app_details (app_details.py:85-166): rewrite
    one (store, crawled_date) incoming subtree into the compacted
    prefix partitioned by crawl_result, verifying the copied row
    count equals the source count before the incoming files may be
    deleted.  Returns {country: rows} for the log line parity.

    The reference loops countries and shells out to DuckDB per
    country; here one job reads the whole subtree (schema union by
    name is the Spark reader default for parquet with mergeSchema)
    and writes all countries' partitions in one pass.
    """
    src_path = (
        f"{root}/{INCOMING_PREFIX}/store={store}/"
        f"crawled_date={crawled_date}"
    )
    out_path = (
        f"{root}/{DETAILS_PREFIX}/store={store}/"
        f"crawled_date={crawled_date}"
    )
    src = spark.read.option("mergeSchema", "true").option(
        "basePath", f"{root}/{INCOMING_PREFIX}"
    ).parquet(src_path)
    (
        src.drop("store", "crawled_date")
        .repartition("country", "crawl_result")
        .write.mode("overwrite")
        .partitionBy("country", "crawl_result")
        .option("compression", "zstd")
        .parquet(out_path)
    )
    # copied == source verification (app_details.py:144-157)
    source_counts = {
        r["country"]: r["n"]
        for r in src.groupBy("country").agg(F.count("*").alias("n")).collect()
    }
    copied_counts = {
        r["country"]: r["n"]
        for r in spark.read.parquet(out_path)
        .groupBy("country")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    if source_counts != copied_counts or not copied_counts:
        raise ValueError(
            f"Row count mismatch! Source had {source_counts} rows, "
            f"but {copied_counts} were copied."
        )
    return copied_counts


def resolve_app_details(details: DataFrame) -> DataFrame:
    """process_chunk (app_details.py:252-290): keep crawl_result=1
    rows, resolve the store_app pk from the scraped-in
    store_app_db_id, drop the new-app-only icon columns, and drop
    rows whose store_id has no pk yet.  One distributed plan replaces
    the reference's 10k-row driver chunks — the chunking bounded
    pandas memory, not semantics."""
    out = details.filter(F.col("crawl_result") == 1)
    for col in NEW_APP_ONLY_COLUMNS:
        if col in out.columns:
            out = out.drop(col)
    return (
        out.withColumn("store_app", F.col("store_app_db_id").cast("long"))
        .filter(F.col("store_app").isNotNull())
        .drop("store_app_db_id")
    )


def latest_keyword_ranks(raw: DataFrame) -> DataFrame:
    """query_keywords_from_s3 (app_details.py:379-414): per (store,
    country, keyword_id, rank) keep the row with the latest
    crawled_at — a groupBy max + equi-join back, exactly the
    reference's CTE shape.  Partial aggregation keeps the shuffle to
    one row per key."""
    base = raw.filter(F.col("store_id").isNotNull()).alias("ar")
    latest = (
        base.groupBy("store", "country", "keyword_id", "rank")
        .agg(F.max("crawled_at").alias("latest_crawled_at"))
        .alias("lp")
    )
    return (
        base.join(
            latest,
            (F.col("ar.keyword_id") == F.col("lp.keyword_id"))
            & (F.col("ar.store") == F.col("lp.store"))
            & (F.col("ar.country") == F.col("lp.country"))
            & (F.col("ar.rank") == F.col("lp.rank"))
            & (F.col("ar.crawled_at") == F.col("lp.latest_crawled_at")),
        )
        .select(
            F.col("ar.crawled_date"),
            F.col("ar.country"),
            F.col("ar.store"),
            F.col("ar.rank").alias("app_rank"),
            F.col("ar.keyword_id"),
            F.col("ar.store_id"),
        )
    )


def resolve_keyword_ranks(
    kw: DataFrame,
    store_id_map: DataFrame,
    countries: DataFrame,
    store: int,
) -> DataFrame:
    """process_keywords (app_details.py:337-377): map country alpha2
    → country id and store_id → store_app pk; store_ids not yet in
    the map get the engine's deterministic surrogate (the reference
    inserts new apps and re-queries the map — check_and_insert_new_
    apps — which the lake expresses as an id back-fill, J10).

    ``store_id_map`` carries (store_id, id); ``countries`` carries
    (alpha2, id).  Both are dimension-sized → broadcast.
    """
    out = (
        kw.join(
            F.broadcast(store_id_map.select("store_id", F.col("id").alias("_sa"))),
            "store_id",
            "left",
        )
        .join(
            F.broadcast(
                countries.select(
                    F.col("alpha2").alias("country"),
                    F.col("id").alias("_cid"),
                )
            ),
            "country",
            "left",
        )
        .withColumn(
            "store_app",
            F.coalesce(
                F.col("_sa"),
                F.pmod(F.xxhash64("store_id"), F.lit(2**31)) + F.lit(2**31),
            ),
        )
        .withColumn("country", F.col("_cid"))
        .withColumn("store", F.lit(store))
        .drop("_sa", "_cid", "store_id")
    )
    return out.select(
        "country", "keyword_id", "store", "crawled_date", "store_app",
        "app_rank",
    )


def keyword_ranks_delete_insert(
    existing: DataFrame, incoming: DataFrame
) -> DataFrame:
    """delete_and_insert on (crawled_date, store)
    (app_details.py:361-377): drop every existing row whose
    (crawled_date, store) appears in the incoming batch, then append
    the batch — the reference's bulk replace for re-imported days."""
    keys = incoming.select("crawled_date", "store").dropDuplicates()
    kept = existing.join(keys, ["crawled_date", "store"], "left_anti")
    return kept.unionByName(incoming.select(*existing.columns))
