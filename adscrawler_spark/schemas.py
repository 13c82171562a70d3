"""Engine table schemas (explicit StructTypes; Iceberg-enforced in
production, parquet in the sandbox).

Data model per SURVEY.md §1 / BASELINE.json input_hint.  The
``documents`` table is the interleaved text+media span table: one row
per fetched document, spans ordered by ``offset`` (text-kind spans
carry ``text``, media-kind spans carry ``media_ref`` — see FIXTURES.md
F1; the reference materializes these as separate columns produced by
the cleaners at /root/reference/adscrawler/app_stores/google.py:164-244,
apple.py:382-498 and ads.txt lines at scrape.py:165-218).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------- spans
SPAN = StructType(
    [
        StructField("kind", StringType()),       # title|description_short|description|adstxt_line|icon|screenshot|featured_image
        StructField("text", StringType()),       # text-kind spans
        StructField("media_ref", StringType()),  # media-kind spans
        StructField("offset", IntegerType()),    # dense 0-based order within doc
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN)),
        StructField("host", StringType()),
        StructField("store", IntegerType()),          # 1=play 2=ios 0=adstxt
        StructField("country", StringType()),
        StructField("crawl_result", IntegerType()),   # 1 ok/2 empty/3 notfound/4 unknown/5 wrong-platform
        StructField("fetched_at", TimestampType()),
        StructField("crawled_date", DateType()),
        # lineage (north_rule: seed → frontier-partition → fetch-batch)
        StructField("seed_id", StringType()),
        StructField("partition_id", IntegerType()),
        StructField("batch_id", LongType()),
    ]
)

# ------------------------------------------------------------- frontier
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_canon", StringType()),
        StructField("url_hash", IntegerType()),       # murmur3 (F.hash)
        StructField("host", StringType()),
        StructField("doc_kind", StringType()),        # listing_play|listing_ios|adstxt
        StructField("priority", DoubleType()),
        StructField("state", StringType()),           # pending|leased|done|failed
        StructField("last_crawled_at", TimestampType()),
        StructField("ad_supported", BooleanType()),
        StructField("installs", LongType()),
        StructField("rating_count", LongType()),
        StructField("crawl_result", IntegerType()),
        StructField("seed_id", StringType()),
        StructField("partition_id", IntegerType()),
        StructField("batch_id", LongType()),
        StructField("leased_until", TimestampType()),
    ]
)

# ---------------------------------------------------- parsed ads.txt rows
ADSTXT_ENTRIES = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("ad_domain", StringType()),
        StructField("publisher_id", StringType()),
        StructField("relationship", StringType()),    # DIRECT|RESELLER
        StructField("certification_auth", StringType()),
        StructField("notes", StringType()),
    ]
)

CRAWL_LOG = StructType(
    [
        StructField("batch_id", LongType()),
        StructField("url_canon", StringType()),
        StructField("host", StringType()),
        StructField("crawl_result", IntegerType()),
        StructField("fetched_at", TimestampType()),
        StructField("attempts", IntegerType()),
    ]
)
