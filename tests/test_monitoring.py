"""Crawl-health telemetry operators (pg-ddl function ports)."""

from pyspark.sql import functions as F

from adscrawler_spark.plans import monitoring as mon


def test_audit_changelog_ops(spark):
    old = spark.createDataFrame(
        [(1, 1, "a", 1), (2, 1, "b", None), (3, 2, "c", 2), (4, 2, "d", 3)],
        "id int, store int, store_id string, crawl_result int",
    )
    new = spark.createDataFrame(
        [(1, 1, "a", 1),        # unchanged -> no row
         (2, 1, "b", 1),        # NULL -> 1: U (null-safe change)
         (4, 2, "d", 3),        # unchanged
         (5, 1, "e", None)],    # insert
        "id int, store int, store_id string, crawl_result int",
    )
    rows = {r.op: r for r in mon.audit_changelog(old, new).collect()}
    assert set(rows) == {"D", "I", "U"}
    assert rows["D"].id == 3 and rows["D"].store_id == "c"
    assert rows["D"].crawl_result is None  # D rows don't carry it
    assert rows["I"].id == 5 and rows["I"].store_id == "e"
    assert rows["U"].id == 2 and rows["U"].crawl_result == 1


def test_freshness_null_unsafe_join(spark):
    """A NULL group key yields rows_older_than15 = NULL even when
    stale rows exist — the reference's plain-= join, kept
    bug-for-bug."""
    rows = [(1, None, "2024-01-01 00:00:00"),
            (2, None, "2024-01-02 00:00:00"),
            (3, 1, "2024-01-01 00:00:00")]
    df = spark.createDataFrame(
        rows, "id int, crawl_result int, updated_at string"
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp_ntz"))
    out = {
        r.crawl_result: r
        for r in mon.freshness_snapshot(
            df, ["crawl_result"], "2024-02-01 00:00:00"
        ).collect()
    }
    assert out[None].total_rows == 2
    assert out[None].rows_older_than15 is None  # the null-unsafe pin
    assert out[1].rows_older_than15 == 1


def test_extract_scheme(spark):
    df = spark.createDataFrame(
        [("HTTPS://x.com",), ("market://d?id=1",), ("plain",), (None,)],
        ["url"],
    )
    got = [r.s for r in df.select(mon.extract_scheme(F.col("url")).alias("s")).collect()]
    assert got == ["https", "market", None, None]
