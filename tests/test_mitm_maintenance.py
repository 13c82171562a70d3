"""Tests for the mitm maintenance flows appended to
operators/creatives.py (manual_actions.py, try_failed_mitms.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from adscrawler_spark.operators import creatives as CR


def test_mitm_filename_parts(spark):
    df = spark.createDataFrame(
        [("com.app.one_42.log",), ("com.two_7_extra.log",)], ["name"]
    )
    pub, run = CR.mitm_filename_parts(F.col("name"))
    got = {tuple(r) for r in df.select(pub, run).collect()}
    # reference: name.split('_')[0], name.split('_')[1].replace('.log','')
    # extra segments are dropped, and '.log' only strips at the end
    assert got == {("com.app.one", "42"), ("com.two", "7")}


def test_redact_responses(spark):
    rows = [
        # is_creative, response_size, text, content
        (True, "100", "t1", "c1"),          # creative -> blanked
        (False, "600000", "t2", "c2"),      # oversized -> blanked
        (False, None, "t3", "c3"),          # size NULL -> '0' -> kept
        (False, "499999", "t4", "c4"),      # under limit -> kept
        (None, "10", "t5", "c5"),           # NULL flag -> kept
    ]
    df = spark.createDataFrame(
        rows,
        "is_creative_content boolean, response_size string, "
        "response_text string, response_content string",
    )
    got = [(r.response_text, r.response_content)
           for r in CR.redact_responses(df).collect()]
    assert got == [("", ""), ("", ""), ("t3", "c3"), ("t4", "c4"),
                   ("t5", "c5")]


def test_failed_mitm_retry_frontier(spark):
    rows = [
        # run_id, pub_store_id, error_msg, inserted_at
        (1, "a", "CRITICAL boom", "2026-01-10"),
        (1, "a", "ok", "2026-01-12"),            # last result ok -> excluded
        (2, "b", "ok", "2026-01-05"),
        (2, "b", "CRITICAL x", "2026-01-11"),    # last critical -> retried
        (3, "c", "CRITICAL y", "2026-01-02"),    # before lookback -> excluded
        (4, "d", "CRITICAL z", "2026-01-09"),    # retried, earlier date
        (5, "e", "warning CRITICAL", "2026-01-15"),  # LIKE 'CRITICAL %' anchor
    ]
    df = spark.createDataFrame(
        rows, "run_id int, pub_store_id string, error_msg string, "
              "inserted_at string",
    )
    got = CR.failed_mitm_retry_frontier(df, "2026-01-05").collect()
    by_run = {r.run_id: r for r in got}
    assert set(by_run) == {2, 4}
    # oldest-first retry order, matching the reference's ascending sort
    assert by_run[4].retry_order == 0
    assert by_run[2].retry_order == 1
