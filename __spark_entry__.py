"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The battery lives in adscrawler_spark/plans/benchmarks.py — one entry
per relational operator family from SURVEY.md §2 plus the
training-data operators (dedup / similarity / text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from adscrawler_spark.plans import benchmarks  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary, SURVEY §2.4 A3/A7) on sf0.001."""
    return benchmarks.pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(benchmarks.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(benchmarks.ORACLE)
