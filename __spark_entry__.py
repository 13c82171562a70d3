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


def _rotation_order() -> list[str]:
    """Order the registry so the driver's 50-entry CORRECTNESS window
    sweeps the whole battery across rounds.

    The driver snapshot caps at 50 entries taken in dict order; with an
    append-only registry the newest entries would never receive a
    driver-issued correctness row. Emit least-recently-driver-verified
    first: names never seen in any ``CORRECTNESS_r*.json`` lead (in
    registry insertion order), then everything else by ascending
    last-verified round. Every entry still appears — only the order
    changes — so pytest's full-battery oracle re-check is unaffected.
    """
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    last_verified: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
            for name in json.load(open(path)):
                last_verified[name] = max(last_verified.get(name, 0), rnd)
        except (ValueError, OSError, json.JSONDecodeError):
            continue
    names = list(benchmarks.QUERIES)
    order = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (last_verified.get(n, -1), order[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: benchmarks.QUERIES[n] for n in _rotation_order()}


def oracle_sql() -> dict[str, str]:
    order = _rotation_order()
    ranked = [n for n in order if n in benchmarks.ORACLE]
    return {n: benchmarks.ORACLE[n] for n in ranked}
