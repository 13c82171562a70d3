"""Repeated-run variance bound for the frontier-dedup benchmark.

Round-4 left two data points straddling the 276k rows/s high-water
mark (276.0k in r3, 248.4k in r4); this harness runs the exact
bench.py dedup measurement N times inside ONE session and prints
mean / spread so the numbers can be read against a distribution
instead of single draws.

Usage: python bench/dedup_variance.py [N]   (default 5)
Env: same as bench.py (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
BENCH_FRONTIER).
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench  # noqa: E402
from adscrawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(
        "dedup-variance", cores=bench.CPUS,
        shuffle_partitions=max(bench.CPUS, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench._warmup(spark)
    rps: list[float] = []
    secs: list[float] = []
    for i in range(n_runs):
        dt, r = bench.bench_dedup(spark)
        secs.append(dt)
        rps.append(r)
        print(f"run {i + 1}/{n_runs}: {dt}s {r} rows/s", flush=True)
    out = {
        "runs": n_runs,
        "frontier_rows": bench.FRONTIER_N,
        "cpus": bench.CPUS,
        "rows_per_sec": rps,
        "mean": round(statistics.mean(rps), 1),
        "stdev": round(statistics.stdev(rps), 1) if n_runs > 1 else 0.0,
        "min": min(rps),
        "max": max(rps),
        "secs": secs,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
