"""Per-query profiling harness for optimization rounds (guide §1.4).

NOT the official bench (bench.py is frozen for measurement) — this
times individual battery queries with the noop sink at any scale
factor, optionally capturing .explain("formatted") to a file.

Usage:
  python bench_extra.py QUERY [QUERY ...] [--sf DIR] [--reps N]
      [--explain-dir DIR] [--cpus N]

Prints one JSON line: {"sf_dir": ..., "queries": {name: [sec, ...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from adscrawler_spark.plans import benchmarks  # noqa: E402
from adscrawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    spark = get_spark(
        "bench_extra", cores=args.cpus,
        shuffle_partitions=max(args.cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Same untimed warm-up as bench.py so first-query JIT noise is out.
    spark.read.parquet(f"{args.sf}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.mode("overwrite").format("noop").save()

    out: dict[str, list[float]] = {}
    for name in args.queries:
        fn = benchmarks.QUERIES[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
        reps = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            reps.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = reps
    print(json.dumps({"sf_dir": args.sf, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
