"""Full task-metric breakdown for the fattest stages of one battery
query (guide §1.4/§7.1): where does executorRunTime go when CPU time
is a small fraction — GC, shuffle fetch, serialization, or blocked on
an external boundary (Python workers)?

Usage: python bench/task_metrics.py QUERY [--sf DIR] [--cpus N] [--top K]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adscrawler_spark.plans import benchmarks  # noqa: E402
from adscrawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/sf1x")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--top", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark(
        "task_metrics", cores=args.cpus,
        shuffle_partitions=max(args.cpus, 16),
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.mode("overwrite").format("noop").save()

    t0 = time.time()
    benchmarks.QUERIES[args.query](spark, args.sf).write.mode(
        "overwrite"
    ).format("noop").save()
    wall = time.time() - t0

    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ))
    stages.sort(key=lambda s: -s["executorRunTime"])
    print(json.dumps({"query": args.query, "wall_s": round(wall, 1)}))
    for st in stages[: args.top]:
        out = {
            "stage": st["stageId"],
            "tasks": st["numCompleteTasks"],
            "run_s": round(st["executorRunTime"] / 1e3, 1),
            "cpu_s": round(st["executorCpuTime"] / 1e9, 1),
            "gc_s": round(st["jvmGcTime"] / 1e3, 1),
            "deser_s": round(st["executorDeserializeTime"] / 1e3, 1),
            "resultSer_s": round(st["resultSerializationTime"] / 1e3, 1),
            "fetchWait_s": round(st["shuffleFetchWaitTime"] / 1e3, 1),
            "writeTime_s": round(st["shuffleWriteTime"] / 1e9, 1),
            "input_mb": round(st["inputBytes"] / 1e6, 1),
            "peakMem_mb": round(
                st.get("peakExecutionMemory", 0) / 1e6, 1
            ),
        }
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
