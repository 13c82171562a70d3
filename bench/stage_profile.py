"""Stage-level attribution for one battery query (guide §7.1 without
an interactive UI): run the query against the noop sink, then dump
every stage's wall time, task time, shuffle bytes and name from the
live REST API, sorted by executor-run time.

Usage: python bench/stage_profile.py QUERY [--sf DIR] [--cpus N]
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
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark(
        "stage_profile", cores=args.cpus,
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
    apps = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications")
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    rows = []
    for st in stages:
        rows.append({
            "stage": st["stageId"],
            "name": st["name"].split("\n")[0][:80],
            "tasks": st["numCompleteTasks"],
            "executorRunTime_s": round(st["executorRunTime"] / 1e3, 1),
            "executorCpuTime_s": round(st["executorCpuTime"] / 1e9, 1),
            "shuffleRead_mb": round(st["shuffleReadBytes"] / 1e6, 1),
            "shuffleWrite_mb": round(st["shuffleWriteBytes"] / 1e6, 1),
            "input_mb": round(st["inputBytes"] / 1e6, 1),
            "submitted": st.get("firstTaskLaunchedTime", ""),
        })
    rows.sort(key=lambda r: -r["executorRunTime_s"])
    print(json.dumps({"query": args.query, "wall_s": round(wall, 1)}))
    for r in rows[:25]:
        print(json.dumps(r))
    for r in rows[:4]:
        try:
            summ = json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/stages/"
                    f"{r['stage']}/0/taskSummary"
                    "?quantiles=0.0,0.5,0.95,1.0"
                )
            )
            print(json.dumps({
                "stage": r["stage"],
                "task_dur_quantiles_s": [
                    round(x / 1e3, 2) for x in summ["duration"]
                ],
                "sched_delay_q_s": [
                    round(x / 1e3, 2)
                    for x in summ.get("schedulerDelay", [])
                ],
            }))
        except Exception as exc:  # noqa: BLE001
            print("taskSummary failed:", r["stage"], exc)
    # job timeline: gaps between a job's completion and the next job's
    # submission are pure driver-side work (planning / codegen)
    jobs = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        )
    )
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%Z").timestamp()

    jobs.sort(key=lambda j: j["jobId"])
    prev_end = None
    print("--- jobs (gap = driver-side time since previous job end) ---")
    for j in jobs:
        sub, comp = ts(j["submissionTime"]), ts(j["completionTime"])
        gap = round(sub - prev_end, 1) if prev_end else 0.0
        prev_end = max(prev_end or comp, comp)
        print(json.dumps({
            "job": j["jobId"], "gap_before_s": gap,
            "dur_s": round(comp - sub, 1),
            "desc": (j.get("description") or j["name"])[:70],
        }))
    spark.stop()


if __name__ == "__main__":
    main()
