"""Per-node SQL metrics for one battery query (guide §1/§7): dump the
slow nodes of the final SQL execution — broadcast collect/build times,
exchange data sizes, python-eval rows — straight from the REST API.

Usage: python bench/sql_metrics.py QUERY [--sf DIR] [--cpus N] [--min-ms N]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adscrawler_spark.plans import benchmarks  # noqa: E402
from adscrawler_spark.session import get_spark  # noqa: E402

_MS = re.compile(r"^\s*([\d.,]+)\s*(ms|s|m|h)?\s*$")


def _to_ms(val: str) -> float | None:
    """Parse a metric value like '1.2 s', '345 ms', '54.3 m'."""
    m = _MS.match(val.replace(",", ""))
    if not m:
        return None
    x = float(m.group(1))
    unit = m.group(2) or "ms"
    return x * {"ms": 1, "s": 1e3, "m": 6e4, "h": 3.6e6}[unit]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/sf1x")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--min-ms", type=float, default=900.0)
    args = ap.parse_args()

    spark = get_spark(
        "sql_metrics", cores=args.cpus,
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
    print(json.dumps({"query": args.query, "wall_s": round(wall, 1)}))

    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    execs = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/sql?length=200&details=true"
        "&planDescription=false"
    ))
    # the battery query is the biggest recent execution
    execs.sort(key=lambda e: -(e.get("duration") or 0))
    for ex in execs[:3]:
        print(json.dumps({
            "exec_id": ex["id"], "dur_s": round(ex["duration"] / 1e3, 1),
            "status": ex["status"],
        }))
        nodes = ex.get("nodes") or []
        slow = []
        for nd in nodes:
            for mt in nd.get("metrics") or []:
                ms = _to_ms(str(mt.get("value", "")))
                name = mt.get("name", "")
                if ms is not None and ms >= args.min_ms and (
                    "time" in name or "duration" in name
                ):
                    slow.append((ms, nd["nodeId"], nd["nodeName"], name,
                                 mt["value"]))
        slow.sort(reverse=True)
        for ms, nid, nname, mname, val in slow[:40]:
            print(json.dumps({
                "node": nid, "op": nname[:60], "metric": mname,
                "value": val,
            }))
    spark.stop()


if __name__ == "__main__":
    main()
