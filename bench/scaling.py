"""Two-parallelism scaling harness (north_rule evidence).

Runs the identical crawl workloads on identical input at local[N] and
local[4N] (default 8 vs 32 cores) in separate JVMs, reports throughput
at both plus scaling efficiency = throughput(4N) / (4 × throughput(N)),
and writes BENCH/BASELINE.md.

The workloads are the BASELINE.json metrics:
  * frontier-dedup: canonicalize → murmur3/xxhash64 → partitioned-Bloom
    probe → exact anti-join confirm over a synthetic frontier;
  * schedule+fetch: one full claim → robots/budget → salted repartition
    → fetch → parse → commit generation.

Usage: python bench/scaling.py [--small cores] [--large cores]
       [--dedup-rows N] [--frontier N] [--batch N]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from adscrawler_spark.session import get_spark

cores = {cores}
spark = get_spark("scaling", cores=cores, shuffle_partitions=max(2 * cores, 16))
spark.sparkContext.setLogLevel("ERROR")

from adscrawler_spark.operators import seen as seen_ops
from adscrawler_spark.operators.frontier import with_canonical
from adscrawler_spark.streaming.frontier_gen import synth_frontier
from adscrawler_spark.streaming import job

# -- workload 1: frontier dedup ---------------------------------------
half = {dedup_rows} // 2
seen = (with_canonical(synth_frontier(spark, half, seed=7))
        .select("url_canon", "url_hash64").dropDuplicates(["url_canon"]))
seen.persist().count()
t0 = time.time()
filters = seen_ops.build_bloom_filters(seen)
unseen = seen_ops.probe_unseen(with_canonical(synth_frontier(spark, {dedup_rows}, seed=42)),
                               filters, seen)
n_unseen = unseen.count()
dedup_sec = time.time() - t0
seen.unpersist()

# -- workload 2: schedule + fetch generation --------------------------
out = tempfile.mkdtemp(prefix="scaling_crawl_")
t0 = time.time()
metrics = job.run(spark, out, frontier_size={frontier}, generations=1,
                  listing_batch={batch}, adstxt_batch={batch},
                  budget_seconds=3600.0)
crawl_sec = time.time() - t0
fetched = metrics[0]["fetched"]
shutil.rmtree(out, ignore_errors=True)
spark.stop()
print("RESULT " + json.dumps({{
    "cores": cores,
    "dedup_sec": round(dedup_sec, 2),
    "dedup_rows_per_sec": round({dedup_rows} / dedup_sec, 1),
    "n_unseen": n_unseen,
    "crawl_sec": round(crawl_sec, 2),
    "fetched": fetched,
    "urls_per_sec": round(fetched / crawl_sec, 1),
}}))
"""


def run_worker(cores: int, dedup_rows: int, frontier: int, batch: int) -> dict:
    code = WORKER.format(
        repo=REPO, cores=cores, dedup_rows=dedup_rows,
        frontier=frontier, batch=batch,
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker cores={cores} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--small", type=int, default=8)
    p.add_argument("--large", type=int, default=32)
    p.add_argument("--dedup-rows", type=int, default=8_000_000)
    p.add_argument("--frontier", type=int, default=1_000_000)
    p.add_argument("--batch", type=int, default=100_000)
    args = p.parse_args()

    small = run_worker(args.small, args.dedup_rows, args.frontier, args.batch)
    large = run_worker(args.large, args.dedup_rows, args.frontier, args.batch)
    ratio = args.large / args.small
    eff_dedup = large["dedup_rows_per_sec"] / (ratio * small["dedup_rows_per_sec"])
    eff_crawl = large["urls_per_sec"] / (ratio * small["urls_per_sec"])
    assert small["n_unseen"] == large["n_unseen"], "parallelism changed the answer"

    report = {
        "small": small,
        "large": large,
        "core_ratio": ratio,
        "scaling_efficiency_dedup": round(eff_dedup, 3),
        "scaling_efficiency_crawl": round(eff_crawl, 3),
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — two-parallelism scaling evidence

Identical job, identical input, two cluster sizes emulated as
`local[{args.small}]` vs `local[{args.large}]` (separate JVMs; only the
workload is timed, session startup excluded). Efficiency =
throughput(4N) / (4 x throughput(N)). Answer equality across
parallelism is asserted (n_unseen identical).

## Workload 1 — frontier dedup throughput
(canonicalize -> murmur3/xxhash64 -> partitioned Bloom probe -> exact
anti-join confirm; {args.dedup_rows:,} input rows, seen set
{args.dedup_rows // 2:,} rows)

| cores | seconds | rows/sec |
|---|---|---|
| {args.small} | {small["dedup_sec"]} | {small["dedup_rows_per_sec"]:,} |
| {args.large} | {large["dedup_sec"]} | {large["dedup_rows_per_sec"]:,} |

**Scaling efficiency ({args.small} -> {args.large} cores): {eff_dedup:.3f}**

## Workload 2 — URLs scheduled+fetched per second
(claim -> robots/budget -> salted repartition -> fetch -> parse ->
snapshot commit; frontier {args.frontier:,}, batches 2 x {args.batch:,})

| cores | seconds | fetched | urls/sec |
|---|---|---|---|
| {args.small} | {small["crawl_sec"]} | {small["fetched"]:,} | {small["urls_per_sec"]:,} |
| {args.large} | {large["crawl_sec"]} | {large["fetched"]:,} | {large["urls_per_sec"]:,} |

**Scaling efficiency ({args.small} -> {args.large} cores): {eff_crawl:.3f}**

Target per BASELINE.json: >= 0.8 from N to 4N executors.
Single-machine caveat: local[{args.small}] and local[{args.large}] share
memory bandwidth and disk; on a real 4x-executor cluster the large
configuration gets 4x the IO and memory bandwidth too, so these numbers
are a lower bound on cluster-scaling efficiency.
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
