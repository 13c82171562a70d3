"""Workload-1 knob sweep (round-6 ask #8): does the 2→4-core dedup
scaling efficiency move when spark.sql.shuffle.partitions is tuned to
the topology and the Arrow probe batch size is swept?

Same measurement discipline as bench/scaling.py: identical
materialized parquet input, one JVM per (cores, knobs) configuration,
answer equality (n_unseen) asserted across every run.  Efficiency =
throughput(2N) / (2 × throughput(N)) — a 2-core → 4-core doubling.
Stage 1 selects the config to carry into the final legs by absolute
4-core throughput (not by the 0.8-efficiency criterion itself): the
final table reports efficiency for every swept config anyway, and the
carried config is the one a production tuning pass would pick.

Usage: python bench/dedup_sweep.py [--dedup-rows 24000000]
       [--final-rows 96000000] [--workdir /tmp/sweep_inputs]
Writes a markdown table to stdout; BENCH/BASELINE.md cites the result.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PREP = r"""
import sys
sys.path.insert(0, {repo!r})
from adscrawler_spark.session import get_spark
spark = get_spark("sweep-prep", cores=16, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
from adscrawler_spark.operators.frontier import with_canonical
from adscrawler_spark.streaming.frontier_gen import synth_frontier
fr = with_canonical(synth_frontier(spark, {rows}, seed=42))
fr.select("url", "url_canon", "url_hash64").write.mode(
    "overwrite").parquet({workdir!r} + "/frontier")
seen = (with_canonical(synth_frontier(spark, {rows} // 2, seed=7))
        .select("url_canon", "url_hash64").dropDuplicates(["url_canon"]))
seen.write.mode("overwrite").parquet({workdir!r} + "/seen")
spark.stop()
print("PREP DONE")
"""

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from adscrawler_spark.session import get_spark
spark = get_spark("sweep", cores={cores}, shuffle_partitions={parts})
spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
               str({arrow_batch}))
spark.sparkContext.setLogLevel("ERROR")
from adscrawler_spark.operators import seen as seen_ops
fr = spark.read.parquet({workdir!r} + "/frontier")
seen = spark.read.parquet({workdir!r} + "/seen")
t0 = time.time()
filters = seen_ops.build_bloom_filters(seen)
unseen = seen_ops.probe_unseen(fr, filters, seen)
n_unseen = unseen.count()
dt = time.time() - t0
spark.stop()
print("RESULT " + json.dumps({{
    "cores": {cores}, "parts": {parts}, "arrow_batch": {arrow_batch},
    "sec": round(dt, 2), "rows_per_sec": round({rows} / dt, 1),
    "n_unseen": n_unseen}}))
"""


def run_code(code: str, timeout: int = 3400) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout,
    )
    return proc.stdout + "\n<stderr>\n" + proc.stderr[-2000:]


def worker(cores, parts, arrow_batch, workdir, rows) -> dict:
    out = run_code(WORKER.format(
        repo=REPO, cores=cores, parts=parts, arrow_batch=arrow_batch,
        workdir=workdir, rows=rows,
    ))
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed:\n{out[-3000:]}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dedup-rows", type=int, default=24_000_000)
    p.add_argument("--final-rows", type=int, default=96_000_000)
    p.add_argument("--workdir", default="/tmp/sweep_inputs")
    p.add_argument("--skip-prep", action="store_true")
    p.add_argument("--skip-final", action="store_true")
    p.add_argument("--final-only", action="store_true",
                   help="skip the knob grid; run only the 96M confirm")
    p.add_argument("--parts", type=int, default=None,
                   help="shuffle partitions for --final-only")
    p.add_argument("--arrow", type=int, default=None,
                   help="arrow batch size for --final-only")
    p.add_argument("--reps", type=int, default=1,
                   help="fresh-JVM reps per final leg (best-of-N, the "
                        "documented host-noise protocol)")
    args = p.parse_args()

    if args.final_only:
        run_final(args, args.parts or 16, args.arrow or 10_000)
        return

    if not args.skip_prep:
        out = run_code(PREP.format(repo=REPO, workdir=args.workdir,
                                   rows=args.dedup_rows))
        if "PREP DONE" not in out:
            raise RuntimeError(f"prep failed: {out[-3000:]}")

    # --- stage 1: knob grid at sweep scale, cores=2 and cores=4 ------
    grid = []
    for parts in (4, 16):
        for arrow_batch in (10_000, 100_000, 500_000):
            grid.append((parts, arrow_batch))
    results = []
    expect = None
    for parts, arrow_batch in grid:
        for cores in (2, 4):
            r = worker(cores, parts, arrow_batch, args.workdir,
                       args.dedup_rows)
            if expect is None:
                expect = r["n_unseen"]
            assert r["n_unseen"] == expect, (r, expect)
            results.append(r)
            print(json.dumps(r), flush=True)

    print("\n| parts | arrow_batch | 2-core r/s | 4-core r/s | eff |")
    print("|---|---|---|---|---|")
    best = None
    for parts, arrow_batch in grid:
        two = next(r for r in results
                   if r["cores"] == 2 and r["parts"] == parts
                   and r["arrow_batch"] == arrow_batch)
        four = next(r for r in results
                    if r["cores"] == 4 and r["parts"] == parts
                    and r["arrow_batch"] == arrow_batch)
        eff = four["rows_per_sec"] / (2 * two["rows_per_sec"])
        print(f"| {parts} | {arrow_batch} | {two['rows_per_sec']} "
              f"| {four['rows_per_sec']} | {eff:.3f} |")
        if best is None or four["rows_per_sec"] > best[2]["rows_per_sec"]:
            best = (parts, arrow_batch, four)
    print(f"\nbest 4-core config: parts={best[0]} arrow={best[1]}")

    if args.skip_final:
        return
    run_final(args, best[0], best[1])


def run_final(args, parts: int, arrow_batch: int) -> None:
    """Stage 2: confirm the chosen knobs at the baseline's 96M scale,
    best-of-``--reps`` fresh JVMs per leg."""
    workdir = args.workdir + "_final"
    if not args.skip_prep or not os.path.isdir(workdir + "/frontier"):
        out = run_code(PREP.format(repo=REPO, workdir=workdir,
                                   rows=args.final_rows), timeout=3400)
        if "PREP DONE" not in out:
            raise RuntimeError(f"final prep failed: {out[-3000:]}")
    finals = {}
    expect = None
    for cores in (2, 4):
        best_leg = None
        for _ in range(max(1, args.reps)):
            r = worker(cores, parts, arrow_batch, workdir,
                       args.final_rows)
            if expect is None:
                expect = r["n_unseen"]
            assert r["n_unseen"] == expect, (r, expect)
            print(json.dumps(r), flush=True)
            if best_leg is None or r["rows_per_sec"] > best_leg["rows_per_sec"]:
                best_leg = r
        finals[cores] = best_leg
    eff = finals[4]["rows_per_sec"] / (2 * finals[2]["rows_per_sec"])
    print(f"\nFINAL {args.final_rows // 1_000_000}M "
          f"(parts={parts} arrow={arrow_batch}, best-of-{args.reps}): "
          f"2-core {finals[2]['rows_per_sec']} r/s, "
          f"4-core {finals[4]['rows_per_sec']} r/s, efficiency {eff:.3f}")


if __name__ == "__main__":
    main()
