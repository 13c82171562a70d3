"""Two-parallelism scaling evidence for the creative-assembly family
(round-5 operators): identical job, identical materialized inputs,
N vs 2N cores in separate JVMs.

Phase 0 materializes the synthetic capture flows + dims once to
parquet; each measured configuration then runs
creative_records_assembly end-to-end from that parquet and reports
the driver-side plan/build time separately from the distributed
execute time — the build is fixed-cost python/py4j work that no
executor count parallelizes, while the execute phase (containment
join, two-tier URL extraction, AdInfo folds, record joins) is the
part a cluster scales.

Usage: python bench/scaling_assembly.py [prepare|run <cores>|drive]
(drive = prepare + run 2 + run 4 + summary; default)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     ASSEMBLY_SCALE_DIR (default /tmp/assembly_scale)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("ASSEMBLY_SCALE_DIR", "/tmp/assembly_scale")
TABLES = ["flows", "mmps", "ad_domains", "store_apps", "domains",
          "click_redirects"]


AMPLIFY = int(os.environ.get("ASSEMBLY_SCALE_AMPLIFY", "16"))


def prepare() -> None:
    """Materialize the synthetic capture, amplified ×AMPLIFY by run
    replication (replica-suffixed run ids and mitm uuids keep the
    per-run containment joins isolated) so the execute phase is large
    enough to measure — the sf0.1 corpus alone runs in ~1 s."""
    from pyspark.sql import functions as F

    from adscrawler_spark.plans.benchmarks import _mitm_flows_synth_spark
    from adscrawler_spark.session import get_spark

    spark = get_spark("assembly-prep", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    frames = dict(zip(TABLES, _mitm_flows_synth_spark(spark, SF_DIR)))
    reps = spark.range(AMPLIFY).select(
        F.col("id").cast("string").alias("_rep")
    )
    frames["flows"] = (
        frames["flows"].crossJoin(reps)
        .withColumn(
            "mitm_uuid", F.concat_ws("_", "mitm_uuid", "_rep")
        )
        .withColumn("run_id", F.concat_ws("_", "run_id", "_rep"))
        .drop("_rep")
    )
    for name, df in frames.items():
        df.write.mode("overwrite").parquet(f"{OUT}/{name}")
    print("prepared", OUT, "amplify", AMPLIFY, flush=True)
    spark.stop()


def run(cores: int) -> None:
    from adscrawler_spark.operators import creatives as cv
    from adscrawler_spark.session import get_spark

    spark = get_spark(
        f"assembly-{cores}c", cores=cores,
        shuffle_partitions=max(cores * 4, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    frames = {t: spark.read.parquet(f"{OUT}/{t}") for t in TABLES}
    t0 = time.time()
    recs = cv.creative_records_assembly(
        frames["flows"], frames["mmps"], frames["ad_domains"],
        frames["store_apps"], frames["domains"],
        click_redirects=frames["click_redirects"], persisted=[],
    )
    t_build = time.time() - t0
    t0 = time.time()
    n = recs.count()
    t_exec = time.time() - t0
    print(json.dumps({
        "cores": cores, "rows": n,
        "build_sec": round(t_build, 2), "exec_sec": round(t_exec, 2),
    }), flush=True)
    spark.stop()


def drive() -> None:
    subprocess.run(
        [sys.executable, __file__, "prepare"], check=True
    )
    results = {}
    for cores in (2, 4):
        out = subprocess.run(
            [sys.executable, __file__, "run", str(cores)],
            check=True, capture_output=True, text=True,
        ).stdout
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
    r2, r4 = results[2], results[4]
    assert r2["rows"] == r4["rows"], (r2, r4)
    eff_exec = (r2["exec_sec"] / r4["exec_sec"]) / 2
    eff_total = (
        (r2["build_sec"] + r2["exec_sec"])
        / (r4["build_sec"] + r4["exec_sec"])
    ) / 2
    print(json.dumps({
        "rows": r2["rows"],
        "2c": r2, "4c": r4,
        "efficiency_exec_2to4": round(eff_exec, 3),
        "efficiency_total_2to4": round(eff_total, 3),
    }))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "drive"
    if mode == "prepare":
        prepare()
    elif mode == "run":
        run(int(sys.argv[2]))
    else:
        drive()
