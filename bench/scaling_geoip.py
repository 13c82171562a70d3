"""Two-parallelism scaling evidence for the geo-IP bucketed range
join (operators/geoip.py) — the round-5 scale-path operator.

Identical materialized inputs (8M probe ips, 300k /20 city blocks +
2k overlapping coarse /13 blocks forcing longest-prefix resolution,
50k /16 ASN blocks), identical job (lookup_ips → count), separate
JVMs at local[small] and local[large].  Reports rows/sec at both and
efficiency = thr(large) / ((large/small) × thr(small)).

Usage: python bench/scaling_geoip.py [--small 4] [--large 16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PREP = r"""
import sys
sys.path.insert(0, {repo!r})
from adscrawler_spark.session import get_spark
import pyspark.sql.functions as F
from adscrawler_spark.operators.geoip import long_to_ip
spark = get_spark("geoip-prep", cores=16, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

ips = spark.range({n_ips}).select(
    long_to_ip(F.pmod(F.xxhash64("id"), F.lit(1 << 32))).alias("ip"))
ips.write.mode("overwrite").parquet({workdir!r} + "/ips")

fine = spark.range({n_city}).select(
    F.concat(long_to_ip(F.col("id") * 4096), F.lit("/20")).alias("network"),
    F.concat(F.lit("Country "), (F.col("id") % 200).cast("string")).alias("country_name"),
    F.concat(F.lit("C"), (F.col("id") % 200).cast("string")).alias("country_iso"),
    F.concat(F.lit("State "), (F.col("id") % 2000).cast("string")).alias("state_name"),
    F.concat(F.lit("S"), (F.col("id") % 2000).cast("string")).alias("state_iso"),
    F.concat(F.lit("City "), F.col("id").cast("string")).alias("city_name"),
    (F.col("id") % 99999).cast("string").alias("zip"),
    (F.col("id").cast("double") + 0.5).alias("latitude"),
    (-(F.col("id").cast("double") + 0.25)).alias("longitude"),
)
coarse = spark.range(2000).select(
    F.concat(long_to_ip(F.col("id") * (1 << 19) * 4), F.lit("/13")).alias("network"),
    F.concat(F.lit("CoarseCountry "), F.col("id").cast("string")).alias("country_name"),
    F.concat(F.lit("X"), F.col("id").cast("string")).alias("country_iso"),
    F.lit("CoarseState").alias("state_name"), F.lit("Y").alias("state_iso"),
    F.lit("CoarseCity").alias("city_name"), F.lit("0").alias("zip"),
    F.lit(0.5).alias("latitude"), F.lit(-0.25).alias("longitude"),
)
fine.unionByName(coarse).write.mode("overwrite").parquet({workdir!r} + "/city")
asn = spark.range({n_asn}).select(
    F.concat(long_to_ip(F.col("id") * (1 << 16)), F.lit("/16")).alias("network"),
    (F.col("id") % 65000).cast("int").alias("asn"),
    F.concat(F.lit("AS-Org "), F.col("id").cast("string")).alias("org"),
)
asn.write.mode("overwrite").parquet({workdir!r} + "/asn")
spark.stop()
print("PREP DONE")
"""

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from adscrawler_spark.session import get_spark
from adscrawler_spark.operators.geoip import lookup_ips
spark = get_spark("geoip-scale-{cores}", cores={cores},
                  shuffle_partitions=max(8, {cores} * 2))
spark.sparkContext.setLogLevel("ERROR")
ips = spark.read.parquet({workdir!r} + "/ips")
city = spark.read.parquet({workdir!r} + "/city")
asn = spark.read.parquet({workdir!r} + "/asn")
# untimed warm-up on a slice (codegen/classloading)
lookup_ips(ips.limit(100_000), city, asn).count()
t0 = time.time()
n = lookup_ips(ips, city, asn).count()
dt = time.time() - t0
print("RESULT " + json.dumps({{"cores": {cores}, "rows": n, "sec": round(dt, 2),
                               "rows_per_sec": round(n / dt, 1)}}))
spark.stop()
"""


def run(code: str) -> str:
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-3000:])
    return out.stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=4)
    ap.add_argument("--large", type=int, default=16)
    ap.add_argument("--n-ips", type=int, default=8_000_000)
    ap.add_argument("--n-city", type=int, default=300_000)
    ap.add_argument("--n-asn", type=int, default=50_000)
    ap.add_argument("--repeat", type=int, default=1,
                    help="best-of-N per parallelism (neighbor load on a "
                         "shared host only ever slows a run, so max "
                         "throughput is the honest estimator)")
    args = ap.parse_args()
    workdir = tempfile.mkdtemp(prefix="geoip_scale_")
    print(run(PREP.format(repo=REPO, workdir=workdir, n_ips=args.n_ips,
                          n_city=args.n_city, n_asn=args.n_asn)).strip())
    results = {}
    for cores in (args.small, args.large):
        best = None
        for _ in range(args.repeat):
            out = run(WORKER.format(repo=REPO, workdir=workdir, cores=cores))
            line = [l for l in out.splitlines()
                    if l.startswith("RESULT ")][-1]
            r = json.loads(line[len("RESULT "):])
            print(line)
            if best is None or r["rows_per_sec"] > best["rows_per_sec"]:
                best = r
        results[cores] = best
    s, l = results[args.small], results[args.large]
    ratio = args.large / args.small
    eff = l["rows_per_sec"] / (ratio * s["rows_per_sec"])
    print(json.dumps({"efficiency": round(eff, 3), "ratio": ratio,
                      "small": s, "large": l}))


if __name__ == "__main__":
    main()
