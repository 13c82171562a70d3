"""Deterministic fetch stage: mapInPandas over the claimed batch.

S10/S11/T3–T5 — the real engine would do politeness-bounded HTTP here
(token buckets per host inside the partition, retry ladder with
backoff); the sandbox substitutes a deterministic responder
(streaming/synth.py) keyed on the JVM-computed xxhash64.  The shape is
the production shape: iterator-of-Arrow-batches, per-partition state,
one output row per claimed URL with (crawl_result, attempts,
virtual_time, body).

The politeness *decision* (virtual schedule + budget) is precomputed
declaratively (operators/politeness.py) so it is a pure function of
the claim order; this stage enforces it and asserts the per-lane
monotonicity invariant at runtime.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from adscrawler_spark.streaming import synth

FETCH_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("url_canon", StringType()),
        StructField("url_hash64", LongType()),
        StructField("host", StringType()),
        StructField("country", StringType()),
        StructField("doc_kind", StringType()),
        StructField("crawl_result", IntegerType()),
        StructField("attempts", IntegerType()),
        StructField("fetched", BooleanType()),
        StructField("denied", BooleanType()),
        StructField("virtual_time", DoubleType()),
        StructField("lane", IntegerType()),
        StructField("body", StringType()),
        StructField("seed_id", StringType()),
        StructField("batch_id", LongType()),
        StructField("partition_id", IntegerType()),
        StructField("claim_rank", IntegerType()),
    ]
)

_IN_COLS = [
    "url", "url_canon", "url_hash64", "host", "country", "doc_kind", "lane",
    "lane_rank", "claim_rank", "crawl_delay", "robots_denied",
    "within_budget", "virtual_time", "seed_id", "batch_id", "partition_id",
]


_THRESHOLDS = np.array([t for t, _, _, _ in synth.OUTCOMES])
_RESULTS = np.array([r for _, r, _, _ in synth.OUTCOMES])
_ATTEMPTS = np.array([a for _, _, a, _ in synth.OUTCOMES])
_OK = np.array([ok for _, _, _, ok in synth.OUTCOMES])


def _fetch_batches(
    batches: Iterator[pd.DataFrame], fetch_cpu_us: int = 0
) -> Iterator[pd.DataFrame]:
    """Vectorized fetch: outcome classes resolve with numpy over the
    whole Arrow batch; Python strings are built only for the rows whose
    simulated fetch succeeds (where real IO would happen)."""
    last_vt: dict[tuple[str, int, str], float] = {}  # per-lane token state
    for pdf in batches:
        n = len(pdf)
        fetchable = (~pdf["robots_denied"].to_numpy(dtype=bool)) & pdf[
            "within_budget"
        ].to_numpy(dtype=bool)
        # per-(lane, family) monotone schedule invariant (politeness
        # order; doc_kind is a family refinement — budgets are
        # per-family, so virtual time restarts across families)
        for (host, lane, kind), grp in pdf.loc[fetchable].groupby(
            ["host", "lane", "doc_kind"], sort=False
        ):
            vts = grp["virtual_time"].to_numpy()
            assert (np.diff(vts) >= 0).all(), "lane schedule not monotone"
            key = (host, int(lane), kind)
            assert vts[0] >= last_vt.get(key, -1.0), "lane state regressed"
            last_vt[key] = float(vts[-1])

        # amortized-fetch mode: model the per-URL CPU a real fetch
        # spends (TLS, decompress, HTML/JSON walk) as a deterministic
        # md5 chain (~0.7 µs/iter measured).  Off by default; the
        # scaling bench uses it to measure generation throughput in the
        # regime where fetch work dominates fixed scheduling latency —
        # the production regime (real fetches are 0.1-4 s of IO+parse).
        # The knob is captured DRIVER-side in fetch() — an executor-
        # side env read is unreliable under Python worker reuse (a
        # worker forked before the env change never sees it; measured
        # as a silently-unburned "amortized" sample).
        if fetch_cpu_us > 0:
            import hashlib

            iters = max(1, int(fetch_cpu_us * 1.4))
            for u in pdf["url"].to_numpy()[fetchable]:
                x = u.encode()
                for _ in range(iters):
                    x = hashlib.md5(x).digest()

        h = pdf["url_hash64"].to_numpy()
        cls = np.searchsorted(_THRESHOLDS, h % 1000, side="right")
        result = _RESULTS[cls]
        attempts = _ATTEMPTS[cls]
        ok = _OK[cls]
        # wrong-platform class only exists for iOS; others degrade to 4
        kinds = pdf["doc_kind"].to_numpy()
        wrong5 = (result == 5) & (kinds != "listing_ios")
        result = np.where(wrong5, 4, result)

        out = pd.DataFrame(
            {
                "url": pdf["url"].to_numpy(),
                "url_canon": pdf["url_canon"].to_numpy(),
                "url_hash64": h,
                "host": pdf["host"].to_numpy(),
                "country": pdf["country"].to_numpy(),
                "doc_kind": kinds,
                "crawl_result": np.where(fetchable, result, 0),
                "attempts": np.where(fetchable, attempts, 0),
                "fetched": fetchable,
                "denied": pdf["robots_denied"].to_numpy(dtype=bool),
                "virtual_time": pdf["virtual_time"].to_numpy(),
                "lane": pdf["lane"].to_numpy(),
                "body": None,
                "seed_id": pdf["seed_id"].to_numpy(),
                "batch_id": pdf["batch_id"].to_numpy(),
                "partition_id": pdf["partition_id"].to_numpy(),
                "claim_rank": pdf["claim_rank"].to_numpy(),
            }
        )
        out["crawl_result"] = out["crawl_result"].astype("object").where(
            out["fetched"], None
        )
        # body synthesis only where the fetch succeeded with content:
        # adstxt keeps its body for every ok class; listings only for 1.
        has_body = fetchable & ok & ((kinds == "adstxt") | (result == 1))
        idx = np.flatnonzero(has_body)
        if len(idx):
            urls = pdf["url"].to_numpy()
            bodies = [
                synth.synth_body(int(h[i]), kinds[i], urls[i]) for i in idx
            ]
            body_col = out["body"].to_numpy(dtype=object)
            body_col[idx] = bodies
            out["body"] = body_col
        yield out


def fetch(claimed: DataFrame) -> DataFrame:
    """Claimed batch (already robots/budget-annotated) → fetch results.

    Repartitions on (host, lane) — the salted layout — and sorts each
    partition by the lane schedule so the per-host politeness order is
    physical, matching what a real fetcher would execute.

    The partition count is EXPLICIT: a claim batch is only tens of MB,
    so AQE would coalesce a count-less repartition to one or two tasks
    and serialize the whole fetch (in production each row is 0.1-4 s of
    work — bytes are the wrong sizing signal for this stage).  Each
    (host, lane) group still lands wholly inside one partition, so the
    per-lane politeness order stays physical at any count."""
    import os

    fetch_cpu_us = int(os.environ.get("ADSCRAWLER_FETCH_CPU_US", "0"))

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _fetch_batches(batches, fetch_cpu_us)

    par = claimed.sparkSession.sparkContext.defaultParallelism
    return (
        claimed.select(*_IN_COLS)
        .repartition(2 * par, F.col("host"), F.col("lane"))
        .sortWithinPartitions("host", "lane", "doc_kind", "lane_rank")
        .mapInPandas(_batches, FETCH_SCHEMA)
    )
