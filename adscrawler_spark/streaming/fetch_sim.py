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
    "url", "url_canon", "url_hash64", "host", "doc_kind", "lane",
    "lane_rank", "claim_rank", "crawl_delay", "robots_denied",
    "within_budget", "virtual_time", "seed_id", "batch_id", "partition_id",
]


def _fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    last_vt: dict[tuple[str, int], float] = {}  # per-lane token state
    for pdf in batches:
        out_rows = []
        for row in pdf.itertuples(index=False):
            denied = bool(row.robots_denied)
            deferred = not bool(row.within_budget)
            if denied or deferred:
                out_rows.append(
                    (row.url, row.url_canon, row.url_hash64, row.host,
                     row.doc_kind, None, 0, False, denied,
                     float(row.virtual_time), int(row.lane), None,
                     row.seed_id, row.batch_id, row.partition_id,
                     int(row.claim_rank))
                )
                continue
            key = (row.host, int(row.lane))
            vt = float(row.virtual_time)
            assert vt >= last_vt.get(key, -1.0), "lane schedule not monotone"
            last_vt[key] = vt
            h = int(row.url_hash64)
            result, attempts, ok = synth.outcome_for(h, row.doc_kind)
            body = synth.synth_body(h, row.doc_kind, row.url) if ok else None
            if result == 2 and row.doc_kind != "adstxt":
                body = None
            out_rows.append(
                (row.url, row.url_canon, row.url_hash64, row.host,
                 row.doc_kind, result, attempts, True, False, vt,
                 int(row.lane), body, row.seed_id, row.batch_id,
                 row.partition_id, int(row.claim_rank))
            )
        yield pd.DataFrame(out_rows, columns=[f.name for f in FETCH_SCHEMA.fields])


def fetch(claimed: DataFrame) -> DataFrame:
    """Claimed batch (already robots/budget-annotated) → fetch results.

    Repartitions on (host, lane) — the salted layout — and sorts each
    partition by the lane schedule so the per-host politeness order is
    physical, matching what a real fetcher would execute."""
    return (
        claimed.select(*_IN_COLS)
        .repartition(F.col("host"), F.col("lane"))
        .sortWithinPartitions("host", "lane", "lane_rank")
        .mapInPandas(_fetch_batches, FETCH_SCHEMA)
    )
