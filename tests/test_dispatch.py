"""Parity tests for operators/dispatch.py against a pure-Python
restatement of the reference dispatcher's semantics
(/root/reference/adscrawler/dramatiq/dispatcher.py:142-273)."""

import math

import pytest
from pyspark.sql import functions as F

from adscrawler_spark.operators import dispatch as D


# -- pure-python restatement of the reference chunk loop (spec oracle) --

def ref_chunks(ids: list[int]) -> list[list[int]]:
    """dispatcher.py:208-219 chunk loop over one country's rows,
    already in engine order (see dispatch.py determinism note)."""
    n = len(ids)
    if n <= D.MAX_CHUNK_SIZE:
        return [ids]
    num_chunks = (n + D.MAX_CHUNK_SIZE - 1) // D.MAX_CHUNK_SIZE
    local = n // num_chunks
    return [ids[i : i + local] for i in range(0, n, local)]


def ref_queue_limit(pending: int, app_limit: int):
    """dispatcher.py:176-190."""
    empty = D.MAX_PENDING_CHUNKS - pending
    if empty < D.MAX_PENDING_CHUNKS / 10:
        return None
    return min([empty * D.MAX_CHUNK_SIZE, app_limit]) * 2


@pytest.mark.parametrize(
    "pending,app_limit",
    [(0, 20_000), (1351, 20_000), (1350, 20_000), (1499, 5_000),
     (1000, 5_000), (1490, 20_000), (1500, 20_000)],
)
def test_queue_query_limit_parity(pending, app_limit):
    assert D.queue_query_limit(pending, app_limit) == ref_queue_limit(
        pending, app_limit
    )


@pytest.mark.parametrize("n", [1, 39, 40, 41, 79, 80, 81, 100, 123, 400])
def test_chunk_assignments_parity(spark, n):
    ids = list(range(n))
    df = spark.createDataFrame(
        [(1, 1, "US", i) for i in ids],
        "store int, group int, country_code string, store_app int",
    )
    got = (
        D.chunk_assignments(df, order_col="store_app")
        .orderBy("store_app")
        .select("store_app", "chunk_seq")
        .collect()
    )
    want = {}
    for seq, chunk in enumerate(ref_chunks(ids)):
        for i in chunk:
            want[i] = seq
    assert {r.store_app: r.chunk_seq for r in got} == want
    # every chunk respects the reference's bound: never larger than
    # the local chunk size (trailing chunks may be smaller)
    sizes = {}
    for r in got:
        sizes[r.chunk_seq] = sizes.get(r.chunk_seq, 0) + 1
    assert max(sizes.values()) <= D.MAX_CHUNK_SIZE


def test_chunk_assignments_partitioned_by_country(spark):
    rows = [(1, 1, "US", i) for i in range(90)] + [
        (1, 1, "DE", 1000 + i) for i in range(10)
    ] + [(2, 2, "US", 2000 + i) for i in range(45)]
    df = spark.createDataFrame(
        rows, "store int, group int, country_code string, store_app int"
    )
    out = D.chunk_assignments(df).collect()
    by_key = {}
    for r in out:
        by_key.setdefault((r.store, r.group, r.country_code), []).append(r)
    # DE fits one chunk; US(1,1) n=90 -> 3 chunks of 30; US(2,2) n=45
    # -> 2 chunks (22, then stride slices 22+23? ref: local=22 ->
    # slices [0:22],[22:44],[44:45] = 3 chunks)
    assert {r.chunk_seq for r in by_key[(1, 1, "DE")]} == {0}
    assert {r.chunk_seq for r in by_key[(1, 1, "US")]} == {0, 1, 2}
    assert {r.chunk_seq for r in by_key[(2, 2, "US")]} == {0, 1, 2}


def test_acquire_locks_anti_join(spark):
    apps = spark.createDataFrame(
        [(1, 1, 10), (1, 1, 11), (2, 1, 10), (1, 2, 12)],
        "store int, group int, store_app int",
    )
    locks = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 99)], "store int, group int, store_app int"
    )
    got = sorted(
        (r.store, r.group, r.store_app)
        for r in D.acquire_locks(apps, locks).collect()
    )
    # (1,1,10) locked; (2,1,10) is a different queue's namespace so it
    # survives — per-queue lock prefixes, dispatcher.py:76-78
    assert got == [(1, 1, 11), (1, 2, 12), (2, 1, 10)]


def test_serialize_projection_fills_optional(spark):
    df = spark.createDataFrame(
        [(1, "sid1", "US", "en")],
        "store_app int, store_id string, country_code string, language string",
    )
    out = D.serialize_projection(df)
    assert out.columns == D.SERIALIZABLE_COLUMNS
    row = out.collect()[0]
    assert row.icon_url_100 is None and row.html_recently_scraped is None


def test_dispatch_all_queues_throttle_and_budget(spark):
    # 4 queues; (1,1) full -> skipped entirely; (2,2) group-2 budget
    rows = []
    for store, group in D.QUEUES:
        for i in range(120):
            rows.append((store, group, "US" if i % 3 else "DE",
                         store * 100_000 + group * 10_000 + i))
    apps = spark.createDataFrame(
        rows, "store int, group int, country_code string, store_app int"
    )
    locks = spark.createDataFrame(
        [(2, 1, 210_000 + i) for i in range(5)],
        "store int, group int, store_app int",
    )
    pending = {(1, 1): 1499, (2, 1): 0, (1, 2): 1000, (2, 2): 0}
    out = D.dispatch_all_queues(apps, locks, pending).collect()
    seen = {}
    for r in out:
        seen.setdefault((r.store, r.group), set()).add(r.store_app)
    assert (1, 1) not in seen  # throttled queue contributes no rows
    assert len(seen[(2, 1)]) == 115  # 120 ranked - 5 locked
    assert len(seen[(1, 2)]) == 120
    assert len(seen[(2, 2)]) == 120
    # chunk sizes bounded everywhere
    counts = {}
    for r in out:
        k = (r.store, r.group, r.country_code, r.chunk_seq)
        counts[k] = counts.get(k, 0) + 1
    assert max(counts.values()) <= D.MAX_CHUNK_SIZE


def test_dispatch_all_queues_budget_cuts_in_order(spark):
    # budget smaller than queue population: lowest order_col survive
    apps = spark.createDataFrame(
        [(1, 1, "US", i) for i in range(200)],
        "store int, group int, country_code string, store_app int",
    )
    locks = apps.limit(0).select("store", "group", "store_app")
    # small app_limit: limit = min(empty*40, 50) * 2 = 100
    out = D.dispatch_all_queues(
        apps, locks, {(1, 1): 0}, app_limit=50
    ).collect()
    kept = sorted(r.store_app for r in out)
    assert kept == list(range(100))


def test_dispatch_all_queues_all_throttled_is_empty(spark):
    apps = spark.createDataFrame(
        [(1, 1, "US", 1)],
        "store int, group int, country_code string, store_app int",
    )
    locks = apps.limit(0)
    pending = {q: 1500 for q in D.QUEUES}
    assert D.dispatch_all_queues(apps, locks, pending).count() == 0


def test_release_lock_keys_outcome_independent(spark):
    from adscrawler_spark.operators import dispatch as DP

    dispatched = spark.createDataFrame(
        [(1, 1, 10, "ok"), (1, 1, 10, "dup"), (2, 2, 20, "failed"),
         (1, 2, 30, "raised")],
        "store int, group int, store_app long, outcome string",
    )
    got = {r.lock_key for r in DP.release_lock_keys(dispatched).collect()}
    # queue naming matches actor_defs.queue_for; failures release too
    assert got == {
        "store_crawls_google_1:lock:10",
        "store_crawls_apple_2:lock:20",
        "store_crawls_google_2:lock:30",
    }
