"""Global crawl-scheduler parity + resume (SURVEY.md §5 points 3/4).

Runs the Spark generation loop on a small synthetic frontier, then
replays the identical configuration through the sequential pure-Python
oracle (pyref/frontier_sim.py) and asserts:

* claim log equality (generation, family, rank, url_canon) — the
  "global crawl ordering" invariant;
* final URL-seen set equality;
* final frontier state equality (every row: state + crawl_result);
* documents doc_id set equality;
* politeness: per-(host,lane) fetch counts never exceed the budget;
* resume: interrupted run (2 gens, then continue to 3) produces
  byte-identical final state to an uninterrupted 3-gen run, and a
  partially-committed generation is rolled back on restart.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from adscrawler_spark.operators import politeness
from adscrawler_spark.pyref.frontier_sim import SimConfig, run_sim
from adscrawler_spark.sources.catalog import Catalog
from adscrawler_spark.streaming import job
from adscrawler_spark.streaming.synth import _AD_DOMAINS

GENS = 3
FRONTIER = 3000
BATCH = 300
BUDGET = 2.0  # seconds/lane/generation — small enough to force deferrals


@pytest.fixture(scope="module")
def run_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl_run"))
    job.run(
        spark, out,
        frontier_size=FRONTIER, generations=GENS,
        listing_batch=BATCH, adstxt_batch=BATCH,
        budget_seconds=BUDGET,
    )
    return out


@pytest.fixture(scope="module")
def sim_state(spark, run_dir):
    cat = Catalog(run_dir)
    frontier0 = cat.table("frontier").read(spark, version=0)
    rows = [r.asDict() for r in frontier0.collect()]
    robots = {
        r.host: (list(r.disallow), r.crawl_delay)
        for r in politeness.default_robots(spark).collect()
    }
    lookup_df = spark.createDataFrame(
        [(f"https://{d}/app-ads.txt",) for d in _AD_DOMAINS], "url string"
    )
    from adscrawler_spark.operators.frontier import with_canonical

    lookup = {
        r.url_canon: (r.url_hash, r.url_hash64, r.row_hash64)
        for r in with_canonical(lookup_df).collect()
    }
    cfg = SimConfig(
        listing_batch=BATCH, adstxt_batch=BATCH, budget_seconds=BUDGET,
        robots=robots, hash_lookup=lookup,
    )
    return run_sim(rows, cfg, GENS)


def test_claim_log_matches_oracle(spark, run_dir, sim_state):
    cat = Catalog(run_dir)
    log = cat.table("crawl_log").read(spark)
    fam = {"adstxt": "adstxt", "rankings": "rankings"}
    got = sorted(
        (
            int(r.batch_id),
            fam.get(r.doc_kind, "listing"),
            int(r.claim_rank),
            r.url_canon,
        )
        for r in log.collect()
    )
    want = sorted(sim_state.claim_log)
    assert got == want


def test_seen_set_matches_oracle(spark, run_dir, sim_state):
    cat = Catalog(run_dir)
    got = {r.url_canon for r in cat.table("url_seen").read(spark).collect()}
    assert got == sim_state.seen


def test_frontier_states_match_oracle(spark, run_dir, sim_state):
    cat = Catalog(run_dir)
    got = sorted(
        (r.url, r.url_canon, r.state,
         -1 if r.crawl_result is None else int(r.crawl_result))
        for r in job.current_frontier(spark, cat).collect()
    )
    want = sorted(
        (r["url"], r["url_canon"], r["state"],
         -1 if r["crawl_result"] is None else int(r["crawl_result"]))
        for r in sim_state.frontier
    )
    assert got == want


def test_documents_match_oracle(spark, run_dir, sim_state):
    cat = Catalog(run_dir)
    rows = cat.table("documents").read(spark).collect()
    got = {r.doc_id for r in rows}
    assert got == sim_state.docs
    # per-doc country parity: Play = resolved developer address with
    # storefront fallback, iOS = storefront, ads.txt = null
    got_countries = {r.doc_id: r.country for r in rows}
    assert got_countries == sim_state.doc_countries
    assert any(v is not None for v in got_countries.values())
    # the fan-out produced more than one storefront country
    assert len({v for v in got_countries.values() if v}) > 1


def test_documents_partition_layout(spark, run_dir):
    """Documents are laid out store/crawled_date/country with a bucket
    column (reference lake layout, process/__init__.py:9-46)."""
    import glob
    import os

    cat = Catalog(run_dir)
    docs = cat.table("documents").read(spark)
    for col in ["store", "crawled_date", "country", "bucket"]:
        assert col in docs.columns, col
    snap = cat.table("documents").snapshot()
    leaf = glob.glob(
        os.path.join(snap["files"][0], "store=*", "crawled_date=*", "country=*")
    )
    assert leaf, "expected hive-style store/crawled_date/country dirs"


def test_rankings_match_oracle_and_dedup(spark, run_dir, sim_state):
    """Rankings land as a crawl-job product: every ingested (store,
    date, country, collection, category, rank, store_id) row equals the
    sequential oracle's ingestion (incl. the daily existence-probe
    skip — re-crawled lists within the same virtual day insert
    nothing), rows land hive-partitioned by store/crawled_date, and the
    best-rank dedup yields one row per (key, store_id)."""
    import glob
    import os

    from pyspark.sql import Window

    cat = Catalog(run_dir)
    ranks = cat.table("rankings").read(spark)
    assert ranks is not None
    got = {
        (int(r.store), str(r.crawled_date), r.country, r.collection,
         r.category, int(r.rank), r.store_id)
        for r in ranks.collect()
    }
    assert got == sim_state.rankings and len(got) > 0
    # T9: 3 generations share one virtual day -> exactly one ingestion
    # per key (no duplicate (key, rank) rows)
    key_cols = ["store", "crawled_date", "country", "collection", "category"]
    dup = (
        ranks.groupBy(*key_cols, "rank").count().filter("count > 1").count()
    )
    assert dup == 0
    # partition layout store/crawled_date (reference rankings lake)
    snap = cat.table("rankings").snapshot()
    leaf = glob.glob(os.path.join(snap["files"][0], "store=*", "crawled_date=*"))
    assert leaf
    # best-rank dedup product (store_app_ranks_latest analog)
    w = Window.partitionBy(*key_cols, "store_id").orderBy("rank")
    best = (
        ranks.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
    assert best.groupBy(*key_cols, "store_id").count().filter("count > 1").count() == 0
    assert best.count() == ranks.select(*key_cols, "store_id").distinct().count()


def test_rankings_t9_probe_partition_pruned(spark, run_dir):
    """The T9 existence probe filters the rankings table to the current
    crawled_date BEFORE the anti-join (streaming/job.py).  Assert the
    date predicate actually reaches the scan as a PartitionFilter —
    i.e. the probe reads one partition's metadata, not all history."""
    cat = Catalog(run_dir)
    ranks = cat.table("rankings").read(spark)
    assert ranks is not None
    probe = ranks.filter(
        F.col("crawled_date") == F.to_date(F.lit("2026-08-02"))
    ).select("store", "crawled_date", "country", "collection", "category")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan_lines, plan
    pf = scan_lines[0].split("PartitionFilters:")[1].split("]")[0]
    assert "crawled_date" in pf, plan


def test_politeness_budget_enforced(spark, run_dir):
    cat = Catalog(run_dir)
    log = cat.table("crawl_log").read(spark).filter("fetched")
    per_lane = (
        log.groupBy("batch_id", "host", "lane")
        .agg(F.count("*").alias("n"), F.max("virtual_time").alias("max_vt"))
        .collect()
    )
    assert per_lane, "no fetches logged"
    for r in per_lane:
        assert r.max_vt < BUDGET, (r.host, r.lane, r.max_vt)


def test_lineage_columns_present(spark, run_dir):
    cat = Catalog(run_dir)
    docs = cat.table("documents").read(spark)
    n_null = docs.filter(
        F.col("seed_id").isNull()
        | F.col("partition_id").isNull()
        | F.col("batch_id").isNull()
    ).count()
    assert n_null == 0


def test_resume_equals_uninterrupted(spark, run_dir, tmp_path_factory):
    out2 = str(tmp_path_factory.mktemp("crawl_resume"))
    job.run(spark, out2, frontier_size=FRONTIER, generations=2,
            listing_batch=BATCH, adstxt_batch=BATCH, budget_seconds=BUDGET)
    # simulate a crash mid-generation: an extra uncommitted doc snapshot
    cat2 = Catalog(out2)
    junk = spark.range(3).select(
        F.lit("junk").alias("doc_id"),
        F.lit(None).cast("string").alias("host"),
    )
    cat2.table("documents").append(junk, {"generation": 999})
    # restart and continue to GENS — rollback must discard the junk
    job.run(spark, out2, frontier_size=FRONTIER, generations=GENS,
            listing_batch=BATCH, adstxt_batch=BATCH, budget_seconds=BUDGET)

    cat1 = Catalog(run_dir)
    for table in ["documents", "url_seen"]:
        a = {tuple(sorted(r.asDict().items(), key=lambda kv: kv[0]))
             for r in cat1.table(table).read(spark).select("doc_id" if table == "documents" else "url_canon").collect()}
        b = {tuple(sorted(r.asDict().items(), key=lambda kv: kv[0]))
             for r in cat2.table(table).read(spark).select("doc_id" if table == "documents" else "url_canon").collect()}
        assert a == b, table
    fa = sorted(
        (r.url, r.state, -1 if r.crawl_result is None else int(r.crawl_result))
        for r in job.current_frontier(spark, cat1).collect()
    )
    fb = sorted(
        (r.url, r.state, -1 if r.crawl_result is None else int(r.crawl_result))
        for r in job.current_frontier(spark, cat2).collect()
    )
    assert fa == fb
    shutil.rmtree(out2, ignore_errors=True)


def test_compaction_preserves_state(spark, run_dir, tmp_path_factory, monkeypatch):
    """Folding the update log into the base (compact_frontier) must not
    change the merged view, and must truncate the log."""
    out = str(tmp_path_factory.mktemp("crawl_compact"))
    monkeypatch.setattr(job, "COMPACT_EVERY", 2)  # compact after gen 1
    job.run(spark, out, frontier_size=FRONTIER, generations=GENS,
            listing_batch=BATCH, adstxt_batch=BATCH, budget_seconds=BUDGET)
    cat_c = Catalog(out)
    cat_plain = Catalog(run_dir)
    fa = sorted(
        (r.url, r.state, -1 if r.crawl_result is None else int(r.crawl_result))
        for r in job.current_frontier(spark, cat_c).collect()
    )
    fb = sorted(
        (r.url, r.state, -1 if r.crawl_result is None else int(r.crawl_result))
        for r in job.current_frontier(spark, cat_plain).collect()
    )
    assert fa == fb
    # the log was truncated at the gen-1 compaction, then gen 2 appended
    upd = cat_c.table("frontier_updates").read(spark)
    assert upd is not None
    assert {int(r.u_batch) for r in upd.select("u_batch").distinct().collect()} == {2}
    shutil.rmtree(out, ignore_errors=True)


def test_span_sequences_end_to_end(spark, run_dir):
    """north_rule per-row invariant through the WHOLE pipeline: every
    documents row's span sequence equals the pure-Python oracle's parse
    of the same deterministic response body."""
    import json as _json

    from adscrawler_spark.pyref import adstxt as py_adstxt
    from adscrawler_spark.pyref import listings as py_listings
    from adscrawler_spark.streaming import synth

    cat = Catalog(run_dir)
    frontier0 = cat.table("frontier").read(spark, version=0)
    meta = {
        r.url_canon: (r.url, int(r.url_hash64), r.doc_kind)
        for r in frontier0.select("url_canon", "url_hash64", "url", "doc_kind")
        .dropDuplicates(["url_canon"]).collect()
    }
    docs = cat.table("documents").read(spark).collect()
    assert docs
    checked = 0
    for row in docs:
        prefix, canon = row.doc_id.split("::", 1)
        if canon not in meta:
            continue  # discovered URL (no frontier-v0 metadata)
        url, h, kind = meta[canon]
        body = synth.synth_body(h, kind, url)
        got = [
            (s.kind, s.text, s.media_ref, s.offset)
            for s in sorted(row.spans, key=lambda s: s.offset)
        ]
        if kind == "adstxt":
            want = [
                ("adstxt_line", ln, None, i)
                for i, ln in enumerate(py_adstxt.kept_lines(body))
            ]
        else:
            raw = _json.loads(body)
            cleaned = (
                py_listings.clean_play_row(raw)
                if kind == "listing_play"
                else py_listings.clean_ios_row(raw)
            )
            want = py_listings.listing_spans(cleaned)
        assert got == want, row.doc_id
        checked += 1
    assert checked > 100  # meaningful coverage across all three kinds


def test_rankings_t9_day_boundary(spark):
    """The pruned probe must skip same-day duplicates AND re-ingest on
    the next virtual day (the daily cadence the reference's
    existing-scenario check implements)."""
    rows = [(1, "2026-08-01", "US", "top", "games", 1, "app.a"),
            (1, "2026-08-01", "US", "top", "games", 2, "app.b")]
    schema = ("store int, crawled_date string, country string,"
              " collection string, category string, rank int,"
              " store_id string")

    def mk(date):
        return spark.createDataFrame(
            [(r[0], date, *r[2:]) for r in rows], schema
        ).withColumn("crawled_date", F.to_date("crawled_date"))

    existing = mk("2026-08-01")
    same_day = job._rankings_t9_skip(
        mk("2026-08-01"), existing, "2026-08-01 05:00:00"
    )
    assert same_day.count() == 0  # intra-day re-crawl -> no-op
    next_day = job._rankings_t9_skip(
        mk("2026-08-02"), existing, "2026-08-02 00:00:00"
    )
    assert next_day.count() == 2  # new day -> full re-ingestion
    none_yet = job._rankings_t9_skip(
        mk("2026-08-01"), None, "2026-08-01 00:00:00"
    )
    assert none_yet.count() == 2
