"""Unit coverage for plans/frontend.py pieces that the battery's
column pruning can hide — the URL shortener regexp chain (the
reference computes it in api_call_countries' cleaned_calls CTE,
api_call_countries__matview.sql:33-39) and the Monday-retention
predicate."""

from pyspark.sql import functions as F

from adscrawler_spark.plans import frontend as fe

SHORT_URL_CASES = [
    ("https://a.com/x/y/z/deep/deeper?q=1", "a.com/x/y"),
    ("http://a.com/x?q=1", "a.com/x"),
    ("https://a.com", "a.com"),
    ("a.com/one/two/three/four", "a.com/one/two"),
    # trailing slash: the {0,2} group backtracks to zero segments and
    # `.*$` eats the slash — PG/DuckDB agree
    ("https://a.com/?q=1", "a.com"),
    # non-http scheme survives step 1; the segment regex then keeps
    # "ftp:" (empty segment after "//" stops the {0,2} group) — DuckDB
    # produces the same
    ("ftp://b.org/x", "ftp:"),
]


def test_short_url_golden(spark):
    df = spark.createDataFrame(
        [(u,) for u, _ in SHORT_URL_CASES], "url string"
    ).withColumn("short", fe.short_url(F.col("url")))
    got = {r["url"]: r["short"] for r in df.collect()}
    for url, want in SHORT_URL_CASES:
        assert got[url] == want, (url, got[url], want)


def test_retention_keeps_mondays_only_in_tail(spark):
    # 2001-08-01 is a Wednesday; 2001-07-02 and 2001-01-01 are Mondays
    rows = [
        ("2001-07-30", True),   # within 14 days (a Monday too)
        ("2001-07-25", True),   # within 14 days, Wednesday
        ("2001-07-10", False),  # outside 14d, Tuesday -> dropped
        ("2001-07-02", True),   # outside 14d but Monday -> kept
        ("2001-02-05", True),   # Monday, within 200d -> kept
        ("2001-01-01", False),  # Monday but 213d back -> dropped
        ("2000-12-31", False),  # Sunday and way back -> dropped
        ("2000-06-05", False),  # Monday but older than 200d -> dropped
    ]
    df = spark.createDataFrame(
        [(d,) for d, _ in rows], "crawled_date string"
    ).withColumn("crawled_date", F.col("crawled_date").cast("date"))
    kept = {
        str(r["crawled_date"])
        for r in fe.ranks_weekly_retention(df, "2001-08-01").collect()
    }
    for d, want in rows:
        assert (d in kept) == want, (d, want, kept)


def test_chain_hops_reconstructs_paths(spark):
    """Pointer doubling vs hand-computed chains: two chains (lengths 4
    and 1) plus a 20-hop chain exceeding the default round budget when
    max_hops is raised accordingly."""
    from adscrawler_spark.operators.chains import (
        chain_final_urls,
        chain_hops,
    )

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")]
    edges += [(f"n{i}", f"n{i+1}") for i in range(20)]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["node"]: r for r in chain_hops(df, max_hops=32).collect()}
    assert out["a"]["hop_index"] == 0 and out["a"]["is_chain_start"]
    assert out["d"]["hop_index"] == 3 and out["d"]["is_chain_end"]
    assert out["d"]["head"] == "a"
    assert out["y"]["head"] == "x" and out["y"]["hop_index"] == 1
    assert out["n20"]["head"] == "n0" and out["n20"]["hop_index"] == 20
    finals = {
        r["head"]: (r["final_url"], r["n_hops"])
        for r in chain_final_urls(chain_hops(df, max_hops=32)).collect()
    }
    assert finals == {"a": ("d", 3), "x": ("y", 1), "n0": ("n20", 20)}


def test_chain_hops_flags_cycles_and_duplicates(spark):
    """Cycle members come back converged=false (and are excluded from
    chain_final_urls); duplicate edge observations do not multiply
    output rows."""
    from adscrawler_spark.operators.chains import (
        chain_final_urls,
        chain_hops,
    )

    edges = [("a", "b"), ("b", "c"), ("a", "b"), ("a", "b"),  # dups
             ("p", "q"), ("q", "p")]                           # cycle
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = chain_hops(df).collect()
    assert len(rows) == 5  # a b c p q — one row each despite dup edges
    out = {r["node"]: r for r in rows}
    assert out["c"]["converged"] and out["c"]["head"] == "a"
    assert not out["p"]["converged"] and not out["q"]["converged"]
    finals = {r["head"] for r in chain_final_urls(chain_hops(df)).collect()}
    assert finals == {"a"}  # the cycle never lands a final URL


def test_advertiser_creatives_dedups_additional_domain_ids(spark):
    """The matview's id = ANY(array) subselect yields one row per
    matching DOMAIN — duplicate ids in the array must not duplicate
    names (code-review finding)."""
    from pyspark.sql import functions as F

    from adscrawler_spark.plans import frontend as fe

    recs = spark.createDataFrame(
        [(1, 1, 1, 10, 2, 3, 4, "m", [5, 5, 6])],
        ["record_id", "creative_asset_id", "api_call_id",
         "advertiser_store_app_id", "creative_host_domain_id",
         "creative_initial_domain_id", "mmp_domain_id", "mmp_urls",
         "additional_ad_domain_ids"],
    )
    assets = spark.createDataFrame(
        [(1, "md5a", None, "jpg")],
        "creative_asset_id int, md5_hash string, phash string,"
        " file_extension string",
    )
    calls = spark.createDataFrame(
        [(1, 10, 1)], ["api_call_id", "store_app", "run_id"]
    )
    runs = spark.createDataFrame([(1,)], ["run_id"]).select(
        "run_id", F.lit("2024-01-01").cast("timestamp").alias("run_at")
    )
    cmap = spark.createDataFrame([(5, 1)], ["domain_id", "company_id"])
    cos = spark.createDataFrame(
        [(1, "co1", 5)], ["company_id", "company_name", "domain_id"]
    )
    doms = spark.createDataFrame(
        [(i, f"dom{i}") for i in range(8)], ["domain_id", "domain_name"]
    )
    apps = spark.createDataFrame(
        [(10, "app", "sid10", "i1", "i5")],
        ["store_app", "name", "store_id", "icon_128", "icon_url_512"],
    )
    out = fe.advertiser_creatives(
        recs, assets, calls, runs, cmap, cos, doms, apps
    ).collect()
    assert len(out) == 1
    assert out[0].additional_ad_domain_urls == ["dom5", "dom6"]
