"""Creative assembly: parity vs the reference's own helpers (exec'd
out of mitm_scrape_ads.py / mitm_logs.py — the files import mitmproxy
and db modules at top level, so the pure functions are extracted by
def-name and run side-by-side) plus the end-to-end lineage into the
creative matviews."""

import datetime as dt
import re
import struct
import urllib
import urllib.parse

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from adscrawler_spark.operators import creatives as cv

REF_SCRAPE = "/root/reference/adscrawler/mitm_ad_parser/mitm_scrape_ads.py"
REF_LOGS = "/root/reference/adscrawler/mitm_ad_parser/mitm_logs.py"


class _Log:
    def __getattr__(self, _):
        return lambda *a, **k: None


def _exec_defs(path, names, extra_ns=None):
    lines = open(path).read().splitlines(keepends=True)
    wanted, capture = [], False
    for ln in lines:
        if ln.startswith("def "):
            capture = ln.split("(")[0][4:] in names
        elif ln and not ln[0].isspace() and not ln.startswith(")"):
            if not ln.startswith("def "):
                capture = False
        if capture:
            wanted.append(ln)
    ns = {
        "pd": pd, "np": np, "re": re, "struct": struct,
        "urllib": urllib, "logger": _Log(),
        "ALL_CREATIVE_EXTENSIONS": cv.ALL_CREATIVE_EXTENSIONS,
    }
    ns.update(extra_ns or {})
    exec("".join(wanted), ns)
    return ns


VIDEO_ID_CASES = [
    # (url, tld_url) — one per get_video_id branch + edges
    ("https://s0.2mdn.net/id/vidAAA111/file.mp4", "2mdn.net"),
    ("https://s0.2mdn.net/simgad/9876543210", "2mdn.net"),
    ("https://s0.2mdn.net/files/videoplay.mp4", "2mdn.net"),
    ("https://r4---sn.googlevideo.com/videoplayback?ei=tokenE1&x=2",
     "googlevideo.com"),
    ("https://cdn.unity3dusercontent.com/abcdef0123456789/high.mp4",
     "unity3dusercontent.com"),
    ("https://media.adcolony.com/longvideoid12345/x", "adcolony.com"),
    ("https://media.adcolony.com/short/final12345", "adcolony.com"),
    ("https://x.bigabidserv.com/path/clip123.mp4", "bigabidserv.com"),
    ("https://x.bigabidserv.com/path/clip456", "bigabidserv.com"),
    ("https://avatars.mds.yandex.net/get-x/id9988/orig", "yandex.net"),
    ("https://cdn.example.com/some/path/file77.png?x=1", "example.com"),
    ("https://cdn.example.com/trailing/", "example.com"),
    ("https://1.2.3.4/x/y.mp4", None),
    ("https://1.2.3.4/x/y.mp4", ""),
]


def test_video_id_parity_vs_reference(spark):
    ns = _exec_defs(REF_SCRAPE, {"get_video_id"})
    ref = ns["get_video_id"]
    expected = [
        ref(pd.Series({"url": u, "tld_url": t})) for u, t in VIDEO_ID_CASES
    ]
    df = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(VIDEO_ID_CASES)],
        "i int, url string, tld_url string",
    )
    got = {
        r["i"]: r["v"]
        for r in df.select("i", cv.video_id_col().alias("v")).collect()
    }
    for i, exp in enumerate(expected):
        assert got[i] == exp, (i, VIDEO_ID_CASES[i], got[i], exp)


def _png(w, h, pad=60000):
    return (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", w, h) + b"\x00" * pad
    )


def test_file_extension_and_is_creative_parity(spark):
    ns = _exec_defs(REF_LOGS, {"add_file_extension", "add_is_creative_column"})
    rows = [
        # (uuid, url, mime, status, size, content, tld)
        ("a", "https://x.com/v.mp4", None, 200, 60000, b"Z" * 100, "x.com"),
        ("b", "https://x.com/v?q=1", "video/webm", 200, 60001, b"Z", "x.com"),
        ("c", "https://x.com/v.png", "text/html; charset=utf-8", 200,
         70000, b"Z", "x.com"),
        ("d", "https://x.com/v.png", "image/png", 404, 70000, b"Z", "x.com"),
        ("e", "https://x.com/v.png", "image/png", 200, 100, b"Z", "x.com"),
        # square png on googleusercontent → publisher icon, excluded
        ("f", "https://lh3.googleusercontent.com/i.png", "image/png", 200,
         70000, _png(128, 128), "googleusercontent.com"),
        # non-square png on googleusercontent → kept
        ("g", "https://lh3.googleusercontent.com/i.png", "image/png", 200,
         70000, _png(320, 50), "googleusercontent.com"),
        # square png elsewhere → kept
        ("h", "https://cdn.ads.com/i.png", "image/png", 200, 70000,
         _png(128, 128), "ads.com"),
        ("i", "https://x.com/v.mov", None, 200, 60000, b"Z" * 99, "x.com"),
        ("j", "https://x.com/v.txt", None, 200, 60000, b"Z", "x.com"),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["mitm_uuid", "url", "response_mime_type", "status_code",
                 "response_size_bytes", "response_content", "tld_url"],
    )
    ref = ns["add_is_creative_column"](ns["add_file_extension"](pdf.copy()))
    sdf = spark.createDataFrame(
        [(u, url, m, st, sz, bytearray(c), t)
         for u, url, m, st, sz, c, t in rows],
        "mitm_uuid string, url string, response_mime_type string, "
        "status_code int, response_size_bytes long, "
        "response_content binary, tld_url string",
    )
    got = {
        r["mitm_uuid"]: (r["file_extension"], r["is_creative"])
        for r in cv.add_is_creative(cv.add_file_extension(sdf)).collect()
    }
    for _, r in ref.iterrows():
        exp_ext = r["file_extension"]
        exp_ext = None if pd.isna(exp_ext) else exp_ext
        assert got[r["mitm_uuid"]] == (exp_ext, bool(r["is_creative"])), (
            r["mitm_uuid"], got[r["mitm_uuid"]],
            (exp_ext, bool(r["is_creative"])),
        )


def test_find_sent_videos_parity(spark):
    ns = _exec_defs(REF_SCRAPE, {"find_sent_video_df"})
    ref_fn = ns["find_sent_video_df"]
    t0 = dt.datetime(2024, 3, 1)
    vid = "tokenXYZ1"
    flows = [
        # (uuid, response_text, called_at_offset)
        ("s1", f"pre {vid} post", -100),     # before → preferred
        ("s2", f"{vid}", 50),                # after → dropped when s1 exists
        ("s3", "unrelated", -10),
    ]
    pdf = pd.DataFrame(
        [(u, txt, t0 + dt.timedelta(seconds=o)) for u, txt, o in flows],
        columns=["mitm_uuid", "response_text", "called_at"],
    )
    creative = pd.Series({"called_at": t0})
    ref_hits = ref_fn(pdf, creative, vid)
    assert sorted(ref_hits["mitm_uuid"]) == ["s1"]
    # remove the timely row → reference falls back to any-time
    ref_hits2 = ref_fn(pdf[pdf["mitm_uuid"] != "s1"], creative, vid)
    assert sorted(ref_hits2["mitm_uuid"]) == ["s2"]

    def engine(flow_subset):
        calls = spark.createDataFrame(
            [("r1", "p", u, txt, t0 + dt.timedelta(seconds=o))
             for u, txt, o in flows if u in flow_subset],
            "run_id string, pub_store_id string, mitm_uuid string, "
            "response_text string, called_at timestamp",
        ).withColumn("tld_url", F.lit("x.com"))
        for c in ("url", "response_mime_type", "response_headers",
                  "query_params", "post_params", "request_text"):
            calls = calls.withColumn(c, F.lit(None).cast("string"))
        cr = spark.createDataFrame(
            [("r1", "p", "m1", t0, vid)],
            "run_id string, pub_store_id string, mitm_uuid string, "
            "called_at timestamp, video_id string",
        )
        hits = cv.find_sent_videos(cr, calls)
        return sorted(r["src_uuid"] for r in hits.collect())

    assert engine({"s1", "s2", "s3"}) == ["s1"]
    assert engine({"s2", "s3"}) == ["s2"]


def test_short_video_id_takes_request_fallback(spark):
    """len(video_id) < 5 skips the sent-video search entirely
    (mitm_scrape_ads.py:153-155) and parses its own request blob."""
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        # creative with a 2-char id; a same-run row CONTAINS the id in
        # its text but must not be used
        ("m1", "https://cdn.x7.com/a/ab.mp4", "x7.com", t0, 200,
         "video/mp4", 60000, None, "CC",
         "{'u': 'market://details?id=com.fall.back'}", "{}", "{}", "rq"),
        ("s1", "https://o.net9.com/ad", "net9.com",
         t0 - dt.timedelta(seconds=5), 200, None, 0,
         "ab market://details?id=com.wrong.path", None,
         None, None, None, None),
    ]
    flows = spark.createDataFrame(
        rows,
        "mitm_uuid string, url string, tld_url string, "
        "called_at timestamp, status_code int, "
        "response_mime_type string, response_size_bytes long, "
        "response_text string, response_content string, "
        "query_params string, response_headers string, "
        "post_params string, request_text string",
    ).withColumn("run_id", F.lit("r1")).withColumn(
        "pub_store_id", F.lit("com.pub.app")
    )
    mmps = spark.createDataFrame([("appsflyer.com",)], ["tld_url"])
    addoms = spark.createDataFrame([("adnet0.com",)], ["domain_name"])
    apps = spark.createDataFrame(
        [(1, "com.fall.back"), (2, "com.wrong.path")], ["id", "store_id"]
    )
    calls = cv.add_is_creative(
        cv.add_file_extension(cv.api_calls_from_flows(flows))
    )
    adv = cv.attribute_creatives(calls, mmps, addoms, apps).collect()
    assert len(adv) == 1
    assert adv[0]["adv_store_id"] == "com.fall.back"
    assert adv[0]["advertiser_store_app_id"] == 1
    assert adv[0]["creative_initial_domain_tld"] is None


def test_domains_with_missing_surrogates(spark):
    adv = spark.createDataFrame(
        [("known.com", "new1.com"), ("new2.com", None)],
        "host_ad_network_tld string, creative_initial_domain_tld string",
    )
    doms = spark.createDataFrame([("known.com", 7)],
                                 ["domain_name", "domain_id"])
    out = cv.domains_with_missing(adv, doms)
    got = {r["domain_name"]: r["domain_id"] for r in out.collect()}
    assert got["known.com"] == 7
    assert set(got) == {"known.com", "new1.com", "new2.com"}
    assert got["new1.com"] is not None and got["new2.com"] is not None


def test_assembly_feeds_creative_rankings_end_to_end(spark):
    """The round-5 re-point: companies_creative_rankings consumes the
    ASSEMBLED creative_records/creative_assets (not a synthesized
    table) — one lineage from capture flows to the frontend matview."""
    from adscrawler_spark.plans import benchmarks as bm
    from adscrawler_spark.plans import frontend as fe

    sf = "/root/testdata/sf0.001"
    flows, mmps, addoms, apps_dim, doms, clicks = (
        bm._mitm_flows_synth_spark(spark, sf)
    )
    calls = cv.add_is_creative(
        cv.add_file_extension(cv.api_calls_from_flows(flows))
    )
    handles = []
    adv = cv.attribute_creatives(
        calls, mmps, addoms, apps_dim, click_redirects=clicks,
        persisted=handles,
    ).persist()
    handles.append(adv)
    assets = cv.creative_assets(adv)
    records = cv.make_creative_records(
        adv, assets, cv.domains_with_missing(adv, doms)
    ).withColumnRenamed("api_call_id", "record_api_call_id")
    records = records.select(
        F.col("record_api_call_id").alias("api_call_id"),
        F.col("record_api_call_id").alias("record_id"),
        "creative_asset_id", "advertiser_store_app_id",
        "advertiser_domain_id", "creative_initial_domain_id",
        "creative_host_domain_id", "additional_ad_domain_ids",
    )
    api_calls = calls.filter(F.col("mitm_uuid").startswith("m")).select(
        F.md5("mitm_uuid").alias("api_call_id"),
        (F.xxhash64("pub_store_id") % 1000).alias("store_app"),
        F.to_date(F.col("called_at")).alias("run_at"),
    )
    company_map = doms.select(
        F.col("domain_id").cast("long").alias("domain_id"),
        (F.col("domain_id") % 5).cast("int").alias("company_id"),
    )
    companies = spark.range(0, 5).select(
        F.col("id").cast("int").alias("company_id"),
        F.col("id").cast("long").alias("domain_id"),
    )
    domains_dim = doms.select(
        F.col("domain_id").cast("long").alias("domain_id"), "domain_name"
    )
    apps_view = apps_dim.select(
        F.col("id").alias("store_app"),
        F.col("store_id").alias("name"),
        F.lit(1).alias("store"),
        "store_id",
        (F.col("id") * 10).alias("installs"),
        (F.col("id") % 100).alias("rating_count"),
    )
    out = fe.companies_creative_rankings(
        records, assets, api_calls, company_map, companies,
        domains_dim, apps_view,
    )
    rows = out.collect()
    for h in handles:
        h.unpersist()
    assert len(rows) > 0
    # attributed advertisers from the assembled lineage surface in the
    # matview output
    advs = {r["advertiser_store_id"] for r in rows
            if r["advertiser_store_id"] is not None}
    assert any(a.startswith("com.adv") for a in advs)
    assert any(a.startswith("com.af") for a in advs)
