"""Per-ad-network routed attribution: one creative per network route,
asserting the reference's per-parser outcomes end-to-end through
attribute_creatives(network_routing=True)."""

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from adscrawler_spark.operators import creatives as cv

T0 = dt.datetime(2024, 3, 1)


def _flow(uuid, url, tld, sec, *, status=200, mime=None, size=0,
          rtext=None, content=None, qp=None, rh=None, pp=None, reqt=None):
    return ("r1", "com.pub.app", uuid, url, tld,
            T0 + dt.timedelta(seconds=sec), status, mime, size, rtext,
            content, qp, rh, pp, reqt)


_SCHEMA = (
    "run_id string, pub_store_id string, mitm_uuid string, url string, "
    "tld_url string, called_at timestamp, status_code int, "
    "response_mime_type string, response_size_bytes long, "
    "response_text string, response_content string, "
    "query_params string, response_headers string, post_params string, "
    "request_text string"
)


def _creative(uuid, vid, sec, size):
    return _flow(
        uuid, f"https://s0.2mdn.net/id/{vid}/file.mp4", "2mdn.net",
        sec, mime="video/mp4", size=size, content=f"C{uuid}",
    )


@pytest.fixture(scope="module")
def records(spark):
    vids = {k: f"video{k}{'x' * 4}" for k in
            ["vg", "mtg", "fy1", "fy2", "fy3", "uni", "goo", "gos",
             "yx1", "yx2", "you", "evr"]}
    rows = [
        _creative(f"m{k}", v, 100 + 10 * i, 60_000 + i)
        for i, (k, v) in enumerate(vids.items())
    ]
    s = rows.append
    # vungle: structural market id + mmp-filtered tpat
    s(_flow("svg", "https://ads.vungle.com/v", "vungle.com", 50,
            rtext=json.dumps({
                "v": vids["vg"],
                "ads": [{"ad_markup": {
                    "ad_market_id": "com.vg.app",
                    "tpat": {
                        "clickUrl": ["https://app.appsflyer.com/x?pid=1",
                                     "https://other.com/c"],
                        "checkpoint.0": ["https://s.adjust.com/t"],
                    }}}]})))
    # mtg: package_name short-circuit
    s(_flow("smtg", "https://api.mtgglobals.com/v", "mtgglobals.com", 50,
            rtext=json.dumps({"v": vids["mtg"],
                              "data": {"ads": [{"package_name":
                                                "com.mt.go"}]}})))
    # fyber 1: inner-active header bundle
    s(_flow("sfy1", "https://x.inner-active.mobi/v", "inner-active.mobi",
            50, rtext=f"resp {vids['fy1']} nothing",
            rh=json.dumps({"x-ia-app-bundle": "com.fy.app"})))
    # fyber 2: tpbid clickless text parse
    s(_flow("sfy2", "https://x.tpbid.com/v", "tpbid.com", 50,
            rtext=f"resp {vids['fy2']} market://details?id=com.fb2.x"))
    # fyber 3: tpbid, no urls → kept-empty AdInfo
    s(_flow("sfy3", "https://x.tpbid.com/v", "tpbid.com", 50,
            rtext=f"resp {vids['fy3']} nothing here"))
    # unity: bundle + adjust referrer merged under the text parse
    s(_flow("suni",
            "https://auction-load.unityads.unity3d.com/v6/games",
            "unity3d.com", 50,
            rtext=json.dumps({
                "v": vids["uni"],
                "media": {"k1": {
                    "bundleId": "com.un.app",
                    "content": "html referrer=adjust_external_z,rest",
                }},
                "turl": "https://cdn.ads9.com/x.js"})))
    # google ad_networks: video-matched html
    s(_flow("sgoo", "https://g.doubleclick.net/v", "doubleclick.net", 50,
            rtext=json.dumps({"ad_networks": [{"ad": {
                "ad_html": f"<div>{vids['goo']} "
                           "market://details?id=com.gg.x</div>"}}]})))
    # google slots: early-stop walk
    s(_flow("sgos", "https://g.doubleclick.net/v", "doubleclick.net", 50,
            rtext=json.dumps({"slots": [{"ads": [
                {"u": vids["gos"],
                 "link": "market://details?id=com.gs.x"}]}]})))
    # yandex native: only the matching ad's links count
    s(_flow("syx1", "https://an.yandex.ru/v", "yandex.ru", 50,
            rtext=json.dumps({"native": {"ads": [
                {"m": vids["yx1"],
                 "l": "market://details?id=com.yx.x"},
                {"m": "other",
                 "l": "market://details?id=com.zz.x"}]}})))
    # yandex native, no matching ad: kept-empty AdInfo
    s(_flow("syx2", "https://an.yandex.ru/v", "yandex.ru", 50,
            rtext=json.dumps({"native": {"ads": [{"m": "none"}]},
                              "vid": vids["yx2"]})))
    # youappi media response: the request side parses
    s(_flow("syou", "https://i.youappi.com/v", "youappi.com", 50,
            mime="video/mp4",
            rtext=f"BIN {vids['you']} BIN",
            qp="{'u': 'market://details?id=com.ya.x'}"))
    # everestop: protobuf plug point → empty AdInfo, urls ignored
    s(_flow("sevr", "https://sdk.everestop.io/v", "everestop.io", 50,
            rtext=f"resp {vids['evr']} market://details?id=com.ev.x"))

    flows = spark.createDataFrame(rows, _SCHEMA)
    mmps = spark.createDataFrame(
        [("appsflyer.com",), ("adjust.com",)], ["tld_url"])
    addoms = spark.createDataFrame([("ads9.com",)], ["domain_name"])
    apps = spark.createDataFrame(
        [(1, "com.vg.app"), (2, "com.mt.go"), (3, "com.fy.app"),
         (4, "com.fb2.x"), (5, "com.un.app"), (6, "com.gg.x"),
         (7, "com.gs.x"), (8, "com.yx.x"), (9, "com.zz.x"),
         (10, "com.ya.x"), (11, "com.ev.x")],
        ["id", "store_id"])
    calls = cv.add_is_creative(
        cv.add_file_extension(cv.api_calls_from_flows(flows)))
    adv = cv.attribute_creatives(
        calls, mmps, addoms, apps, network_routing=True,
        persisted=[],
    )
    return {r["mitm_uuid"]: r for r in adv.collect()}


def test_vungle_structural_short_circuit(records):
    r = records["mvg"]
    assert r["adv_store_id"] == "com.vg.app"
    assert r["advertiser_store_app_id"] == 1
    assert r["mmp_urls"] == ["https://app.appsflyer.com/x?pid=1",
                             "https://s.adjust.com/t"]
    assert r["mmp_tld"] == "appsflyer.com"
    assert r["found_ad_network_tlds"] == []
    assert r["creative_initial_domain_tld"] == "vungle.com"


def test_mtg_package_name(records):
    r = records["mmtg"]
    assert r["adv_store_id"] == "com.mt.go"
    assert r["advertiser_store_app_id"] == 2


def test_fyber_header_bundle(records):
    r = records["mfy1"]
    assert r["adv_store_id"] == "com.fy.app"
    assert r["creative_initial_domain_tld"] == "fyber.com"


def test_fyber_clickless_text_parse(records):
    r = records["mfy2"]
    assert r["adv_store_id"] == "com.fb2.x"
    assert r["creative_initial_domain_tld"] == "fyber.com"


def test_fyber_empty_adinfo_kept(records):
    r = records["mfy3"]
    assert r["adv_store_id"] is None
    assert r["creative_initial_domain_tld"] == "fyber.com"


def test_unity_bundle_fill(records):
    r = records["muni"]
    assert r["adv_store_id"] == "com.un.app"
    assert r["advertiser_store_app_id"] == 5
    # the reference's referrer-mmp merge (:941) is dead code — the
    # success path always carries a list, never None — so the
    # adjust_external marker contributes nothing
    assert r["mmp_urls"] == []
    assert r["mmp_tld"] is None
    assert r["found_ad_network_tlds"] == ["ads9.com"]


def test_google_ad_networks_html(records):
    r = records["mgoo"]
    assert r["adv_store_id"] == "com.gg.x"


def test_google_slots_walk(records):
    r = records["mgos"]
    assert r["adv_store_id"] == "com.gs.x"


def test_yandex_matched_ad_only(records):
    r = records["myx1"]
    assert r["adv_store_id"] == "com.yx.x"


def test_yandex_no_match_empty_kept(records):
    r = records["myx2"]
    assert r["adv_store_id"] is None
    assert r["creative_initial_domain_tld"] == "yandex.ru"


def test_youappi_request_side(records):
    r = records["myou"]
    assert r["adv_store_id"] == "com.ya.x"


def test_everestop_protobuf_plug_point(records):
    r = records["mevr"]
    assert r["adv_store_id"] is None
    assert r["creative_initial_domain_tld"] == "everestop.io"


@pytest.fixture(scope="module")
def edge_records(spark):
    vids = {k: f"edge{k}{'y' * 4}" for k in ["gm", "mt0"]}
    rows = [
        _creative(f"m{k}", v, 100 + 10 * i, 70_000 + i)
        for i, (k, v) in enumerate(vids.items())
    ]
    # google slots ad with TWO advertiser links: the reference's
    # early-stop condition (exactly one adv) never fires → dropped
    rows.append(_flow(
        "sgm", "https://g.doubleclick.net/v", "doubleclick.net", 50,
        rtext=json.dumps({"slots": [{"ads": [
            {"u": vids["gm"],
             "l1": "market://details?id=com.m1.x",
             "l2": "market://details?id=com.m2.x"}]}]})))
    # mtg with an EMPTY package_name: falsy → generic text parse wins
    rows.append(_flow(
        "smt0", "https://api.mtgglobals.com/v", "mtgglobals.com", 50,
        rtext=json.dumps({
            "v": vids["mt0"],
            "data": {"ads": [{"package_name": "",
                              "l": "market://details?id=com.mr.x"}]}})))
    flows = spark.createDataFrame(rows, _SCHEMA)
    mmps = spark.createDataFrame([("appsflyer.com",)], ["tld_url"])
    addoms = spark.createDataFrame([("ads9.com",)], ["domain_name"])
    apps = spark.createDataFrame(
        [(21, "com.m1.x"), (22, "com.m2.x"), (23, "com.mr.x")],
        ["id", "store_id"])
    calls = cv.add_is_creative(
        cv.add_file_extension(cv.api_calls_from_flows(flows)))
    adv = cv.attribute_creatives(
        calls, mmps, addoms, apps, network_routing=True, persisted=[])
    return {r["mitm_uuid"]: r for r in adv.collect()}


def test_google_slots_multi_adv_dropped(edge_records):
    r = edge_records["mgm"]
    assert r["adv_store_id"] is None
    assert r["advertiser_store_app_ids"] is None
    assert r["creative_initial_domain_tld"] is None


def test_mtg_empty_package_falls_back_to_text(edge_records):
    r = edge_records["mmt0"]
    assert r["adv_store_id"] == "com.mr.x"
    assert r["advertiser_store_app_id"] == 23
