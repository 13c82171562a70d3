"""Ad-payload URL harvesting: parity vs the reference's own extraction
code, plus Spark-side plumbing checks.

The reference module (mitm_ad_parser/network_parsers.py) imports
protod/bs4/requests at module scope, so it cannot be imported here;
instead the *pure* extraction functions (regex constants through
``_extract_urls_from_chunks`` and the non-XML body of
``extract_and_decode_urls``) are exec'd out of the reference source and
run side-by-side with the port on adversarial payloads.
"""

import html
import re
import urllib
import urllib.parse

import pytest
from pyspark.sql import functions as F

from adscrawler_spark.operators import adpayload as ap

REF = "/root/reference/adscrawler/mitm_ad_parser/network_parsers.py"


def _load_reference_extractor():
    src = open(REF).read()
    # constants + helpers live between URL_PATTERN block and
    # extract_and_decode_urls; exec everything that has no external
    # dependency (the file's module-scope imports are NOT run).
    wanted = []
    lines = src.splitlines(keepends=True)
    capture = False
    for i, ln in enumerate(lines):
        if ln.startswith(("SUPPORTED_URL_SCHEMES", "MAX_URL_EXTRACTION_DEPTH",
                          "URL_PATTERN", "URL_VALUE_HINT_RE",
                          "ENCODED_SCHEME_RE", "DECODED_CONTEXT_DELIMITERS_RE",
                          "TRAILING_ENCODED_URL_DELIMITER_RE")):
            capture = True
        if ln.startswith("def "):
            name = ln.split("(")[0][4:]
            capture = name in {
                "strip_trailing_encoded_url_delimiters",
                "_has_balanced_delimiters", "_is_reasonable_decoded_url",
                "_is_valid_extracted_url", "_decode_scheme_markers",
                "_scrub_decoded_context_delimiters", "_normalize_extracted_url",
                "_extract_query_value_chunks", "_derive_additional_search_chunks",
                "_build_initial_search_chunks", "_extract_urls_from_chunks",
            }
        if ln.startswith(("PLAYSTORE_URL_PARTS", "ANDROID_USER_AGENT",
                          "IGNORE_STORE_IDS", "IGNORE_PRIVACY_URLS",
                          "logger =")):
            capture = False
        if capture:
            wanted.append(ln)
    ns = {"re": re, "html": html, "urllib": urllib}
    exec("".join(wanted), ns)

    def ref_extract(text: str) -> set[str]:
        # extract_and_decode_urls minus the XML/VAST head (exercised
        # separately) — network_parsers.py:297-301.
        chunks = ns["_build_initial_search_chunks"](text=text, vast_urls=[])
        return set(ns["_extract_urls_from_chunks"](chunks))

    return ref_extract


PAYLOADS = [
    "imp https://cab12.com/t?cb=9f3e end",
    "click https://r1.org/redir?u=http%3A%2F%2Ft2.net%2Fp%2F77 end",
    "open intent://details?id=com.g.app end market://details?id=com.h.x",
    'json {"click":"https://q.com/t?x=1","i":"https://i.co/p"} tail',
    "no urls at all",
    "",
    # trailing encoded delimiter stripping
    "x https://a.com/p%5D y",
    "x https://a.com/p?q=%5Bv%5D end",
    # html entities
    "a https://e.com/p?u=http%3A%2F%2Fn.io%2Fq&amp;z=1 b",
    # unicode escapes
    "pre https:\\/\\/esc.com\\/path post",
    # fragment with query-ish values
    "f https://fr.ag/p#u=http%3A%2F%2Ffg.me%2Fz end",
    # nested two levels deep
    "n https://o1.com/r?u=http%3A%2F%2Fo2.com%2Fr%3Fu%3Dhttp%253A%252F%252Fo3.com%252Fend q",
    # unsupported scheme and bare domain
    "ftp://nope.com/x and bare.com/path",
    # percent-encoded whole payload, no literal ://
    "http%3A%2F%2Fenc.only%2Fpage",
    # parens/brackets terminators
    "see (https://par.en/x) [https://brk.et/y] {https://brc.es/z}",
    # market inside intent query
    "go intent://launch?package=com.pkg.one&u=market%3A%2F%2Fdetails%3Fid%3Dcom.two end",
    # null bytes
    "nul https://nu\x00l.com/p end",
    # commas and semicolons
    "a https://c1.com/x,https://c2.com/y;https://c3.com/z b",
]


def test_extraction_parity_with_reference():
    ref_extract = _load_reference_extractor()
    for p in PAYLOADS:
        got = set(ap.extract_and_decode_urls(p)) if p else set()
        want = ref_extract(p) if p else set()
        assert got == want, (p, got, want)


def test_vast_xml_extraction():
    v = ('<?xml version="1.0"?><VAST version="3.0"><Ad><InLine>'
         "<Impression>https://v.com/imp?c=12</Impression><Creatives>"
         "<MediaFile>https://m.net/f.mp4</MediaFile></Creatives>"
         "</InLine></Ad></VAST>")
    assert ap.extract_and_decode_urls(v) == [
        "https://m.net/f.mp4", "https://v.com/imp?c=12",
    ]
    # malformed XML falls back to raw-text regex extraction
    broken = '<?xml version="1.0"?><VAST><Impression>https://b.co/i</Impr'
    assert ap.extract_and_decode_urls(broken) == ["https://b.co/i"]


def test_video_fields_meta_cdata():
    vast_inner = html.escape(
        "<VAST><Ad><![CDATA[https://cd.ata/track?x=1]]></Ad></VAST>"
    )
    doc = f'<html><meta name="video_fields" content="{vast_inner}"/></html>'
    assert "https://cd.ata/track?x=1" in ap.extract_and_decode_urls(doc)


def test_payload_urls_spark_plumbing(spark):
    rows = [
        ("a", "imp https://one.com/t?cb=1 end"),
        ("b", "click https://r.org/redir?u=http%3A%2F%2Ftw.net%2Fp end"),
        ("c", "no urls"),
        ("d", None),
        ("e", "imp https://one.com/t?cb=1 end"),  # duplicate payload
    ]
    df = spark.createDataFrame(rows, ["api_call_id", "payload"])
    out = ap.payload_urls(df.repartition(2), "payload").collect()
    got = {(r.api_call_id, r.url) for r in out}
    assert got == {
        ("a", "https://one.com/t?cb=1"),
        ("e", "https://one.com/t?cb=1"),
        ("b", "http://tw.net/p"),
        ("b", "https://r.org/redir?u=http://tw.net/p"),
    }


def test_known_parts_classification(spark):
    urls = [
        # appsflyer MMP + adv id
        (1, "pub.app", "https://app.appsflyer.com/com.adv.game?pid=x"),
        # websdk: mmp only, no adv
        (1, "pub.app", "https://websdk.appsflyer.com/sdk?x=1"),
        # support.appsflyer.com: skipped outright
        (1, "pub.app", "https://support.appsflyer.com/help"),
        # intent details adv
        (1, "pub.app", "intent://details?id=com.int.app"),
        # bidease: ad network, not adv
        (1, "pub.app", "intent://details?id=bidease.com_99"),
        # ad network domain
        (1, "pub.app", "https://cdn.adnet1.com/c.js"),
        # ad network domain but privacy path — dropped
        (1, "pub.app", "https://adnet1.com/privacy-policy"),
        # publisher's own id — filtered from adv list
        (2, "com.pub.two", "market://details?id=com.pub.two"),
        (2, "com.pub.two", "market://details?id=com.other.one"),
        # ignore store id
        (2, "com.pub.two", "market://details?id=com.android.vending"),
        # play url adv
        (3, "p3", "https://play.google.com/store/apps/details?id=com.play.x&hl=en"),
        # play developer url — nothing
        (3, "p3", "https://play.google.com/store/apps/developer?id=Some+Dev"),
        # two advs -> multiple
        (4, "p4", "intent://details?id=com.a.one"),
        (4, "p4", "market://details?id=com.b.two"),
    ]
    df = spark.createDataFrame(urls, ["api_call_id", "pub_store_id", "url"])
    mmps = spark.createDataFrame([("appsflyer.com",)], ["tld_url"])
    ads = spark.createDataFrame(
        [("adnet1.com",), ("bidease.com",)], ["domain_name"]
    )
    out = {r.api_call_id: r for r in ap.known_parts(df, mmps, ads).collect()}
    r1 = out[1]
    # the appsflyer regex extracts com.adv.game AND the intent url
    # yields com.int.app -> two advertiser ids -> the exactly-one rule
    # nulls adv_store_id and carries the list instead
    assert r1.adv_store_id is None
    assert set(r1.advertiser_store_app_ids.split(",")) == {
        "com.adv.game", "com.int.app",
    }
    assert set(r1.mmp_urls.split(",")) == {
        "https://app.appsflyer.com/com.adv.game?pid=x",
        "https://websdk.appsflyer.com/sdk?x=1",
    }
    assert set(r1.ad_network_tlds.split(",")) == {"adnet1.com", "bidease.com"}
    r2 = out[2]
    assert r2.adv_store_id == "com.other.one"
    assert r2.advertiser_store_app_ids is None
    r3 = out[3]
    assert r3.adv_store_id == "com.play.x"
    assert r3.ad_network_tlds == ""
    r4 = out[4]
    assert r4.adv_store_id is None
    assert set(r4.advertiser_store_app_ids.split(",")) == {
        "com.a.one", "com.b.two",
    }


def test_video_fields_meta_attr_order_and_quotes():
    """BeautifulSoup accepts any attribute order/quoting — the regex
    port must too (code-review finding)."""
    vast_inner = html.escape(
        "<VAST><Ad><![CDATA[https://cd.ata/track?x=1]]></Ad></VAST>"
    )
    reversed_attrs = (
        f'<html><meta content="{vast_inner}" name="video_fields"/></html>'
    )
    assert "https://cd.ata/track?x=1" in ap.extract_and_decode_urls(
        reversed_attrs
    )
    single_quoted = (
        "<html><meta name='video_fields' content='"
        + vast_inner.replace('"', "&quot;")
        + "'/></html>"
    )
    assert "https://cd.ata/track?x=1" in ap.extract_and_decode_urls(
        single_quoted
    )


def test_play_id_ignores_nested_url_params(spark):
    """adv_id_from_play_url parses the OUTER query via parse_qs — an
    id= inside another param's nested URL must not win (code-review
    finding)."""
    urls = [
        (1, "pub", "https://play.google.com/redirect?url=https://foo.com?id=com.bad&id=com.real"),
        (2, "pub", "https://play.google.com/store/apps/details?id=com.first&ref=x?id=com.second"),
    ]
    df = spark.createDataFrame(urls, ["api_call_id", "pub_store_id", "url"])
    mmps = spark.createDataFrame([("appsflyer.com",)], ["tld_url"])
    ads = spark.createDataFrame([("adnet1.com",)], ["domain_name"])
    out = {r.api_call_id: r for r in ap.known_parts(df, mmps, ads).collect()}
    assert out[1].adv_store_id == "com.real"
    assert out[2].adv_store_id == "com.first"


def test_payload_span_rows_shapes():
    """Interleaved span split: text runs + raw URL media_refs with
    contiguous offsets; URL-only and empty payloads."""
    assert ap.payload_span_rows("https://a.com/x") == [
        ("media_ref", None, "https://a.com/x", 0)
    ]
    assert ap.payload_span_rows("") == []
    got = ap.payload_span_rows("x https://a.com/1 y https://b.com/2")
    assert [s[0] for s in got] == ["text", "media_ref", "text", "media_ref"]
    assert [s[3] for s in got] == [0, 1, 2, 3]
    # raw form preserved (no decoding in the span layer)
    enc = ap.payload_span_rows("z https://a.com/p?u=http%3A%2F%2Fb.io q")
    assert enc[1][2] == "https://a.com/p?u=http%3A%2F%2Fb.io"


def test_two_tier_payload_urls_matches_python_extractor(spark):
    """The JVM depth-0 tier and the Python tier must agree with
    extract_and_decode_urls row-for-row — including payloads crafted
    to sit right on the tier boundary."""
    payloads = [
        # marker-free → JVM tier
        "imp https://ca1.com/t?cb=2 end",
        "click intent://details?id=com.a.b market://details?id=com.c.d",
        "u https://a.com/x?p=1&q=2;u2 https://b.net/y.mp4\ttail",
        "(https://par.en.com/x),{https://brace.com/y}",
        "https://host.com:8080/p http://user@host2.com/q",
        "https://trail.com/x?a=1,next",
        "scheme case HTTPS://upper.com/x stays unmatched",
        "empty-host https://: and https://@ and market://m",
        # boundary: '&not' is an html5 semicolonless entity → Python
        "https://e.com/x?not=1&copy=2",
        "https://e.com/x?plain=1&safe=2",
        # second :// inside a match → Python tier recursion
        "wrap https://r.org/redir?u=http://inner.net/p/x end",
        # encoded scheme → Python tier
        "enc https://r.org/go?u=http%3A%2F%2Fdeep.net%2Fz",
        # entity-encoded ampersands
        "amp https://x.com/a?b=1&amp;c=https://y.com/d",
        # VAST XML
        '<?xml version="1.0"?><VAST version="3.0"><Ad><InLine>'
        "<Impression>https://v.com/imp?c=9</Impression>"
        "<MediaFile>https://m.net/f.mp4</MediaFile></InLine></Ad></VAST>",
        # backslash escapes (json-ish)
        '{"u":"https:\\/\\/js.on.com\\/path"}',
        # NUL byte scrub
        "nul https://n.com/x\x00tail",
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i int, payload string"
    )
    got = {}
    for r in ap.payload_urls(df, "payload").collect():
        got.setdefault(r["i"], []).append(r["url"])
    for i, p in enumerate(payloads):
        expected = ap.extract_and_decode_urls(p) if p else []
        assert sorted(got.get(i, [])) == sorted(expected), (
            i, p, sorted(got.get(i, [])), expected
        )
