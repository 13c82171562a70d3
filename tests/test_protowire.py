"""Blind protobuf decode + the bidmachine/everestop routed parsers.

Reference semantics pinned here:
* network_parsers.py:814-871 parse_bidmachine_ad — fixed path
  [5][6][3][13][2]: [3] advertiser, [2] tld, [17] parse text; the
  path advertiser fills a null parse result; the path tld fills empty
  found-tlds; a failed path walk parses the full render instead.
* :873-900 parse_everestop_ad — [3]/[2] only, never parses text.
* :823-826 — response_content stored as a stringified bytes literal
  is ast.literal_eval'd back.
"""

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from adscrawler_spark.functions import protowire as pw
from adscrawler_spark.operators import creatives as cv

# ------------------------------------------------------------------
# pure wire-format round-trips
# ------------------------------------------------------------------


@given(st.integers(min_value=0, max_value=(1 << 63) - 1))
def test_varint_roundtrip(n):
    enc = pw.encode_varint(n)
    assert pw._read_varint(enc, 0) == (n, len(enc))


@settings(max_examples=50)
@given(
    st.dictionaries(
        st.integers(min_value=1, max_value=200),
        st.one_of(
            st.integers(min_value=0, max_value=1 << 40),
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Lu", "Ll", "Nd"),
                ),
                min_size=0, max_size=20,
            ),
        ),
        min_size=1, max_size=6,
    )
)
def test_message_roundtrip(fields):
    raw = pw.encode_message(fields)
    dec = pw.blind_decode(raw)
    assert dec is not None
    for k, v in fields.items():
        got = dec[k]
        if isinstance(v, str) and len(v) < 2:
            # 0/1-char strings can only come back as strings
            assert got == v
        else:
            assert got == v


def test_nested_message_roundtrip():
    tree = {1: {2: {3: "deep value", 4: 7}}, 9: "top"}
    dec = pw.blind_decode(pw.encode_message(tree))
    assert dec[1][2][3] == "deep value"
    assert dec[1][2][4] == 7
    assert dec[9] == "top"


def test_repeated_field_last_wins():
    raw = pw.encode_message({5: ["first", "second"]})
    assert pw.blind_decode(raw)[5] == "second"


def test_printable_text_stays_text():
    # 'adnet.com' aliases a valid fixed64 field; text must win
    raw = pw.encode_message({2: "adnet.com"})
    assert pw.blind_decode(raw)[2] == "adnet.com"


def test_non_utf8_leaf_stays_bytes():
    raw = pw.encode_message({4: b"\xff\xfe\x01"})
    assert pw.blind_decode(raw)[4] == b"\xff\xfe\x01"


def test_group_wire_type_rejected():
    # tag = field 1, wire type 3 (start group)
    assert pw.blind_decode(bytes([0x0B, 0x0C])) is None


def test_truncated_payload_rejected():
    raw = pw.encode_message({1: "hello"})[:-2]
    assert pw.blind_decode(raw) is None


# ------------------------------------------------------------------
# the fixed ad path, abort-order semantics
# ------------------------------------------------------------------

def _payload(inner, extra=None):
    tree = {5: {6: {3: {13: {2: inner}}}}}
    if extra:
        tree[5].update(extra)
    return pw.encode_message(tree)


def test_extract_complete_path():
    raw = _payload({3: "com.adv.app", 2: "adnet.com", 17: "txt here"})
    adv, tld, t17, full = pw.extract_ad_fields(raw)
    assert (adv, tld, t17) == ("com.adv.app", "adnet.com", "txt here")
    assert "com.adv.app" in full


def test_extract_missing_3_aborts_everything():
    adv, tld, t17, full = pw.extract_ad_fields(
        _payload({2: "adnet.com", 17: "txt"})
    )
    assert (adv, tld, t17) == (None, None, None)
    assert "adnet.com" in full


def test_extract_missing_2_keeps_adv_only():
    # [2] is read second: everestop keeps the advertiser, bidmachine
    # aborts to the full-render parse with no tld fill
    adv, tld, t17, _ = pw.extract_ad_fields(
        _payload({3: "com.adv.app", 17: "txt"})
    )
    assert (adv, tld, t17) == ("com.adv.app", None, None)


def test_extract_missing_17_keeps_adv_and_tld():
    adv, tld, t17, _ = pw.extract_ad_fields(
        _payload({3: "com.adv.app", 2: "adnet.com"})
    )
    assert (adv, tld, t17) == ("com.adv.app", "adnet.com", None)


def test_extract_stringified_bytes_storage_form():
    raw = _payload({3: "com.adv.app", 2: "adnet.com", 17: "t"})
    assert pw.extract_ad_fields(repr(raw))[0] == "com.adv.app"


def test_extract_non_message_payload():
    adv, tld, t17, full = pw.extract_ad_fields(
        b"plain market://details?id=com.q.r text"
    )
    assert (adv, tld, t17) == (None, None, None)
    assert full == "plain market://details?id=com.q.r text"


def test_extract_null_and_empty():
    assert pw.extract_ad_fields(None) == (None, None, None, None)
    assert pw.extract_ad_fields(b"") == (None, None, None, "")


# ------------------------------------------------------------------
# end-to-end through attribute_creatives(network_routing=True)
# ------------------------------------------------------------------

T0 = dt.datetime(2024, 3, 1)

_SCHEMA = (
    "run_id string, pub_store_id string, mitm_uuid string, url string, "
    "tld_url string, called_at timestamp, status_code int, "
    "response_mime_type string, response_size_bytes long, "
    "response_text string, response_content string, "
    "query_params string, response_headers string, post_params string, "
    "request_text string"
)


def _flow(uuid, url, tld, sec, *, rtext=None, content=None, size=0,
          mime=None):
    return ("r1", "com.pub.app", uuid, url, tld,
            T0 + dt.timedelta(seconds=sec), 200, mime, size, rtext,
            content, None, None, None, None)


def _creative(uuid, vid, sec, size):
    return _flow(
        uuid, f"https://s0.2mdn.net/id/{vid}/file.mp4", "2mdn.net",
        sec, mime="video/mp4", size=size, content=f"C{uuid}",
    )


def _bm(uuid, vid, content):
    return _flow(uuid, "https://api.bidmachine.io/v", "bidmachine.io",
                 50, rtext=f"resp {vid} x", content=content)


def _ev(uuid, vid, content):
    return _flow(uuid, "https://sdk.everestop.io/v", "everestop.io",
                 50, rtext=f"resp {vid} market://details?id=com.decoy.x",
                 content=content)


@pytest.fixture(scope="module")
def records(spark):
    vids = {k: f"video{k}{'x' * 4}" for k in
            ["bm1", "bm2", "bm3", "bm4", "bm5", "ev1", "ev2", "evp"]}
    rows = [
        _creative(f"m{k}", v, 100 + 10 * i, 60_000 + i)
        for i, (k, v) in enumerate(vids.items())
    ]
    # bm1: complete path, URL-less [17] text → the path advertiser
    # fills; the path tld fills the empty found-tlds
    rows.append(_bm("sbm1", vids["bm1"], repr(_payload(
        {3: "com.bm1.app", 2: "adnet1.com", 17: "no links in here"}
    ))))
    # bm2: complete path, [17] text carries its own advertiser — the
    # text parse wins over the path advertiser; the tld still fills
    rows.append(_bm("sbm2", vids["bm2"], repr(_payload(
        {3: "com.bm2p.app", 2: "adnet2.com",
         17: "see market://details?id=com.bm2t.app end"}
    ))))
    # bm3: [17] missing → the FULL render parses (the market url sits
    # in a sibling subtree); the tld was read before the abort → fills
    rows.append(_bm("sbm3", vids["bm3"], repr(_payload(
        {3: "com.bm3p.app", 2: "adnet3.com"},
        extra={9: "deep market://details?id=com.bm3.app ok"},
    ))))
    # bm4: content is not a protobuf message at all → the rendered
    # text (the raw string) parses
    rows.append(_bm("sbm4", vids["bm4"],
                    repr(b"raw market://details?id=com.bm4.app z")))
    # bm5: no content → decode failure → empty-but-kept AdInfo
    rows.append(_bm("sbm5", vids["bm5"], None))
    # ev1: complete path → structural AdInfo(adv, [tld]); the decoy
    # market url in response_text must be IGNORED (no text parse)
    rows.append(_ev("sev1", vids["ev1"], repr(_payload(
        {3: "com.ev1.app", 2: "adnet4.com", 17: "ignored for everestop"}
    ))))
    # ev2: path misses [3] → empty-but-kept AdInfo
    rows.append(_ev("sev2", vids["ev2"], repr(_payload(
        {2: "adnet5.com"}
    ))))
    # evp: path advertiser equals the publisher → the AdInfo is
    # dropped outright (:1288) — neither the advertiser nor its tld
    # may leak into the creative's attribution
    rows.append(_ev("sevp", vids["evp"], repr(_payload(
        {3: "com.pub.app", 2: "adnet6.com"}
    ))))

    flows = spark.createDataFrame(rows, _SCHEMA)
    mmps = spark.createDataFrame(
        [("appsflyer.com",), ("adjust.com",)], ["tld_url"])
    addoms = spark.createDataFrame([("ads9.com",)], ["domain_name"])
    apps = spark.createDataFrame(
        [(1, "com.bm1.app"), (2, "com.bm2t.app"), (3, "com.bm2p.app"),
         (4, "com.bm3.app"), (5, "com.bm4.app"), (6, "com.ev1.app"),
         (7, "com.decoy.x"), (8, "com.pub.app")],
        ["id", "store_id"])
    calls = cv.add_is_creative(
        cv.add_file_extension(cv.api_calls_from_flows(flows)))
    adv = cv.attribute_creatives(
        calls, mmps, addoms, apps, network_routing=True, persisted=[],
    )
    return {r["mitm_uuid"]: r for r in adv.collect()}


def test_bidmachine_path_adv_fills_empty_parse(records):
    r = records["mbm1"]
    assert r["adv_store_id"] == "com.bm1.app"
    assert r["advertiser_store_app_id"] == 1
    assert r["found_ad_network_tlds"] == ["adnet1.com"]
    assert r["creative_initial_domain_tld"] == "bidmachine.io"


def test_bidmachine_text_adv_wins_tld_still_fills(records):
    r = records["mbm2"]
    assert r["adv_store_id"] == "com.bm2t.app"
    assert r["advertiser_store_app_id"] == 2
    assert r["found_ad_network_tlds"] == ["adnet2.com"]


def test_bidmachine_partial_path_full_render_parse(records):
    r = records["mbm3"]
    assert r["adv_store_id"] == "com.bm3.app"
    assert r["found_ad_network_tlds"] == ["adnet3.com"]


def test_bidmachine_non_message_content_text_parse(records):
    r = records["mbm4"]
    assert r["adv_store_id"] == "com.bm4.app"
    assert r["found_ad_network_tlds"] == []


def test_bidmachine_decode_failure_empty_kept(records):
    r = records["mbm5"]
    assert r["adv_store_id"] is None
    assert r["found_ad_network_tlds"] == []
    assert r["creative_initial_domain_tld"] == "bidmachine.io"


def test_everestop_structural_adinfo(records):
    r = records["mev1"]
    assert r["adv_store_id"] == "com.ev1.app"
    assert r["advertiser_store_app_id"] == 6
    assert r["found_ad_network_tlds"] == ["adnet4.com"]
    assert r["mmp_urls"] == []
    assert r["creative_initial_domain_tld"] == "everestop.io"


def test_everestop_no_path_empty_kept(records):
    r = records["mev2"]
    assert r["adv_store_id"] is None


def test_everestop_publisher_id_dropped(records):
    r = records["mevp"]
    assert r["adv_store_id"] is None
    assert r["advertiser_store_app_id"] is None
    assert r["found_ad_network_tlds"] == []
