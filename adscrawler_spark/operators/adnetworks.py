"""Per-ad-network AdInfo parsers — the reference's network-specific
branches re-expressed as route + text-derivation columns feeding the
same generic known-parts fold.

Reference (cited per function):
* routing ladder — /root/reference/adscrawler/mitm_ad_parser/
  network_parsers.py:1216-1260 ``parse_sent_video_df`` (init_tld
  elif chain; the fyber tld triple normalizes init_tld to
  'fyber.com'; unity routes by URL substring).
* vungle — :1005-1042 ``parse_vungle_ad``: ad_market_id +
  mmp-filtered tpat click/checkpoint URLs, short-circuiting the text
  parse when the market id is present.
* mtg — :716-736 ``parse_mtg_ad``: data.ads[0].package_name
  short-circuit.
* fyber — :1045-1058 ``parse_fyber_ad``: the x-ia-app-bundle
  response header short-circuit on inner-active.mobi, else a
  clickless URL harvest of the response text.
* youappi — :667-685 ``parse_youappi_ad``: request-blob text when
  the response is the media itself.
* unity — :903-943 ``parse_unity_ad``: bundleId / adjust_external
  referrer extras merged UNDER the generic text parse of the
  response.
* google — :1062-1161 ``parse_google_ad``: ad_networks html
  concatenation (video-matched first, all as fallback), the slots
  early-stop walk, and the xml/html/js raw-text fallback.
* yandex — :688-713 ``parse_yandex_ad``: native.ads filtered to the
  entries containing the video id.
* everestop/bidmachine — :814-900: protobuf payloads, blind-decoded
  (no schema) and walked at the fixed field path
  ``ret[5][6][3][13][2]`` → [3] advertiser store id, [2] ad-network
  tld, [17] bidmachine's parse text.  The engine's decoder is
  ``functions/protowire.py`` (public wire format); the per-route
  combination keeps the reference's abort-order semantics (see
  ``protowire.extract_ad_fields``).  Documented deviation: when the
  fixed path yields no advertiser the reference re-parses
  ``str(ret)`` as a second pass (:848-867) — the engine parses the
  full render in ONE pass only when the path walk failed; a
  completed path whose text parse found nothing keeps that parse
  (the full render is a superset of the [17] text, so the URL
  harvest loses nothing in the failure direction — same class as
  the :1266-1285 re-parse guard deviation below).

Engine shape: routing and the vungle/mtg/fyber/youappi derivations
are pure JVM (``get_json_object`` / header lookups / when-ladders).
The json-array-walking routes (google, yandex, unity) run in ONE
Arrow-vectorized UDF that derives the parse text (and unity/vungle
structural extras) per sent row, memoized per batch over unique
(route, text, video_id) — the reference walks the same json per row
in Python too, so this is the same tier with batching on top.  The
google slots early-stop needs the known-advertiser rule, so the UDF
closure carries the curated MMP/ad-domain lists (hundreds of rows by
construction — the reference loads the same lists into sets per
process).

Documented deviation: the reference's second-parse guard
(network_parsers.py:1266-1285 — re-parse the raw response when a
network parser found nothing, and DROP the row with an error when
that redundant parse finds an advertiser) is not replicated; it is
an error-path discard that never contributes attribution, and it
would double the parse work of every unmatched row.  The engine
keeps the network parser's own (null-advertiser) result instead.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (ArrayType, BooleanType, StringType,
                               StructField, StructType)

from adscrawler_spark.functions.urls import _root_domain
from adscrawler_spark.operators import adpayload as _ap
from adscrawler_spark.operators.adpayload import (
    IGNORE_STORE_IDS,
    extract_and_decode_urls,
)

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://")


def _tld_of_url(url: str) -> str | None:
    """get_tld for one URL (scheme/userinfo/port/path stripped, PSL
    registrable domain) — the python twin of functions.urls'
    vectorized host+root pipeline, for the UDF-side rules."""
    if not url:
        return None
    s = _SCHEME_RE.sub("", url, count=1)
    s = s.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]
    s = s.rsplit("@", 1)[-1].split(":", 1)[0]
    return _root_domain(s)

FYBER_TLDS = ("fyber.com", "tpbid.com", "inner-active.mobi")
PROTOBUF_ROUTES = ("bidmachine", "everestop")


def route_col(init_tld=None, url=None) -> F.Column:
    """The parse_sent_video_df elif ladder (:1235-1260) as a column.
    Order matters: unity is matched by URL *after* the tld equality
    routes, exactly like the reference."""
    init_tld = F.col("init_tld") if init_tld is None else init_tld
    url = F.col("src_url") if url is None else url
    return (
        F.when(init_tld == "vungle.com", F.lit("vungle"))
        .when(init_tld == "bidmachine.io", F.lit("bidmachine"))
        .when(init_tld.isin(*FYBER_TLDS), F.lit("fyber"))
        .when(init_tld == "everestop.io", F.lit("everestop"))
        .when(init_tld == "doubleclick.net", F.lit("google"))
        .when(
            F.coalesce(url, F.lit("")).contains("unityads.unity3d.com"),
            F.lit("unity"),
        )
        .when(init_tld == "mtgglobals.com", F.lit("mtg"))
        .when(init_tld == "yandex.ru", F.lit("yandex"))
        .when(init_tld == "youappi.com", F.lit("youappi"))
        .otherwise(F.lit("generic"))
    )


def effective_init_tld(init_tld=None, route=None) -> F.Column:
    """:1244 — the fyber triple reports init_tld 'fyber.com'."""
    init_tld = F.col("init_tld") if init_tld is None else init_tld
    route = F.col("route") if route is None else route
    return F.when(route == "fyber", F.lit("fyber.com")).otherwise(init_tld)


# --- JVM structural extras -------------------------------------------
_VUNGLE_TPAT_KEYS = ["clickUrl", "checkpoint.0", "checkpoint.100"]
_MTG_ADV_PATH = "$.data.ads[0].package_name"


def mtg_direct_adv(text: F.Column) -> F.Column:
    # :722 'if adv_store_id:' — an empty package_name is falsy and
    # falls back to the generic text parse
    return F.nullif(
        F.get_json_object(text, _MTG_ADV_PATH), F.lit("")
    )


def fyber_direct_adv(init_tld: F.Column, headers_json: F.Column) -> F.Column:
    """inner-active.mobi responses carry the advertiser bundle in the
    x-ia-app-bundle header (:1047-1053).  ``headers_json``: the
    response headers as a JSON object string."""
    return F.when(
        init_tld.contains("inner-active.mobi"),
        F.get_json_object(headers_json, "$['x-ia-app-bundle']"),
    )


def youappi_text(mime: F.Column, response_text: F.Column,
                 request_blob: F.Column) -> F.Column:
    """:671-677 — media responses parse the request side instead."""
    m = F.coalesce(mime, F.lit(""))
    return F.when(
        m.contains("image") | m.contains("video"), request_blob
    ).otherwise(response_text)


# --- the json-walking routes (vungle / google / yandex / unity) -------
_GY_SCHEMA = StructType([
    StructField("parse_text", StringType()),
    StructField("direct_adv", StringType()),
    StructField("direct_mmp", ArrayType(StringType())),
    # true → the row's empty AdInfo survives even with zero
    # extracted URLs (yandex native-no-match semantics)
    StructField("keep_empty", BooleanType()),
])

# compiled from adpayload's shared pattern constants so the UDF-side
# early-stop rule can never drift from the JVM-side classification
_AF_ADV_RE = re.compile(_ap._AF_ADV_RE)
_INTENT_DETAILS_RE = re.compile(_ap._INTENT_DETAILS_RE)
_INTENT_PACKAGE_RE = re.compile(_ap._INTENT_PACKAGE_RE)
_MARKET_DETAILS_RE = re.compile(_ap._MARKET_DETAILS_RE)
_LEADING_ID_RE = re.compile(r"^[a-zA-Z0-9._-]+")


def _adv_ids_in_urls(urls, mmps: frozenset, pub_store_id: str,
                     tld_of) -> list[str]:
    """The advertiser-id slice of parse_urls_for_known_parts
    (:572-640) — just enough to evaluate the google slots early-stop
    condition ('parse found an adv_store_id', :1129)."""
    import urllib.parse

    found = []
    for url in urls:
        tld = tld_of(url) or ""
        if tld in mmps:
            low = url.lower()
            if any(x in low for x in ("/privacy-policy",
                                      "support.appsflyer.com",
                                      "/terms-of-use")):
                continue
            if "websdk.appsflyer.com" in url:
                continue
            if "appsflyer.com" in tld:
                m = _AF_ADV_RE.search(url)
                if m and m.group(1):
                    found.append(m.group(1))
        elif m := _INTENT_DETAILS_RE.search(url):
            if not m.group(1).startswith("bidease.com_"):
                found.append(m.group(1))
        elif m := _INTENT_PACKAGE_RE.search(url):
            found.append(m.group(1))
        elif m := _MARKET_DETAILS_RE.search(url):
            found.append(m.group(1))
        elif "play.google.com" in url and "google.com" in tld:
            if "apps/developer?" in url:
                continue
            try:
                q = urllib.parse.parse_qs(
                    urllib.parse.urlparse(url).query
                )["id"][0]
                m = _LEADING_ID_RE.match(q)
                if m:
                    found.append(
                        m.group(0).rstrip("!@#$%^&*()+=[]{}|\\:;\"'<>?,/")
                    )
            except Exception:
                continue
    ignore = set(IGNORE_STORE_IDS) | {pub_store_id}
    found = [x for x in set(found) if x not in ignore]
    return found


def _google_text(response_text: str, video_id: str,
                 mmps: frozenset, pub_store_id: str, tld_of):
    """parse_google_ad (:1073-1160) minus the db/log plumbing; returns
    the text the generic parser would scan, or None when the reference
    errors out of the row."""
    try:
        g = json.loads(response_text)
    except (json.JSONDecodeError, TypeError):
        if response_text and (
            response_text[0:14] == "<?xml version="
            or response_text[0:15] == "<!DOCTYPE html>"
            or response_text[0:15] == "document.write("
            or response_text[0:3] == "if "
        ):
            return response_text
        return None
    if isinstance(g, dict) and "ad_networks" in g:
        all_html, good_html = "", ""
        for gadn in g["ad_networks"]:
            ad_html = " "
            if "ad" in gadn:
                gad = gadn["ad"]
                if "ad_html" in gad:
                    ad_html = gad["ad_html"]
                elif "ad_json" in gad:
                    ad_html = json.dumps(gad["ad_json"])
                all_html += ad_html
                if video_id in ad_html:
                    good_html += ad_html
        # good first; the all_html fallback replaces it when good is
        # empty/linkless (:1099-1106 — the reference falls back on
        # the 'No URLs found' error)
        if good_html and extract_and_decode_urls(good_html):
            return good_html
        return all_html
    if isinstance(g, dict) and "slots" in g:
        for slot in g["slots"]:
            if video_id in str(slot):
                for ad in slot.get("ads", []):
                    if video_id in str(ad):
                        text = str(ad)
                        urls = extract_and_decode_urls(text)
                        if not urls:
                            # 'No URLs found' error → row dropped
                            return None
                        # the stop condition is adv_store_id not None
                        # (:1129) — the exactly-one rule; a multi-
                        # advertiser ad leaves it None and the walk
                        # continues (and the row drops if nothing
                        # later satisfies it)
                        if len(_adv_ids_in_urls(
                            urls, mmps, pub_store_id, tld_of
                        )) == 1:
                            return text
        return None
    return None


def _yandex_text(response_text: str, video_id: str):
    """parse_yandex_ad (:692-705): native responses narrow the text
    to the ads that contain the video id (python-repr of the matched
    list, like the reference's ``str(matched_ads)``).  Returns
    (text, keep_empty): a native response with no matching ad yields
    the reference's empty-but-kept AdInfo (:699-702)."""
    try:
        t = json.loads(response_text)
    except (json.JSONDecodeError, TypeError):
        return response_text, False
    if isinstance(t, dict) and "native" in t:
        matched = [
            x for x in t["native"].get("ads", []) if video_id in str(x)
        ]
        if not matched:
            return None, True
        return str(matched), False
    return response_text, False


def _unity_extras(url: str, response_text: str):
    """parse_unity_ad (:910-928): the bundleId from the first media
    entry.  The reference ALSO collects an 'adjust.com' marker from
    the adjust_external referrer (:917-928) but the merge guarding it
    (:941 ``found_mmp_urls is None``) is dead code — the success path
    always carries a list ([] included, never None) and the error
    path returns before the merge — so the engine extracts no
    referrer mmp either."""
    adv = None
    if url and "auction-load.unityads.unity3d.com" in url:
        try:
            ad_response = json.loads(response_text)
            mykey = list(ad_response["media"].keys())[0]
            keyresp = ad_response["media"][mykey]
            if "bundleId" in keyresp:
                adv = keyresp["bundleId"]
        except Exception:
            pass
    return adv, None


def _vungle_parse(response_text: str, mmps: frozenset, tld_of):
    """parse_vungle_ad (:1009-1041): ad_market_id short-circuit with
    the mmp-filtered tpat click/checkpoint URLs; a json miss falls
    back to the generic text parse of the response."""
    adv, mmp = None, None
    try:
        d = json.loads(response_text)
        adv = d["ads"][0]["ad_markup"]["ad_market_id"]
        urlkeys = d["ads"][0]["ad_markup"]["tpat"]
        found = []
        for k in _VUNGLE_TPAT_KEYS:
            try:
                for u in urlkeys[k]:
                    if (tld_of(u) or "") in mmps:
                        found.append(u)
            except Exception:
                pass
        mmp = found or None
    except Exception:
        pass
    if adv:
        return None, adv, mmp
    return response_text, None, None


def make_network_text_udf(mmp_tlds: frozenset):
    """Build the Arrow UDF deriving (parse_text, direct_adv,
    direct_mmp, keep_empty) for the json-walking routes (vungle,
    google, yandex, unity).  ``mmp_tlds``: the curated MMP
    registrable-domain set (small by construction — the reference
    loads the same list into a per-process set) for the vungle tpat
    filter and the google slots early-stop rule.  Memoized per batch
    over unique inputs — ad responses repeat across placements."""
    mmps = frozenset(mmp_tlds)

    @pandas_udf(_GY_SCHEMA)
    def derive(route: pd.Series, url: pd.Series, text: pd.Series,
               vid: pd.Series, pub: pd.Series) -> pd.DataFrame:
        cache: dict[tuple, tuple] = {}
        out = []
        for r, u, t, v, p in zip(route, url, text, vid, pub):
            key = (r, u, t, v, p)
            if key in cache:
                out.append(cache[key])
                continue
            parse_text, adv, mmp, keep = None, None, None, False
            t = t if isinstance(t, str) else ""
            if r == "vungle":
                parse_text, adv, mmp = _vungle_parse(t, mmps, _tld_of_url)
            elif r == "google":
                parse_text = _google_text(
                    t, v or "", mmps, p or "", _tld_of_url
                )
            elif r == "yandex":
                parse_text, keep = _yandex_text(t, v or "")
            elif r == "unity":
                parse_text = t
                adv, mmp = _unity_extras(u or "", t)
            res = (parse_text, adv, mmp, keep)
            cache[key] = res
            out.append(res)
        return pd.DataFrame(
            out,
            columns=["parse_text", "direct_adv", "direct_mmp",
                     "keep_empty"],
        )

    return derive


_UDF_ROUTES = ("vungle", "google", "yandex", "unity")


def with_network_fields(
    src: DataFrame,
    mmp_tld_set: frozenset,
    text_col: str = "text",
    url_col: str = "src_url",
    mime_col: str = "src_mime",
    headers_col: str = "src_headers",
    request_blob_col: str = "request_blob",
    content_col: str = "src_content",
    video_col: str = "video_id",
) -> DataFrame:
    """Attach route / parse_text / direct_adv / direct_mmp /
    keep_empty / clicks_enabled to sent rows.  Per-route semantics
    (cited in the module docstring):

    * vungle / mtg / fyber: a structural advertiser suppresses the
      text parse entirely (parse_text null, direct_adv set).
    * fyber without the header: the response text parses WITHOUT
      click expansion (parse_urls_for_known_parts direct call) and
      keeps an empty AdInfo even when no URLs surface.
    * unity: text parses normally; the bundle fills a null
      advertiser after the fold (the referrer-mmp merge is dead code
      in the reference — see _unity_extras).
    * youappi: text swaps to the request blob for media responses.
    * yandex native-no-match: keep_empty row.
    * protobuf routes (bidmachine / everestop): the blind wire decode
      (functions/protowire.py) walks the fixed field path.
      bidmachine parses text — [17] when the path completed, else the
      full render — with the path advertiser filling a null fold
      result and the path tld filling empty found-tlds (:840-870).
      everestop never parses text: the path advertiser/tld ARE the
      AdInfo (:873-900).  Both keep empty AdInfos on decode failure.
      ``direct_tlds`` carries the path tld for the downstream fold.
    """
    t = F.col(text_col)
    d = src.withColumn(
        "route", route_col(F.col("init_tld"), F.col(url_col))
    )
    mtg_adv = mtg_direct_adv(t)
    fyber_adv = fyber_direct_adv(F.col("init_tld"), F.col(headers_col))
    jvm_direct = (
        F.when(F.col("route") == "mtg", mtg_adv)
        .when(F.col("route") == "fyber", fyber_adv)
    )
    jvm_text = (
        F.when(
            F.col("route").isin("generic", "mtg", "fyber"),
            F.when(jvm_direct.isNotNull(),
                   F.lit(None).cast("string")).otherwise(t),
        )
        .when(
            F.col("route") == "youappi",
            youappi_text(F.col(mime_col), t, F.col(request_blob_col)),
        )
        # protobuf routes: no text parse
    )
    gy = make_network_text_udf(mmp_tld_set)(
        F.col("route"), F.col(url_col), t, F.col(video_col),
        F.col("pub_store_id"),
    )
    # filter-split + union, NOT a conditional projection: Spark pulls
    # Python UDFs out of when() branches and would evaluate the Arrow
    # UDF for every generic row (same trap adpayload.payload_urls
    # documents for its two-tier plan)
    needs_udf = F.col("route").isin(*_UDF_ROUTES)
    is_proto = F.col("route").isin(*PROTOBUF_ROUTES)
    no_tlds = F.lit(None).cast("array<string>")
    # the raw content rides only as far as this split — drop it from
    # the union output so the downstream checkpoint/meta joins don't
    # carry payload bytes
    base_cols = [c for c in src.columns if c != content_col]
    base_cols.append("route")
    udf_rows = d.filter(needs_udf).withColumn("_gy", gy).select(
        *base_cols,
        F.col("_gy.parse_text").alias("parse_text"),
        F.col("_gy.direct_adv").alias("direct_adv"),
        F.col("_gy.direct_mmp").alias("direct_mmp"),
        F.coalesce(F.col("_gy.keep_empty"), F.lit(False)).alias(
            "keep_empty"
        ),
        no_tlds.alias("direct_tlds"),
    )
    from adscrawler_spark.functions import protowire as pw

    content = (
        F.col(content_col) if content_col in src.columns
        else F.lit(None).cast("string")
    )
    pb = pw.protobuf_ad_fields_udf()(content)
    proto_rows = d.filter(is_proto).withColumn("_pb", pb).select(
        *base_cols,
        # bidmachine: [17] text when the path completed, else the
        # full render; everestop never parses text
        F.when(
            F.col("route") == "bidmachine",
            F.coalesce(F.col("_pb.pb_text17"), F.col("_pb.pb_full")),
        ).alias("parse_text"),
        # the path advertiser: everestop always; bidmachine only when
        # the try block completed (= [17] extracted) — :846 fill
        F.when(
            (F.col("route") == "everestop")
            | F.col("_pb.pb_text17").isNotNull(),
            F.col("_pb.pb_adv"),
        ).alias("direct_adv"),
        no_tlds.alias("direct_mmp"),
        F.lit(True).alias("keep_empty"),
        F.when(
            F.col("_pb.pb_tld").isNotNull(),
            F.array(F.col("_pb.pb_tld")),
        ).alias("direct_tlds"),
    )
    jvm_rows = d.filter(~needs_udf & ~is_proto).select(
        *base_cols,
        jvm_text.alias("parse_text"),
        jvm_direct.alias("direct_adv"),
        no_tlds.alias("direct_mmp"),
        ((F.col("route") == "fyber") & jvm_direct.isNull()).alias(
            "keep_empty"
        ),
        no_tlds.alias("direct_tlds"),
    )
    return (
        udf_rows.unionByName(proto_rows).unionByName(jvm_rows)
        # every text parse goes through parse_text_for_adinfo (click
        # expansion included) EXCEPT fyber's clickless direct call
        .withColumn(
            "clicks_enabled",
            F.col("parse_text").isNotNull()
            & (F.col("route") != "fyber"),
        )
        .withColumn("init_tld", effective_init_tld())
    )
