"""Ad-response payload URL harvesting and known-part attribution.

The reference's mitm ad parser extracts every URL hidden inside an ad
network's response payload — raw text, VAST XML trackers, HTML-escaped
blobs, and URLs percent-encoded inside other URLs' query strings — and
then classifies each URL into MMP links, advertiser store ids, and ad
network domains that feed the creative-attribution joins.

Semantics ported (cited per function):
* ``extract_and_decode_urls`` —
  /root/reference/adscrawler/mitm_ad_parser/network_parsers.py:259-301
  (driver), :41-49 URL_PATTERN, :83-105
  strip_trailing_encoded_url_delimiters, :117-151 normalize/validate,
  :153-195 query-value chunk derivation, :197-225 initial chunks,
  :226-257 the depth-bounded chunk worklist.
* ``known_parts`` / ``payload_known_parts`` —
  network_parsers.py:563-647 ``parse_urls_for_known_parts`` and
  :351-360 ``adv_id_from_play_url``.

Spark-first shape: extraction is a per-payload pure function behind an
Arrow-vectorized ``pandas_udf`` that memoizes over *unique* payloads
per batch — ad responses are heavily duplicated (one creative served
to many placements), so the unique count per batch sits far below the
row count, exactly like the URL canonicalizer.  Classification is pure
JVM (``regexp_extract`` / ``contains`` / joins against the small MMP
and ad-domain dimensions) followed by one hash aggregation per
api_call — no Python in that path at all.

The reference parses the ``<meta name="video_fields">`` branch with
BeautifulSoup (not available here); the port matches it with regexes,
which is behavior-equivalent for well-formed meta tags (the only shape
the reference branch consumes).
"""

from __future__ import annotations

import html
import re
import urllib.parse
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

# --- constants (network_parsers.py:36-80) ----------------------------
SUPPORTED_URL_SCHEMES = {"http", "https", "intent", "market",
                         "fybernativebrowser"}
MAX_URL_EXTRACTION_DEPTH = 4

URL_PATTERN = re.compile(
    r"""(?:
    (?:https?|intent|market|fybernativebrowser):\/\/
    [^\s'"<>\]\)\}]+?
)
(?=[\s"\\;'<>"]|[\]\)\}\{,]|$)
""",
    re.VERBOSE,
)
URL_VALUE_HINT_RE = re.compile(r"(?i)(?:://|%3A%2F%2F)")
ENCODED_SCHEME_RE = re.compile(
    r"(?i)\b(https?|intent|market|fybernativebrowser)%3A%2F%2F"
)
DECODED_CONTEXT_DELIMITERS_RE = re.compile(r"[\[\]<>]")
TRAILING_ENCODED_URL_DELIMITER_RE = re.compile(r"(?i)(%5D|%3E|%5B|%3C)$")

IGNORE_STORE_IDS = ["com.android.vending"]
IGNORE_PRIVACY_URLS = [
    "/policy.html", "/legal", "/policy", "/privacy", "privacy_policy",
    "/your-personal-data", "private-policy.html", "/privacypolicy",
    "privacy-policy", "data-protection", "/data-privacy",
]

_VAST_TRACKER_TAGS = ["Impression", "ClickThrough", "ClickTracking",
                      "MediaFile", "Tracking"]


# --- per-payload extraction (network_parsers.py:83-301) --------------
def strip_trailing_encoded_url_delimiters(url: str) -> str:
    """network_parsers.py:83-105 — pop unmatched encoded wrapper
    delimiters (%5D/%3E/%5B/%3C) off the URL tail."""
    pairs = {"%5d": ("[", "]"), "%5b": ("[", "]"),
             "%3e": ("<", ">"), "%3c": ("<", ">")}
    while True:
        m = TRAILING_ENCODED_URL_DELIMITER_RE.search(url)
        if m is None:
            return url
        token = m.group(1).lower()
        open_char, close_char = pairs[token]
        decoded = urllib.parse.unquote(url)
        n_open, n_close = decoded.count(open_char), decoded.count(close_char)
        strip = (token in {"%5d", "%3e"} and n_close > n_open) or (
            token in {"%5b", "%3c"} and n_open > n_close
        )
        if not strip:
            return url
        url = url[: -len(m.group(1))]


def _is_reasonable_decoded_url(url: str) -> bool:
    if "<" in url or ">" in url:
        return False
    return url.count("[") == url.count("]")


def _is_valid_extracted_url(url: str) -> bool:
    if url.count("[") != url.count("]"):
        return False
    try:
        parsed = urllib.parse.urlsplit(url)
        hostname = parsed.hostname
    except (ValueError, Exception):
        return False
    if not hostname or any(c in hostname for c in "%[]<>'\""):
        return False
    return parsed.scheme.lower() in SUPPORTED_URL_SCHEMES


def _decode_scheme_markers(text: str) -> str:
    return ENCODED_SCHEME_RE.sub(lambda m: f"{m.group(1)}://", text)


def _normalize_extracted_url(url: str) -> str | None:
    cleaned = strip_trailing_encoded_url_delimiters(url.replace("\x00", ""))
    decoded = urllib.parse.unquote(cleaned)
    normalized = (
        decoded
        if decoded != cleaned and _is_reasonable_decoded_url(decoded)
        else cleaned
    )
    return normalized if _is_valid_extracted_url(normalized) else None


def _extract_query_value_chunks(url: str) -> list[str]:
    values: list[str] = []
    try:
        parsed = urllib.parse.urlsplit(url)
    except ValueError:
        return values
    blobs = [parsed.query]
    if parsed.fragment and "=" in parsed.fragment:
        blobs.append(parsed.fragment)
    for blob in blobs:
        if not blob:
            continue
        for item in blob.split("&"):
            if not item:
                continue
            _, _sep, value = item.partition("=")
            if value and URL_VALUE_HINT_RE.search(value):
                values.append(value)
    return values


def _derive_additional_search_chunks(url: str) -> list[tuple[str, bool]]:
    out: list[tuple[str, bool]] = []
    for value in _extract_query_value_chunks(url):
        out.append((value, True))
        scheme_dec = _decode_scheme_markers(value)
        if scheme_dec != value:
            out.append((scheme_dec, True))
        decoded = urllib.parse.unquote(value)
        if decoded != value:
            out.append((decoded, True))
            scrubbed_dec = DECODED_CONTEXT_DELIMITERS_RE.sub(" ", decoded)
            if scrubbed_dec != decoded:
                out.append((scrubbed_dec, True))
        unescaped = html.unescape(value)
        if unescaped != value:
            out.append((unescaped, True))
        scrubbed = DECODED_CONTEXT_DELIMITERS_RE.sub(" ", value)
        if scrubbed != value:
            out.append((scrubbed, True))
    return out


def _vast_urls(text: str) -> list[str]:
    """network_parsers.py:261-297 — VAST tracker extraction (stdlib ET)
    plus the video_fields / <vast> CDATA branch (regex in place of the
    reference's BeautifulSoup)."""
    vast_urls: list[str] = []
    if "<?xml version" in text[0:13]:
        tree = None
        try:
            tree = ET.fromstring(text)
        except ET.ParseError:
            try:
                tree = ET.fromstring(html.unescape(text))
            except ET.ParseError:
                pass
        if tree is not None:
            for tag in _VAST_TRACKER_TAGS:
                for el in tree.iter(tag):
                    if el.text:
                        vast_urls.append(el.text.strip())
    if text.strip().startswith("<") and (
        '<meta name="video_fields"' in text.lower() or "<vast" in text.lower()
    ):
        # BeautifulSoup accepts any attribute order and quoting; match
        # the tag first, then pull content out of it, either quote
        # style, name before or after content.
        tag = re.search(
            r"<meta\b[^>]*\bname=[\"']video_fields[\"'][^>]*>",
            text, re.IGNORECASE | re.DOTALL,
        )
        if tag:
            content = re.search(
                r"\bcontent=(\"(.*?)\"|'(.*?)')",
                tag.group(0), re.IGNORECASE | re.DOTALL,
            )
            if content:
                vast_xml = html.unescape(
                    content.group(2)
                    if content.group(2) is not None
                    else content.group(3)
                )
                vast_urls += re.findall(r"<!\[CDATA\[(.*?)\]\]>", vast_xml)
        if re.search(r"<vast[\s>]", text, re.IGNORECASE):
            vast_urls += re.findall(r"<!\[CDATA\[(.*?)\]\]>", text)
    return vast_urls


def _build_initial_search_chunks(
    text: str, vast_urls: list[str]
) -> list[tuple[str, bool]]:
    chunks: list[tuple[str, bool]] = [(text, True)]
    unescaped = html.unescape(text)
    if unescaped != text:
        chunks.append((unescaped, True))
    try:
        unicode_decoded = text.encode("utf-8").decode("unicode_escape")
    except (UnicodeDecodeError, UnicodeEncodeError):
        unicode_decoded = None
    if unicode_decoded and unicode_decoded != text:
        chunks.append((unicode_decoded, True))
    if "://" not in text:
        scheme_dec = _decode_scheme_markers(text)
        if scheme_dec != text:
            chunks.append((scheme_dec, True))
        decoded = urllib.parse.unquote(text)
        if decoded != text:
            chunks.append((decoded, True))
            scheme_dec2 = _decode_scheme_markers(decoded)
            if scheme_dec2 != decoded:
                chunks.append((scheme_dec2, True))
    for url in vast_urls:
        chunks.append((url, True))
    return chunks


def extract_and_decode_urls(text: str) -> list[str]:
    """Depth-bounded URL harvest from one ad payload
    (network_parsers.py:226-301).  Returns a *sorted* list — the
    reference returns set order; sorting makes the operator
    deterministic without changing the set."""
    if not text:
        return []
    chunks = _build_initial_search_chunks(text, _vast_urls(text))
    found: set[str] = set()
    seen_chunks: set[tuple[str, bool]] = set()
    processed: set[str] = set()
    current = chunks
    for _depth in range(MAX_URL_EXTRACTION_DEPTH):
        if not current:
            break
        nxt: list[tuple[str, bool]] = []
        for chunk, allow_full in current:
            key = (chunk, allow_full)
            if not chunk or key in seen_chunks:
                continue
            seen_chunks.add(key)
            for m in URL_PATTERN.finditer(chunk):
                raw = strip_trailing_encoded_url_delimiters(
                    m.group(0).replace("\x00", "")
                )
                if not raw:
                    continue
                should_emit = allow_full or m.start() > 0
                if raw not in processed:
                    processed.add(raw)
                    normalized = _normalize_extracted_url(raw)
                    if normalized is not None and should_emit:
                        found.add(normalized)
                    nxt.extend(_derive_additional_search_chunks(raw))
                elif should_emit:
                    normalized = _normalize_extracted_url(raw)
                    if normalized is not None:
                        found.add(normalized)
        current = nxt
    return sorted(found)


@pandas_udf(ArrayType(StringType()))
def extract_urls_udf(payloads: pd.Series) -> pd.Series:
    """Arrow-vectorized wrapper, memoized over unique payloads per
    batch (ad creatives repeat across placements; the unique count per
    batch is orders of magnitude below the row count)."""
    uniq = {p: extract_and_decode_urls(p) for p in payloads.dropna().unique()}
    return payloads.map(uniq).where(payloads.notna(), None)


# --- depth-0 JVM tier -------------------------------------------------
# A payload whose text can trigger NONE of the decode/recursion paths
# reduces extract_and_decode_urls to: regex matches → validity filter →
# sorted set.  That whole tier runs as JVM expressions; Python only
# sees payloads that contain encoded/entity/VAST/nested material.
#
# The markers are conservative supersets of the triggers:
# * '%'        — percent-decoding, encoded schemes, encoded trailing
#                delimiters (any %-free payload is untouched by all)
# * '<'        — the VAST / video_fields / xml branches
# * backslash  — the unicode_escape initial chunk
# * NUL        — the \\x00 scrub
# * html entities — the html.unescape initial chunk: '&#…' numeric,
#   '&name;' generic, and the html5 semicolon-less names (generated
#   from the stdlib table html.entities.html5, the exact set
#   html.unescape can rewrite without a trailing ';')
# * a second '://' inside any regex match — the query-value recursion
#   (_derive_additional_search_chunks hint); chunks derive only from
#   matched URLs, so unmatched '://' elsewhere cannot recurse.
import html.entities as _html_entities  # noqa: E402

_SEMICOLONLESS_ENTITIES = sorted(
    {k for k in _html_entities.html5 if not k.endswith(";")},
    key=len, reverse=True,
)
_ENTITY_MARKER_RE = (
    "&(#|[a-zA-Z][a-zA-Z0-9]{0,31};|("
    + "|".join(_SEMICOLONLESS_ENTITIES)
    + "))"
)
# Java's (?x) COMMENTS flag gives the exact verbose-pattern semantics,
# so the JVM tier compiles the reference pattern text verbatim.
_JVM_URL_PATTERN = "(?x)" + URL_PATTERN.pattern


def _jvm_valid_url(u: F.Column) -> F.Column:
    """_is_valid_extracted_url (network_parsers.py:117-131) for the
    marker-free tier: the pattern already bans whitespace and
    '\"<>]' in the body and pins the scheme set, '%' is globally
    absent, so what remains is bracket balance (any '[' is unbalanced
    — ']' cannot match) and a non-empty hostname."""
    auth = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", 1)
    host = F.substring_index(F.substring_index(auth, "@", -1), ":", 1)
    return ~u.contains("[") & (host != "")


def _needs_python_tier(t: F.Column, jvm_urls: F.Column) -> F.Column:
    lt = F.lower(t)
    return (
        lt.contains("%")
        | t.contains("<")
        | t.contains("\\")
        | t.contains("\x00")
        | t.rlike(_ENTITY_MARKER_RE)
        | F.exists(
            jvm_urls, lambda u: F.size(F.split(u, "://")) > 2
        )
    )


def needs_python_tier(text_col) -> F.Column:
    """Public predicate: true when a payload can trigger any decode /
    entity / VAST / recursion path and must go through the Arrow UDF;
    false payloads extract entirely JVM-side.  Used by the bench to
    report the measured tier split."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return _needs_python_tier(
        t, F.regexp_extract_all(t, F.lit(_JVM_URL_PATTERN), 0)
    )


def payload_urls(
    df: DataFrame, text_col: str = "payload", out_col: str = "url"
) -> DataFrame:
    """One row per (payload row, extracted URL) — the engine analog of
    running extract_and_decode_urls per api_call and storing the found
    set (network_parsers.py:306-325 store_found_urls_in_db).  Payload
    rows with zero URLs emit no rows, matching the reference's empty
    upsert.

    Two-tier plan: marker-free payloads extract entirely JVM-side
    (regexp_extract_all with the reference pattern + validity filter
    + sorted dedup); only payloads that can trigger decoding or
    recursion reach the Arrow UDF.  The tiers are a filter-split +
    union — Spark pulls Python UDFs out of conditional projections
    and would otherwise run the UDF for every row."""
    t = F.col(text_col)
    jvm_urls = F.regexp_extract_all(t, F.lit(_JVM_URL_PATTERN), 0)
    nested = _needs_python_tier(t, jvm_urls)
    fast = df.filter(t.isNotNull() & ~nested).withColumn(
        out_col,
        F.explode(
            F.array_sort(
                F.array_distinct(F.filter(jvm_urls, _jvm_valid_url))
            )
        ),
    )
    slow = df.filter(t.isNotNull() & nested).withColumn(
        out_col, F.explode(extract_urls_udf(t))
    )
    return fast.unionByName(slow)


# --- known-part classification (network_parsers.py:563-647) ----------
_AF_ADV_RE = r"http.*\.appsflyer\.com/([a-zA-Z0-9_.]+)[\?\-]"
_INTENT_DETAILS_RE = r"intent://details\?id=([a-zA-Z0-9._]+)"
_INTENT_PACKAGE_RE = r"intent://.*package=([a-zA-Z0-9._]+)"
_MARKET_DETAILS_RE = r"market://details\?id=([a-zA-Z0-9._]+)"
# adv_id_from_play_url (network_parsers.py:351-360): parse_qs of the
# OUTER query string (everything after the first '?', split on '&'),
# then a leading [a-zA-Z0-9._-]+ match.  Two-step JVM equivalent:
# extract the outer query, then an id param anchored at a '&' boundary
# — a nested URL inside another param's value ('…?u=https://x?id=bad')
# cannot match because its 'id=' follows '?' not '&'/start.
_OUTER_QUERY_RE = r"^[^#?]*\?([^#]*)"
_QUERY_ID_RE = r"(?:^|&)id=([a-zA-Z0-9._\-]+)"


def classified_urls(
    urls: DataFrame,
    mmp_tlds: DataFrame,
    ad_domains: DataFrame,
    tld_col=None,
    pub_col: str = "pub_store_id",
) -> DataFrame:
    """Per-URL known-part classification — the inside of the
    ``parse_urls_for_known_parts`` loop (network_parsers.py:572-622)
    as pure JVM expressions.

    Input keeps all its columns; adds ``tld_url`` plus the three
    classification outputs ``mmp_url`` / ``adv_id`` /
    ``ad_network_tld`` (each null when the URL is not of that kind).
    ``mmp_tlds``/``ad_domains`` are curated vendor lists (hundreds of
    rows), safe to broadcast at any crawl scale.  ``tld_col`` defaults
    to the engine's PSL ``root_domain`` over the URL (the get_tld
    analog); battery oracles pass a portable expression instead."""
    from adscrawler_spark.functions.urls import root_domain

    if tld_col is None:
        tld_col = root_domain(F.col("url"))
    in_cols = [c for c in urls.columns if c != "tld_url"]
    u = urls.withColumn("tld_url", F.coalesce(tld_col, F.lit("")))
    u = u.withColumn("lurl", F.lower(F.col("url")))
    u = u.join(
        F.broadcast(
            mmp_tlds.select(F.col("tld_url"), F.lit(True).alias("is_mmp"))
        ),
        "tld_url", "left",
    ).join(
        F.broadcast(
            ad_domains.select(
                F.col("domain_name").alias("tld_url"),
                F.lit(True).alias("is_ad_domain"),
            )
        ),
        "tld_url", "left",
    )
    is_mmp = F.coalesce(F.col("is_mmp"), F.lit(False))
    is_ad_domain = F.coalesce(F.col("is_ad_domain"), F.lit(False))
    mmp_privacy = (
        F.col("lurl").contains("/privacy-policy")
        | F.col("lurl").contains("support.appsflyer.com")
        | F.col("lurl").contains("/terms-of-use")
    )
    websdk = F.col("url").contains("websdk.appsflyer.com")
    mmp_url = F.when(is_mmp & ~mmp_privacy, F.col("url"))
    af_adv = F.when(
        is_mmp & ~mmp_privacy & ~websdk
        & F.col("tld_url").contains("appsflyer.com"),
        F.nullif(F.regexp_extract("url", _AF_ADV_RE, 1), F.lit("")),
    )
    # the elif ladder (— only reached when tld is NOT an MMP)
    intent_details = F.nullif(
        F.regexp_extract("url", _INTENT_DETAILS_RE, 1), F.lit("")
    )
    intent_package = F.nullif(
        F.regexp_extract("url", _INTENT_PACKAGE_RE, 1), F.lit("")
    )
    market_details = F.nullif(
        F.regexp_extract("url", _MARKET_DETAILS_RE, 1), F.lit("")
    )
    is_play = F.col("url").contains("play.google.com") & F.col(
        "tld_url"
    ).contains("google.com")
    play_dev = F.col("url").contains("apps/developer?")
    play_id = F.when(
        is_play & ~play_dev,
        F.nullif(
            F.regexp_extract(
                F.regexp_extract("url", _OUTER_QUERY_RE, 1),
                _QUERY_ID_RE, 1,
            ),
            F.lit(""),
        ),
    )
    bidease = (
        ~is_mmp
        & intent_details.isNotNull()
        & intent_details.startswith("bidease.com_")
    )
    # the reference's elif ladder: first matching branch wins; a
    # bidease intent id yields NO advertiser (it is routed to the ad
    # network list instead), expressed as a true-branch null.
    ladder_adv = F.when(
        ~is_mmp,
        F.when(
            intent_details.isNotNull(),
            F.when(~intent_details.startswith("bidease.com_"), intent_details),
        )
        .when(intent_package.isNotNull(), intent_package)
        .when(market_details.isNotNull(), market_details)
        .when(is_play & ~play_dev, play_id),
    )
    adv_id = F.coalesce(af_adv, ladder_adv)
    privacy_hit = F.lit(False)
    for part in IGNORE_PRIVACY_URLS:
        privacy_hit = privacy_hit | F.col("lurl").contains(part)
    # `continue` paths that skip the ad-domain check: mmp-privacy rows,
    # websdk rows, bidease rows, play apps/developer? rows.  (mmp rows
    # are excluded by ~is_mmp anyway.)
    ad_network_tld = F.when(
        bidease, F.lit("bidease.com")
    ).when(
        is_ad_domain & ~is_mmp & ~privacy_hit
        & ~(is_play & play_dev) & (F.col("tld_url") != ""),
        F.col("tld_url"),
    )
    return u.select(
        *in_cols, "tld_url",
        mmp_url.alias("mmp_url"),
        adv_id.alias("adv_id"),
        ad_network_tld.alias("ad_network_tld"),
    )


def known_parts_agg(
    urls: DataFrame,
    mmp_tlds: DataFrame,
    ad_domains: DataFrame,
    key_cols: tuple[str, ...] = ("api_call_id",),
    tld_col=None,
    pub_col: str = "pub_store_id",
) -> DataFrame:
    """Fold classified URLs per ``key_cols`` into the reference's
    ``AdInfo`` arrays (network_parsers.py:623-646): sorted distinct
    mmp_urls / ad_network_tlds, the advertiser-id set minus the ignore
    list and the publisher's own id, plus ``mmp_tld`` — the tld of the
    AdInfo's first mmp url (models.py:26-29; the reference's "first"
    is set-iteration order, pinned here to the minimum url)."""
    cls = classified_urls(urls, mmp_tlds, ad_domains, tld_col, pub_col)
    agg = cls.groupBy(*key_cols).agg(
        F.array_sort(F.collect_set("mmp_url")).alias("mmp_urls"),
        F.array_sort(
            F.array_except(
                F.collect_set("adv_id"),
                F.array(
                    *[F.lit(x) for x in IGNORE_STORE_IDS],
                    F.first(pub_col),
                ),
            )
        ).alias("adv_ids"),
        F.array_sort(F.collect_set("ad_network_tld")).alias(
            "ad_network_tlds"
        ),
        F.min(
            F.when(
                F.col("mmp_url").isNotNull(),
                F.struct("mmp_url", "tld_url"),
            )
        ).alias("_mmp_first"),
    )
    return agg.select(
        *key_cols, "mmp_urls", "adv_ids", "ad_network_tlds",
        F.col("_mmp_first.tld_url").alias("mmp_tld"),
    )


def known_parts(
    urls: DataFrame,
    mmp_tlds: DataFrame,
    ad_domains: DataFrame,
    tld_col=None,
) -> DataFrame:
    """Classify extracted payload URLs and fold them per api_call into
    the reference's ``AdInfo`` (network_parsers.py:563-647).

    ``urls``: (api_call_id, pub_store_id, url) — one row per found URL.
    ``mmp_tlds``: (tld_url) — MMP registrable domains
    (get_all_mmp_tlds_set).  ``ad_domains``: (domain_name) — known ad
    network registrable domains (query_domains_set).

    Returns one row per api_call: adv_store_id (exactly-one rule),
    adv_store_ids (only when multiple — MultipleAdvertiserIdError
    carrier), mmp_urls, ad_network_tlds (sorted arrays)."""
    agg = known_parts_agg(
        urls, mmp_tlds, ad_domains, ("api_call_id",), tld_col
    )
    one = F.size("adv_ids") == 1
    many = F.size("adv_ids") > 1
    return agg.select(
        "api_call_id",
        F.when(one, F.element_at("adv_ids", 1)).alias("adv_store_id"),
        F.when(many, F.array_join("adv_ids", ",")).alias(
            "advertiser_store_app_ids"
        ),
        F.array_join("mmp_urls", ",").alias("mmp_urls"),
        F.array_join("ad_network_tlds", ",").alias("ad_network_tlds"),
    )


# --- interleaved span form ------------------------------------------
_SPAN_TYPE = ArrayType(
    StructType([
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ])
)


def payload_span_rows(text: str) -> list[tuple]:
    """Split one ad payload into the engine's interleaved span form
    (the north-rule document model: kind/text/media_ref/offset): text
    runs between top-level URL matches become text spans, each matched
    URL a media_ref span — the creative-processor view of an ad
    response (creative_processor.py keys downloaded creative assets by
    the URLs found in the payload; the span sequence preserves WHERE
    in the response each reference sat).  media_ref carries the RAW
    matched URL — spans store the document verbatim; decoding and
    harvesting stay in extract_and_decode_urls.  Empty text runs are
    dropped (same non-empty rule as the listing span builder)."""
    if not text:
        return []
    spans: list[tuple] = []
    last = 0
    off = 0
    for m in URL_PATTERN.finditer(text):
        seg = text[last:m.start()]
        if seg:
            spans.append(("text", seg, None, off))
            off += 1
        spans.append(("media_ref", None, m.group(0), off))
        off += 1
        last = m.end()
    tail = text[last:]
    if tail:
        spans.append(("text", tail, None, off))
    return spans


@pandas_udf(_SPAN_TYPE)
def payload_spans_udf(payloads: pd.Series) -> pd.Series:
    uniq = {p: payload_span_rows(p) for p in payloads.dropna().unique()}
    return payloads.map(uniq).where(payloads.notna(), None)


def payload_spans(
    df: DataFrame, text_col: str = "payload", out_col: str = "spans"
) -> DataFrame:
    """Attach the interleaved span sequence for each ad payload row."""
    return df.withColumn(out_col, payload_spans_udf(F.col(text_col)))
