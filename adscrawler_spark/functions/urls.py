"""Vectorized URL canonicalization — the engine's hot-path canonicalizer.

Semantics: SURVEY.md P13/P14; reference behavior at
/root/reference/adscrawler/app_stores/utils.py:178-204 and
/root/reference/adscrawler/scrape.py:138-148, golden-tested against
/root/reference/tests/app_stores/test_scrape_stores.py:42-69.

Implementation is Spark-first:
* scheme/path/port stripping is pure pandas ``.str`` vector ops,
* PSL suffix matching is memoized over *unique* hosts per Arrow batch —
  crawl batches are grouped by host, so the per-batch unique count is
  orders of magnitude below the row count (this is the vectorization
  that replaces per-row tldextract calls),
* the murmur3 URL hash stays JVM-side (``F.hash`` == Spark's Murmur3),
  never in Python.

No row-at-a-time ``udf()`` anywhere (enforced by tests).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from adscrawler_spark.functions.psl import MAX_SUFFIX_LABELS, PUBLIC_SUFFIXES

_IP4 = r"^(\d{1,3}\.){3}\d{1,3}$"


def _hosts_from_urls(urls: pd.Series) -> pd.Series:
    """Vectorized loose host extraction (scheme/userinfo/port/path off)."""
    s = urls.astype("string")
    s = s.str.replace(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", "", regex=True, n=1)
    s = s.str.split("/", n=1).str[0]
    s = s.str.split("?", n=1).str[0]
    s = s.str.split("#", n=1).str[0]
    s = s.str.rsplit("@", n=1).str[-1]
    s = s.str.split(":", n=1).str[0]
    return s


def _extract_host(host: str) -> tuple[str, str, str]:
    """(subdomain, domain, suffix) for one host — called once per
    *unique* host per batch (memoized in the UDF body)."""
    if not host:
        return ("", "", "")
    labels = host.split(".")
    n = len(labels)
    if n == 4 and all(p.isdigit() and len(p) <= 3 for p in labels):
        return ("", host, "")
    for i in range(max(0, n - MAX_SUFFIX_LABELS), n):
        if ".".join(labels[i:]).lower() in PUBLIC_SUFFIXES:
            return (
                ".".join(labels[: i - 1]) if i > 1 else "",
                labels[i - 1] if i > 0 else "",
                ".".join(labels[i:]),
            )
    return (".".join(labels[:-1]), labels[-1], "")


def _canon_with_sub(host: str) -> str:
    sub, dom, suf = _extract_host(host)
    if sub == "m" or sub == "" or "www" in sub.split("."):
        out = dom + "." + suf
    else:
        out = sub + "." + dom + "." + suf
    return out.lower()


def _root_domain(host: str) -> str | None:
    _sub, dom, suf = _extract_host(host)
    if not suf:
        return None
    out = dom + "." + suf
    return None if out == "." else out


@pandas_udf(StringType())
def canonical_host(urls: pd.Series) -> pd.Series:
    """extract_domains_with_sub, vectorized (utils.py:191-204 parity)."""
    hosts = _hosts_from_urls(urls)
    uniq = {h: _canon_with_sub(h) for h in hosts.dropna().unique()}
    return hosts.map(uniq).astype(object).where(hosts.notna(), None)


@pandas_udf(StringType())
def root_domain(urls: pd.Series) -> pd.Series:
    """extract_root_domain, vectorized (utils.py:178-188 parity)."""
    hosts = _hosts_from_urls(urls)
    uniq = {h: _root_domain(h) for h in hosts.dropna().unique()}
    return hosts.map(uniq).astype(object).where(hosts.notna(), None)


@pandas_udf(StringType())
def adstxt_fetch_host(urls: pd.Series) -> pd.Series:
    """Host the app-ads.txt is fetched from (scrape.py:138-148 rule —
    same collapse rule as canonical_host; kept as its own function so
    the call-site mirrors the reference's two entry points)."""
    hosts = _hosts_from_urls(urls)
    uniq = {h: _canon_with_sub(h) for h in hosts.dropna().unique()}
    return hosts.map(uniq).astype(object).where(hosts.notna(), None)


@pandas_udf(StringType())
def canonical_url(urls: pd.Series) -> pd.Series:
    """Full URL canonicalization: canonical host (subdomain collapse
    rule) + path?query with scheme/userinfo/port/fragment stripped.
    This is the frontier's dedup key — two raw URLs are the same crawl
    target iff their canonical URLs match.  (canonical_host alone is a
    *host*, which would collapse every listing on a store host to one
    key — hosts are for politeness, canonical URLs for identity.)"""
    s = urls.astype("string")
    s = s.str.replace(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", "", regex=True, n=1)
    s = s.str.split("#", n=1).str[0]
    split = s.str.split("/", n=1)
    authority = (
        split.str[0]
        .str.split("?", n=1).str[0]
        .str.rsplit("@", n=1).str[-1]
        .str.split(":", n=1).str[0]
    )
    rest = split.str[1]  # <NA> when no path
    uniq = {h: _canon_with_sub(h) for h in authority.dropna().unique()}
    canon_host = authority.map(uniq)
    path = ("/" + rest.fillna("")).where(rest.notna(), "")
    out = canon_host + path
    return out.astype(object).where(urls.notna(), None)


@pandas_udf(StringType())
def adstxt_registrable(values: pd.Series) -> pd.Series:
    """Collapse an ads.txt ad-system domain to registrable form, always
    joining domain+'.'+suffix even when the suffix is unknown (so
    'localhost' → 'localhost.'), per the reference cleaner at
    /root/reference/adscrawler/scrape.py:224-228."""
    hosts = _hosts_from_urls(values)

    def collapse(h: str) -> str:
        _sub, dom, suf = _extract_host(h)
        return dom + "." + suf

    uniq = {h: collapse(h) for h in hosts.dropna().unique()}
    return hosts.map(uniq).astype(object).where(hosts.notna(), None)


# Hosted-platform developer domains that never carry an app-ads.txt
# worth crawling (SURVEY.md P15; /root/reference/adscrawler/config.py:208-235,
# applied at scrape.py:156-160 and apple.py:280-304).
IGNORE_TLDS = [
    "00webhostapp.com", "bitballoon.com", "blogger.com", "linkedin.com",
    "blogspot.com", "blogspot.co.id", "blogspot.in", "bytehost6.com",
    "facebook.com", "flycricket.io", "github.io", "github.com",
    "instagram.com", "netlify.com", "page.link", "site123.me",
    "simplesite.com", "subsplash.com", "twitter.com", "tumblr.com",
    "weebly.com", "wix.com", "wixsite.com", "wordpress.com", "youtube.com",
]


def ignored_tld_filter(url_col: Column | str) -> Column:
    """TRUE when the URL targets a hosted platform (reference checks
    substring containment against the fetch URL, scrape.py:156-158)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    out = F.lit(False)
    for tld in IGNORE_TLDS:
        out = out | c.contains(tld)
    return out


def url_hash(col: Column | str) -> Column:
    """Murmur3 URL hash — JVM-side (north_rule: murmur3-hashed URLs)."""
    return F.hash(col)


def hash_bucket(col: Column | str, buckets: int = 256) -> Column:
    """Reference's 256-way md5 2-hex bucketing
    (app_metrics_history.py:163,772,1142) — used as a physical
    partition key; non-negative pmod keeps Iceberg-style bucketing."""
    return F.pmod(F.hash(col), F.lit(buckets))
