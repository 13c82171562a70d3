"""Per-row URL/domain extraction oracle.

Reproduces the observable behavior of the reference's tldextract-based
helpers, bug-for-bug against the hardcoded golden table at
/root/reference/tests/app_stores/test_scrape_stores.py:42-69:

* ``extract_domains_with_sub``  — /root/reference/adscrawler/app_stores/utils.py:191-204
* ``extract_root_domain``      — /root/reference/adscrawler/app_stores/utils.py:178-188
* ``ads_txt_fetch_host`` rule  — /root/reference/adscrawler/scrape.py:138-148
"""

from __future__ import annotations

import math
import re

from adscrawler_spark.functions.psl import MAX_SUFFIX_LABELS, PUBLIC_SUFFIXES

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://")
_IP_RE = re.compile(r"^(\d{1,3}\.){3}\d{1,3}$")


def split_host(url: str) -> str:
    """Loose host extraction (scheme/userinfo/port/path stripped)."""
    s = _SCHEME_RE.sub("", url)
    s = s.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]
    s = s.rpartition("@")[2]
    s = s.partition(":")[0]
    return s


def extract(url: str) -> tuple[str, str, str]:
    """(subdomain, domain, suffix) per the PSL longest-match algorithm,
    with tldextract's quirks: IPv4-looking hosts become the domain with
    empty suffix; an unmatched host puts its last label in domain."""
    host = split_host(url)
    if not host:
        return ("", "", "")
    if _IP_RE.match(host):
        return ("", host, "")
    labels = host.split(".")
    n = len(labels)
    start = max(0, n - MAX_SUFFIX_LABELS)
    for i in range(start, n):
        candidate = ".".join(labels[i:]).lower()
        if candidate in PUBLIC_SUFFIXES:
            suffix = ".".join(labels[i:])
            domain = labels[i - 1] if i > 0 else ""
            subdomain = ".".join(labels[: i - 1]) if i > 1 else ""
            return (subdomain, domain, suffix)
    # No rule matched: suffix empty, last label is the domain.
    return (".".join(labels[:-1]), labels[-1], "")


def _is_null(x: object) -> bool:
    return x is None or (isinstance(x, float) and math.isnan(x))


def extract_domains_with_sub(x: str | float | None) -> str | None:
    """Canonical crawl host: keep the subdomain unless it is 'm', any
    'www' label, or empty — then collapse to the registrable domain."""
    if _is_null(x):
        return None
    sub, dom, suf = extract(str(x))
    use_top = sub == "m" or "www" in sub.split(".") or sub == ""
    url = ".".join([dom, suf]) if use_top else ".".join([sub, dom, suf])
    return url.lower()


def extract_root_domain(url: str | float | None) -> str | None:
    """Registrable domain only; None when there is no known suffix."""
    if _is_null(url):
        return None
    _sub, dom, suf = extract(str(url))
    if not suf:
        return None
    tld_url = dom + "." + suf
    if tld_url == ".":
        return None
    return tld_url


def ads_txt_fetch_host(url: str) -> str:
    """Which host the app-ads.txt is fetched from (subdomain kept only
    when meaningful), per /root/reference/adscrawler/scrape.py:138-148."""
    sub, dom, suf = extract(url)
    use_top = sub == "m" or "www" in sub.split(".") or sub == ""
    if sub and not use_top:
        return ".".join([sub, dom, suf])
    return ".".join([dom, suf])
