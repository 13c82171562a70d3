"""Per-row ads.txt parsing oracle.

Re-states the observable semantics of the reference's parser + cleaner
(/root/reference/adscrawler/scrape.py:165-260) and the body-level
rejection rules (scrape.py:124-135), independently implemented for the
parity suite.  Notable reference quirks preserved bug-for-bug:

* ALL spaces are removed from the whole body before any parsing
  (``txt.replace(" ", "")`` at scrape.py:166), including inside values;
* blank lines and ``#``-prefixed lines are skipped; line order is kept;
* csv.DictReader(fieldnames=4, restkey='notes', QUOTE_NONE) semantics:
  a row always materializes ≥4 fields (missing → None), extras beyond
  4 are re-joined with ',' into ``notes`` — so the reference's
  3-column branch (scrape.py:209-210) is dead code;
* domain is lowercased, then re-collapsed to registrable domain via
  the PSL (suffix-less values keep a trailing '.', e.g. 'localhost.');
* the 4 standard columns are stripped to ``[a-zA-Z0-9_\\-.]``;
* relationship: uppercase, substring-contains DIRECT → 'DIRECT', then
  contains RESELLER → 'RESELLER'; the reference's second ``.loc`` mask
  is computed on the already-mutated column (scrape.py:236-244), so a
  value containing both tokens collapses to 'DIRECT' first and then no
  longer matches RESELLER — both-token values end up DIRECT;
* rows without domain/publisher_id/canonical relationship are dropped;
* crawl_result codes: 1 ok, 2 empty-after-clean, 3 HTML or missing
  DIRECT/RESELLER token (or fetch-level not-found), 4 unknown.
"""

from __future__ import annotations

import re

from adscrawler_spark.pyref.urls import extract

_KEEP = re.compile(r"[^a-zA-Z0-9_\-.]")

Entry = tuple[str, str, str, str | None, str | None]


def kept_lines(body: str) -> list[str]:
    """The ordered adstxt_line spans for a body."""
    text = body.replace(" ", "")
    return [ln for ln in text.split("\n") if ln and ln[0] != "#"]


def parse_line(line: str) -> tuple[str | None, ...]:
    """One raw record: (domain, publisher_id, relationship,
    certification_auth, notes) with DictReader padding semantics."""
    fields = line.split(",")
    padded: list[str | None] = list(fields[:4]) + [None] * max(0, 4 - len(fields))
    notes = ",".join(fields[4:]) if len(fields) > 4 else None
    return (padded[0], padded[1], padded[2], padded[3], notes)


def _clean_domain(raw: str | None) -> str | None:
    if raw is None:
        return None
    low = raw.lower()
    _sub, dom, suf = extract(low)
    collapsed = dom + "." + suf
    return _KEEP.sub("", collapsed)


def _clean_std(raw: str | None) -> str | None:
    return None if raw is None else _KEEP.sub("", raw)


def _clean_relationship(raw: str | None) -> str | None:
    if raw is None:
        return None
    up = _KEEP.sub("", raw).upper()
    if "DIRECT" in up:
        up = "DIRECT"
    if "RESELLER" in up:
        up = "RESELLER"
    return up


def clean_entries(records: list[tuple[str | None, ...]]) -> list[Entry]:
    out: list[Entry] = []
    for dom, pub, rel, cert, notes in records:
        d = _clean_domain(dom)
        p = _clean_std(pub)
        r = _clean_relationship(rel)
        c = _clean_std(cert)
        if d and p and r in ("DIRECT", "RESELLER"):
            out.append((d, p, r, c, notes))
    return out


def body_rejection(body: str) -> int | None:
    """Fetch-stage body checks (scrape.py:124-135): HTML page or a body
    with no DIRECT/RESELLER token anywhere → crawl_result 3."""
    if "<head>" in body:
        return 3
    if "DIRECT" not in body.upper() and "RESELLER" not in body.upper():
        return 3
    return None


def parse_body(body: str) -> tuple[list[Entry], int]:
    """Full oracle: (deduped entries, crawl_result)."""
    rejected = body_rejection(body)
    if rejected is not None:
        return ([], rejected)
    records = [parse_line(ln) for ln in kept_lines(body)]
    entries = clean_entries(records)
    # dedup on (ad_domain, publisher_id, relationship), first wins
    # (scrape.py:349-350 drop_duplicates keeps first)
    seen: set[tuple[str, str, str]] = set()
    deduped: list[Entry] = []
    for e in entries:
        k = (e[0], e[1], e[2])
        if k not in seen:
            seen.add(k)
            deduped.append(e)
    if not deduped:
        return ([], 2)
    return (deduped, 1)
