"""Deterministic synthetic fetch responses — shared data functions.

Both the Spark fetch simulator (mapInPandas) and the pure-Python
sequential oracle (pyref/frontier_sim.py) synthesize responses with
THESE functions, so parity tests exercise the pipeline, not the
response generator.  Everything is a pure function of the URL's
xxhash64 (computed JVM-side; Python only sees the int).

Outcome classes mirror the reference's crawl_result routing
(/root/reference/adscrawler/app_stores/scrape_stores.py:753-844,
scrape.py:280-301): 1 ok, 2 parse-empty, 3 not-found, 4 persistent
unknown error, 5 wrong platform (iOS 'mac software').  Retry ladder:
max 2 retries with backoff (scrape_stores.py:762-801) — transient
classes consume extra attempts before succeeding/failing.
"""

from __future__ import annotations

import json

# (threshold, crawl_result, attempts, fetch_ok)
# pmod(url_hash64, 1000) buckets; cumulative thresholds.
OUTCOMES: list[tuple[int, int, int, bool]] = [
    (800, 1, 1, True),    # clean fetch
    (850, 1, 2, True),    # one transient error, retry ok
    (880, 1, 3, True),    # two transient errors, 2nd retry ok
    (930, 3, 1, False),   # not found
    (960, 4, 3, False),   # persistent unknown (exhausts retries)
    (975, 5, 1, False),   # wrong platform (ios only; else 4)
    (1000, 2, 1, True),   # fetch ok but content empty/invalid
]

_DESCRIPTIONS = [
    "The best application for all of your daily needs and it is one of the "
    "most useful tools that you can have with you",
    "Esta es la mejor aplicación para todas sus necesidades diarias y es "
    "una de las más útiles que puede tener",
    "Die beste Anwendung für alle Ihre täglichen Bedürfnisse und sie ist "
    "eine der nützlichsten die Sie haben können",
    "这是一个非常好用的应用程序 它可以满足你每天的各种需求 推荐给所有人",
    "Cette application est la meilleure pour tous vos besoins quotidiens "
    "et elle est une des plus utiles que vous pouvez avoir",
]
_CATEGORIES = ["TOOLS", "GAME_PUZZLE", "FOOD_AND_DRINK", "SOCIAL", "FINANCE"]

# deterministic developer addresses: ~half carry a resolvable country
# (P11 evidence path, scrape_stores.py:991-1050), half don't — the doc
# then falls back to the storefront crawl country.
_ADDRESSES = [
    None,
    "12 Main Street, Springfield, United States",
    "Hauptstrasse 5, 10115 Berlin, Germany",
    None,
    "1-2-3 Shibuya, Tokyo, Japan",
    "Av. Paulista 100, São Paulo, Brazil",
    None,
    "Gangnam-daero 123, Seoul, South Korea",
]
_IOS_GENRES = ["Games,Word,Puzzle", "Games,Racing", "Food & Drink", "Finance"]
_AD_DOMAINS = [f"adnet{i}-ads.com" for i in range(40)]


def outcome_for(h: int, doc_kind: str) -> tuple[int, int, bool]:
    """(crawl_result, attempts, fetch_ok) for a url hash."""
    b = h % 1000
    for threshold, result, attempts, ok in OUTCOMES:
        if b < threshold:
            if result == 5 and doc_kind != "listing_ios":
                return (4, attempts, False)
            return (result, attempts, ok)
    raise AssertionError("unreachable")


def synth_adstxt_body(h: int) -> str:
    """Deterministic app-ads.txt body with branch coverage driven by
    hash bits: comments, 3/4/>4-field rows, junk, subdomained domains."""
    n_lines = 3 + (h % 8)
    lines = ["# synthetic app-ads.txt"]
    for i in range(n_lines):
        g = (h // (i + 1)) % 10
        dom = _AD_DOMAINS[(h + i * 7) % len(_AD_DOMAINS)]
        pub = f"pub-{(h + i) % 10_000}"
        if g == 0:
            lines.append(f"# comment {i}")
        elif g == 1:
            lines.append(f"ssp.{dom}, {pub}, RESELLER, cert{i}")
        elif g == 2:
            lines.append(f"{dom}, {pub}, direct")
        elif g == 3:
            lines.append(f"{dom.upper()}, {pub}, RESELLER, cert{i}, note a, note b")
        elif g == 4:
            lines.append(f"{dom}, , DIRECT")  # dropped: no publisher
        else:
            lines.append(f"{dom}, {pub}, DIRECT, cert{i}")
    return "\n".join(lines)


def synth_play_listing(h: int, app_id: str) -> str:
    """JSON body of a raw Play store response (fields consumed by
    clean_play_listings)."""
    d = {
        "store_id": app_id,
        "title": f"App {h % 100000}",
        "installs": f"{10 ** (h % 7):,}+",
        "realInstalls": (h % 10**7) + 1,
        "score": round(1.0 + (h % 40) / 10.0, 1),
        "ratings": h % 10**5,
        "reviews": h % 10**4,
        "histogram": [(h + i) % 1000 for i in range(5)],
        "summary": f"Short summary {h % 997}",
        "description": _DESCRIPTIONS[h % len(_DESCRIPTIONS)],
        "released": "Jan 5, 2024" if h % 2 == 0 else "5 Jan 2024",
        "updated": 1_700_000_000 + (h % 10**7),
        "containsAds": h % 3 == 0,
        "offersIAP": h % 5 == 0,
        "icon": f"https://cdn.example/icon/{h % 10**6}.png",
        "developerWebsite": f"https://www.pub{h % 500}-dev.com/about",
        "developerId": f"dev{h % 10**4}",
        "developer": f"Developer {h % 10**4}",
        "developerAddress": _ADDRESSES[h % len(_ADDRESSES)],
        "genreId": _CATEGORIES[h % len(_CATEGORIES)],
        "headerImage": f"https://cdn.example/hdr/{h % 10**6}.png",
        "screenshots": [
            f"https://cdn.example/s/{h % 10**6}_{i}.png" for i in range(h % 5)
        ],
    }
    return json.dumps(d)


def synth_ios_listing(h: int, track_id: str) -> str:
    d = {
        "trackId": int(track_id) if track_id.isdigit() else h % 10**9,
        "trackName": f"iApp {h % 100000}",
        "averageUserRating": round(1.0 + (h % 40) / 10.0, 1),
        "userRatingCount": h % 10**5,
        "user_ratings": " ".join(
            f"{i + 1}: {(h + i) % 10_000:,}" for i in range(5)
        ),
        "sellerUrl": f"https://www.pub{h % 500}-dev.com",
        "primaryGenreName": "Games" if h % 2 == 0 else "Finance",
        "genres": _IOS_GENRES[h % len(_IOS_GENRES)],
        "bundleId": f"com.bundle.a{h % 10**6}",
        "releaseDate": f"20{10 + h % 15}-0{1 + h % 9}-1{h % 9}T00:00:00Z",
        "currentVersionReleaseDate": f"2024-0{1 + h % 9}-02T10:30:00Z",
        "artistId": f"{h % 10**6}" + (".0" if h % 7 == 0 else ""),
        "artistName": f"Studio {h % 10**4}",
        "artworkUrl512": f"https://cdn.example/ios/{h % 10**6}.png",
        "screenshotUrls": ",".join(
            f"https://cdn.example/is/{h % 10**6}_{i}.png" for i in range(h % 4)
        ),
        "ipadScreenshotUrls": "",
        "languageCodesISO2A": "EN",
        "price": 0.0 if h % 4 else 2.99,
        "description": _DESCRIPTIONS[(h // 7) % len(_DESCRIPTIONS)],
        "kind": "software",
    }
    return json.dumps(d)


RANK_LIST_LEN = 20


def synth_rankings_body(h: int, url: str) -> str:
    """Deterministic ranked list of store ids for a rankings URL
    (the reference's scraped collection page, app_rankings.py:60-113):
    RANK_LIST_LEN ids, order a pure function of the URL hash."""
    is_play = "google-play-store.com" in url
    seen: set[int] = set()
    ids = []
    for i in range(RANK_LIST_LEN):
        k = (h + (i + 1) * 2654435761) % 400
        if k in seen:  # a ranked list never repeats an app
            continue
        seen.add(k)
        ids.append(f"com.app{k}" if is_play else str(k))
    return json.dumps({"ranks": ids})


def synth_body(h: int, doc_kind: str, url: str) -> str:
    if doc_kind == "adstxt":
        return synth_adstxt_body(h)
    if doc_kind == "rankings":
        return synth_rankings_body(h, url)
    app_id = url.rsplit("id", 1)[-1].split("&")[0].replace("=com.app", "")
    if doc_kind == "listing_play":
        return synth_play_listing(h, f"com.app{app_id}")
    return synth_ios_listing(h, app_id)
