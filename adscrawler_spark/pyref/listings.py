"""Per-row store-listing cleaning oracle (Play + iOS).

Independent restatement of the reference cleaners for the parity suite:
Play /root/reference/adscrawler/app_stores/google.py:164-244,
iOS  /root/reference/adscrawler/app_stores/apple.py:382-498,
UTF-8 truncation utils.py:106-117. Dates parse with the same
format-fallback ladder; the iOS '.0' developer-id repair and the
always-taken detect-language branch (apple.py:469-487 — the
``.str.len().all() == 2`` guard is constant-False) are preserved.
Spans: same canonical candidate order as the Spark side.
"""

from __future__ import annotations

import re
from datetime import date, datetime, timezone

from adscrawler_spark.functions import langmodel
from adscrawler_spark.operators.listings import GAME_CATEGORIES

Span = tuple[str, str | None, str | None, int]


def truncate_utf8_bytes(s: str | None, max_bytes: int = 2400) -> str:
    if s is None:
        return ""
    raw = s.encode("utf-8")
    if len(raw) <= max_bytes:
        return s
    cut = raw[:max_bytes]
    while cut:
        try:
            return cut.decode("utf-8")
        except UnicodeDecodeError:
            cut = cut[:-1]
    return ""


def detect_lang(description: str | None) -> str:
    code = langmodel.detect(langmodel.prep_snippet(description))
    return "zh" if code.startswith("zh-") else code


def _parse_play_date(raw: str | None) -> date | None:
    if not raw:
        return None
    for fmt in ("%b %d, %Y", "%d %b %Y"):
        try:
            return datetime.strptime(raw, fmt).date()
        except ValueError:
            continue
    return None


def clean_play_row(row: dict) -> dict:
    out: dict = {}
    out["store_id"] = row.get("store_id")
    out["name"] = row.get("title")
    installs = row.get("realInstalls")
    min_installs = row.get("installs")
    if min_installs is None and installs is not None:
        min_installs = str(installs)
    out["min_installs"] = min_installs
    out["installs"] = installs
    out["rating"] = row.get("score")
    out["rating_count"] = row.get("ratings")
    out["review_count"] = row.get("reviews")
    out["histogram"] = row.get("histogram")
    out["description_short"] = row.get("summary")
    out["description"] = row.get("description")
    out["release_date"] = _parse_play_date(row.get("released"))
    upd = row.get("updated")
    out["store_last_updated"] = (
        datetime.fromtimestamp(upd, tz=timezone.utc).replace(tzinfo=None)
        if upd is not None
        else None
    )
    out["ad_supported"] = row.get("containsAds")
    out["in_app_purchases"] = row.get("offersIAP")
    out["icon_url_512"] = row.get("icon")
    out["url"] = row.get("developerWebsite")
    out["developer_id"] = row.get("developerId")
    dev = row.get("developer")
    out["developer_name"] = dev.replace("\t", " ") if dev is not None else None
    out["developer_address"] = row.get("developerAddress")
    cat = row.get("genreId")
    out["category"] = cat.lower() if cat is not None else None
    out["featured_image_url"] = row.get("headerImage")
    shots = row.get("screenshots") or []
    for i in range(3):
        out[f"phone_image_url_{i + 1}"] = shots[i] if i < len(shots) else None
    out["store_language_code"] = detect_lang(row.get("description"))
    return out


def _ios_category(category: str | None, genres: str | None) -> str | None:
    if category == "Games" and genres is not None and genres != "Games":
        matches = [
            t.lower().replace(" ", "_")
            for t in genres.split(",")
            if t.lower().replace(" ", "_") in GAME_CATEGORIES
        ]
        if matches:
            category = "game_" + matches[0]
    if category is None:
        return None
    return category.lower().replace(" & ", "_and_")


def _fix_dev_id(dev: str | None) -> str | None:
    if dev is None:
        return None
    # reference: .str.contains(".0") is a REGEX (any char + '0');
    # matching rows take the part before the first literal dot.
    if re.search(".0", dev):
        return dev.split(".")[0]
    return dev


def clean_ios_row(row: dict) -> dict:
    out: dict = {}
    sid = row.get("trackId")
    out["store_id"] = str(sid) if sid is not None else None
    out["name"] = row.get("trackName")
    out["rating"] = row.get("averageUserRating")
    out["rating_count"] = row.get("userRatingCount")
    out["url"] = row.get("sellerUrl")
    out["bundle_id"] = row.get("bundleId")
    price = row.get("price", 0)
    out["price"] = price
    out["free"] = price == 0 if price is not None else False
    out["category"] = _ios_category(row.get("primaryGenreName"), row.get("genres"))
    slu = row.get("currentVersionReleaseDate")
    out["store_last_updated"] = (
        datetime.fromisoformat(slu.replace("Z", "+00:00")).replace(tzinfo=None)
        if slu
        else None
    )
    rd = row.get("releaseDate")
    try:
        out["release_date"] = (
            datetime.strptime(rd, "%Y-%m-%dT%H:%M:%SZ").date() if rd else None
        )
    except ValueError:
        out["release_date"] = None
    ur = row.get("user_ratings")
    out["histogram"] = (
        [int(n) for n in re.findall(r"\d+", ur)[1::2]] if ur is not None else None
    )
    out["description"] = truncate_utf8_bytes(row.get("description"))
    out["store_language_code"] = detect_lang(out["description"])
    dev = row.get("artistId")
    out["developer_id"] = _fix_dev_id(str(dev) if dev is not None else None)
    out["developer_name"] = row.get("artistName")
    out["icon_url_512"] = row.get("artworkUrl512")
    raw_p, raw_t = row.get("screenshotUrls"), row.get("ipadScreenshotUrls")
    phones = raw_p.split(",") if raw_p is not None else []
    tablets = raw_t.split(",") if raw_t is not None else []
    for i in range(3):
        out[f"phone_image_url_{i + 1}"] = phones[i] if i < len(phones) else None
        out[f"tablet_image_url_{i + 1}"] = tablets[i] if i < len(tablets) else None
    out["wrong_platform"] = row.get("kind") != "software" if row.get("kind") is not None else False
    return out


_SPAN_ORDER: list[tuple[str, str, bool]] = [
    ("title", "name", False),
    ("description_short", "description_short", False),
    ("description", "description", False),
    ("icon", "icon_url_512", True),
    ("featured_image", "featured_image_url", True),
    ("screenshot", "phone_image_url_1", True),
    ("screenshot", "phone_image_url_2", True),
    ("screenshot", "phone_image_url_3", True),
    ("screenshot", "tablet_image_url_1", True),
    ("screenshot", "tablet_image_url_2", True),
    ("screenshot", "tablet_image_url_3", True),
]


def listing_spans(cleaned: dict) -> list[Span]:
    spans: list[Span] = []
    for kind, col, is_media in _SPAN_ORDER:
        if col not in cleaned:
            continue
        val = cleaned[col]
        if val is None or val == "":
            continue
        spans.append(
            (kind, None if is_media else val, val if is_media else None, len(spans))
        )
    return spans
