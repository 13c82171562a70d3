"""Store-listing cleaners → interleaved span sequences (SURVEY.md P1–P10).

Reproduces the observable column semantics of the reference cleaners —
Play: /root/reference/adscrawler/app_stores/google.py:164-244,
iOS:  /root/reference/adscrawler/app_stores/apple.py:382-498 —
as declarative Spark expressions. Python appears only in two Arrow
UDFs (UTF-8 byte truncation, LID model); everything else is JVM-side.

Reference quirks preserved bug-for-bug:
* Play release_date: '%b %d, %Y' then '%d %b %Y' fallback
  (google.py:200-207); store_last_updated from unix seconds.
* iOS histogram: ``re.findall(r"\\d+", user_ratings)[1::2]``
  (apple.py:458-463) — including the comma-split artifact on
  thousands-separated counts.
* iOS developer_id '.0' repair (apple.py:489-497): rows matching the
  *regex* '.0' (any char + '0') take the substring before the first
  literal dot — a no-op for dot-less ids, exactly as in pandas.
* iOS ``languageCodesISO2A``: the reference's guard
  ``.str.len().all() == 2`` compares a bool to 2 and is always False
  (apple.py:469-472), so the detect-from-description branch ALWAYS
  runs; we reproduce that (detect per row; 'zz' on failure is per-row
  here vs per-chunk in the reference — documented divergence).
* 'zh-*' language codes collapse to 'zh' (google.py:241-243).
* iOS Games category: 'game_' + first genre token found in
  GAME_CATEGORIES (apple.py:408-424); no-match keeps the original
  category (the reference aborts the whole chunk's update on a
  no-match row — per-row here).

Span model (BASELINE.json input_hint / FIXTURES.md F1): per document,
ordered candidates [title, description_short, description, icon,
featured_image, phone screenshots 1-3, tablet screenshots 1-3]; null /
empty values are skipped and offsets are re-densified 0..n-1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adscrawler_spark.functions.text import detect_language, truncate_utf8

# apple.py:522-540 (public store category names)
GAME_CATEGORIES = [
    "arcade", "simulation", "action", "adventure", "educational",
    "role_playing", "racing", "trivia", "board", "strategy", "puzzle",
    "casual", "word", "card", "sports", "casino", "music",
]

PLAY_RENAMES = {
    "title": "name",
    "installs": "min_installs",
    "realInstalls": "installs",
    "score": "rating",
    "updated": "store_last_updated",
    "reviews": "review_count",
    "ratings": "rating_count",
    "summary": "description_short",
    "released": "release_date_raw",
    "containsAds": "ad_supported",
    "offersIAP": "in_app_purchases",
    "icon": "icon_url_512",
    "developerWebsite": "url",
    "developerAddress": "developer_address",
    "developerId": "developer_id",
    "developer": "developer_name",
    "genreId": "category",
    "headerImage": "featured_image_url",
    "screenshots": "phone_image_urls",
}

IOS_RENAMES = {
    "trackId": "store_id_raw",
    "trackName": "name",
    "averageUserRating": "rating",
    "sellerUrl": "url",
    "primaryGenreName": "category",
    "bundleId": "bundle_id",
    "releaseDate": "release_date_raw",
    "currentVersionReleaseDate": "store_last_updated_raw",
    "artistId": "developer_id_raw",
    "artistName": "developer_name",
    "userRatingCount": "rating_count",
    "artworkUrl512": "icon_url_512",
    "screenshotUrls": "phone_image_urls",
    "ipadScreenshotUrls": "tablet_image_urls",
    "languageCodesISO2A": "store_language_code_raw",
}


def _lang_with_zh_collapse(description: Column) -> Column:
    code = detect_language(description)
    return F.when(code.startswith("zh-"), "zh").otherwise(code)


def clean_play_listings(raw: DataFrame) -> DataFrame:
    """P1/P3/P4/P5/P7/P8 for Play (google.py:164-244)."""
    df = raw.withColumnsRenamed(PLAY_RENAMES)
    shots = F.col("phone_image_urls")
    return df.withColumns(
        {
            "min_installs": F.when(
                F.col("min_installs").isNull() & F.col("installs").isNotNull(),
                F.col("installs").cast("string"),
            ).otherwise(F.col("min_installs")),
            "release_date": F.coalesce(
                F.expr("try_to_date(release_date_raw, 'MMM d, yyyy')"),
                F.expr("try_to_date(release_date_raw, 'd MMM yyyy')"),
            ),
            "store_last_updated": F.col("store_last_updated").cast("long").cast("timestamp"),
            "category": F.lower("category"),
            "developer_name": F.replace(
                F.col("developer_name"), F.lit("\t"), F.lit(" ")
            ),
            "phone_image_url_1": F.get(shots, 0),
            "phone_image_url_2": F.get(shots, 1),
            "phone_image_url_3": F.get(shots, 2),
            "store_language_code": _lang_with_zh_collapse(F.col("description")),
        }
    ).drop("release_date_raw", "phone_image_urls")


def _ios_game_category(category: Column, genres: Column) -> Column:
    toks = F.transform(
        F.split(genres, ",", -1), lambda t: F.lower(F.replace(t, F.lit(" "), F.lit("_")))
    )
    first_game = F.get(F.filter(toks, lambda t: t.isin(GAME_CATEGORIES)), 0)
    return F.when(
        (category == "Games")
        & genres.isNotNull()
        & (genres != "Games")
        & first_game.isNotNull(),
        F.concat(F.lit("game_"), first_game),
    ).otherwise(category)


def clean_ios_listings(raw: DataFrame) -> DataFrame:
    """P2/P4/P6/P7/P9/P10 for iOS (apple.py:382-498)."""
    df = raw.withColumnsRenamed(IOS_RENAMES)
    if "price" not in df.columns:
        df = df.withColumn("price", F.lit(0.0))
    nums = F.regexp_extract_all(F.col("user_ratings"), F.lit(r"\d+"), 0)
    odd_nums = F.filter(nums, lambda _x, i: i % 2 == 1)
    dev = F.col("developer_id_raw").cast("string")
    cat = _ios_game_category(F.col("category"), F.col("genres"))
    return df.withColumns(
        {
            "store_id": F.col("store_id_raw").cast("string"),
            "free": F.coalesce(F.col("price") == 0, F.lit(False)),
            "category": F.replace(F.lower(cat), F.lit(" & "), F.lit("_and_")),
            "store_last_updated": F.expr("try_to_timestamp(store_last_updated_raw)"),
            "release_date": F.to_date(
                F.expr(
                    "try_to_timestamp(release_date_raw, \"yyyy-MM-dd'T'HH:mm:ss'Z'\")"
                )
            ),
            "histogram": odd_nums.cast("array<long>"),
            "description": truncate_utf8(F.col("description")),
            "store_language_code": _lang_with_zh_collapse(F.col("description")),
            "developer_id": F.when(
                dev.rlike(".0"), F.get(F.split(dev, r"\.", -1), 0)
            ).otherwise(dev),
            "phone_image_url_1": F.get(F.split("phone_image_urls", ",", -1), 0),
            "phone_image_url_2": F.get(F.split("phone_image_urls", ",", -1), 1),
            "phone_image_url_3": F.get(F.split("phone_image_urls", ",", -1), 2),
            "tablet_image_url_1": F.get(F.split("tablet_image_urls", ",", -1), 0),
            "tablet_image_url_2": F.get(F.split("tablet_image_urls", ",", -1), 1),
            "tablet_image_url_3": F.get(F.split("tablet_image_urls", ",", -1), 2),
            "wrong_platform": F.coalesce(
                F.col("kind") != "software", F.lit(False)
            ),
        }
    ).drop(
        "store_id_raw", "developer_id_raw", "release_date_raw",
        "store_last_updated_raw", "store_language_code_raw",
        "phone_image_urls", "tablet_image_urls",
    )


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


def listing_spans_col(df: DataFrame) -> Column:
    """Array<SPAN> column from whichever cleaned columns exist."""
    cols = set(df.columns)
    candidates = []
    for kind, col, is_media in _SPAN_ORDER:
        if col not in cols:
            continue
        candidates.append(
            F.struct(
                F.lit(kind).alias("kind"),
                (F.col(col) if not is_media else F.lit(None).cast("string")).alias("text"),
                (F.col(col) if is_media else F.lit(None).cast("string")).alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        )
    arr = F.filter(
        F.array(*candidates),
        lambda s: (F.coalesce(s["text"], s["media_ref"]).isNotNull())
        & (F.coalesce(s["text"], s["media_ref"]) != ""),
    )
    return F.transform(
        arr,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )


def listing_documents(cleaned: DataFrame, doc_id_col: Column) -> DataFrame:
    """(doc_id, spans) from a cleaned listing DataFrame."""
    return cleaned.select(
        doc_id_col.alias("doc_id"), listing_spans_col(cleaned).alias("spans")
    )


def normalize_search_results(
    raw: DataFrame, country: str, language: str
) -> DataFrame:
    """Search-result normalization (SURVEY.md F6 fixture;
    /root/reference/adscrawler/app_stores/google.py:17-54, golden-tested
    by the reference at tests/app_stores/test_google.py:8-68):

    * rows without appId/store_id are dropped;
    * store_link = url if present else synthesized details link;
    * renames: title→name, developer→developer_name, icon→icon_url_512;
    * constants: store=1, country, language; id == store_id.

    Declarative columns over whatever raw columns exist."""
    cols = set(raw.columns)

    def opt(name: str) -> Column:
        return F.col(name) if name in cols else F.lit(None).cast("string")

    store_id = F.coalesce(opt("store_id"), opt("appId"))
    link = F.coalesce(
        opt("url"),
        opt("store_link"),
        F.concat(
            F.lit("https://play.google.com/store/apps/details?id="), store_id
        ),
    )
    out = raw.filter(store_id.isNotNull() & (store_id != "")).select(
        store_id.alias("store_id"),
        store_id.alias("id"),
        link.alias("store_link"),
        F.coalesce(opt("title"), opt("name")).alias("name"),
        F.coalesce(opt("developer"), opt("developer_name")).alias("developer_name"),
        F.coalesce(opt("icon"), opt("icon_url_512")).alias("icon_url_512"),
        F.lit(1).alias("store"),
        F.lit(country).alias("country"),
        F.lit(language).alias("language"),
        *[
            F.col(c)
            for c in raw.columns
            if c not in {
                "store_id", "appId", "url", "store_link", "title", "name",
                "developer", "developer_name", "icon", "icon_url_512",
            }
        ],
    )
    return out
