"""Store-listing cleaner parity (Spark vs pyref oracle) on FIXTURES.md
F5 shapes, incl. edge rows: multibyte truncation boundary, '.0'
developer ids, both Play date formats, comma'd histograms, game genre
lists, '&' categories, missing screenshots, wrong-platform rows."""

import pandas as pd
import pytest

from adscrawler_spark.operators.listings import (
    clean_ios_listings,
    clean_play_listings,
    listing_documents,
)
from adscrawler_spark.pyref import listings as pyref

PLAY_SCHEMA = (
    "store_id string, title string, installs string, realInstalls long, "
    "score double, ratings long, reviews long, histogram array<long>, "
    "summary string, description string, released string, updated long, "
    "containsAds boolean, offersIAP boolean, icon string, "
    "developerWebsite string, developerId string, developer string, "
    "developerAddress string, genreId string, headerImage string, "
    "screenshots array<string>"
)

LONG_DESC = "intro " + "é" * 2000  # 6 + 4000 bytes → mid-char cut at 2400

PLAY_ROWS = [
    dict(
        store_id="com.example.one", title="Example One",
        installs="1,000,000+", realInstalls=1234567, score=4.5,
        ratings=1000, reviews=200, histogram=[10, 20, 30, 40, 900],
        summary="A short summary of the app",
        description="This is the description of the app and it is in English "
                    "with many of the most common words that you would expect",
        released="Jan 5, 2024", updated=1704412800, containsAds=True,
        offersIAP=False, icon="https://cdn/icon1.png",
        developerWebsite="https://www.example.com", developerId="dev1",
        developer="Dev\tOne", developerAddress="123 Road, Seoul, South Korea",
        genreId="FOOD_AND_DRINK", headerImage="https://cdn/header1.png",
        screenshots=["https://cdn/s1.png", "https://cdn/s2.png",
                     "https://cdn/s3.png", "https://cdn/s4.png"],
    ),
    dict(
        store_id="com.example.two", title="Ejemplo Dos",
        installs=None, realInstalls=500, score=None, ratings=None,
        reviews=None, histogram=None,
        summary=None,
        description="Esta es la descripción de la aplicación y es en español "
                    "con muchas de las palabras más comunes que se esperan",
        released="5 Jan 2024", updated=None, containsAds=None,
        offersIAP=None, icon=None, developerWebsite=None, developerId=None,
        developer=None, developerAddress=None, genreId=None,
        headerImage=None, screenshots=None,
    ),
    dict(
        store_id="com.example.zh", title="中文应用",
        installs="100+", realInstalls=100, score=3.0, ratings=5, reviews=1,
        histogram=[1, 1, 1, 1, 1],
        summary="短摘要",
        description="这是一个中文应用的描述 它包含很多中文字符 用于测试语言检测",
        released="not a date", updated=1704412800, containsAds=False,
        offersIAP=True, icon="https://cdn/icon3.png",
        developerWebsite="https://blog.example.co.uk/x", developerId="dev3",
        developer="Dev Three", developerAddress=None, genreId="GAME_PUZZLE",
        headerImage=None, screenshots=["https://cdn/z1.png"],
    ),
]

IOS_SCHEMA = (
    "trackId long, trackName string, averageUserRating double, "
    "userRatingCount long, user_ratings string, sellerUrl string, "
    "primaryGenreName string, genres string, bundleId string, "
    "releaseDate string, currentVersionReleaseDate string, artistId string, "
    "artistName string, artworkUrl512 string, screenshotUrls string, "
    "ipadScreenshotUrls string, languageCodesISO2A string, price double, "
    "description string, kind string"
)

IOS_ROWS = [
    dict(
        trackId=111, trackName="Puzzle Fun",
        averageUserRating=4.2, userRatingCount=999,
        user_ratings="1: 1,234 2: 56 3: 78 4: 90 5: 1,000",
        sellerUrl="https://apps.example.com", primaryGenreName="Games",
        genres="Games,Word,Puzzle", bundleId="com.fun.puzzle",
        releaseDate="2023-06-15T00:00:00Z",
        currentVersionReleaseDate="2024-02-01T12:30:00Z",
        artistId="12345.0", artistName="Fun Co",
        artworkUrl512="https://cdn/ios1.png",
        screenshotUrls="https://cdn/i1.png,https://cdn/i2.png",
        ipadScreenshotUrls="https://cdn/t1.png",
        languageCodesISO2A="EN", price=0.0,
        description="An english puzzle game that you can play with all of "
                    "your friends and it is one of the best in the store",
        kind="software",
    ),
    dict(
        trackId=222, trackName="Food & Drink Finder",
        averageUserRating=None, userRatingCount=None, user_ratings=None,
        sellerUrl=None, primaryGenreName="Food & Drink", genres="Food & Drink",
        bundleId="com.food.finder", releaseDate=None,
        currentVersionReleaseDate=None, artistId="987", artistName=None,
        artworkUrl512=None, screenshotUrls=None, ipadScreenshotUrls=None,
        languageCodesISO2A=None, price=2.99, description=LONG_DESC,
        kind="mac software",
    ),
    dict(
        trackId=333, trackName="Gibberish",
        averageUserRating=1.0, userRatingCount=1,
        user_ratings="1: 1 2: 1 3: 1 4: 1 5: 1",
        sellerUrl="https://g.example.org", primaryGenreName="Games",
        genres="Games", bundleId="com.g.x", releaseDate="2020-01-01T00:00:00Z",
        currentVersionReleaseDate="2020-01-02T00:00:00Z", artistId="40",
        artistName="G", artworkUrl512="https://cdn/g.png",
        screenshotUrls="", ipadScreenshotUrls="",
        languageCodesISO2A="XX", price=0.0,
        description="qzx vbnk wrtp mlkj dfgh",
        kind="software",
    ),
]

COMPARE_PLAY = [
    "store_id", "name", "min_installs", "installs", "rating", "rating_count",
    "review_count", "description_short", "description", "release_date",
    "store_last_updated", "ad_supported", "in_app_purchases", "icon_url_512",
    "url", "developer_id", "developer_name", "developer_address", "category",
    "featured_image_url", "phone_image_url_1", "phone_image_url_2",
    "phone_image_url_3", "store_language_code",
]
COMPARE_IOS = [
    "store_id", "name", "rating", "rating_count", "url", "bundle_id", "free",
    "category", "store_last_updated", "release_date", "histogram",
    "description", "store_language_code", "developer_id", "developer_name",
    "icon_url_512", "phone_image_url_1", "phone_image_url_2",
    "phone_image_url_3", "tablet_image_url_1", "tablet_image_url_2",
    "tablet_image_url_3", "wrong_platform",
]


def _norm(v):
    if isinstance(v, float) and pd.isna(v):
        return None
    if pd.api.types.is_scalar(v) and v is pd.NaT:
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, (list, tuple)) or (hasattr(v, "tolist") and not pd.api.types.is_scalar(v)):
        return [int(x) for x in v]
    return v


@pytest.fixture(scope="module")
def play_out(spark):
    raw = spark.createDataFrame([tuple(r.values()) for r in PLAY_ROWS], PLAY_SCHEMA)
    cleaned = clean_play_listings(raw)
    import pyspark.sql.functions as F
    docs = listing_documents(cleaned, F.concat(F.lit("gp::"), F.col("store_id")))
    return cleaned.toPandas().set_index("store_id"), {
        r.doc_id: r.spans for r in docs.collect()
    }


@pytest.fixture(scope="module")
def ios_out(spark):
    raw = spark.createDataFrame([tuple(r.values()) for r in IOS_ROWS], IOS_SCHEMA)
    cleaned = clean_ios_listings(raw)
    import pyspark.sql.functions as F
    docs = listing_documents(cleaned, F.concat(F.lit("ios::"), F.col("store_id")))
    return cleaned.toPandas().set_index("store_id"), {
        r.doc_id: r.spans for r in docs.collect()
    }


def test_play_columns_match_oracle(play_out):
    got_df, _ = play_out
    for row in PLAY_ROWS:
        want = pyref.clean_play_row(row)
        got = got_df.loc[row["store_id"]]
        for col in COMPARE_PLAY:
            if col == "store_id":
                continue
            g, w = _norm(got[col]), _norm(want[col])
            if col == "release_date" and g is not None:
                g = g if not hasattr(g, "date") else g
            assert g == w, (row["store_id"], col, g, w)


def test_ios_columns_match_oracle(ios_out):
    got_df, _ = ios_out
    for row in IOS_ROWS:
        want = pyref.clean_ios_row(row)
        got = got_df.loc[str(row["trackId"])]
        for col in COMPARE_IOS:
            if col == "store_id":
                continue
            g, w = _norm(got[col]), _norm(want[col])
            assert g == w, (row["trackId"], col, g, w)


def test_span_sequences_match_oracle(play_out, ios_out):
    for rows, out, cleaner, prefix in [
        (PLAY_ROWS, play_out, pyref.clean_play_row, "gp::"),
        (IOS_ROWS, ios_out, pyref.clean_ios_row, "ios::"),
    ]:
        _, spans_by_doc = out
        for row in rows:
            cleaned = cleaner(row)
            want = pyref.listing_spans(cleaned)
            doc_id = prefix + cleaned["store_id"]
            got = [
                (s.kind, s.text, s.media_ref, s.offset)
                for s in sorted(spans_by_doc[doc_id], key=lambda s: s.offset)
            ]
            assert got == want, doc_id


def test_edge_semantics(play_out, ios_out):
    play_df, _ = play_out
    ios_df, _ = ios_out
    # min_installs backfill from realInstalls (google.py:192-198)
    assert play_df.loc["com.example.two", "min_installs"] == "500"
    # both Play date formats parse; junk -> null (google.py:200-207)
    assert str(play_df.loc["com.example.one", "release_date"]) == "2024-01-05"
    assert str(play_df.loc["com.example.two", "release_date"]) == "2024-01-05"
    assert pd.isna(play_df.loc["com.example.zh", "release_date"])
    # tab scrub + zh collapse
    assert play_df.loc["com.example.one", "developer_name"] == "Dev One"
    assert play_df.loc["com.example.zh", "store_language_code"] == "zh"
    assert play_df.loc["com.example.one", "store_language_code"] == "en"
    assert play_df.loc["com.example.two", "store_language_code"] == "es"
    # iOS: game category from genre list; & -> _and_ (apple.py:408-433)
    assert ios_df.loc["111", "category"] == "game_word"
    assert ios_df.loc["222", "category"] == "food_and_drink"
    # histogram odd-index artifact on comma'd counts (apple.py:458-463)
    # findall('\d+') on "1: 1,234 2: 56 3: 78 4: 90 5: 1,000" yields
    # [1,1,234,2,56,3,78,4,90,5,1,000]; odd indices -> [1,2,3,4,5,0]
    assert [int(x) for x in ios_df.loc["111", "histogram"]] == [1, 2, 3, 4, 5, 0]
    # developer_id '.0' repair (apple.py:489-497); '40' matches regex but no dot
    assert ios_df.loc["111", "developer_id"] == "12345"
    assert ios_df.loc["333", "developer_id"] == "40"
    # UTF-8 byte cap at a valid boundary (utils.py:106-117)
    desc = ios_df.loc["222", "description"]
    assert len(desc.encode("utf-8")) <= 2400
    assert desc == pyref.truncate_utf8_bytes(LONG_DESC)
    # wrong platform flag; unknown language -> zz
    assert bool(ios_df.loc["222", "wrong_platform"]) is True
    assert ios_df.loc["333", "store_language_code"] == "zz"


def test_normalize_search_results(spark):
    """Port of the reference's own golden test
    (tests/app_stores/test_google.py:8-68)."""
    from adscrawler_spark.operators.listings import normalize_search_results

    raw = spark.createDataFrame(
        [
            (None, "YouTube", None, "Google LLC", "https://example.com/icon0.png", None),
            ("com.example.app", "Example App",
             "https://play.google.com/store/apps/details?id=com.example.app",
             "Example Dev", "https://example.com/icon1.png", 4.5),
        ],
        "appId string, title string, url string, developer string, "
        "icon string, score double",
    )
    rows = normalize_search_results(raw, "us", "en").collect()
    assert len(rows) == 1  # appId=None dropped
    r = rows[0].asDict()
    assert r["store_id"] == "com.example.app" and r["id"] == "com.example.app"
    assert r["store_link"].endswith("details?id=com.example.app")
    assert r["name"] == "Example App"
    assert r["developer_name"] == "Example Dev"
    assert r["icon_url_512"] == "https://example.com/icon1.png"
    assert (r["store"], r["country"], r["language"]) == (1, "us", "en")
    assert r["score"] == 4.5
    for dropped in ("appId", "title", "url", "developer", "icon"):
        assert dropped not in r

    # store_link synthesized when url absent (second reference test)
    raw2 = spark.createDataFrame(
        [("com.example.app", "Example App", "Example Dev", "i.png")],
        "appId string, title string, developer string, icon string",
    )
    r2 = normalize_search_results(raw2, "mx", "es").collect()[0]
    assert r2.store_link == (
        "https://play.google.com/store/apps/details?id=com.example.app"
    )
    assert (r2.country, r2.language) == ("mx", "es")
