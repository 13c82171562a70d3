"""Derived-pipeline semantics (metrics_history) on a hand-built crawl
log with known gaps, plus P11 country resolution parity."""

import datetime

import pytest
from pyspark.sql import functions as F

from adscrawler_spark.functions.country import guess_country, resolve_country
from adscrawler_spark.plans import metrics_history as mh


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def crawl_log(spark):
    # host a: weeks 1,2,4 (gap at 3); host b: week 2 only
    rows = [
        # (batch, url_canon, host, result, fetched_at, fetched)
        (0, "a.com/1", "a.com", 1, _ts("2026-01-05 10:00"), True),
        (0, "a.com/2", "a.com", 3, _ts("2026-01-06 10:00"), True),
        (1, "a.com/1", "a.com", 1, _ts("2026-01-13 10:00"), True),
        (3, "a.com/1", "a.com", 1, _ts("2026-01-27 10:00"), True),
        (3, "a.com/3", "a.com", 1, _ts("2026-01-27 11:00"), True),
        (1, "b.com/1", "b.com", 1, _ts("2026-01-14 09:00"), True),
        (1, "c.com/1", "c.com", 4, _ts("2026-01-14 09:00"), False),
    ]
    return spark.createDataFrame(
        rows,
        "batch_id long, url_canon string, host string, crawl_result int, "
        "fetched_at timestamp, fetched boolean",
    )


def test_latest_crawl_state(crawl_log):
    latest = {r.url_canon: r.batch_id for r in mh.latest_crawl_state(crawl_log).collect()}
    assert latest["a.com/1"] == 3  # newest fetched_at wins
    assert latest["a.com/2"] == 0


def test_weekly_and_densify_and_zscore(crawl_log):
    weekly = mh.weekly_host_metrics(crawl_log)
    wk = {(r.host, str(r.week_start)): (r.fetches, r.ok_rate) for r in weekly.collect()}
    assert wk[("a.com", "2026-01-05")] == (2, 0.5)
    assert wk[("a.com", "2026-01-26")] == (2, 1.0)
    assert ("c.com", "2026-01-12") not in wk  # fetched=False excluded

    dense = mh.densified_metrics(weekly)
    d = {(r.host, str(r.week_start)): (r.fetches, r.ok_rate_filled) for r in dense.collect()}
    # gap week materialized with 0 fetches and carried-forward ok_rate
    assert d[("a.com", "2026-01-19")] == (0, 1.0)
    assert len([k for k in d if k[0] == "a.com"]) == 4  # 4 consecutive weeks

    z = mh.zscored_metrics(dense, baseline_weeks=8)
    zz = {(r.host, str(r.week_start)): r.fetches_z for r in z.collect()}
    assert zz[("a.com", "2026-01-05")] is None  # empty baseline frame
    assert zz[("a.com", "2026-01-19")] is not None


def test_host_changes(crawl_log):
    ch = {
        (r.host, str(r.week_start)): (r.added, r.removed)
        for r in mh.host_changes(mh.weekly_host_metrics(crawl_log)).collect()
    }
    assert ch[("a.com", "2026-01-05")] == (True, False)   # first week
    assert ch[("a.com", "2026-01-12")] == (False, True)   # gap follows
    assert ch[("a.com", "2026-01-26")] == (True, True)    # re-added, last
    assert ch[("b.com", "2026-01-12")] == (True, True)    # singleton


CASES = [
    ("123 Road, Seoul, South Korea", "KR"),
    ("Foo Strasse 5, Berlin, Germany", "DE"),
    ("1 Infinite Loop, Cupertino, USA", "US"),
    ("10 Downing St, London, UK", "GB"),
    ("Av. Paulista, São Paulo, Brasil", "BR"),
    ("Shibuya, 日本", "JP"),
    ("Somewhere, FRA", "FR"),
    ("ends with token US", "US"),
    ("no country here", None),
    ("", None),
    (None, None),
]


def test_country_resolution(spark):
    for addr, want in CASES:
        assert guess_country(addr) == want, addr
    df = spark.createDataFrame([(a,) for a, _ in CASES], "addr string")
    got = [r.c for r in df.select(resolve_country("addr").alias("c")).collect()]
    assert got == [w for _, w in CASES]


def test_interpolate_weekly_linear_and_clamp(spark):
    """Gap weeks get prev+frac*(next-prev); clamped variant floors a
    negative slope at 0 (installs semantics, app_metrics_history.py:
    657-663); no extrapolation outside the anchor span."""
    d = datetime.date
    obs = spark.createDataFrame(
        [
            # group "a": anchors at w0=10.0 and w3=40.0 (gap w1, w2)
            ("a", d(2024, 1, 1), 10.0),
            ("a", d(2024, 1, 22), 40.0),
            # group "b": decreasing anchors 30 -> 9 across one gap week
            ("b", d(2024, 1, 8), 30.0),
            ("b", d(2024, 1, 22), 9.0),
        ],
        "g string, week_start date, val double",
    )
    out = {
        (r.g, str(r.week_start)): r.val
        for r in mh.interpolate_weekly(obs, ["g"], "week_start", "val").collect()
    }
    assert out[("a", "2024-01-01")] == 10.0
    assert out[("a", "2024-01-08")] == pytest.approx(20.0)
    assert out[("a", "2024-01-15")] == pytest.approx(30.0)
    assert out[("a", "2024-01-22")] == 40.0
    # group b spans only w1..w3: no row for b at 2024-01-01 (no
    # extrapolation before first anchor); w2 interpolates downward
    assert ("b", "2024-01-01") not in out
    assert out[("b", "2024-01-15")] == pytest.approx(19.5)
    clamped = {
        (r.g, str(r.week_start)): r.val
        for r in mh.interpolate_weekly(
            obs, ["g"], "week_start", "val", clamp_non_negative=True
        ).collect()
    }
    # negative slope floored: gap week carries the prev anchor flat
    assert clamped[("b", "2024-01-15")] == pytest.approx(30.0)
    assert clamped[("a", "2024-01-08")] == pytest.approx(20.0)
    # exact observations never altered by the clamp
    assert clamped[("b", "2024-01-22")] == 9.0


def test_country_share_model_parity_and_fallback(spark):
    """Grouped-map applyInPandas model equals the sequential pandas
    oracle, including the global-fallback branch (two countries both
    reporting ~the global counter get zeroed and the week falls back to
    max_reviews as the global denominator)."""
    import datetime as _dt

    import pandas as pd

    from adscrawler_spark.operators import estimates as est

    w1, w2 = _dt.date(2024, 1, 1), _dt.date(2024, 1, 8)
    rows = [
        # app 1 / week 1: countries 0 and 1 both report ~global (1000,
        # 980 >= 0.96*1000) -> both fallback; country 2 is local-only.
        (1, 0, w1, 1000, 5000),
        (1, 1, w1, 980, 4000),
        (1, 2, w1, 50, 3000),
        # app 1 / week 2: one clear max -> no fallback, pct over sum.
        (1, 0, w2, 600, 5000),
        (1, 1, w2, 300, 4000),
        # app 2: below the 200 floor -> never a candidate.
        (2, 0, w1, 150, 900),
        (2, 1, w1, 149, 800),
    ]
    cols = ["store_app", "country", "week_start", "review_count", "installs"]
    sdf = spark.createDataFrame(
        rows, "store_app int, country int, week_start date, "
        "review_count long, installs long"
    )
    got = (
        est.country_share_model(sdf)
        .toPandas()
        .sort_values(["store_app", "country", "week_start"])
        .reset_index(drop=True)
    )
    pdf = pd.DataFrame(rows, columns=cols)
    want = (
        pdf.groupby("store_app", group_keys=False)[pdf.columns]
        .apply(est.country_share_columns)
        .sort_values(["store_app", "country", "week_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    by = {
        (r.store_app, r.country, r.week_start): r for _, r in got.iterrows()
    }
    # fallback week: both candidates zeroed, denominator = max_reviews
    assert by[(1, 0, w1)].true_review_count == 0
    assert by[(1, 1, w1)].true_review_count == 0
    assert by[(1, 2, w1)].pct_of_global == 0.05  # 50 / 1000
    # non-fallback week: pct over the local sum (600+300)
    assert by[(1, 0, w2)].pct_of_global == round(600 / 900, 4)
    assert by[(1, 0, w2)].installs_est == int(5000 * (600 / 900) + 0.5)
    # below floor: never candidates, plain shares
    assert by[(2, 0, w1)].true_review_count == 150


def test_parse_robots_txt(spark):
    """Golden robots.txt grammar: sections, comments, crawl-delay,
    default-agent isolation (north_star robots rules)."""
    from adscrawler_spark.operators.politeness import (
        DEFAULT_CRAWL_DELAY,
        parse_robots_txt,
    )

    body_a = "\n".join(
        [
            "# global section",
            "User-agent: *",
            "Disallow: /private",
            "Disallow: /tmp  # trailing comment",
            "Crawl-delay: 2.5",
            "",
            "User-agent: evilbot",
            "Disallow: /",
        ]
    )
    body_b = "\n".join(
        [
            "User-agent: otherbot",
            "Disallow: /x",
            "User-Agent: *",
            "Disallow:",  # empty disallow = allow all
        ]
    )
    df = spark.createDataFrame(
        [("a.com", body_a), ("b.com", body_b)], "host string, body string"
    )
    got = {r.host: r for r in parse_robots_txt(df).collect()}
    assert got["a.com"].disallow == ["/private", "/tmp"]
    assert got["a.com"].crawl_delay == 2.5
    # evilbot's blanket Disallow must NOT leak into the * section
    assert "/" not in got["a.com"].disallow
    assert got["b.com"].disallow == []
    assert got["b.com"].crawl_delay == DEFAULT_CRAWL_DELAY


def test_parse_robots_txt_groups(spark):
    """RFC 9309 group rules: stacked User-agent lines share one rule
    set, and an exact-agent group beats the '*' groups entirely."""
    from adscrawler_spark.operators.politeness import parse_robots_txt

    stacked = "\n".join(
        [
            "User-agent: foo",
            "User-agent: *",
            "Disallow: /x",
            "",
            "User-agent: bar",
            "Disallow: /y",
        ]
    )
    specific = "\n".join(
        [
            "User-agent: *",
            "Disallow: /all",
            "Crawl-delay: 9",
            "",
            "User-agent: mybot",
            "Disallow: /mine",
            "Crawl-delay: 1",
        ]
    )
    orphan = "Disallow: /before-any-group\nUser-agent: *\nDisallow: /ok"
    df = spark.createDataFrame(
        [("s.com", stacked), ("p.com", specific), ("o.com", orphan)],
        "host string, body string",
    )
    star = {r.host: r for r in parse_robots_txt(df).collect()}
    # '*' stacked with foo still gets the group's rules; bar's don't leak
    assert star["s.com"].disallow == ["/x"]
    # '*' agent: p.com's exact mybot group is ignored
    assert star["p.com"].disallow == ["/all"] and star["p.com"].crawl_delay == 9.0
    # rules before any User-agent line belong to no group
    assert star["o.com"].disallow == ["/ok"]
    mybot = {r.host: r for r in parse_robots_txt(df, agent="MyBot").collect()}
    # exact group wins over '*' — only /mine, delay 1
    assert mybot["p.com"].disallow == ["/mine"]
    assert mybot["p.com"].crawl_delay == 1.0
    # named agent with no exact group falls back to '*' groups
    assert mybot["s.com"].disallow == ["/x"]


def test_catalog_compact_preserves_data(spark, tmp_path):
    from adscrawler_spark.sources.catalog import Catalog

    t = Catalog(str(tmp_path / "cat")).table("things")
    for i in range(4):
        t.append(spark.range(i * 10, (i + 1) * 10))
    assert len(t.snapshot()["files"]) == 4
    before = sorted(r.id for r in t.read(spark).collect())
    t.compact(spark)
    assert len(t.snapshot()["files"]) == 1
    after = sorted(r.id for r in t.read(spark).collect())
    assert before == after == list(range(40))


def test_ranked_top_n_edges(spark):
    from pyspark.sql import functions as F

    from adscrawler_spark.operators.frontier import ranked_top_n

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    order = [F.asc("k"), F.desc("id")]
    # n larger than the data: every row ranked, total order exact
    all_rows = ranked_top_n(df, order, 1000, rank_col="r").collect()
    assert len(all_rows) == 100
    want = sorted(((r.k, -r.id) for r in all_rows))
    got = [
        (r.k, -r.id)
        for r in sorted(all_rows, key=lambda r: r.r)
    ]
    assert got == want
    assert sorted(r.r for r in all_rows) == list(range(1, 101))
    # n = 1
    top = ranked_top_n(df, order, 1, rank_col="r").collect()
    assert len(top) == 1 and top[0].k == 0 and top[0].id == 98
