"""Parity tests for plans/package_downloads.py against a pure-python
restatement of the reference's download management
(packages/apks/download_apk.py, packages/ipas/download_ipa.py)."""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from adscrawler_spark.plans import package_downloads as PD


# ---------------------------------------------------------------------
# Pure-python restatement (mirrors the reference control flow)
# ---------------------------------------------------------------------

def py_coerce(vc):
    if vc is None:
        return None
    vc = vc.strip()
    return int(vc) if vc and vc.isdigit() else None


def py_android(last, attempts, post):
    """manage_apk_download + external_download restated.

    attempts: {source: (download_ok, available_version_code, ext)}
    post: (unzip_class, version_str, md5) or None
    returns (crawl_result, version_str, md5, ext, error_count)
    """
    last_code = py_coerce(last)
    gate = attempts.get("gplaydl")
    if (
        gate is not None
        and last_code is not None
        and gate[1] is not None
        and gate[1] <= last_code
    ):
        return (1, str(last_code), None, None, 0)
    won = None
    for s in PD.APK_SOURCES:
        a = attempts.get(s)
        if a and a[0]:
            won = a
            break
    if won is None:
        return (2, "-1", None, None, 2)
    cls, version, md5 = post
    if cls == "ok":
        return (1, version, md5, won[2], 0)
    if cls == "unzip_missing":
        return (1, "-1", None, won[2], 0)
    return (3, "-1", None, won[2], 1)


def py_ios(outcome):
    cls, version, md5 = outcome
    if cls == "ok":
        return (1, version if version is not None else "-1", md5, "ipa", 0)
    if cls in ("http_error", "conn_error"):
        return (3, "-1", None, None, 3)
    if cls == "unpack_fail":
        return (2, "-1", None, None, 1)
    return (3, "-1", None, None, 3)


FRONTIER_SCHEMA = StructType(
    [
        StructField("store_app", LongType()),
        StructField("store_id", StringType()),
        StructField("last_downloaded_version_code", StringType()),
    ]
)
ATTEMPT_SCHEMA = StructType(
    [
        StructField("store_id", StringType()),
        StructField("source", StringType()),
        StructField("download_ok", BooleanType()),
        StructField("available_version_code", LongType()),
        StructField("ext", StringType()),
    ]
)
POST_SCHEMA = StructType(
    [
        StructField("store_id", StringType()),
        StructField("unzip_class", StringType()),
        StructField("version_str", StringType()),
        StructField("md5_hash", StringType()),
    ]
)

ANDROID_CASES = {
    # store_id: (last, {source: (ok, avail, ext)}, post)
    "a.gate": ("100", {"gplaydl": (True, 100, "xapk"),
                       "apkpure": (True, None, "apk")},
               ("ok", "101", "h1")),
    "a.newer": ("100", {"gplaydl": (True, 101, "xapk")}, ("ok", "101", "h2")),
    "a.nolast": (None, {"gplaydl": (True, 50, "xapk")}, ("ok", "50", "h3")),
    "a.badlast": (" abc ", {"gplaydl": (True, 50, "xapk")}, ("ok", "50", "h4")),
    "a.fallback": ("7", {"gplaydl": (False, None, None),
                         "apkpure": (False, None, None),
                         "apkmirror": (True, None, "apk")},
                   ("ok", "8", "h5")),
    "a.allfail": ("7", {"gplaydl": (False, None, None),
                        "apkpure": (False, None, None)}, ("ok", "9", "h6")),
    "a.unzipmiss": (None, {"apkpure": (True, None, "apk")},
                    ("unzip_missing", None, None)),
    "a.unziperr": (None, {"apkpure": (True, None, "xapk")},
                   ("unzip_error", None, None)),
    "a.other": (None, {"apkmirror": (True, None, "apk")},
                ("other", None, None)),
    # gate probe present but gplaydl info failed (None avail): no gate,
    # ladder continues
    "a.gateprobe": ("100", {"gplaydl": (False, None, None),
                            "apkpure": (True, None, "apk")},
                    ("ok", "102", "h7")),
}


def _android_results(spark):
    frontier = spark.createDataFrame(
        [(i, sid, c[0]) for i, (sid, c) in enumerate(ANDROID_CASES.items())],
        FRONTIER_SCHEMA,
    )
    attempts = spark.createDataFrame(
        [
            (sid, src, ok, avail, ext)
            for sid, c in ANDROID_CASES.items()
            for src, (ok, avail, ext) in c[1].items()
        ],
        ATTEMPT_SCHEMA,
    )
    post = spark.createDataFrame(
        [(sid, *c[2]) for sid, c in ANDROID_CASES.items()], POST_SCHEMA
    )
    return PD.android_download_results(frontier, attempts, post)


def test_android_ladder_parity(spark):
    got = {r.store_id: r for r in _android_results(spark).collect()}
    assert len(got) == len(ANDROID_CASES)
    for sid, (last, attempts, post) in ANDROID_CASES.items():
        want = py_android(last, attempts, post)
        r = got[sid]
        assert (
            r.crawl_result, r.version_str, r.md5_hash, r.ext, r.error_count
        ) == want, sid
        assert r.store == 1


IOS_CASES = {
    "i.ok": ("ok", "9.1", "ih1"),
    "i.noversion": ("ok", None, "ih2"),
    "i.http": ("http_error", None, None),
    "i.conn": ("conn_error", None, None),
    "i.unpack": ("unpack_fail", None, None),
    "i.other": ("other", None, None),
}


def test_ios_parity(spark):
    frontier = spark.createDataFrame(
        [(i, sid, None) for i, sid in enumerate(IOS_CASES)], FRONTIER_SCHEMA
    ).select("store_app", "store_id")
    attempts = spark.createDataFrame(
        [(sid, *c) for sid, c in IOS_CASES.items()],
        "store_id string, outcome_class string, version_str string, "
        "md5_hash string",
    )
    got = {r.store_id: r
           for r in PD.ios_download_results(frontier, attempts).collect()}
    for sid, c in IOS_CASES.items():
        want = py_ios(c)
        r = got[sid]
        assert (
            r.crawl_result, r.version_str, r.md5_hash, r.ext, r.error_count
        ) == want, sid
        assert r.store == 2


def test_persistence_rows(spark):
    results = _android_results(spark)
    vc = {r.store_app: r for r in PD.version_code_rows(results).collect()}
    log = {r.store_app: r for r in PD.download_log_rows(results).collect()}
    keys = PD.s3_upload_keys(results).collect()
    routing = {r.store_id: r.dest_dir
               for r in PD.main_dir_routing(results).collect()}
    sids = list(ANDROID_CASES)
    for i, sid in enumerate(sids):
        want = py_android(*ANDROID_CASES[sid])
        assert vc[i].version_code == (want[1] or "-1"), sid
        assert vc[i].crawl_result == want[0]
        assert vc[i].apk_hash == want[2]
        assert log[i].version_code == (want[1] or "-1")
    # uploads only for downloaded + cr in (1,3) + md5
    want_keys = {
        f"apks/android/{sid}/{w[1]}/{sid}_{w[2]}.{w[3]}"
        for sid, w in ((s, py_android(*ANDROID_CASES[s])) for s in sids)
        if w[2] is not None and w[0] in (1, 3) and w[3] is not None
    }
    assert {k.s3_key for k in keys} == want_keys
    assert routing["a.fallback"] == "apks"
    assert routing["a.unziperr"] == "xapks"
    assert "a.allfail" not in routing and "a.gate" not in routing


def test_download_backoff_walk_matches_sequential_loop(spark):
    ecs = [0, 2, 0, 0, 3, 3, 3, 3, 0, 0, 0]

    def py_walk(ecs):
        total, out = 0, []
        stopped = False
        for ec in ecs:
            if stopped:
                out.append((ec, None, None, False))
                continue
            if ec == 0:
                if total > 0:
                    total -= 1
                sleep = total + 10
            else:
                total += ec
                sleep = total * total * 5
            out.append((ec, total, sleep, True))
            if total > 11:
                stopped = True
        return out

    df = spark.createDataFrame(
        [(i, ec) for i, ec in enumerate(ecs)], "seq int, error_count int"
    )
    got = sorted(PD.download_backoff_walk(df).collect(), key=lambda r: r.seq)
    want = py_walk(ecs)
    for r, (ec, total, sleep, processed) in zip(got, want):
        assert r.error_count == ec
        assert bool(r.processed) == processed, r.seq
        if processed:
            assert (r.total_errors, r.sleep_sec) == (total, sleep), r.seq
