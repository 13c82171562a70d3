"""Decoded-package SDK detail extraction (operators/manifests.py) vs
the reference semantics (packages/apks/manifest.py,
packages/ipas/get_plist.py, packages/process_files.py)."""

import json
import plistlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from adscrawler_spark.operators import manifests as mf
from adscrawler_spark.plans import version_details as vd


def _inv(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


# ---------------------------------------------------------------------
# Android: smali ladder
# ---------------------------------------------------------------------

def test_smali_ladder_golden(spark):
    prefix = "/tmp/unzipped"
    rows = [
        ("app1", 10, f"{prefix}/app1/smali/com/appsflyer/internal"),
        ("app1", 10, f"{prefix}/app1/smali_classes_3/com/unity3d/ads"),
        ("app1", 10, f"{prefix}/app1/smali_classes4/io/bidmachine"),
        ("app1", 10, f"{prefix}/app1/smali_assets2/org/x"),
        ("app1", 10, f"{prefix}/app1/smali_assets/net/pubnative"),
        ("app1", 10, f"{prefix}/app1/smali/a/b"),          # len<=4 drop
        ("app1", 10, f"{prefix}/app1/res/raw"),            # no smali
        ("app1", 10, f"{prefix}/app1/SMALI/com/CaseTest"),  # ci filter
    ]
    out = mf.smali_details(
        _inv(spark, rows, ["store_id", "version_code_id", "path"]),
        unzip_prefix=prefix,
    )
    got = sorted(r.android_name for r in out.collect())
    # The case-insensitive contains keeps the SMALI row but the
    # replace ladder is case-sensitive, exactly like the reference
    # (filter on .str.lower(), replaces on the raw path).
    assert got == sorted(
        [
            "com.appsflyer.internal",
            "com.unity3d.ads",
            "io.bidmachine",
            "org.x",
            "net.pubnative",
            "SMALI.com.CaseTest",
        ]
    )
    assert {r.path for r in out.collect()} == {"smali"}
    assert {r.tag for r in out.collect()} == {None}


def test_smali_ladder_matches_pandas_restatement(spark):
    """The JVM ladder equals the reference's pandas replace chain
    (manifest.py:93-111) restated here over adversarial paths."""
    prefix = "/u"
    paths = [
        f"{prefix}/a/smali/com/x/smali/y",        # literal hits twice
        f"{prefix}/a/smali_classes_12/com/q",
        f"{prefix}/a/smali_classes9/np",           # len>4 post-transform
        f"{prefix}/a/smali_classes22",
        f"{prefix}/a/smali_assets/k/l/m/n",
        f"{prefix}/a/xsmali_assets7/deep/pkg",
    ]
    ser = pd.Series(paths)
    ser = ser[ser.str.lower().str.contains("smali")]
    ser = (
        ser.str.replace(prefix + "/a/", "", regex=False)
        .str.replace("smali/", "", regex=False)
        .str.replace(r"smali_classes_\d+/", "", regex=True)
        .str.replace(r"smali_classes\d+/", "", regex=True)
        .str.replace(r"smali_classes\d+", "", regex=True)
        .str.replace(r"smali_assets\d+/", "", regex=True)
        .str.replace("smali_assets/", "", regex=False)
        .str.replace("smali_assets", "", regex=False)
        .str.replace("/", ".", regex=False)
    )
    expected = sorted(ser[ser.str.len() > 4].tolist())
    out = mf.smali_details(
        _inv(
            spark,
            [("a", 1, p) for p in paths],
            ["store_id", "version_code_id", "path"],
        ),
        unzip_prefix=prefix,
    )
    assert sorted(r.android_name for r in out.collect()) == expected


# ---------------------------------------------------------------------
# Android: manifest XML walk
# ---------------------------------------------------------------------

_MANIFEST_XML = """<manifest xmlns:android="http://schemas.android.com/apk/res/android">
<application>
  <receiver android:exported="true" android:name="com.appsflyer.MultipleInstallBroadcastReceiver">
    <intent-filter>
      <action android:name="com.android.vending.INSTALL_REFERRER"/>
    </intent-filter>
  </receiver>
  <receiver android:name="com.appsflyer.SingleInstallBroadcastReceiver"/>
</application>
</manifest>"""


def test_manifest_xml_walk_matches_reference_docstring(spark):
    out = mf.manifest_xml_details(
        _inv(
            spark,
            [("app1", 10, _MANIFEST_XML)],
            ["store_id", "version_code_id", "manifest_xml"],
        )
    ).collect()
    rows = [(r.path, r.tag, r.android_name) for r in out]
    assert rows == [
        ("application", "application", ""),
        ("application/receiver", "receiver",
         "com.appsflyer.MultipleInstallBroadcastReceiver"),
        ("application/receiver/intent-filter", "intent-filter", ""),
        ("application/receiver/intent-filter/action", "action",
         "com.android.vending.INSTALL_REFERRER"),
        ("application/receiver", "receiver",
         "com.appsflyer.SingleInstallBroadcastReceiver"),
    ]


def test_manifest_xml_bad_input_yields_no_rows(spark):
    out = mf.manifest_xml_details(
        _inv(
            spark,
            [("app1", 10, "<not-xml"), ("app2", 11, None)],
            ["store_id", "version_code_id", "manifest_xml"],
        )
    )
    assert out.count() == 0


# ---------------------------------------------------------------------
# Android: res/raw JSONs
# ---------------------------------------------------------------------

def test_raw_json_details_keys_and_break(spark):
    rows = [
        ("a", 1, "cfg.json", json.dumps({"k1": "v1", "k2": {"n": 5}})),
        ("a", 1, "list.json", json.dumps([1, 2])),      # skipped
        ("a", 1, "zz.json", json.dumps({"later": 1})),
        ("b", 2, "bad.json", "{nope"),                   # breaks app b
        ("b", 2, "good.json", json.dumps({"x": "y"})),   # after break? no:
        # sorted order puts bad.json first -> break -> good.json lost
    ]
    out = mf.raw_json_details(
        _inv(
            spark, rows,
            ["store_id", "version_code_id", "file_name", "json_content"],
        )
    ).collect()
    got = sorted((r.store_id, r.path, r.android_name) for r in out)
    assert got == [
        ("a", "res.raw.cfg.k1", "v1"),
        ("a", "res.raw.cfg.k2", str({"n": 5})),
        ("a", "res.raw.zz.later", "1"),
    ]


def test_raw_json_value_truncated_to_500(spark):
    big = json.dumps({"k": "x" * 900})
    out = mf.raw_json_details(
        _inv(
            spark, [("a", 1, "f.json", big)],
            ["store_id", "version_code_id", "file_name", "json_content"],
        )
    ).collect()
    assert len(out) == 1 and len(out[0].android_name) == 500


def test_android_details_dedups_across_sources(spark):
    xml = mf.manifest_xml_details(
        _inv(spark, [("a", 1, _MANIFEST_XML)],
             ["store_id", "version_code_id", "manifest_xml"])
    )
    smali = mf.smali_details(
        _inv(spark, [("a", 1, "smali/com/appsflyer/internal"),
                     ("a", 1, "smali/com/appsflyer/internal")],
             ["store_id", "version_code_id", "path"])
    )
    jsons = mf.raw_json_details(
        _inv(spark, [("a", 1, "f.json", json.dumps({"k": "v"}))],
             ["store_id", "version_code_id", "file_name", "json_content"])
    )
    out = mf.android_details(xml, smali, jsons)
    assert out.count() == 5 + 1 + 1  # xml rows + one smali + one json
    assert out.filter(F.col("path") == "smali").count() == 1


# ---------------------------------------------------------------------
# iOS: Payload listings + Mach-O
# ---------------------------------------------------------------------

def test_ipa_path_details(spark):
    rows = [
        ("a", 1, "Payload/My.app/Frameworks/FBSDKCoreKit.framework", True),
        ("a", 1, "Payload/My.app/Frameworks/libswift.dylib", False),
        ("a", 1, "Payload/My.app/Frameworks/readme.txt", False),   # drop
        ("a", 1, "Payload/My.app/GoogleMaps.bundle", True),
        ("a", 1, "Payload/My.app/notbundle", True),                # drop
        ("a", 1, "Payload/My.app/gamecookeddata", True),
        ("a", 1, "Payload/My.app/ue4commandline.txt", False),
        ("a", 1, "Payload/My.app/deep/dir.bundle", True),          # drop
    ]
    out = mf.ipa_path_details(
        _inv(spark, rows, ["store_id", "version_code_id", "path", "is_dir"])
    ).collect()
    got = sorted((r.path, r.value) for r in out)
    assert got == [
        ("Payload", "gamecookeddata"),
        ("Payload", "ue4commandline.txt"),
        ("bundles", "GoogleMaps.bundle"),
        ("frameworks", "FBSDKCoreKit.framework"),
        ("frameworks", "libswift.dylib"),
    ]


def test_macho_details_golden(spark):
    rows = [
        ("a", 1, "/usr/lib/libSystem.B.dylib"),
        ("a", 1, "/usr/lib/libSystem.B.dylib"),      # dedup
        ("a", 1, "Frameworks/Flutter.framework/Flutter"),  # ext slash cut
        ("a", 1, "dotless"),                               # no dot -> drop
        ("a", 1, "@rpath/libswiftCore.dylib/extra"),
        ("a", 1, None),
    ]
    out = mf.macho_details(
        _inv(spark, rows, ["store_id", "version_code_id", "name"])
    ).collect()
    got = sorted((r.path, r.value) for r in out)
    assert got == [
        ("/usr/lib", "libSystem.B.dylib"),
        ("@rpath", "libswiftCore.dylib"),
        ("Frameworks", "Flutter.framework"),
    ]


# ---------------------------------------------------------------------
# iOS: plist flatten — golden rows pinning the reference's pandas
# dtype semantics (get_plist.py:74-137 + unpack_and_attach:19-42).
# plistlib.dumps sorts keys, exactly like a plist document on disk.
# ---------------------------------------------------------------------

def _rows(data):
    return [
        (p, v)
        for (p, _t, v) in mf._plist_rows(plistlib.dumps(data).decode())
    ]


def test_plist_rows_golden_full():
    data = {
        "CFBundleVersion": "42",
        "CFBundleShortVersionString": "1.2.3",
        "UIDeviceFamily": [1, 2],
        "NSAppTransportSecurity": {"NSAllowsArbitraryLoads": True},
        "CFBundleURLTypes": [
            {"CFBundleURLSchemes": ["fb123", "myapp"],
             "CFBundleURLName": "n"},
            {"CFBundleURLSchemes": ["other"]},
        ],
        "CFBundleConfigDataJSONBase64": "ZHJvcHBlZA==",
        "LongKey": "y" * 700,
    }
    got = _rows(data)
    # Keys arrive sorted; the base64 blob is dropped; nested-dict
    # columns come after top-level scalars; dict elements join their
    # cells in column-union order; list ints float ('1.0') because
    # the dict elements widened the column union.
    assert got == [
        ("CFBundleShortVersionString", "1.2.3"),
        ("CFBundleURLTypes", "n['fb123', 'myapp']"),
        ("CFBundleURLTypes", "['other']"),
        ("CFBundleVersion", "42"),
        ("LongKey", "y" * 500),
        ("UIDeviceFamily", "1.0"),
        ("UIDeviceFamily", "2.0"),
        ("NSAppTransportSecurity/NSAllowsArbitraryLoads", "True"),
    ]


def test_plist_rows_golden_dtype_edges():
    # ints stay ints when no dict widens the union
    assert _rows({"a": [3, 4], "c": 8}) == [
        ("a", "3"), ("a", "4"), ("c", "8")]
    # bools joining an all-numeric column render as pandas ints
    assert _rows({"b": [True, False], "c": 8, "n": {"i": 9}}) == [
        ("b", "1"), ("b", "0"), ("c", "8"), ("n/i", "9")]
    # bools beside strings keep their repr
    assert _rows({"b": True, "s": "x"}) == [("b", "True"), ("s", "x")]
    # empty list explodes to an empty-string row
    assert _rows({"e": [], "x": "q"}) == [("e", ""), ("x", "q")]
    # mixed scalar/dict list: scalar lands in the leading value
    # column, dict cells follow in key order
    assert _rows({"m": ["scalar", {"j": 2, "k": "v"}]}) == [
        ("m", "scalar"), ("m", "2.0v")]


def test_plist_rows_bad_input():
    assert mf._plist_rows("not a plist") == []


def test_plist_version_id_placeholder_fallback():
    t1 = plistlib.dumps(
        {"CFBundleVersion": "1", "CFBundleShortVersionString": "4.5"}
    ).decode()
    t2 = plistlib.dumps(
        {"CFBundleVersion": "77", "CFBundleShortVersionString": "4.5"}
    ).decode()
    assert mf.plist_version_id(t1) == "4.5"
    assert mf.plist_version_id(t2) == "77"


def test_ios_details_end_shape(spark):
    plists = mf.plist_details(
        _inv(
            spark,
            [("a", 1, plistlib.dumps(
                {"CFBundleVersion": "42", "UIDeviceFamily": [1, 2],
                 "NSAppTransportSecurity": {"NSAllowsArbitraryLoads": True}}
            ).decode())],
            ["store_id", "version_code_id", "plist_text"],
        )
    )
    paths = mf.ipa_path_details(
        _inv(spark, [("a", 1, "Payload/My.app/G.bundle", True)],
             ["store_id", "version_code_id", "path", "is_dir"])
    )
    macho = mf.macho_details(
        _inv(spark, [("a", 1, "/usr/lib/libc.A.dylib")],
             ["store_id", "version_code_id", "name"])
    )
    out = mf.ios_details(plists, paths, macho)
    assert out.columns == [
        "store_id", "version_code_id", "path", "tag", "android_name"
    ]
    assert out.filter(F.col("tag") != "").count() == 0
    assert out.filter(F.col("path") == "bundles").count() == 1


# ---------------------------------------------------------------------
# Shared downstream: scan results + dictionary upsert + e2e
# ---------------------------------------------------------------------

def test_scan_results_fallback_rows(spark):
    details = spark.createDataFrame(
        [("a", 1, "smali", None, "com.x.y")],
        "store_id string, version_code_id long, path string, "
        "tag string, android_name string",
    )
    scanned = _inv(
        spark,
        [("a", 1, 100, 1), ("b", 2, 101, 3)],
        ["store_id", "version_code_id", "store_app", "scan_result"],
    )
    out = {(r.version_code_id, r.scan_result)
           for r in mf.scan_results(details, scanned).collect()}
    assert out == {(1, 1), (2, 3)}


def test_version_strings_upsert_dictionary_and_map(spark):
    details = _inv(
        spark,
        [
            ("a", 1, "smali", None, "com.x.y"),
            ("a", 1, "smali", None, "com.x.y"),       # dup pair
            ("b", 2, "smali", None, "com.x.y"),       # same triple
            ("b", 2, "application/meta-data", "meta-data", "com.z"),
        ],
        ["store_id", "version_code_id", "path", "tag", "android_name"],
    )
    strings, mapping = mf.version_strings_upsert(details)
    s = strings.collect()
    assert len(s) == 2 == strings.select("string_id").distinct().count()
    assert {r.tag for r in s} == {"", "meta-data"}
    m = {(r.version_code_id, r.string_id) for r in mapping.collect()}
    assert len(m) == 3
    by_triple = {(r.xml_path, r.tag, r.value_name): r.string_id for r in s}
    assert (1, by_triple[("smali", "", "com.x.y")]) in m
    assert (2, by_triple[("smali", "", "com.x.y")]) in m


def test_details_feed_version_details_end_to_end(spark):
    """Decoded inventory → details → dictionary → the version-details
    artifact chain (plans/version_details.py) — the lineage the
    reference runs as process_sdks → upsert → build_matched_app_sdk_
    strings."""
    smali = mf.smali_details(
        _inv(
            spark,
            [("appA", 1, "smali/com/appsflyer/sdk"),
             ("appA", 1, "smali/com/unity3d/ads"),
             ("appB", 2, "smali/com/appsflyer/sdk")],
            ["store_id", "version_code_id", "path"],
        )
    )
    strings, mapping = mf.version_strings_upsert(smali)
    codes = _inv(
        spark,
        [(1, 100, "2024-01-01"), (2, 200, "2024-02-01")],
        ["id", "store_app", "created_at"],
    )
    matches = strings.filter(
        F.col("value_name").startswith("com.appsflyer")
    ).select("string_id", F.lit(7).alias("sdk_id"))
    matched = vd.matched_app_sdk_strings(mapping, codes, matches)
    rows = matched.collect()
    assert len(rows) == 3
    sdk_rows = [r for r in rows if r.sdk_id == 7]
    assert {r.store_app for r in sdk_rows} == {100, 200}
    unmatched = [r for r in rows if r.sdk_id is None]
    assert len(unmatched) == 1


def test_version_manifests_dedup(spark):
    out = mf.version_manifests(
        _inv(
            spark,
            [("a", 1, "<manifest A/>"), ("a", 1, "<manifest A/>"),
             ("b", 2, "<manifest B/>")],
            ["store_id", "version_code_id", "manifest_xml"],
        )
    )
    assert out.count() == 2
    assert set(out.columns) == {"version_code", "manifest_string"}
