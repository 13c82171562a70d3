"""Decoded-package SDK detail extraction — the relational half of the
reference's APK/IPA decompile pipeline as distributed plans.

The reference decompiles an APK (apktool) or unzips an IPA on a worker
box, then derives a ``details_df`` of (path, tag, android_name) rows
from the decoded tree: the AndroidManifest XML walk, the smali
directory listing, and the ``res/raw`` JSONs on Android
(packages/apks/manifest.py:24-157); the Info.plist flatten, the
Frameworks/bundle/special-file listings, and the Mach-O load commands
on iOS (packages/ipas/get_plist.py:45-197).  The decode/unzip step is
an external binary (apktool / ipsw) and stays outside the engine — the
operators here start from what that step yields: a file inventory
table ``(store_id, version_code_id, path, is_dir)`` and a raw-document
table (manifest XML / plist text / res-raw JSON strings).

Everything downstream of the inventory is real and distributed:

* smali path → android package name is a pure JVM string ladder
  (no Python);
* frameworks / bundles / special files / Mach-O loads are JVM
  regexp filters and splits over the inventory;
* the XML and plist walks are per-document recursion — Arrow-batched
  UDFs returning arrays of structs that the plan explodes;
* the version_strings dictionary encode + per-version map
  (packages/process_files.py:234-289 upsert_sdk_details_df) is a
  dropDuplicates + deterministic hash surrogate, feeding the
  version-details artifacts (plans/version_details.py) end-to-end.

Scale notes: every extractor is map-side until the final
``dropDuplicates`` (a hash aggregate keyed by app — distributes) and
the dictionary encode (a dedup on the string triple; high-cardinality
key, no skew).  No driver-side collection anywhere; the UDF tier only
ever sees the raw-document columns, never the inventory fan-out.
"""

from __future__ import annotations

import json
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

# packages/apks/manifest.py:21 / packages/ipas/get_plist.py:16
FAILED_VERSION_STR = "-1"

# scan_result codes (packages/apks/manifest.py:166-195)
SCAN_OK = 1
SCAN_ERROR = 3
SCAN_NOT_FOUND = 4

_DETAIL_SCHEMA = ArrayType(
    StructType(
        [
            StructField("path", StringType()),
            StructField("tag", StringType()),
            StructField("android_name", StringType()),
        ]
    )
)


# ---------------------------------------------------------------------
# Android: smali directory listing → package names (JVM-side)
# ---------------------------------------------------------------------

def smali_details(files: DataFrame, unzip_prefix: str = "") -> DataFrame:
    """Smali directory paths → dotted android package names
    (packages/apks/manifest.py:93-111 get_smali_df).

    ``files`` is the decoded-tree *directory* inventory
    ``(store_id, version_code_id, path)`` (the reference's
    ``unzipped_apk_paths`` collects directories only).  The reference's
    pandas replace ladder maps 1:1 onto JVM string functions: literal
    replaces hit every occurrence (pandas ``regex=False`` default),
    regex replaces are global — both match ``F.replace`` /
    ``F.regexp_replace`` semantics.  The per-store unzip prefix is
    ``{unzip_prefix}/{store_id}/``.
    """
    p = F.col("path")
    if unzip_prefix:
        p = F.replace(
            p,
            F.concat(F.lit(unzip_prefix.rstrip("/") + "/"),
                     F.col("store_id"), F.lit("/")),
            F.lit(""),
        )
    p = F.replace(p, F.lit("smali/"), F.lit(""))
    p = F.regexp_replace(p, r"smali_classes_\d+/", "")
    p = F.regexp_replace(p, r"smali_classes\d+/", "")
    p = F.regexp_replace(p, r"smali_classes\d+", "")
    p = F.regexp_replace(p, r"smali_assets\d+/", "")
    p = F.replace(p, F.lit("smali_assets/"), F.lit(""))
    p = F.replace(p, F.lit("smali_assets"), F.lit(""))
    p = F.replace(p, F.lit("/"), F.lit("."))
    return (
        files.filter(F.contains(F.lower(F.col("path")), F.lit("smali")))
        .select(
            "store_id",
            "version_code_id",
            F.lit("smali").alias("path"),
            F.lit(None).cast("string").alias("tag"),
            p.alias("android_name"),
        )
        .filter(F.length("android_name") > 4)
    )


# ---------------------------------------------------------------------
# Android: AndroidManifest.xml walk (Arrow UDF → explode)
# ---------------------------------------------------------------------

_ANDROID_NAME_ATTR = "{http://schemas.android.com/apk/res/android}name"


def _manifest_rows(xml_str: str) -> list[tuple[str, str, str]]:
    """Depth-first element walk with '/'-joined tag paths
    (packages/apks/manifest.py:114-157 xml_to_dataframe — the
    docstring there owns the flawed-nesting caveat; this reproduces
    it, including the empty-string android_name for tag-only rows)."""
    try:
        root = ElementTree.fromstring(xml_str)
    except ElementTree.ParseError:
        return []
    out: list[tuple[str, str, str]] = []

    def walk(element, path: str) -> None:
        for child in element:
            tag = child.tag
            name = child.attrib.get(_ANDROID_NAME_ATTR, "")
            new_path = f"{path}/{tag}" if path else tag
            out.append((new_path, tag, name))
            walk(child, new_path)

    walk(root, "")
    return out


@F.pandas_udf(_DETAIL_SCHEMA)
def _manifest_rows_udf(xml: pd.Series) -> pd.Series:
    return xml.map(lambda s: _manifest_rows(s) if s else [])


def manifest_xml_details(manifests: DataFrame) -> DataFrame:
    """AndroidManifest.xml text → exploded (path, tag, android_name)
    rows per app version.  ``manifests`` carries
    ``(store_id, version_code_id, manifest_xml)``."""
    return (
        manifests.select(
            "store_id",
            "version_code_id",
            F.explode(_manifest_rows_udf("manifest_xml")).alias("d"),
        )
        .select(
            "store_id", "version_code_id",
            F.col("d.path").alias("path"),
            F.col("d.tag").alias("tag"),
            F.col("d.android_name").alias("android_name"),
        )
    )


# ---------------------------------------------------------------------
# Android: res/raw JSON keys (Arrow UDF over grouped files)
# ---------------------------------------------------------------------

def _raw_json_rows(
    named: list[tuple[str, str]]
) -> list[tuple[str, str, str]]:
    """Per-app res/raw JSON key walk
    (packages/apks/manifest.py:41-73 get_json_df): dict files yield a
    row per top-level key with the value's str() truncated to 500;
    list files are skipped; the first unparseable file stops the walk
    for the app (the reference ``break``s its glob loop).  Files are
    processed in name order for determinism (the reference inherits
    filesystem glob order — documented deviation)."""
    out: list[tuple[str, str, str]] = []
    for file_name, content in sorted(named):
        try:
            data = json.loads(content)
        except Exception:
            break
        if isinstance(data, dict):
            stem = file_name[:-5] if file_name.endswith(".json") else file_name
            for key, val in data.items():
                out.append(
                    ("res.raw." + stem + "." + key, None, str(val)[:500])
                )
    return out


@F.pandas_udf(_DETAIL_SCHEMA)
def _raw_json_rows_udf(files: pd.Series) -> pd.Series:
    return files.map(
        lambda pairs: _raw_json_rows(
            [(p["file_name"], p["json_content"]) for p in pairs]
            if pairs is not None else []
        )
    )


def raw_json_details(json_files: DataFrame) -> DataFrame:
    """res/raw/*.json inventory ``(store_id, version_code_id,
    file_name, json_content)`` → (path, tag=NULL, android_name) rows.
    Grouped per app version first so the break-on-first-error
    semantics stay within one UDF call."""
    grouped = json_files.groupBy("store_id", "version_code_id").agg(
        F.collect_list(
            F.struct(
                F.col("file_name"), F.col("json_content")
            )
        ).alias("files")
    )
    return (
        grouped.select(
            "store_id", "version_code_id",
            F.explode(_raw_json_rows_udf("files")).alias("d"),
        )
        .select(
            "store_id", "version_code_id",
            F.col("d.path").alias("path"),
            F.col("d.tag").alias("tag"),
            F.col("d.android_name").alias("android_name"),
        )
    )


def android_details(
    xml_details: DataFrame,
    smali: DataFrame,
    jsons: DataFrame,
) -> DataFrame:
    """Concat + drop_duplicates of the three Android detail sources
    (packages/apks/manifest.py:24-38 get_parsed_manifest), keyed per
    app version."""
    return (
        xml_details.unionByName(smali)
        .unionByName(jsons)
        .dropDuplicates(
            ["store_id", "version_code_id", "path", "tag", "android_name"]
        )
    )


# ---------------------------------------------------------------------
# iOS: Payload tree listings (JVM-side)
# ---------------------------------------------------------------------

_APP_CHILD = r"^Payload/[^/]+/([^/]+)$"
_FRAMEWORK_CHILD = r"^Payload/[^/]+/Frameworks/([^/]+)$"


def ipa_path_details(files: DataFrame) -> DataFrame:
    """Frameworks / bundle / special-file rows from the unzipped IPA
    inventory ``(store_id, version_code_id, path, is_dir)``
    (packages/ipas/get_plist.py:139-197 ipa_frameworks / ipa_bundles /
    special_files): Frameworks children that are directories or
    ``.dylib`` files → path='frameworks'; app-dir children that are
    ``.bundle`` directories → path='bundles'; ``cookeddata``
    directories and ``ue4commandline.txt`` files → path='Payload'.
    Pure JVM regexps over the inventory — no Python tier."""
    base = F.element_at(F.split(F.col("path"), "/"), -1)
    fw = files.filter(
        F.col("path").rlike(_FRAMEWORK_CHILD)
        & (F.col("is_dir") | F.endswith(base, F.lit(".dylib")))
    ).select(
        "store_id", "version_code_id",
        F.lit("frameworks").alias("path"),
        base.alias("value"),
    )
    app_child = files.filter(F.col("path").rlike(_APP_CHILD))
    bundles = app_child.filter(
        F.col("is_dir") & F.endswith(base, F.lit(".bundle"))
    ).select(
        "store_id", "version_code_id",
        F.lit("bundles").alias("path"),
        base.alias("value"),
    )
    special = app_child.filter(
        (F.col("is_dir") & F.endswith(base, F.lit("cookeddata")))
        | (~F.col("is_dir") & F.endswith(base, F.lit("ue4commandline.txt")))
    ).select(
        "store_id", "version_code_id",
        F.lit("Payload").alias("path"),
        base.alias("value"),
    )
    return fw.unionByName(bundles).unionByName(special)


def macho_details(loads: DataFrame) -> DataFrame:
    """Mach-O load-command names → (path, value) rows
    (packages/ipas/get_plist.py:45-71 get_macho_info): split each
    distinct non-null name on the FIRST dot (no-dot names drop out),
    value = basename-before-dot + '.' + extension-with-trailing-
    '/...'-stripped, path = the directory part ('' at root).
    ``loads`` carries ``(store_id, version_code_id, name)``."""
    parts = F.split(F.col("name"), r"\.", 2)
    path_part = F.element_at(parts, 1)
    ext = F.regexp_replace(F.element_at(parts, 2), r"/.*$", "")
    return (
        loads.filter(F.col("name").isNotNull())
        .dropDuplicates(["store_id", "version_code_id", "name"])
        .filter(F.size(parts) == 2)
        .select(
            "store_id", "version_code_id",
            F.regexp_extract(path_part, r"^(.*)/[^/]*$", 1).alias("path"),
            F.concat(
                F.element_at(F.split(path_part, "/"), -1),
                F.lit("."), ext,
            ).alias("value"),
        )
        .dropDuplicates(["store_id", "version_code_id", "path", "value"])
    )


# ---------------------------------------------------------------------
# iOS: Info.plist flatten (Arrow UDF → explode)
# ---------------------------------------------------------------------

def _plist_rows(plist_text: str) -> list[tuple[str, str, str]]:
    """Info.plist → (path, tag='', value_name) rows
    (packages/ipas/get_plist.py:74-137 get_parsed_plist): drop the two
    base64 blob keys, flatten with '/' separators, explode list
    values, unpack dict elements into the column union, then join
    each row's non-path cells as strings with missing cells as ''
    and truncate to 500 chars.

    The flatten/unpack/join runs the same public pandas pipeline the
    reference uses — json_normalize / explode / apply(pd.Series) —
    because its observable output depends on pandas dtype promotion
    (list ints render '1.0' whenever a dict element widens the column
    union; bools joining an int column render '1'/'0'), which a
    hand-rolled walk cannot reproduce reliably.  The per-document
    pandas cost is bounded: one small frame per Info.plist, at most
    one plist per scanned app version, inside an Arrow batch.
    tests/test_manifests.py pins the tricky dtype cases as golden
    rows."""
    import plistlib

    try:
        data = plistlib.loads(plist_text.encode())
    except Exception:
        return []
    if not isinstance(data, dict) or not data:
        return []
    data.pop("CFBundleConfigDataJSONBase64", None)
    data.pop("CFBundlePagesJSONBase64", None)
    if not data:
        return []
    df = (
        pd.json_normalize(data, sep="/")
        .T.explode(0)
        .reset_index()
        .rename(columns={"index": "path", 0: "value"})
    )
    unpacked = df["value"].apply(pd.Series)
    unpacked = unpacked.rename(columns={0: "value"})
    ddf = pd.concat([df.drop("value", axis=1), unpacked], axis=1)
    joined = (
        ddf[[x for x in ddf.columns if x != "path"]]
        .fillna("")
        .apply(lambda row: "".join([str(x) for x in row]), axis=1)
    )
    return [
        (p, "", v[:500]) for p, v in zip(ddf["path"], joined)
    ]


def plist_version_id(plist_text: str) -> str:
    """CFBundleVersion with the '0'/'1' placeholder fallback to
    CFBundleShortVersionString (packages/ipas/get_plist.py:124-127)."""
    import plistlib

    try:
        data = plistlib.loads(plist_text.encode())
    except Exception:
        return FAILED_VERSION_STR
    version_id = str(data.get("CFBundleVersion", FAILED_VERSION_STR))
    version_str = data.get("CFBundleShortVersionString")
    if version_id in ("0", "1") and version_str:
        version_id = str(version_str)
    return version_id


@F.pandas_udf(_DETAIL_SCHEMA)
def _plist_rows_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda s: _plist_rows(s) if s else [])


def plist_details(plists: DataFrame) -> DataFrame:
    """``(store_id, version_code_id, plist_text)`` → exploded plist
    detail rows with the iOS column naming (tag='', value_name)."""
    return (
        plists.select(
            "store_id", "version_code_id",
            F.explode(_plist_rows_udf("plist_text")).alias("d"),
        )
        .select(
            "store_id", "version_code_id",
            F.col("d.path").alias("path"),
            F.col("d.tag").alias("tag"),
            F.col("d.android_name").alias("value"),
        )
    )


def ios_details(
    plist_rows: DataFrame,
    path_rows: DataFrame,
    macho_rows: DataFrame,
) -> DataFrame:
    """Concat of the plist flatten with the Payload-tree and Mach-O
    listings, normalized to the Android detail column names
    (get_plist.py:128-136: tag='', value→value_name; the engine keeps
    ``android_name`` as the shared column so both stores feed one
    dictionary)."""
    paths = path_rows.unionByName(macho_rows).withColumn("tag", F.lit(""))
    return (
        plist_rows.unionByName(paths)
        .select(
            "store_id", "version_code_id", "path", "tag",
            F.col("value").alias("android_name"),
        )
        .dropDuplicates(
            ["store_id", "version_code_id", "path", "tag", "android_name"]
        )
    )


# ---------------------------------------------------------------------
# Shared downstream: scan results + version_strings dictionary
# (packages/process_files.py:146-289)
# ---------------------------------------------------------------------

def scan_results(
    details: DataFrame, scanned_apps: DataFrame
) -> DataFrame:
    """Per-version scan-result rows
    (packages/process_files.py:195-219): versions that produced
    details get their scan_result; versions that produced none get
    the single fallback row carrying the failure code.
    ``scanned_apps`` is ``(store_id, version_code_id, store_app,
    scan_result)`` — the crawl outcome per attempted version."""
    with_rows = details.select("version_code_id").distinct()
    ok = scanned_apps.join(with_rows, "version_code_id", "semi")
    failed = scanned_apps.join(with_rows, "version_code_id", "anti")
    return (
        ok.unionByName(failed)
        .select("version_code_id", "scan_result")
        .dropDuplicates()
    )


def version_strings_upsert(
    details: DataFrame, surrogate=F.xxhash64
) -> tuple[DataFrame, DataFrame]:
    """The version_strings dictionary upsert + per-version string map
    (packages/process_files.py:234-289 upsert_sdk_details_df): rename
    to (xml_path, tag, value_name), null tags become '', dedup the
    (triple, version_code) pairs, dictionary-encode the distinct
    triples with a deterministic surrogate id (the reference's serial
    pk cannot exist on a lake table — same convention as
    operators/creatives.py), and emit

    * ``version_strings`` — (string_id, xml_path, tag, value_name)
    * ``version_details_map`` — (version_code_id, string_id), the
      exact input of plans/version_details.matched_app_sdk_strings.

    The encode is a dropDuplicates on the high-cardinality triple —
    a hash aggregate, no skew; the map derives by recomputing the
    surrogate on the deduped pair set, so no join is needed at all.
    """
    base = details.select(
        F.col("path").alias("xml_path"),
        F.coalesce(F.col("tag"), F.lit("")).alias("tag"),
        F.col("android_name").alias("value_name"),
        F.col("version_code_id"),
    ).dropDuplicates()
    sid = surrogate("xml_path", "tag", "value_name")
    strings = (
        base.select("xml_path", "tag", "value_name")
        .dropDuplicates()
        .select(
            sid.alias("string_id"), "xml_path", "tag", "value_name"
        )
    )
    mapping = base.select(
        "version_code_id", sid.alias("string_id")
    ).dropDuplicates()
    return strings, mapping


def version_manifests(manifests: DataFrame) -> DataFrame:
    """(version_code, manifest_string) dedup
    (packages/process_files.py:279-287): one raw manifest/plist text
    per version code."""
    return manifests.select(
        F.col("version_code_id").alias("version_code"),
        F.col("manifest_xml").alias("manifest_string"),
    ).dropDuplicates(["version_code"])
