"""Parity tests for operators/company_logos.py against a pure-python
restatement of the reference's per-company loops
(tools/get_company_logos.py) — the restatement mirrors the reference
control flow (probe break-on-success, strictly-greater pick_best
replacement, the keyed-upsert evidence ladder) independently of the
Spark plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from adscrawler_spark.operators import company_logos as CL


# ---------------------------------------------------------------------
# Pure-python restatements (the oracle side)
# ---------------------------------------------------------------------

def py_pick_best(images):
    """pick_best + the fetch/open gates (get_company_logos.py:157-190)."""
    best, best_score = None, -1
    for url, ok, size_bytes, w, h, fmt in images:
        if not ok or size_bytes <= 200:
            continue
        if w == 0 or h == 0:
            continue
        aspect = max(w, h) / min(w, h)
        score = w * h
        if 0.9 <= aspect <= 1.1:
            score *= 3
        if score > best_score:
            best = (url, f"logo_{w}x{h}." + (fmt.lower() if fmt else "png"))
            best_score = score
    return best


def py_probe_ladder(probes, guess):
    """_process_single_company's needs_logo path (:752-790)."""
    filename = found_url = found_github = None
    for _idx, fname, lurl, guser in sorted(probes):
        filename, found_url, found_github = fname, lurl, guser
        if filename:
            break
    if not filename:
        filename = guess[0]
        if not found_url:
            found_url = guess[1]
    return filename, found_url, found_github


def py_evidence(ld_code, hq, locations, alpha2_to_id, guess):
    """_process_linkedin_country as final-upsert state (:429-511)."""
    final = None
    if ld_code:
        cid = alpha2_to_id.get(ld_code.upper())
        final = (f"headquarters: {hq or ld_code}", cid)
        if cid is not None:
            return final
    if hq:
        cid = alpha2_to_id.get(guess(hq) or "")
        final = (f"headquarters: {hq}", cid)
        if cid is not None:
            return final
    for loc in locations or []:
        if not loc:
            continue
        cid = alpha2_to_id.get(guess(loc) or "")
        final = (f"location: {loc}", cid)
        if cid is not None:
            return final
    if locations:
        final = (f"location: {locations[-1]}", None)
    return final


# ---------------------------------------------------------------------
# Extractors
# ---------------------------------------------------------------------

def test_url_extractors(spark):
    rows = [
        ("http://acme.com/x",),
        ("  acme.io ",),
        ("https://www.linkedin.com/company/acme-corp///",),
        ("https://LinkedIn.com/company/acme?x=1",),
        ("https://github.com/SomeOrg/repo",),
        ("https://www.github.com/Another?tab=1",),
        ("https://example.com/page",),
    ]
    df = spark.createDataFrame(rows, ["u"])
    out = df.select(
        CL.normalize_url(F.col("u")).alias("norm"),
        CL.extract_linkedin_path(F.col("u")).alias("li"),
        CL.extract_github_user(F.col("u")).alias("gh"),
    ).collect()
    assert out[0].norm == "https://acme.com/x"
    assert out[1].norm == "https://acme.io"
    assert out[2].li == "company/acme-corp"
    assert out[3].li == "company/acme?x=1"
    assert out[4].gh == "SomeOrg"
    assert out[5].gh == "Another"
    assert out[6].li is None and out[6].gh is None


def test_html_harvesters(spark):
    html = (
        "<html><body><main><header>"
        "<img src='https://avatars.github.com/u/1' alt='org'>"
        "<img src='/static/x.png' alt='user avatar'>"
        "<img src='' alt='avatar'>"
        "</header></main>"
        "<meta property=\"og:image\" content=\"https://cdn/logo1.png\">"
        "<meta name='twitter:image' content='https://cdn/logo2.png'>"
        "<meta property=\"og:image\" content=\"https://cdn/logo1.png\">"
        "<a href=\"https://www.linkedin.com/company/acme\">x</a>"
        "<a href='https://github.com/AcmeOrg'>y</a>"
        "<a href='https://other.com'>z</a>"
        "</body></html>"
    )
    df = spark.createDataFrame([(html,)], ["html"])
    row = df.select(
        CL.find_hrefs_containing(F.col("html"), "linkedin.com").alias("li"),
        CL.find_hrefs_containing(F.col("html"), "github.com").alias("gh"),
        CL.parse_linkedin_meta(F.col("html")).alias("metas"),
        CL.parse_github_avatars(F.col("html")).alias("avatars"),
    ).collect()[0]
    assert row.li == ["https://www.linkedin.com/company/acme"]
    assert row.gh == ["https://github.com/AcmeOrg"]
    assert sorted(row.metas) == ["https://cdn/logo1.png", "https://cdn/logo2.png"]
    assert row.avatars == [
        "https://avatars.github.com/u/1",
        "/static/x.png",
    ]


# ---------------------------------------------------------------------
# pick_best parity
# ---------------------------------------------------------------------

IMG_SCHEMA = StructType(
    [
        StructField("domain", StringType()),
        StructField("candidate_url", StringType()),
        StructField("fetch_order", IntegerType()),
        StructField("ok", BooleanType()),
        StructField("size_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


@pytest.mark.parametrize(
    "images",
    [
        # square beats larger non-square (3x multiplier)
        [
            ("u1", True, 5000, 100, 100, "PNG"),
            ("u2", True, 5000, 160, 80, "JPEG"),
        ],
        # strictly-greater: first of two equal squares wins
        [
            ("u1", True, 5000, 64, 64, "PNG"),
            ("u2", True, 5000, 64, 64, "PNG"),
        ],
        # gates: small body, failed fetch, zero dim
        [
            ("u1", True, 100, 500, 500, "PNG"),
            ("u2", False, 9000, 500, 500, "PNG"),
            ("u3", True, 9000, 0, 300, "PNG"),
            ("u4", True, 9000, 30, 40, None),
        ],
        # everything filtered -> no row
        [("u1", False, 10, 0, 0, None)],
        # aspect boundary 1.1 inclusive (110x100 -> square)
        [
            ("u1", True, 9000, 110, 100, "WEBP"),
            ("u2", True, 9000, 150, 100, "PNG"),
        ],
    ],
)
def test_pick_best_parity(spark, images):
    rows = [("acme.com", u, i, ok, sb, w, h, f)
            for i, (u, ok, sb, w, h, f) in enumerate(images)]
    df = spark.createDataFrame(rows, IMG_SCHEMA)
    got = CL.pick_best_logos(df).collect()
    want = py_pick_best([(u, ok, sb, w, h, f) for u, ok, sb, w, h, f in images])
    if want is None:
        assert got == []
    else:
        assert len(got) == 1
        assert got[0].candidate_url == want[0]
        assert got[0].filename == want[1]
        assert got[0].logo_url == f"company-logos/acme.com/{want[1]}"


# ---------------------------------------------------------------------
# probe ladder parity
# ---------------------------------------------------------------------

PROBE_SCHEMA = StructType(
    [
        StructField("domain", StringType()),
        StructField("suffix_idx", IntegerType()),
        StructField("filename", StringType()),
        StructField("linkedin_path", StringType()),
        StructField("github_user", StringType()),
    ]
)
GUESS_SCHEMA = StructType(
    [
        StructField("domain", StringType()),
        StructField("filename", StringType()),
        StructField("linkedin_path", StringType()),
    ]
)


@pytest.mark.parametrize(
    "probes,guess",
    [
        # success on second suffix; its linkedin/github ride along
        (
            [(0, None, "company/a0", None), (1, "logo.png", "company/a1", "gh1"),
             (2, "late.png", "company/a2", "gh2")],
            ("guess.png", "company/guessed"),
        ),
        # all fail: guess filename, last probe's linkedin wins over guess
        (
            [(0, None, "company/first", None), (4, None, "company/last", "ghL")],
            ("guess.png", "company/guessed"),
        ),
        # all fail and last probe found nothing: guessed path fills in
        (
            [(0, None, None, None), (1, None, None, "ghX")],
            (None, "company/guessed"),
        ),
        # immediate success on bare suffix
        ([(0, "bare.png", None, "gh0")], ("g.png", "company/g")),
    ],
)
def test_probe_ladder_parity(spark, probes, guess):
    pdf = spark.createDataFrame(
        [("d.com", i, f, l, g) for i, f, l, g in probes], PROBE_SCHEMA
    )
    gdf = spark.createDataFrame([("d.com", guess[0], guess[1])], GUESS_SCHEMA)
    got = CL.resolve_probe_ladder(pdf, gdf).collect()
    want = py_probe_ladder(probes, guess)
    assert len(got) == 1
    r = got[0]
    assert (r.filename, r.linkedin_path, r.github_user) == want


def test_probe_suffixes_github_special_case(spark):
    df = spark.createDataFrame([("acme.com",), ("github.com-someorg",)], ["domain"])
    out = CL.probe_suffixes(df).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append((r.suffix_idx, r.suffix))
    assert sorted(by_dom["acme.com"]) == list(enumerate(CL.TRY_THESE))
    assert by_dom["github.com-someorg"] == [(0, "")]


# ---------------------------------------------------------------------
# refresh selection + save rules
# ---------------------------------------------------------------------

def test_companies_needing_refresh(spark):
    companies = spark.createDataFrame(
        [
            (1, "a.com", "A", "company-logos/a.com/l.png", "company/a", "gha"),
            (2, "b.com", "B", None, None, "ghb"),
            (3, "c.com", "C", "", "company/c", None),
            (4, "d.com", "D", "company-logos/d.com/l.png", None, None),
        ],
        ["company_id", "company_domain", "company_name", "company_logo_url",
         "company_linkedin_url", "company_github_user"],
    )
    resolved = spark.createDataFrame(
        [(1, "US"), (3, "DE"), (4, "FR")], ["company_id", "country"]
    )
    got = {r.company_id: r for r in
           CL.companies_needing_refresh(companies, resolved).collect()}
    # company 1 is complete -> excluded
    assert set(got) == {2, 3, 4}
    assert got[2].needs_logo and got[2].needs_country and not got[2].needs_github
    assert got[3].needs_logo and not got[3].needs_country and got[3].needs_github
    assert not got[4].needs_logo and not got[4].needs_country
    assert got[4].needs_github
    # missing_only=False keeps everyone with needs forced on
    all_rows = CL.companies_needing_refresh(
        companies, resolved, missing_only=False
    ).collect()
    assert len(all_rows) == 4
    assert all(r.needs_logo and r.needs_country for r in all_rows)


def test_company_metadata_updates_save_rules(spark):
    ladder = spark.createDataFrame(
        [
            ("a.com", "logo_10x10.png", "company/a-found", "gh-found"),
            ("b.com", None, "company/b-found", None),
            ("c.com", None, None, None),
        ],
        ["domain", "filename", "linkedin_path", "github_user"],
    )
    companies = spark.createDataFrame(
        [
            (1, "a.com", "company/a-existing", ""),
            (2, "b.com", None, "ghb"),
            (3, "c.com", None, None),
        ],
        ["company_id", "company_domain", "company_linkedin_url",
         "company_github_user"],
    )
    got = {r.company_id: r
           for r in CL.company_metadata_updates(ladder, companies).collect()}
    # a: linkedin already set -> not saved; github empty -> saved; logo saved
    assert got[1].save_linkedin_url is None
    assert got[1].save_github_user == "gh-found"
    assert got[1].save_logo_url == "company-logos/a.com/logo_10x10.png"
    # b: linkedin missing -> saved; github existing -> no row content except linkedin
    assert got[2].save_linkedin_url == "company/b-found"
    assert got[2].save_github_user is None and got[2].save_logo_url is None
    # c: nothing to save -> filtered out entirely
    assert 3 not in got


# ---------------------------------------------------------------------
# country-evidence ladder parity
# ---------------------------------------------------------------------

ABOUT_SCHEMA = StructType(
    [
        StructField("company_id", LongType()),
        StructField("hq_country_code", StringType()),
        StructField("headquarters", StringType()),
        StructField("locations", ArrayType(StringType())),
    ]
)

ALPHA2_TO_ID = {"US": 1, "DE": 2, "FR": 3, "GB": 4}


def _suffix_guess(text):
    """Deterministic test resolver: trailing 2-letter uppercase token."""
    if not text:
        return None
    tok = text.rsplit(" ", 1)[-1]
    return tok if tok.isupper() and len(tok) == 2 else None


def _suffix_guess_col(col):
    tok = F.regexp_extract(col, r"([A-Z]{2})$", 1)
    return F.when(tok != "", tok)


EVIDENCE_CASES = [
    # JSON-LD resolves immediately
    (10, "US", "Mountain View US", ["Berlin DE"]),
    # JSON-LD present but unmapped -> falls to hq, which resolves
    (11, "XX", "Hamburg DE", ["Paris FR"]),
    # no JSON-LD, hq unresolvable -> first resolving location
    (12, None, "Nowhere Special", ["unknown place", "Lyon FR", "Austin US"]),
    # nothing resolves, locations present -> last location with NULL
    (13, None, "Nowhere", ["spot one", "spot two"]),
    # nothing resolves, no locations -> hq row with NULL survives
    (14, None, "Nowhere", None),
    # only unmapped JSON-LD, nothing else -> ld row with NULL
    (15, "ZZ", None, None),
    # falsy location skipped by the loop but used by the fallback
    (16, None, None, ["London GB", ""]),
    # empty-string last location: fallback emits 'location: '
    (17, None, "Nowhere", ["", ""]),
    # no evidence at all -> no row
    (18, None, None, None),
]


def test_linkedin_country_evidence_parity(spark):
    about = spark.createDataFrame(EVIDENCE_CASES, ABOUT_SCHEMA)
    countries = spark.createDataFrame(
        [(v, k) for k, v in ALPHA2_TO_ID.items()], ["country_id", "alpha2"]
    )
    got = {
        r.company_id: (r.raw_value, r.country_id, r.source)
        for r in CL.linkedin_country_evidence(
            about, countries, resolver=_suffix_guess_col
        ).collect()
    }
    for cid, ld, hq, locs in EVIDENCE_CASES:
        want = py_evidence(ld, hq, locs, ALPHA2_TO_ID, _suffix_guess)
        if want is None:
            assert cid not in got, f"company {cid}"
        else:
            assert got[cid] == (want[0], want[1], "linkedin"), f"company {cid}"
