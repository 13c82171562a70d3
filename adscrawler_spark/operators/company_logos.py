"""Company metadata enrichment: logo discovery, LinkedIn/GitHub
linkage, and country evidence — the relational cores of the
reference's company-logo tool (tools/get_company_logos.py).

The reference walks companies one at a time: select the ones missing
a logo / resolved country / github user
(get_company_logos.py:823-877), probe a ladder of site paths for
logo-image candidates (":671-798" — '', /about, /company, …, then a
guessed LinkedIn page), score the fetched images and keep the best
(":167-190"), and upsert a single country-evidence row per company
from the LinkedIn about page's JSON-LD → headquarters → locations
ladder (":429-511").

Spark-first: every per-company Python loop becomes a window over
decision rows.  The HTTP fetches and PIL image decodes stay outside
the plans (the engine's multimodal codec plug-point — see
operators/multimodal.py): plans consume *fetched-page* and
*fetched-image* tables carrying html/metadata columns and emit
decision rows (which logo to keep, which URLs to save, the final
evidence row), never driver-side loops.

Determinism notes (pinned by tests/test_company_logos.py):
* pick_best keeps the FIRST candidate on score ties because the
  reference only replaces on strictly-greater scores
  (get_company_logos.py:186-189) — the engine orders by
  (score desc, fetch_order asc);
* the country-evidence upsert is keyed (company_id, source), so the
  reference's sequence of upserts collapses to "first tier that
  RESOLVES wins, else the last tier executed" — resolution is pure,
  so computing every tier and window-picking is observationally
  identical to the reference's early-return loop
  (get_company_logos.py:429-511).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------
# URL / path extractors (get_company_logos.py:56-73,193-200) — JVM-only
# ---------------------------------------------------------------------


def normalize_url(col: Column) -> Column:
    """normalize_url (get_company_logos.py:56-61): trim, force https
    on http:// urls, prefix bare domains with https://."""
    t = F.trim(col)
    return (
        F.when(t.startswith("http"), F.regexp_replace(t, "^http://", "https://"))
        .otherwise(F.concat(F.lit("https://"), t))
    )


def extract_linkedin_path(col: Column) -> Column:
    """extract_linkedin_path (:67-73): the path after linkedin.com/,
    trailing slashes stripped; NULL when the url is not a LinkedIn
    one (re.search with re.I → inline (?i) flag)."""
    hit = F.regexp_extract(col, r"(?i)(?:www\.)?linkedin\.com/(.+)", 1)
    trimmed = F.regexp_replace(hit, "/+$", "")
    return F.when(trimmed != "", trimmed)


def extract_github_user(col: Column) -> Column:
    """extract_github_user (:193-200): first path segment after
    github.com/ (user or org), NULL when absent."""
    hit = F.regexp_extract(col, r"(?i)(?:www\.)?github\.com/([^/\?#]+)", 1)
    return F.when(hit != "", hit)


# ---------------------------------------------------------------------
# HTML candidate harvesting (:203-227,314-321,351-361) — JVM regexps
# over an html column.  The reference uses BeautifulSoup on live
# pages; the engine extracts with regexps that agree with the soup
# walk on well-formed attribute markup (candidates are short
# machine-generated tags: meta og:image, <a href>, avatar <img>).
# ---------------------------------------------------------------------

_HREF_PAT = r"""(?i)href=["']([^"']*)["']"""
_META_IMAGE_PAT = (
    r"""(?i)<meta[^>]*(?:property|name)=["'](?:og:image|twitter:image)["']"""
    r"""[^>]*content=["']([^"']*)["']"""
)
_IMG_TAG_PAT = r"(?i)<img[^>]*>"
_SRC_PAT = r"""(?i)src=["']([^"']*)["']"""
_ALT_PAT = r"""(?i)alt=["']([^"']*)["']"""
_HEADER_PAT = r"(?is)<header[^>]*>.*?</header>"


def find_hrefs_containing(html: Column, other_tld: str) -> Column:
    """find_other_domains (:203-210): distinct <a href> values
    containing the given domain substring."""
    hrefs = F.regexp_extract_all(html, F.lit(_HREF_PAT), 1)
    return F.array_distinct(
        F.filter(hrefs, lambda h: h.contains(other_tld))
    )


def parse_linkedin_meta(html: Column) -> Column:
    """parse_linkedin (:351-361): og:image / twitter:image meta
    content values (the public LinkedIn page exposes the logo only
    through these), distinct."""
    return F.array_distinct(F.regexp_extract_all(html, F.lit(_META_IMAGE_PAT), 1))


def parse_github_avatars(html: Column) -> Column:
    """parse_github (:212-227): <img> tags inside the first page
    <header> whose src or alt mentions ``avatar``, distinct srcs."""
    header = F.regexp_extract(html, _HEADER_PAT, 0)
    imgs = F.regexp_extract_all(header, F.lit(_IMG_TAG_PAT), 0)
    avatar_srcs = F.transform(
        F.filter(
            imgs,
            lambda tag: F.regexp_extract(tag, _SRC_PAT, 1).contains("avatar")
            | F.regexp_extract(tag, _ALT_PAT, 1).contains("avatar"),
        ),
        lambda tag: F.regexp_extract(tag, _SRC_PAT, 1),
    )
    return F.array_distinct(F.filter(avatar_srcs, lambda s: s != ""))


# ---------------------------------------------------------------------
# Logo choice (:157-190,323-349)
# ---------------------------------------------------------------------


def pick_best_logos(images: DataFrame) -> DataFrame:
    """fetch_image + pick_best + process_candidates' filename build
    (get_company_logos.py:157-190,323-349) over a fetched-image table
    (domain, candidate_url, fetch_order, ok, size_bytes, width,
    height, fmt):

    * fetch_image keeps 200-responses larger than 200 bytes (:157-165)
      → ``ok AND size_bytes > 200``;
    * unopenable / zero-dimension images are skipped (:172-178);
    * score = width*height, tripled when the aspect ratio is within
      [0.9, 1.1] (:180-186); first candidate wins ties (strictly-
      greater replacement, :186-189);
    * filename = ``logo_{w}x{h}.{fmt}`` with the format defaulting to
      png when undetectable (:335-343).

    Returns one row per domain: (domain, candidate_url, filename,
    logo_url).
    """
    usable = images.filter(
        F.col("ok")
        & (F.col("size_bytes") > 200)
        & (F.col("width") > 0)
        & (F.col("height") > 0)
    )
    ar = F.greatest("width", "height") / F.least("width", "height")
    score = F.when((ar >= 0.9) & (ar <= 1.1), 3).otherwise(1) * F.col(
        "width"
    ) * F.col("height")
    w = Window.partitionBy("domain").orderBy(
        F.desc("score"), F.asc("fetch_order")
    )
    filename = F.concat(
        F.lit("logo_"),
        F.col("width").cast("string"),
        F.lit("x"),
        F.col("height").cast("string"),
        F.lit("."),
        F.coalesce(F.lower("fmt"), F.lit("png")),
    )
    return (
        usable.withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "domain",
            "candidate_url",
            filename.alias("filename"),
            F.concat(
                F.lit("company-logos/"), F.col("domain"), F.lit("/"), filename
            ).alias("logo_url"),
        )
    )


# ---------------------------------------------------------------------
# Site probe ladder (:671-798)
# ---------------------------------------------------------------------

TRY_THESE = ["", "/about", "/company", "/about-us", "/about-company"]
GUESS_TIER = 99  # try_guessing runs after every path probe failed


def probe_suffixes(domains: DataFrame) -> DataFrame:
    """The probe fan-out (get_company_logos.py:752-760): every domain
    crossed with the path-suffix ladder — github.com domains probe
    only the bare page.  Emits (domain, suffix, suffix_idx)."""
    ladder = F.array(*[F.lit(s) for s in TRY_THESE])
    bare = F.array(F.lit(""))
    suffixes = F.when(F.col("domain").contains("github.com"), bare).otherwise(
        ladder
    )
    return domains.select(
        "domain", F.posexplode(suffixes).alias("suffix_idx", "suffix")
    ).select("domain", "suffix", "suffix_idx")


def resolve_probe_ladder(probes: DataFrame, guesses: DataFrame) -> DataFrame:
    """Collapse per-(domain, suffix) probe outcomes to the reference's
    per-company result (get_company_logos.py:752-790):

    * the first suffix (ladder order) yielding a filename wins, and
      its linkedin_path / github_user ride along (the loop breaks on
      success, so later probes never run — pure outcomes make
      computing them all equivalent);
    * when every probe failed, the filename comes from the LinkedIn
      guess tier, the linkedin_path falls back from the LAST probe's
      discovery to the guessed path (:777-780), and the github_user
      is the last probe's.

    ``probes``: (domain, suffix_idx, filename, linkedin_path,
    github_user); ``guesses``: (domain, filename, linkedin_path).
    Returns (domain, filename, linkedin_path, github_user).
    """
    w_first = Window.partitionBy("domain").orderBy(F.asc("suffix_idx"))
    w_last = Window.partitionBy("domain").orderBy(F.desc("suffix_idx"))
    winner = (
        probes.filter(F.col("filename").isNotNull())
        .withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .select("domain", "filename", "linkedin_path", "github_user")
    )
    last_probe = (
        probes.withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select(
            "domain",
            F.col("linkedin_path").alias("last_linkedin_path"),
            F.col("github_user").alias("last_github_user"),
        )
    )
    fallback = (
        probes.select("domain")
        .distinct()
        .join(winner.select("domain", F.lit(True).alias("_won")), "domain", "left")
        .filter(F.col("_won").isNull())
        .join(last_probe, "domain", "left")
        .join(
            guesses.select(
                "domain",
                F.col("filename").alias("guess_filename"),
                F.col("linkedin_path").alias("guess_linkedin_path"),
            ),
            "domain",
            "left",
        )
        .select(
            "domain",
            F.col("guess_filename").alias("filename"),
            F.coalesce("last_linkedin_path", "guess_linkedin_path").alias(
                "linkedin_path"
            ),
            F.col("last_github_user").alias("github_user"),
        )
    )
    return winner.unionByName(fallback)


# ---------------------------------------------------------------------
# Refresh selection (:823-877)
# ---------------------------------------------------------------------


def companies_needing_refresh(
    companies: DataFrame, resolved: DataFrame, missing_only: bool = True
) -> DataFrame:
    """refresh_metadata's selection (get_company_logos.py:823-855):
    companies LEFT JOIN their resolved country, flagged needs_logo /
    needs_country / needs_github; missing_only keeps rows where any
    flag is set, otherwise every company is processed with both
    needs flags forced on (:850-855)."""
    joined = companies.join(
        resolved.select("company_id", "country"), "company_id", "left"
    )
    has_logo = F.col("company_logo_url").isNotNull() & (
        F.col("company_logo_url") != ""
    )
    has_country = F.col("country").isNotNull()
    has_github = F.col("company_github_user").isNotNull() & (
        F.col("company_github_user") != ""
    )
    flagged = joined.select(
        "company_id",
        "company_domain",
        "company_name",
        "company_logo_url",
        "company_linkedin_url",
        "company_github_user",
        (~has_logo).alias("needs_logo"),
        (~has_country).alias("needs_country"),
        (~has_github).alias("needs_github"),
    )
    if not missing_only:
        return flagged.withColumn("needs_logo", F.lit(True)).withColumn(
            "needs_country", F.lit(True)
        )
    return flagged.filter(
        F.col("needs_logo") | F.col("needs_country") | F.col("needs_github")
    )


# ---------------------------------------------------------------------
# Metadata save rules (:671-798)
# ---------------------------------------------------------------------


def company_metadata_updates(
    resolved_ladder: DataFrame, companies: DataFrame
) -> DataFrame:
    """The three conditional saves around the probe ladder
    (get_company_logos.py:770-790): linkedin_url and github_user are
    written only when the company had none stored; the logo_url is
    written whenever a filename was found.  Emits one row per company
    with the NULL-means-no-change convention of sources/merge.py."""
    joined = resolved_ladder.join(
        companies.select(
            "company_id",
            F.col("company_domain").alias("domain"),
            "company_linkedin_url",
            "company_github_user",
        ),
        "domain",
    )
    missing_linkedin = F.col("company_linkedin_url").isNull() | (
        F.col("company_linkedin_url") == ""
    )
    missing_github = F.col("company_github_user").isNull() | (
        F.col("company_github_user") == ""
    )
    return joined.select(
        "company_id",
        "domain",
        F.when(
            F.col("linkedin_path").isNotNull() & missing_linkedin,
            F.col("linkedin_path"),
        ).alias("save_linkedin_url"),
        F.when(
            F.col("github_user").isNotNull() & missing_github,
            F.col("github_user"),
        ).alias("save_github_user"),
        F.when(
            F.col("filename").isNotNull(),
            F.concat(
                F.lit("company-logos/"),
                F.col("domain"),
                F.lit("/"),
                F.col("filename"),
            ),
        ).alias("save_logo_url"),
    ).filter(
        F.col("save_linkedin_url").isNotNull()
        | F.col("save_github_user").isNotNull()
        | F.col("save_logo_url").isNotNull()
    )


# ---------------------------------------------------------------------
# LinkedIn country-evidence ladder (:429-511)
# ---------------------------------------------------------------------


def linkedin_country_evidence(
    about: DataFrame,
    countries: DataFrame,
    resolver=None,
) -> DataFrame:
    """_process_linkedin_country (get_company_logos.py:429-511) as a
    tier window.  The reference upserts into a table keyed
    (company_id, source='linkedin') while walking JSON-LD country
    code → headquarters guess → each location until one resolves,
    then re-upserts the last location with NULL when nothing did.
    Because the key collapses the sequence, the surviving row is:

    * the FIRST tier whose country resolves, else
    * the LAST tier executed — the locations fallback when the page
      listed locations (even a blank last location, :500-511), else
      the headquarters guess, else the JSON-LD row.

    Tier raw_values reproduce the reference strings exactly:
    ``headquarters: {hq or code}`` for JSON-LD (:458), ``headquarters:
    {hq}`` for the guess (:475), ``location: {loc}`` for locations
    (:489,507).  Falsy locations are skipped by the loop (:486-487)
    but locations[-1] is used verbatim in the fallback (:505).

    ``about``: (company_id, hq_country_code, headquarters,
    locations array<string>).  ``countries``: (country_id, alpha2).
    ``resolver``: Column→Column address→alpha2 guess; defaults to the
    engine's P11 resolver (functions/country.py).
    """
    if resolver is None:
        from adscrawler_spark.functions.country import resolve_country

        resolver = resolve_country

    ld_tier = F.when(
        F.col("hq_country_code").isNotNull(),
        F.array(
            F.struct(
                F.lit(0).alias("tier"),
                F.concat(
                    F.lit("headquarters: "),
                    F.coalesce("headquarters", "hq_country_code"),
                ).alias("raw_value"),
                F.upper("hq_country_code").alias("direct_alpha2"),
                F.lit(None).cast("string").alias("guess_text"),
            )
        ),
    ).otherwise(F.array().cast(
        "array<struct<tier:int,raw_value:string,direct_alpha2:string,guess_text:string>>"
    ))
    hq_tier = F.when(
        F.col("headquarters").isNotNull() & (F.col("headquarters") != ""),
        F.array(
            F.struct(
                F.lit(1).alias("tier"),
                F.concat(F.lit("headquarters: "), F.col("headquarters")).alias(
                    "raw_value"
                ),
                F.lit(None).cast("string").alias("direct_alpha2"),
                F.col("headquarters").alias("guess_text"),
            )
        ),
    ).otherwise(F.array().cast(
        "array<struct<tier:int,raw_value:string,direct_alpha2:string,guess_text:string>>"
    ))
    locs = F.coalesce("locations", F.array().cast("array<string>"))
    loc_tiers = F.transform(
        F.filter(locs, lambda x: x.isNotNull() & (x != "")),
        lambda loc, i: F.struct(
            (i + F.lit(2)).alias("tier"),
            F.concat(F.lit("location: "), loc).alias("raw_value"),
            F.lit(None).cast("string").alias("direct_alpha2"),
            loc.alias("guess_text"),
        ),
    )
    fallback_tier = F.when(
        F.size(locs) > 0,
        F.array(
            F.struct(
                F.lit(1_000_000).alias("tier"),
                F.concat(
                    F.lit("location: "), F.coalesce(F.element_at(locs, -1), F.lit(""))
                ).alias("raw_value"),
                F.lit(None).cast("string").alias("direct_alpha2"),
                F.lit(None).cast("string").alias("guess_text"),
            )
        ),
    ).otherwise(F.array().cast(
        "array<struct<tier:int,raw_value:string,direct_alpha2:string,guess_text:string>>"
    ))

    tiers = about.select(
        "company_id",
        F.explode(
            F.concat(ld_tier, hq_tier, loc_tiers, fallback_tier)
        ).alias("t"),
    ).select(
        "company_id",
        F.col("t.tier").alias("tier"),
        F.col("t.raw_value").alias("raw_value"),
        F.coalesce(F.col("t.direct_alpha2"), resolver(F.col("t.guess_text"))).alias(
            "alpha2"
        ),
    )
    resolved = tiers.join(
        F.broadcast(countries.select(F.upper("alpha2").alias("alpha2"), "country_id")),
        "alpha2",
        "left",
    )
    w_first = Window.partitionBy("company_id").orderBy(F.asc("tier"))
    w_last = Window.partitionBy("company_id").orderBy(F.desc("tier"))
    first_hit = (
        resolved.filter(F.col("country_id").isNotNull())
        .withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
    )
    last_executed = (
        resolved.withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .join(
            first_hit.select("company_id", F.lit(True).alias("_hit")),
            "company_id",
            "left",
        )
        .filter(F.col("_hit").isNull())
    )
    return (
        first_hit.select("company_id", "raw_value", "country_id")
        .unionByName(last_executed.select("company_id", "raw_value", "country_id"))
        .withColumn("source", F.lit("linkedin"))
        .select("company_id", "source", "raw_value", "country_id")
    )
