"""ads.txt parsing as declarative Spark transformations.

Semantics: SURVEY.md P12/P13 (reference parser+cleaner at
/root/reference/adscrawler/scrape.py:165-260, body rejection at
scrape.py:124-135, dedup at scrape.py:349-350).  Everything except the
PSL domain collapse (one vectorized pandas UDF) is JVM-side built-in
expressions, so Catalyst keeps the whole parse inside whole-stage
codegen and the parse scales linearly with input splits — no shuffle
until the per-doc result aggregation.

Span invariant (BASELINE.json input_hint): each kept ads.txt line is
one span (kind='adstxt_line', text=line, media_ref=null, offset=index
within the document's kept-line sequence) — order-exact vs the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from adscrawler_spark.functions.urls import adstxt_registrable

_JUNK = r"[^a-zA-Z0-9_\-\.]"

# crawl_result codes (reference pg-ddl/insert_default_values.sql:1-6)
OK, EMPTY, NOT_FOUND, UNKNOWN, WRONG_PLATFORM = 1, 2, 3, 4, 5


def kept_lines_col(body_col: str) -> F.Column:
    """Ordered array of parse-eligible lines: all spaces removed from
    the whole body first (scrape.py:166), blank/comment lines dropped."""
    stripped = F.replace(F.col(body_col), F.lit(" "), F.lit(""))
    return F.filter(
        F.split(stripped, "\n", -1),
        lambda ln: (F.length(ln) > 0) & (F.substring(ln, 1, 1) != "#"),
    )


def body_rejection_col(body_col: str) -> F.Column:
    """Fetch-stage rejection (scrape.py:124-135): HTML body or no
    DIRECT/RESELLER token anywhere → crawl_result 3, else null."""
    body = F.col(body_col)
    upper = F.upper(body)
    return F.when(body.contains("<head>"), F.lit(NOT_FOUND)).when(
        ~(upper.contains("DIRECT") | upper.contains("RESELLER")), F.lit(NOT_FOUND)
    )


def adstxt_line_spans(raw: DataFrame, body_col: str = "body") -> DataFrame:
    """(doc_id, spans) — the interleaved-span form of an ads.txt doc."""
    lines = kept_lines_col(body_col)
    span = F.transform(
        lines,
        lambda ln, i: F.struct(
            F.lit("adstxt_line").alias("kind"),
            ln.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return raw.select("doc_id", span.alias("spans"))


def _parse_fields(df: DataFrame, line_col: str) -> DataFrame:
    """Split one record line into the 5 raw fields with csv.DictReader
    padding semantics (missing → null, >4 fields rejoin into notes)."""
    parts = F.split(F.col(line_col), ",", -1)
    n = F.size(parts)
    return df.withColumns(
        {
            "raw_domain": F.get(parts, 0),
            "raw_publisher_id": F.get(parts, 1),
            "raw_relationship": F.get(parts, 2),
            "raw_certification_auth": F.get(parts, 3),
            "raw_notes": F.when(
                n > 4, F.array_join(F.slice(parts, 5, n - 4), ",")
            ),
        }
    )


def _clean_fields(df: DataFrame) -> DataFrame:
    """P13 normalization (scrape.py:221-260).

    The keep-filter is expressed entirely on raw JVM-side columns and
    applied *before* the PSL pandas UDF: the collapsed domain is
    ``domain + '.' + suffix`` junk-stripped (dots survive the strip),
    so it is empty/null iff the raw domain is null — the reference's
    post-clean domain predicate reduces to ``raw_domain IS NOT NULL``.
    This keeps exactly one ArrowEvalPython in the plan and shrinks the
    UDF's input to surviving rows only."""
    rel = F.upper(F.regexp_replace("raw_relationship", _JUNK, ""))
    # first .loc assignment wins in the reference (both-token → DIRECT)
    rel = (
        F.when(rel.contains("DIRECT"), "DIRECT")
        .when(rel.contains("RESELLER"), "RESELLER")
        .otherwise(rel)
    )
    pub = F.regexp_replace("raw_publisher_id", _JUNK, "")
    return (
        df.withColumns({"publisher_id": pub, "relationship": rel})
        .filter(
            F.col("raw_domain").isNotNull()
            & F.col("publisher_id").isNotNull()
            & (F.col("publisher_id") != "")
            & F.col("relationship").isin("DIRECT", "RESELLER")
        )
        .withColumns(
            {
                "ad_domain": F.regexp_replace(
                    adstxt_registrable(F.lower("raw_domain")), _JUNK, ""
                ),
                "certification_auth": F.regexp_replace(
                    "raw_certification_auth", _JUNK, ""
                ),
                "notes": F.col("raw_notes"),
            }
        )
    )


def entries_from_spans(docs: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → adstxt_entries, deduped per doc on
    (ad_domain, publisher_id, relationship) keeping the first-offset
    occurrence (reference drop_duplicates keep='first')."""
    lines = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("adstxt_line"))
        ).alias("span"),
    ).select(
        "doc_id",
        F.col("span.text").alias("line"),
        F.col("span.offset").alias("offset"),
    )
    cleaned = _clean_fields(_parse_fields(lines, "line"))
    first = Window.partitionBy(
        "doc_id", "ad_domain", "publisher_id", "relationship"
    ).orderBy("offset")
    return (
        cleaned.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "ad_domain",
            "publisher_id",
            "relationship",
            "certification_auth",
            "notes",
            "offset",
        )
    )


def parse_adstxt_docs(raw: DataFrame, body_col: str = "body") -> tuple[DataFrame, DataFrame]:
    """Raw bodies → (entries, per-doc results).

    results(doc_id, crawl_result): 3 body-rejected, 2 parsed-but-empty,
    1 ok — mirroring scrape_app_ads_url result routing
    (scrape.py:280-301)."""
    classified = raw.withColumn("rejected", body_rejection_col(body_col))
    eligible = classified.filter(F.col("rejected").isNull())
    spans = adstxt_line_spans(eligible, body_col)
    entries = entries_from_spans(spans)
    per_doc = entries.groupBy("doc_id").agg(F.count("*").alias("n_entries"))
    results = (
        classified.select("doc_id", "rejected")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("rejected"),
                F.when(F.coalesce(F.col("n_entries"), F.lit(0)) > 0, OK).otherwise(
                    EMPTY
                ),
            ).alias("crawl_result"),
        )
    )
    return entries, results


# ---------------------------------------------------------------------
# Normalized persistence cascade (scrape.py:316-379)
# ---------------------------------------------------------------------

def _default_surrogate(*cols) -> F.Column:
    """Deterministic dim pk minting (the J10 back-fill pattern)."""
    return F.xxhash64(F.concat_ws("|", *cols))


def app_ads_upsert_cascade(
    entries: DataFrame,
    domains_dim: DataFrame,
    entrys_dim: DataFrame,
    surrogate=_default_surrogate,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """scrape_app_ads_url's three-table upsert cascade
    (scrape.py:316-379): found domain names upsert into ``domains``
    (keyed domain_name), cleaned entries resolve their ad_domain id
    and upsert into ``app_ads_entrys`` (keyed (ad_domain,
    publisher_id, relationship) — the reference's per-crawl
    drop_duplicates keep='first' becomes a deterministic
    (pub_domain, offset)-ordered first pick across the batch), and
    the per-publisher linkage lands in ``app_ads_map`` as distinct
    (pub_domain, app_ads_entry) pairs.

    The reference runs this once per crawled pub domain with driver
    round-trips for the returned ids; the engine runs the whole
    batch as three join stages with deterministic surrogate pks —
    no ids visit the driver.

    ``entries``: (pub_domain, ad_domain <registrable name>,
    publisher_id, relationship, certification_auth, notes, offset).
    ``domains_dim``: (id, domain_name).  ``entrys_dim``: (id,
    ad_domain, publisher_id, relationship).
    Returns (domains_updated, entrys_updated, map_rows).
    """
    found = entries.select(
        F.col("ad_domain").alias("domain_name")
    ).distinct()
    new_domains = found.join(
        domains_dim.select("domain_name"), "domain_name", "left_anti"
    ).withColumn("id", surrogate(F.col("domain_name")))
    domains_updated = domains_dim.unionByName(
        new_domains.select(*domains_dim.columns), allowMissingColumns=True
    )

    resolved = entries.join(
        domains_updated.select(
            F.col("domain_name").alias("ad_domain"),
            F.col("id").alias("ad_domain_id"),
        ),
        "ad_domain",
        "left",
    )
    w = Window.partitionBy(
        "ad_domain_id", "publisher_id", "relationship"
    ).orderBy(F.asc("pub_domain"), F.asc("offset"))
    canonical = (
        resolved.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("ad_domain_id").alias("ad_domain"),
            "publisher_id",
            "relationship",
            "certification_auth",
            "notes",
        )
    )
    new_entrys = canonical.join(
        entrys_dim.select("ad_domain", "publisher_id", "relationship"),
        ["ad_domain", "publisher_id", "relationship"],
        "left_anti",
    ).withColumn(
        "id",
        surrogate(
            F.col("ad_domain").cast("string"),
            F.col("publisher_id"),
            F.col("relationship"),
        ),
    )
    entrys_updated = entrys_dim.unionByName(
        new_entrys.select(*entrys_dim.columns), allowMissingColumns=True
    )

    map_rows = (
        resolved.join(
            entrys_updated.select(
                F.col("ad_domain").alias("ad_domain_id"),
                "publisher_id",
                "relationship",
                F.col("id").alias("app_ads_entry"),
            ),
            ["ad_domain_id", "publisher_id", "relationship"],
            "left",
        )
        .select("pub_domain", "app_ads_entry")
        .distinct()
    )
    return domains_updated, entrys_updated, map_rows
