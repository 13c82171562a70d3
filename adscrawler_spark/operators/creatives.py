"""Creative attribution assembly — mitm capture rows → api_calls →
attributed creatives → creative_assets + creative_records.

This is the pipeline between ad-payload parsing and the creative
matviews: the reference derives ``creative_records`` from captured
api_calls + known-part classification; this module re-expresses that
flow as distributed joins so ``plans/frontend.py`` creative matviews
consume a real lineage instead of a synthesized table.

Semantics ported (cited per function):
* ``api_calls_from_flows`` / ``add_file_extension`` /
  ``add_is_creative`` —
  /root/reference/adscrawler/mitm_ad_parser/mitm_logs.py:110-167
  (parse_log's relational flatten), :286-311 (extension from mime
  then URL), :314-348 (creative gate incl. the PNG IHDR square
  probe, here pure-JVM byte slicing).
* ``video_id_col`` — mitm_scrape_ads.py:70-105 ``get_video_id``.
* ``creative_rows`` — mitm_scrape_ads.py:118-120 (filter + dedup)
  and :127-147 (tld/ignore skips, applied after the dedup exactly
  like the iteration order).
* ``find_sent_videos`` — mitm_scrape_ads.py:51-67
  ``find_sent_video_df`` (time-preferred containment match with the
  any-time fallback) and :148-160 (short-id skip).
* ``attribute_creatives`` — mitm_scrape_ads.py:108-363: the per-sent
  generic text parse (network_parsers.py:946-988
  ``parse_text_for_adinfo`` incl. :323-348 click-url expansion),
  AdInfo filtering (:187-193), the exactly-one-advertiser resolution
  (:223-266), mmp/ad-network/click unions (:211-288), and the
  initial-domain conflict drop (:319-332).
* ``creative_assets`` — mitm_scrape_ads.py:579-591.
* ``make_creative_records`` — mitm_scrape_ads.py:418-450
  ``add_additional_domain_id_column`` + :451-528
  ``make_creative_records_df``.

Documented deviations (each is a determinism or uniformity pin, not a
behavior change for well-formed inputs):
* Serial db ids become deterministic surrogates: api_call_id =
  md5(mitm_uuid), creative_asset_id = the asset's natural key
  md5_hash, url ids = md5(url).  A db sequence cannot exist on a
  1000-executor cluster; content-derived ids are stable under resume
  and need no coordination.
* The reference's per-network parsers (vungle JSON, bidmachine
  protobuf, google HTML, unity…, network_parsers.py:1005-1162) all
  fold into the same AdInfo; the engine routes every sent row through
  the generic text parser (network_parsers.py:991-1002
  ``parse_generic_adnetwork``), the reference's own fallback branch.
* The reference resolves multi-advertiser ids to db ids only on the
  sent path and would crash folding a fallback-path multi AdInfo
  (mitm_scrape_ads.py:227-229 reads an attribute only the sent path
  sets); the engine resolves both paths uniformly.
* "First" over an unordered set (mmp_tld pick, models.py:26-29) is
  pinned to the minimum; list orders are pinned to sorted, except
  additional_ad_domain_ids which preserves the reference's exact
  first-occurrence-in-explode-order (:441-447 ``.unique()``).

Scale shape: everything except URL extraction (the Arrow-memoized
``adpayload.extract_urls_udf``) is JVM expressions + hash
aggregations.  The containment search joins creatives×flows *within a
capture run* — the reference's own per-run scan — so the quadratic
term is bounded by single-device-run sizes while runs distribute
freely across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from adscrawler_spark.operators import adpayload as ap

# config.py:239-276
CREATIVE_STATIC_MIME_EXTENSIONS = ["jpeg", "jpg", "png", "webp", "avif"]
CREATIVE_VIDEO_MIME_EXTENSIONS = ["gif", "webm", "mp4", "quicktime"]
ANY_CREATIVE_VIDEO_EXTENSIONS = CREATIVE_VIDEO_MIME_EXTENSIONS + [
    "mov", "m4v",
]
ALL_CREATIVE_EXTENSIONS = sorted(
    {*CREATIVE_STATIC_MIME_EXTENSIONS, *ANY_CREATIVE_VIDEO_EXTENSIONS}
)
# mitm_scrape_ads.py:43-44
IGNORE_CREATIVE_IDS = ["privacy", "google_play_icon_grey_2022", "favicon"]
IGNORE_CREATIVE_HOST_TLDS = ["digitaloceanspaces.com"]
# mitm_logs.py:36-43
IGNORE_URLS = [
    "https://connectivitycheck.gstatic.com/generate_204",
    "https://infinitedata-pa.googleapis.com/mdi.InfiniteData/Lookup",
    "https://android.apis.google.com/c2dm/register3",
    "http://connectivitycheck.gstatic.com/generate_204",
    "https://www.google.com/generate_204",
    "https://ota.waydro.id/system/lineage/waydroid_x86_64/GAPPS.json",
]
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_RUN_KEYS = ("run_id", "pub_store_id")


def api_calls_from_flows(flows: DataFrame) -> DataFrame:
    """parse_log's relational flatten (mitm_logs.py:150-167): drop
    connectivity-check noise URLs, int-typed status codes.  The
    run_id / pub_store_id attribution (:158-166) arrives as columns —
    the capture job writes one log per (store_id, run_id)."""
    return flows.filter(
        F.col("url").isNull() | ~F.col("url").isin(IGNORE_URLS)
    ).withColumn("status_code", F.col("status_code").cast("int"))


def add_file_extension(df: DataFrame) -> DataFrame:
    """mitm_logs.py:286-311 — extension from the response mime type
    first, else from the URL, gated to the creative-extension list."""
    url_ext = F.nullif(
        F.lower(
            F.regexp_extract(
                F.coalesce(F.col("url"), F.lit("")),
                r"(?i)\.([a-z0-9]{2,4})(?:\?|#|$)", 1,
            )
        ),
        F.lit(""),
    )
    mime_ext = F.nullif(
        F.lower(
            F.regexp_extract(
                F.coalesce(F.col("response_mime_type"), F.lit("")),
                r"(?i)^(?:image|video|text)/([^;]+)", 1,
            )
        ),
        F.lit(""),
    )
    return (
        df.withColumn("url_file_extension", url_ext)
        .withColumn("mime_file_extension", mime_ext)
        .withColumn(
            "file_extension",
            F.when(
                F.col("mime_file_extension").isin(ALL_CREATIVE_EXTENSIONS),
                F.col("mime_file_extension"),
            ).when(
                F.col("url_file_extension").isin(ALL_CREATIVE_EXTENSIONS),
                F.col("url_file_extension"),
            ),
        )
    )


def add_is_creative(
    df: DataFrame, content_col: str = "response_content"
) -> DataFrame:
    """mitm_logs.py:314-348 — creative gate: known extension, HTTP
    200, >50 kB, content present; minus the square-PNG publisher-icon
    exclusion on googleusercontent.  The PNG IHDR width/height probe
    (:328-340, struct.unpack of bytes 16:24) is pure JVM: substring
    over the binary column + hex→decimal conv — no Python per row."""
    content = F.col(content_col).cast("binary")
    # null extension must gate to False, not null (pandas isin
    # semantics), or three-valued AND leaks nulls into the flag
    base = (
        F.coalesce(
            F.col("file_extension").isin(ALL_CREATIVE_EXTENSIONS),
            F.lit(False),
        )
        & (F.col("status_code") == 200)
        & (F.col("response_size_bytes") > 50_000)
        & content.isNotNull()
    )
    is_png_bytes = F.substring(content, 1, 8) == F.lit(_PNG_MAGIC)
    png_w = F.conv(F.hex(F.substring(content, 17, 4)), 16, 10).cast("long")
    png_h = F.conv(F.hex(F.substring(content, 21, 4)), 16, 10).cast("long")
    is_square = is_png_bytes & (png_w == png_h)
    return df.withColumn("is_creative_content", base).withColumn(
        "is_creative",
        base
        & ~F.coalesce(
            (F.col("file_extension") == "png")
            & (F.col("tld_url") == "googleusercontent.com")
            & is_square,
            F.lit(False),
        ),
    )


def video_id_col(
    url: F.Column | None = None, tld: F.Column | None = None
) -> F.Column:
    """get_video_id (mitm_scrape_ads.py:70-105) as one JVM when-ladder
    over the host tld families.  ``parse_url`` stands in for urlparse;
    a missing ``ei`` query param yields '' where the reference would
    raise (the only guard added)."""
    url = F.col("url") if url is None else url
    tld = F.col("tld_url") if tld is None else tld
    path = F.parse_url(url, F.lit("PATH"))
    last_path = F.regexp_extract(path, r"([^/]*)$", 1)
    last_url = F.regexp_extract(url, r"/([^/]*)$", 1)
    secondlast_url = F.regexp_extract(url, r"/([^/]*)/[^/]*$", 1)
    return (
        F.when(tld.isNull() | (tld == ""), F.lit(""))
        .when(
            tld.contains("2mdn"),
            F.when(
                url.contains("/id/"),
                F.regexp_extract(path, r"/id/([^/]*)", 1),
            )
            .when(url.contains("simgad"), last_url)
            .otherwise(last_path),
        )
        .when(
            tld.contains("googlevideo"),
            F.coalesce(F.parse_url(url, F.lit("QUERY"), F.lit("ei")),
                       F.lit("")),
        )
        .when(tld == "unity3dusercontent.com", secondlast_url)
        .when(
            tld == "adcolony.com",
            F.when(F.length(secondlast_url) < 10, last_url).otherwise(
                secondlast_url
            ),
        )
        .when(
            tld.contains("bigabidserv.com"),
            F.split(last_url, r"\.").getItem(0),
        )
        .when(tld.contains("yandex.net"), secondlast_url)
        .otherwise(last_path)
    )


def creative_rows(calls: DataFrame) -> DataFrame:
    """The creative candidate set (mitm_scrape_ads.py:118-147):
    is_creative with a host tld, video ids attached, deduped on
    (video_id, response_size_bytes) keeping the first row in capture
    order (:120 drop_duplicates — pinned to called_at, mitm_uuid),
    then the iteration-time skips: empty tld (:127), ignored video
    ids and host tlds (:141-147)."""
    w = Window.partitionBy(
        *_RUN_KEYS, "video_id", "response_size_bytes"
    ).orderBy("called_at", "mitm_uuid")
    return (
        calls.filter(F.col("is_creative") & F.col("tld_url").isNotNull())
        .withColumn("video_id", video_id_col())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .filter(
            (F.col("tld_url") != "")
            & ~F.col("video_id").isin(IGNORE_CREATIVE_IDS)
            & ~F.col("tld_url").isin(IGNORE_CREATIVE_HOST_TLDS)
        )
    )


def find_sent_videos(creatives: DataFrame, calls: DataFrame) -> DataFrame:
    """find_sent_video_df (mitm_scrape_ads.py:51-67): within the same
    capture run, every api call whose response text contains the
    creative's video id, preferring calls at-or-before the creative's
    fetch time and falling back to any-time when none precede it.
    Short video ids (<5 chars) skip the search entirely (:153-155).

    One containment join keyed on the run — the quadratic term is
    bounded per capture run (single device session), and runs spread
    across the cluster."""
    # carry the creative's host tld with the match (functionally
    # dependent on cr_uuid): downstream attribution needs it for the
    # initial-vs-host comparison, and riding it here removes the
    # whole infos⋈creatives host join — one data-scaled shuffle join
    # per assembly (guide §2.1: don't re-join for a column you
    # already had).  Conditional: unit fixtures call this without a
    # tld_url column.
    _tld_carry = (
        [F.col("tld_url").alias("cr_host_tld")]
        if "tld_url" in creatives.columns else []
    )
    cr = creatives.filter(F.length("video_id") >= 5).select(
        *_RUN_KEYS,
        F.col("mitm_uuid").alias("cr_uuid"),
        F.col("called_at").alias("cr_called_at"),
        "video_id",
        *_tld_carry,
    )
    src = calls.select(
        *_RUN_KEYS,
        F.col("mitm_uuid").alias("src_uuid"),
        F.col("tld_url").alias("src_tld"),
        F.col("called_at").alias("src_called_at"),
        F.coalesce(F.col("response_text"), F.lit("")).alias("src_text"),
        # carried for the network-routing ladder (route by url,
        # youappi mime swap, fyber header, youappi request blob)
        F.col("url").alias("src_url"),
        F.col("response_mime_type").alias("src_mime"),
        F.col("response_headers").alias("src_headers"),
        request_text_blob(calls).alias("src_request_blob"),
        # raw payload bytes ride the join ONLY for the two
        # protobuf-routed networks (the routing ladder matches these
        # by tld equality, so the predicate is exact) — every other
        # route parses response_text and ships null here
        F.when(
            F.col("tld_url").isin("bidmachine.io", "everestop.io"),
            F.col("response_content")
            if "response_content" in calls.columns
            else F.lit(None).cast("string"),
        ).alias("src_content"),
    )
    # Candidate generation via an inverted 5-gram index instead of the
    # per-run cross join (guide §2.3/§3.2): the old equi-join on the
    # run keys alone evaluated instr(src_text, video_id) over
    # |cr|×|src| pairs per run — with a fixed run count that term is
    # quadratic in the capture volume (47× wall-clock for 10× rows at
    # the r6 driver measurement).  Exact-equivalence argument: if
    # video_id (length >= 5 by the filter above) is a substring of
    # src_text, then EVERY 5-gram of video_id — in particular its
    # lexicographically smallest one — is a 5-gram of src_text, so
    # joining the creative's min-gram against the source's distinct
    # 5-grams has no false negatives; the instr() confirm below drops
    # the false positives.  Cost is linear: ~one gram row per source
    # character (capture response texts are short), versus the old
    # |cr|×|src| instr scans per run.
    # the join key is ONE xxhash64 over (run keys, gram), not the
    # string gram + run-key columns: the gram index shuffles ~one row
    # per source character, so narrowing each row to (src_uuid, 8-byte
    # hash) cuts the exchange bytes ~4x (guide §2.3 "narrower types").
    # Exactness: equal (keys, gram) always hash equal (no false
    # negatives); a 64-bit collision can only add a candidate that the
    # (run keys, src_uuid) join + instr() confirm below discards —
    # src_uuid is globally unique, so a cross-run collision finds no
    # src row under the creative's run keys, and a same-run false
    # gram match fails instr().
    gram_hash = lambda g: F.xxhash64(*_RUN_KEYS, g)  # noqa: E731
    cand_cr = cr.withColumn(
        "_gh",
        gram_hash(
            F.expr(
                "array_min(transform(sequence(1, length(video_id) - 4),"
                " i -> substring(video_id, i, 5)))"
            )
        ),
    )
    src_grams = (
        src.filter(F.length("src_text") >= 5)
        .select(
            *_RUN_KEYS,
            "src_uuid",
            F.explode(
                F.expr(
                    "array_distinct(transform("
                    "sequence(1, length(src_text) - 4),"
                    " i -> substring(src_text, i, 5)))"
                )
            ).alias("_gram"),
        )
        .select("src_uuid", gram_hash(F.col("_gram")).alias("_gh"))
    )
    cand = cand_cr.join(src_grams, "_gh").select(
        *_RUN_KEYS, "cr_uuid", "cr_called_at", "video_id", "src_uuid",
        *(["cr_host_tld"] if _tld_carry else []),
    )
    hits = cand.join(src, [*_RUN_KEYS, "src_uuid"]).filter(
        F.instr(F.col("src_text"), F.col("video_id")) > 0
    )
    w = Window.partitionBy(*_RUN_KEYS, "cr_uuid")
    hits = hits.withColumn(
        "_time_ok", F.col("src_called_at") <= F.col("cr_called_at")
    ).withColumn("_any_time", F.max("_time_ok").over(w))
    return hits.filter(F.col("_time_ok") | ~F.col("_any_time")).drop(
        "_time_ok", "_any_time", "cr_called_at"
    )


def request_text_blob(df: DataFrame) -> F.Column:
    """get_request_text (network_parsers.py:649-664): the stringified
    concat of query params, response headers, post params and request
    text — str(None) is the literal 'None', kept for parity."""
    return F.concat_ws(
        " ",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("None"))
            for c in (
                "query_params", "response_headers", "post_params",
                "request_text",
            )
        ],
    )


# check_click_urls markers (network_parsers.py:330-344)
_FYBER_PREFIX = "fybernativebrowser://navigate?url="


def _click_source(url: F.Column) -> F.Column:
    """The URL a click-marker row would follow (null when the row has
    no click marker), incl. the tpbid/fyber prefix strips."""
    marker = (
        url.contains("/click")
        | url.contains("/clk")
        | url.contains("onelink.me")
        | url.contains("yandex.ru/an/count/")
    )
    stripped = F.replace(url, F.lit(_FYBER_PREFIX), F.lit(""))
    return F.when(
        marker, F.when(url.contains("tpbid.com"), stripped).otherwise(url)
    ).when(url.contains(_FYBER_PREFIX), stripped)


def attribute_creatives(
    calls: DataFrame,
    mmp_tlds: DataFrame,
    ad_domains: DataFrame,
    store_apps: DataFrame,
    click_redirects: DataFrame | None = None,
    phash_col: F.Column | None = None,
    tld_col=None,
    persisted: list | None = None,
    network_routing: bool = False,
    mmp_tld_set: frozenset | None = None,
) -> DataFrame:
    """attribute_creatives (mitm_scrape_ads.py:108-363) end-to-end:
    one output row per surviving creative with the folded AdInfo.

    ``network_routing``: route sent rows through the per-ad-network
    parsers (operators/adnetworks.py — vungle/mtg/fyber structural
    short-circuits, youappi request swap, google/yandex json walks,
    unity merge, protobuf plug points) before the generic fold; off,
    every sent row parses generically (the reference's own fallback
    branch).  ``mmp_tld_set``: the MMP tld set for the routed parsers
    (collected from ``mmp_tlds`` when absent — a curated
    hundreds-row dim by construction).

    ``persisted``: optional list that opts in to one-shot-composition
    optimization: the multiply-consumed intermediates (creative set,
    sources, extracted urls, AdInfos) are cut with ``localCheckpoint``
    — caching them for their several consumers AND stopping each
    downstream transformation from re-analyzing the whole tower
    (driver-side analysis grows quadratically with plan depth).  Any
    plain cache handles created are appended for the caller to
    unpersist.  Leave None for pure lineage (a resumable production
    DAG materializing to durable tables between steps).

    ``calls``: api_calls rows (through ``api_calls_from_flows`` +
    ``add_file_extension`` + ``add_is_creative``) with
    mitm_uuid/run_id/pub_store_id/url/tld_url/called_at/
    response_text/response_content and the request-blob parts.
    ``store_apps``: (id, store_id) — advertiser store-id → db id,
    matched case-insensitively (queries.py
    query_store_app_by_store_id_cached semantics).
    ``click_redirects``: optional (url, redirect_url) — the
    pre-crawled redirect expansions standing in for
    follow_url_redirects' live HTTP (:341-344); absent means no click
    rows resolve, like a cold redirect cache.
    ``phash_col``: perceptual-hash expression over the content column
    (creative_processor.get_phash plug point — real pHash needs an
    image codec this container lacks); defaults to a deterministic
    16-hex digest of the bytes.
    """
    if persisted is not None:
        # one cut at the tower's root: every downstream subtree
        # (creatives window, gram join, UDF split, URL harvest) then
        # compiles and re-analyzes against a flat LogicalRDD instead
        # of re-walking the calls projection tower — and the checkpoint
        # doubles as the shared materialization for the cr/src join
        # sides (r7: measured ~2× construction-time cut on the three
        # mitm battery entries)
        calls = calls.localCheckpoint(eager=False)
    creatives = creative_rows(calls)
    if persisted is not None:
        # cache only (no plan cut): consumed by the sent-match, the
        # fallback anti-join, the host join and the final output
        # join.  Each localCheckpoint call pays a full plan
        # compilation of its subtree, so cuts go where the tower is
        # deepest (sources, the AdInfo fold, the adv output) and
        # plain persist covers the shallow reuse points.
        creatives = creatives.persist()
        persisted.append(creatives)
    if phash_col is None:
        phash_col = F.substring(
            F.sha1(F.col("response_content").cast("binary")), 1, 16
        )

    sent = find_sent_videos(creatives, calls)
    if persisted is not None:
        # the sent tower (calls→creatives containment join + window)
        # is referenced by FOUR downstream paths (the network-field
        # split's two union branches, the fallback anti-join, the
        # sources union); without a cut each occurrence re-runs
        # whole-stage codegen over the full join tower — a
        # size-independent driver cost that dominated the assembly
        # wall clock at bench scale (janino, not Catalyst optimize)
        sent = sent.localCheckpoint(eager=False)
    # fallback: creatives with no sent match (or short ids, which
    # never joined) parse their own request blob
    # (mitm_scrape_ads.py:161-175 via parse_creative_request).
    # shuffle_hash: the build side scales with the creative count —
    # a broadcast would collect + hash it single-threaded on the
    # driver (guide §3.1: broadcast only what stays bounded).
    fb = creatives.join(
        sent.select("cr_uuid").distinct().hint("shuffle_hash"),
        creatives["mitm_uuid"] == F.col("cr_uuid"), "left_anti",
    )
    fb_sources = fb.select(
        *_RUN_KEYS,
        F.col("mitm_uuid").alias("cr_uuid"),
        F.col("mitm_uuid").alias("src_uuid"),
        F.col("tld_url").alias("cr_host_tld"),
        F.lit(None).cast("string").alias("init_tld"),
        request_text_blob(fb).alias("text"),
        F.lit(True).alias("clicks_enabled"),
    )
    nf = None
    if network_routing:
        from adscrawler_spark.operators import adnetworks as an

        if mmp_tld_set is None:
            # curated vendor dim (hundreds of rows by construction) —
            # the reference loads the same list into a per-process set
            c0 = mmp_tlds.columns[0]
            mmp_tld_set = frozenset(
                r[0] for r in mmp_tlds.select(c0).collect()
            )
        nf = an.with_network_fields(
            sent.select(
                *_RUN_KEYS, "cr_uuid", "src_uuid", "cr_host_tld",
                F.col("src_tld").alias("init_tld"),
                F.col("src_text").alias("text"),
                "src_url", "src_mime", "src_headers",
                F.col("src_request_blob").alias("request_blob"),
                "src_content", "video_id",
            ),
            mmp_tld_set,
        )
        # prune to what the three consumers (sources, meta,
        # direct/empty infos) actually read BEFORE materializing the
        # checkpoint: the raw text / url / mime / headers /
        # request-blob payload columns never leave this operator, and
        # a localCheckpoint stores every column it is handed (guide
        # §2.3 — project before the exchange; the checkpoint is the
        # exchange here)
        nf = nf.select(
            *_RUN_KEYS, "cr_uuid", "src_uuid", "cr_host_tld",
            "init_tld",
            "route", "parse_text", "direct_adv", "direct_mmp",
            "direct_tlds", "keep_empty", "clicks_enabled",
        )
        if persisted is not None:
            nf = nf.localCheckpoint(eager=False)
        sources = nf.filter(F.col("parse_text").isNotNull()).select(
            *_RUN_KEYS, "cr_uuid", "src_uuid", "cr_host_tld",
            "init_tld",
            F.col("parse_text").alias("text"), "clicks_enabled",
        ).unionByName(fb_sources)
    else:
        sources = sent.select(
            *_RUN_KEYS, "cr_uuid", "src_uuid", "cr_host_tld",
            F.col("src_tld").alias("init_tld"),
            F.col("src_text").alias("text"),
            F.lit(True).alias("clicks_enabled"),
        ).unionByName(fb_sources)

    # --- per-source URL harvest + click expansion ---------------------
    if persisted is not None:
        # the two-tier extractor filter-splits its input; the plan
        # cut both caches the containment join for the tier split AND
        # stops every downstream transformation from re-analyzing the
        # whole flows→calls→creatives→sent tower (driver-side
        # analysis grows quadratically with tower depth otherwise —
        # it dominated the assembly's wall clock at bench scale).
        # (r7: converting this cut and nf/infos to plain persists was
        # measured 1.5-2x SLOWER at the 10x profile — the separate
        # serial checkpoint jobs are cheaper than the double-compute
        # races and re-analysis the persists reintroduce; reverted.)
        sources = sources.localCheckpoint(eager=False)
    urls = ap.payload_urls(
        sources, text_col="text", out_col="url"
    ).drop("text")
    if persisted is not None:
        # consumed by the click expansion AND the all-urls union —
        # uncached, each consumer re-runs the extraction tiers
        urls = urls.persist()
        persisted.append(urls)
    # cr_host_tld rides in the key set: functionally dependent on
    # cr_uuid (one host tld per creative), so every grouping below is
    # cardinality-identical — and carrying it removes the
    # infos⋈creatives host join entirely (one data-scaled shuffle
    # join per assembly, measured 5-11s of driver-serial broadcast
    # build at the 10x profile before the r7 shuffle_hash interim fix)
    key = [*_RUN_KEYS, "cr_uuid", "src_uuid", "cr_host_tld", "init_tld"]
    if click_redirects is not None:
        clicks = (
            # fyber's clickless direct harvest never expands clicks
            urls.filter(F.col("clicks_enabled"))
            .withColumn("_csrc", _click_source(F.col("url")))
            .filter(F.col("_csrc").isNotNull())
            .join(
                click_redirects.select(
                    F.col("url").alias("_csrc"), "redirect_url"
                ),
                "_csrc",
            )
            .select(*key, F.col("redirect_url").alias("url"))
        )
        click_ids = clicks.groupBy(*key).agg(
            F.array_sort(F.collect_set(F.md5("url"))).alias(
                "click_url_ids"
            )
        )
        # parse_text_for_adinfo:963 — click results join the URL set
        all_urls = urls.select(*key, "url").unionByName(
            clicks
        ).distinct()
    else:
        click_ids = None
        all_urls = urls.select(*key, "url").distinct()

    infos = ap.known_parts_agg(
        all_urls, mmp_tlds, ad_domains,
        key_cols=tuple(key), tld_col=tld_col,
    )
    if persisted is not None:
        # consumed by the multi-adv explode AND the join-back below
        infos = infos.localCheckpoint(eager=False)
    if click_ids is not None:
        infos = infos.join(click_ids, key, "left")
    else:
        infos = infos.withColumn(
            "click_url_ids", F.lit(None).cast("array<string>")
        )

    # --- AdInfo-level resolution (parse_sent_video_df:1296-1365) ------
    apps = store_apps.select(
        F.lower(F.col("store_id")).alias("_sid_lc"),
        F.col("id").alias("_app_db_id"),
    )
    one = F.size("adv_ids") == 1
    many = F.size("adv_ids") > 1
    adv_one = F.when(one, F.element_at("adv_ids", 1))
    if nf is not None:
        meta = nf.select(
            "cr_uuid", "src_uuid", "route", "direct_adv",
            "direct_mmp", "direct_tlds",
        )
        infos = infos.join(meta, ["cr_uuid", "src_uuid"], "left")
        # unity merge (:939-940): the bundle fills a null advertiser
        # (the referrer-mmp merge at :941 is dead code — see
        # adnetworks._unity_extras); bidmachine's path advertiser
        # fills the same way (network_parsers.py:846).  The filled
        # advertiser still faces the :1288 publisher check below
        adv_one = F.when(
            F.col("route").isin("unity", "bidmachine"),
            F.coalesce(adv_one, F.col("direct_adv")),
        ).otherwise(adv_one)
        # bidmachine tld fill-if-empty (:869-870): the path tld joins
        # only when the text parse surfaced no ad-network tlds
        infos = infos.withColumn(
            "ad_network_tlds",
            F.when(
                (F.col("route") == "bidmachine")
                & F.col("direct_tlds").isNotNull()
                & (
                    F.size(
                        F.coalesce(
                            "ad_network_tlds",
                            F.array().cast("array<string>"),
                        )
                    )
                    == 0
                ),
                F.col("direct_tlds"),
            ).otherwise(F.col("ad_network_tlds")),
        )
    infos = infos.select(
        *key, "mmp_urls", "ad_network_tlds", "mmp_tld", "click_url_ids",
        adv_one.alias("adv_store_id"),
        F.when(many, F.col("adv_ids")).alias("adv_multi"),
    )
    if nf is not None:
        from adscrawler_spark.functions.urls import root_domain

        # a parse that produced ANY AdInfo — even one later dropped
        # by the publisher check or the db resolution — must not be
        # replaced by a keep-empty row (the reference's continue
        # discards it outright)
        parsed_keys = infos.select("cr_uuid", "src_uuid")
        # :1288 — an advertiser equal to the publisher id drops the
        # AdInfo (parsed ids already exclude it; unity fills can't)
        infos = infos.filter(
            F.col("adv_store_id").isNull()
            | (F.col("adv_store_id") != F.col("pub_store_id"))
        )
        empty_arr = F.array().cast("array<string>")
        # a structural advertiser whose parse contributed no fold row
        # emits its own AdInfo: mtg/fyber/everestop direct rows carry
        # no parse_text and are never in parsed_keys; bidmachine's
        # completed path with a URL-less [17] text lands here via the
        # anti-join (:846 — parse(text) came back empty, the path
        # advertiser still attributes, the path tld still fills)
        direct_infos = nf.filter(
            F.col("direct_adv").isNotNull()
            & (F.col("direct_adv") != F.col("pub_store_id"))
        ).join(
            parsed_keys, ["cr_uuid", "src_uuid"], "left_anti"
        ).select(
            *key,
            F.array_sort(
                F.coalesce("direct_mmp", empty_arr)
            ).alias("mmp_urls"),
            F.coalesce("direct_tlds", empty_arr).alias(
                "ad_network_tlds"
            ),
            # AdInfo.mmp_tld = get_tld(first mmp url) (models.py:26-29)
            # F.get is the ANSI-safe indexer (null on empty)
            root_domain(
                F.get(F.array_sort(F.coalesce("direct_mmp", empty_arr)), 0)
            ).alias("mmp_tld"),
            F.lit(None).cast("array<string>").alias("click_url_ids"),
            F.col("direct_adv").alias("adv_store_id"),
            F.lit(None).cast("array<string>").alias("adv_multi"),
        )
        # keep-empty routes emit the reference's empty-but-kept AdInfo
        # whenever their parse produced NO AdInfo row — either no text
        # at all (yandex native-no-match, protobuf) or a clickless
        # fyber parse that surfaced zero URLs
        empty_infos = nf.filter(
            F.col("keep_empty") & F.col("direct_adv").isNull()
        ).join(
            parsed_keys, ["cr_uuid", "src_uuid"], "left_anti"
        ).select(
            *key,
            empty_arr.alias("mmp_urls"),
            empty_arr.alias("ad_network_tlds"),
            F.lit(None).cast("string").alias("mmp_tld"),
            F.lit(None).cast("array<string>").alias("click_url_ids"),
            F.lit(None).cast("string").alias("adv_store_id"),
            F.lit(None).cast("array<string>").alias("adv_multi"),
        )
        infos = infos.unionByName(direct_infos).unionByName(empty_infos)
    # single-adv db id: unresolvable → the whole AdInfo is dropped
    # (:1313-1328 continue)
    infos = infos.join(
        apps.withColumnRenamed("_app_db_id", "adv_store_app_id"),
        F.lower(infos["adv_store_id"]) == apps["_sid_lc"], "left",
    ).drop("_sid_lc").filter(
        F.col("adv_store_id").isNull()
        | F.col("adv_store_app_id").isNotNull()
    )
    # multi-adv resolution: unresolved members drop out (:1344-1358),
    # empty results fold to null (:1363-1365)
    multi = (
        infos.filter(F.col("adv_multi").isNotNull())
        .select(*key, F.explode("adv_multi").alias("_sid"))
        .join(apps, F.lower(F.col("_sid")) == apps["_sid_lc"], "left")
        .groupBy(*key)
        .agg(
            F.array_sort(
                F.collect_set("_app_db_id")
            ).alias("_multi_resolved")
        )
    )
    infos = infos.join(multi, key, "left").withColumn(
        "advertiser_store_app_ids",
        F.when(
            F.size("_multi_resolved") > 0, F.col("_multi_resolved")
        ),
    ).drop("adv_multi", "_multi_resolved")

    # --- creative-level fold (mitm_scrape_ads.py:187-332) -------------
    # no host join: the creative's host tld rode the pipeline as
    # cr_host_tld (see the key comment above), so the
    # initial-vs-host drop rule is a plain filter.  The old
    # infos⋈creatives join here was data-scaled on both sides and
    # its build cost 5.1s collect + 4.3s single-threaded
    # HashedRelation build at the 10x profile when the size
    # estimator picked a broadcast.
    kept = infos.withColumn(
        "host_ad_network_tld", F.col("cr_host_tld")
    ).filter(
        F.col("adv_store_id").isNotNull()
        | F.col("advertiser_store_app_ids").isNotNull()
        | (
            F.col("init_tld").isNotNull()
            & (F.col("init_tld") != F.col("host_ad_network_tld"))
        )
    )
    folded = kept.groupBy("cr_uuid").agg(
        F.array_sort(F.collect_set("adv_store_id")).alias("_advs"),
        F.array_sort(
            F.flatten(F.collect_set("advertiser_store_app_ids"))
        ).alias("_multi_all"),
        F.array_sort(
            F.collect_set(
                F.when(
                    F.col("adv_store_id").isNotNull(),
                    F.col("adv_store_app_id"),
                )
            )
        ).alias("_confident_ids"),
        F.array_sort(F.collect_set("mmp_tld")).alias("_mmp_tlds"),
        F.array_sort(F.flatten(F.collect_set("mmp_urls"))).alias(
            "_mmp_urls"
        ),
        F.array_sort(F.flatten(F.collect_set("ad_network_tlds"))).alias(
            "_adnet_tlds"
        ),
        F.array_sort(
            F.flatten(
                F.collect_set(
                    F.coalesce(
                        F.col("click_url_ids"),
                        F.array().cast("array<string>"),
                    )
                )
            )
        ).alias("_click_ids"),
        # init_tlds = list(set(...)) counts None as a member (:319);
        # non-null distinct count + a null-presence bit replicates it
        (
            F.size(F.collect_set("init_tld"))
            + F.max(F.when(F.col("init_tld").isNull(), 1).otherwise(0))
        ).alias("_n_init"),
        F.max("init_tld").alias("_init_tld"),
    )
    n_advs = F.size("_advs")
    has_multi = F.size("_multi_all") > 0
    resolved = folded.select(
        "cr_uuid",
        F.when((n_advs == 1) & ~has_multi,
               F.element_at("_advs", 1)).alias("adv_store_id"),
        F.when(
            (n_advs == 1) & ~has_multi, F.element_at("_confident_ids", 1)
        ).alias("advertiser_store_app_id"),
        F.when(
            (n_advs > 1) | ((n_advs >= 1) & has_multi),
            F.array_sort(
                F.array_distinct(
                    F.concat("_confident_ids", "_multi_all")
                )
            ),
        )
        .when(has_multi, F.col("_multi_all"))
        .alias("advertiser_store_app_ids"),
        # ANSI-safe first element (empty set → null)
        F.when(
            F.size("_mmp_tlds") > 0, F.element_at("_mmp_tlds", 1)
        ).alias("mmp_tld"),
        F.array_distinct("_mmp_urls").alias("mmp_urls"),
        F.array_distinct("_adnet_tlds").alias("found_ad_network_tlds"),
        F.array_distinct("_click_ids").alias("click_url_ids"),
        "_n_init", "_init_tld",
    )
    out = (
        creatives.join(
            resolved,
            creatives["mitm_uuid"] == resolved["cr_uuid"], "left",
        )
        # multiple initial domains → creative dropped (:325-330)
        .filter(
            F.col("_n_init").isNull() | (F.col("_n_init") <= 1)
        )
    )
    return out.select(
        "mitm_uuid", "pub_store_id", "run_id",
        F.md5(F.col("response_content").cast("binary")).alias("md5_hash"),
        F.col("tld_url").alias("host_ad_network_tld"),
        F.col("_init_tld").alias("creative_initial_domain_tld"),
        F.coalesce(
            "click_url_ids", F.array().cast("array<string>")
        ).alias("click_url_ids"),
        "adv_store_id", "advertiser_store_app_id",
        "advertiser_store_app_ids",
        F.coalesce("mmp_urls", F.array().cast("array<string>")).alias(
            "mmp_urls"
        ),
        F.coalesce(
            "found_ad_network_tlds", F.array().cast("array<string>")
        ).alias("found_ad_network_tlds"),
        "mmp_tld",
        phash_col.alias("phash"),
        "file_extension",
    )


def creative_assets(adv_creatives: DataFrame) -> DataFrame:
    """creative_assets upsert (mitm_scrape_ads.py:579-591): distinct
    (md5_hash, file_extension, phash).  The asset id is the natural
    key md5_hash itself — the reference's serial id is a storage
    detail a distributed engine replaces with the content hash."""
    return adv_creatives.select(
        "md5_hash", "file_extension", "phash"
    ).distinct().withColumn("creative_asset_id", F.col("md5_hash"))


def domains_with_missing(
    adv_creatives: DataFrame,
    domains: DataFrame,
    id_col: F.Column | None = None,
) -> DataFrame:
    """get_domains (mitm_scrape_ads.py:378-415): host / initial tlds
    absent from the domain dim are inserted before the id mapping
    (the reference upserts them and concats the returned rows).  The
    db sequence becomes an ``xxhash64(domain_name)`` surrogate by
    default — deterministic and coordination-free; found_ad_network
    tlds are deliberately NOT inserted, matching the reference's
    check_cols."""
    if id_col is None:
        id_col = F.xxhash64(F.col("domain_name"))
    missing = (
        adv_creatives.select(
            F.col("host_ad_network_tld").alias("domain_name")
        )
        .unionByName(
            adv_creatives.select(
                F.col("creative_initial_domain_tld").alias("domain_name")
            )
        )
        .filter(F.col("domain_name").isNotNull())
        .distinct()
        .join(domains.select("domain_name"), "domain_name", "left_anti")
        .select("domain_name", id_col.cast("long").alias("domain_id"))
    )
    return domains.select(
        "domain_name", F.col("domain_id").cast("long").alias("domain_id")
    ).unionByName(missing)


def make_creative_records(
    adv_creatives: DataFrame,
    assets: DataFrame,
    domains: DataFrame,
    api_call_id_col: F.Column | None = None,
) -> DataFrame:
    """make_creative_records_df + add_additional_domain_id_column
    (mitm_scrape_ads.py:418-528): asset / api-call keys, domain-id
    joins for the host / initial / mmp tlds, and the exploded
    found_ad_network_tlds → additional_ad_domain_ids mapping that
    preserves first-occurrence order exactly like pandas ``.unique()``
    (:441-447).

    ``domains``: (domain_name, domain_id).  get_domains (:378-415)
    upserts host/initial tlds missing from the dim before mapping;
    here missing names resolve through the same dim after the caller
    unions its new-domain rows in — found_ad_network_tlds members
    absent from the dim drop out silently, exactly like the
    reference's ``.dropna()`` (they are NOT upserted there either).
    ``api_call_id_col`` defaults to the md5(mitm_uuid) surrogate."""
    if api_call_id_col is None:
        api_call_id_col = F.md5(F.col("mitm_uuid"))
    d = F.broadcast(domains.select("domain_name", "domain_id"))
    base = adv_creatives.withColumn("api_call_id", api_call_id_col)
    cr = (
        base
        # future feature placeholder (:593)
        .withColumn("advertiser_domain_id",
                    F.lit(None).cast("long"))
        # shuffle_hash, not broadcast: one asset row per distinct
        # creative — the build side scales with the corpus, and a
        # forced broadcast collects + hashes it single-threaded on
        # the driver (guide §3.1: broadcast only bounded dims; the
        # domain dim below stays broadcast for exactly that reason)
        .join(
            assets.select("md5_hash", "creative_asset_id")
            .hint("shuffle_hash"),
            "md5_hash", "left",
        )
        .join(
            d.select(
                F.col("domain_name").alias("host_ad_network_tld"),
                F.col("domain_id").alias("creative_host_domain_id"),
            ),
            "host_ad_network_tld", "left",
        )
        .join(
            d.select(
                F.col("domain_name").alias(
                    "creative_initial_domain_tld"
                ),
                F.col("domain_id").alias("creative_initial_domain_id"),
            ),
            "creative_initial_domain_tld", "left",
        )
        .join(
            d.select(
                F.col("domain_name").alias("mmp_tld"),
                F.col("domain_id").alias("mmp_domain_id"),
            ),
            "mmp_tld", "left",
        )
    )
    # explode in array order, map, refold ordered by position, dedup
    # preserving first occurrence — pandas explode→merge→unique
    # parity.  Derived from the INPUT frame, not the dim-joined one,
    # so the dim joins build exactly once.
    exploded = (
        base.select(
            "api_call_id",
            F.posexplode_outer("found_ad_network_tlds").alias(
                "_pos", "_tld"
            ),
        )
        .join(
            d.select(
                F.col("domain_name").alias("_tld"),
                F.col("domain_id").alias("_add_id"),
            ),
            "_tld", "left",
        )
        .groupBy("api_call_id")
        .agg(
            F.array_distinct(
                F.filter(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("_pos", "_add_id"))
                        ),
                        lambda s: s.getField("_add_id"),
                    ),
                    lambda x: x.isNotNull(),
                )
            ).alias("additional_ad_domain_ids")
        )
    )
    cr = cr.join(exploded, "api_call_id", "left")
    return cr.select(
        "api_call_id", "creative_asset_id", "creative_host_domain_id",
        "creative_initial_domain_id", "advertiser_store_app_id",
        "advertiser_domain_id", "mmp_domain_id", "mmp_urls",
        F.coalesce(
            "additional_ad_domain_ids", F.array().cast("array<long>")
        ).alias("additional_ad_domain_ids"),
        "click_url_ids",
        # empty array → null (:523-525)
        F.when(
            F.size("advertiser_store_app_ids") > 0,
            F.col("advertiser_store_app_ids"),
        ).alias("advertiser_store_app_ids"),
    )


def creative_records_assembly(
    flows: DataFrame,
    mmp_tlds: DataFrame,
    ad_domains: DataFrame,
    store_apps: DataFrame,
    domains: DataFrame,
    click_redirects: DataFrame | None = None,
    phash_col: F.Column | None = None,
    tld_col=None,
    persisted: list | None = None,
) -> DataFrame:
    """The whole pipeline: capture flows → api_calls → attributed
    creatives → creative_records (parse_store_id_mitm_log,
    mitm_scrape_ads.py:529-625, minus the S3/db side effects).

    ``persisted``: cache-handle list (see attribute_creatives) for
    the intra-attribution reuse points.  Independently of it, the
    attributed-creative frame is cut with ``localCheckpoint`` — the
    reference materializes adv_creatives / creative_assets to
    database tables at exactly this boundary
    (mitm_scrape_ads.py:583-594), and without a plan cut every
    downstream join re-analyzes and re-executes the whole
    attribution lineage.  A production DAG composing the step
    functions directly should materialize to durable tables here
    instead (the streaming/job.py sink pattern) so executor loss
    stays recoverable."""
    calls = add_is_creative(
        add_file_extension(api_calls_from_flows(flows))
    )
    adv = attribute_creatives(
        calls, mmp_tlds, ad_domains, store_apps,
        click_redirects=click_redirects, phash_col=phash_col,
        tld_col=tld_col, persisted=persisted,
    ).localCheckpoint(eager=False)
    assets = creative_assets(adv)
    full_domains = domains_with_missing(adv, domains)
    if persisted is not None:
        # broadcast into four joins below; cached, the broadcast
        # builds share one materialization of the anti-join
        full_domains = full_domains.persist()
        persisted.append(full_domains)
    return make_creative_records(adv, assets, full_domains)


# ---------------------------------------------------------------------
# Manual/maintenance flows (mitm_ad_parser/manual_actions.py,
# try_failed_mitms.py)
# ---------------------------------------------------------------------

LARGE_RESPONSE_BYTES = 500_000  # manual_actions.py:44


def mitm_filename_parts(name_col):
    """open_all_local_mitms' filename attribution
    (manual_actions.py:29-31): ``{pub_store_id}_{run_id}.log`` —
    the reference takes split('_')[0] and split('_')[1] with the
    .log suffix stripped, exactly (extra underscore segments are
    dropped, not rejoined)."""
    parts = F.split(name_col, "_")
    return (
        F.element_at(parts, 1).alias("pub_store_id"),
        F.regexp_replace(F.element_at(parts, 2), r"\.log$", "")
        .alias("run_id"),
    )


def redact_responses(df: DataFrame) -> DataFrame:
    """The export redaction (manual_actions.py:33-52): creative
    binary payloads and oversized responses have response_text /
    response_content blanked to '' (empty string, not NULL — the
    np.where replacement).  The size guard parses the string column
    with the reference's fillna('0') cast."""
    redact = F.coalesce(F.col("is_creative_content"), F.lit(False)) | (
        F.coalesce(F.col("response_size"), F.lit("0")).cast("long")
        > LARGE_RESPONSE_BYTES
    )
    blank = lambda c: F.when(redact, F.lit("")).otherwise(F.col(c)).alias(c)  # noqa: E731
    others = [c for c in df.columns
              if c not in ("response_text", "response_content")]
    return df.select(*others, blank("response_text"),
                     blank("response_content"))


def failed_mitm_retry_frontier(
    scan_results: DataFrame, lookback_date: str
) -> DataFrame:
    """get_failed_mitm_logs + the retry walk order
    (dbcon/queries.py:1544-1559, try_failed_mitms.py:10-40): the
    LAST result per run_id (DISTINCT ON ordered inserted_at DESC),
    kept when it is a CRITICAL failure inside the lookback window,
    retried oldest-first.  Emits (run_id, pub_store_id, error_msg,
    inserted_at, retry_order) — retry_order reproduces the
    reference's sorted iteration index."""
    w = Window.partitionBy("run_id").orderBy(
        F.desc("inserted_at"), F.asc("error_msg")
    )
    last = (
        scan_results.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    failed = last.filter(
        F.col("error_msg").startswith("CRITICAL ")
        & (F.col("inserted_at") >= F.lit(lookback_date))
    )
    # global order is the point: the reference retries these one at a
    # time on the driver; the frontier is maintenance-sized (failed
    # runs inside the lookback), so the single-partition window is
    # O(failures), not O(corpus)
    w_ord = Window.orderBy(F.asc("inserted_at"), F.asc("run_id"))
    return failed.select(
        "run_id", "pub_store_id", "error_msg", "inserted_at",
        (F.row_number().over(w_ord) - 1).alias("retry_order"),
    )
