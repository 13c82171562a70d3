"""IP → geography/ASN enrichment — the relational core of the
reference's geo tool (tools/geo.py).

The reference resolves one ip at a time through two MaxMind mmdb
readers (tools/geo.py:52-98: city + ASN, longest-prefix-match inside
the reader) and wraps the pair in ``get_geo``'s fallback ladder
(tools/geo.py:101-129): a miss in EITHER database returns the
None-valued column set, an unparseable address returns empty strings.

Spark-first: the mmdb point-lookup becomes a distributed range join.
A naive ``ip BETWEEN start AND end`` theta-join is a broadcast
nested-loop (quadratic at 100 TB); instead each CIDR block is
exploded into the /16 buckets it spans, turning the lookup into an
equi-join on bucket plus a residual range filter — both sides hash-
partition on the bucket key, so the plan is shuffle-bounded and
skew-safe at any scale.  Fine blocks (/16 and longer — virtually the
whole GeoLite2 table) expand to exactly one bucket; the rare coarse
block expands to 2^(16-prefix) rows, a bounded, data-independent
blow-up.  Overlapping blocks resolve longest-prefix-wins, matching
the mmdb trie semantics, via map-side-combinable ``min_by``
aggregation rather than a window sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bucket granularity: bucket = ip >> BUCKET_BITS, i.e. 8 = /24
# buckets.  The bucket size trades candidate fan-in against block
# explode fan-out: with /16 buckets every probe ip met every /17-/24
# block sharing its /16 (~200 candidates per ip at the bench shape —
# 274M candidate rows through the residual range filter, ~2/3 of the
# lookup's CPU); /24 buckets bring that to ~1-3 candidates while a
# GeoLite2-shaped table (mostly /20-/24 blocks, few coarser than /16)
# explodes to only ~1-2 bucket rows per block.  Blocks coarser than
# the bucket explode into 2^(bucket_prefix - block_prefix) rows, so
# anything /9 or coarser would be the thing to watch before shrinking
# further.
BUCKET_BITS = 8

_IPV4_PAT = r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$"


def ip_to_long(col: Column) -> Column:
    """Dotted-quad → 32-bit integer (NULL when the shape or octet
    range is invalid — the addresses geoip2 would reject with an
    exception, tools/geo.py:125-128)."""
    p = F.split(col, r"\.")
    octets_ok = (
        col.rlike(_IPV4_PAT)
        & (p[0].cast("int") <= 255)
        & (p[1].cast("int") <= 255)
        & (p[2].cast("int") <= 255)
        & (p[3].cast("int") <= 255)
    )
    val = (
        p[0].cast("long") * 16777216
        + p[1].cast("long") * 65536
        + p[2].cast("long") * 256
        + p[3].cast("long")
    )
    return F.when(octets_ok, val)


def long_to_ip(col: Column) -> Column:
    """32-bit integer → dotted quad."""
    return F.concat_ws(
        ".",
        (col / 16777216).cast("long").cast("string"),
        ((col / 65536) % 256).cast("long").cast("string"),
        ((col / 256) % 256).cast("long").cast("string"),
        (col % 256).cast("string"),
    )


def parse_cidr(blocks: DataFrame) -> DataFrame:
    """Parse a ``network`` CIDR column into (start_ip, end_ip,
    prefix_len).  All arithmetic is JVM-side; span = 2^(32-prefix) is
    exact in double up to 2^53."""
    parts = F.split(F.col("network"), "/")
    plen = parts[1].cast("int")
    base = ip_to_long(parts[0])
    span = F.pow(F.lit(2.0), 32 - plen).cast("long")
    start = F.floor(base / span) * span
    end = start + span - 1
    return (
        blocks.withColumn("prefix_len", plen)
        .withColumn("start_ip", start)
        .withColumn("end_ip", end)
    )


def explode_cidr_buckets(blocks: DataFrame) -> DataFrame:
    """``parse_cidr`` + explode each block into the buckets it spans."""
    shift = F.lit(1 << BUCKET_BITS)
    return parse_cidr(blocks).withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("start_ip") / shift),
                F.floor(F.col("end_ip") / shift),
            )
        ),
    )


def _block_pack() -> Column:
    """One BIGINT encoding the longest-prefix-wins ordering AND the
    block's identity: (32-plen) in bits 40-45, start_ip in bits 8-39,
    plen in bits 0-7 — numeric compare == lexicographic (32-plen,
    start_ip, plen).  A plain min(long) folds in a HashAggregate;
    the min_by-over-struct formulation it replaces fell back to
    SortAggregate (struct aggregation buffers are not hash-mutable)
    and dominated the lookup's CPU at the 10x profile.  The ordering
    is EXACTLY the old (32-plen, network) one: candidates all contain
    the probe ip, so equal-length candidates are the identical block
    and the tie-break is unreachable."""
    # the shift operands must already be LONG: shiftleft on an int
    # column wraps the shift distance mod 32
    return (
        F.shiftleft((F.lit(32) - F.col("prefix_len")).cast("long"), 40)
        + F.shiftleft(F.col("start_ip").cast("long"), 8)
        + F.col("prefix_len")
    ).cast("long")


CITY_COLS = [
    "country_name", "country_iso", "state_name", "state_iso",
    "city_name", "zip", "latitude", "longitude",
]
ASN_COLS = ["asn", "org"]


def _join_block_candidates(
    probe: DataFrame,
    city_blocks: DataFrame,
    asn_blocks: DataFrame,
    broadcast_blocks: bool = True,
) -> DataFrame:
    """Left-join a probe frame (carrying ``ip_int``) against the
    tagged union of both exploded block tables on /16 bucket +
    residual range.  Shared by the ip-keyed lookup and the uuid-keyed
    snapshot path."""
    blocks = (
        explode_cidr_buckets(city_blocks)
        .withColumn("_tag", F.lit("c"))
        .unionByName(
            explode_cidr_buckets(asn_blocks).withColumn("_tag", F.lit("a")),
            allowMissingColumns=True,
        )
    )
    if broadcast_blocks:
        blocks = F.broadcast(blocks)
    probe = probe.withColumn(
        "bucket", F.floor(F.col("ip_int") / F.lit(1 << BUCKET_BITS))
    )
    return probe.join(
        blocks,
        (probe["bucket"] == blocks["bucket"])
        & (probe["ip_int"] >= blocks["start_ip"])
        & (probe["ip_int"] <= blocks["end_ip"]),
        "left",
    )


def _best_block(tag: str) -> Column:
    """Longest-prefix-wins candidate pick for one database tag: a
    hash-aggregable min over the packed ordering long (``_block_pack``
    — the when() is NULL for other tags' rows and min skips NULLs, so
    each tag's aggregate only sees its own candidates).  The winner's
    attributes join back afterwards from the un-exploded parsed block
    dim keyed by the same pack."""
    return F.min(F.when(F.col("_tag") == tag, _block_pack()))


def lookup_ips(
    ips: DataFrame,
    city_blocks: DataFrame,
    asn_blocks: DataFrame,
    broadcast_blocks: bool = True,
) -> DataFrame:
    """lookup_ip (tools/geo.py:52-98) as two bucketed range joins.
    The reference runs both readers inside one try whose
    AddressNotFoundError handler returns None — a miss in EITHER
    database nulls the whole row's enrichment (the city reader runs
    first, so its miss short-circuits; pure lookups make computing
    both then gating equivalent).  ``cidr`` is the matched city
    block's network (str(response.traits.network)).

    ``ips``: one ``ip`` string column (pre-validated dotted quads).
    ``city_blocks``: network + CITY_COLS.  ``asn_blocks``: network +
    ASN_COLS.  Returns ip + CITY_COLS + cidr + ASN_COLS with the
    all-or-nothing NULL rule applied.

    Plan shape: both block tables are exploded, tagged, and unioned so
    the probe side is joined ONCE; the longest-prefix winner per
    database is then resolved with per-tag ``min_by`` aggregations
    (ordering = (32 − prefix_len, network), i.e. plen DESC then
    network ASC — ``min_by`` skips NULL orderings, so each tag's
    aggregate only sees its own candidates).  Because every ip lives
    in exactly one /16 bucket, all of an ip's candidates are
    co-located after the bucket join and the map-side partial
    aggregate collapses them to one row per ip before the final
    shuffle — no window sort.

    With ``broadcast_blocks`` (the default) the exploded block table
    is broadcast: the Spark-first analogue of the reference shipping
    the mmdb files to every worker process (tools/geo.py opens both
    readers per process).  GeoLite2 is a bounded dim (~4M blocks);
    one copy per executor beats shuffling a 10^10-row probe side.
    The probe is then hash-partitioned by ip exactly once (the
    distinct), the broadcast join preserves that partitioning, and
    the groupBy(ip) reuses it — a one-shuffle plan end to end.  Pass
    ``broadcast_blocks=False`` to fall back to the shuffled bucket
    equi-join when the block table genuinely exceeds executor memory.
    """
    base = ips.select("ip").distinct().withColumn(
        "ip_int", ip_to_long(F.col("ip"))
    )
    joined = _join_block_candidates(
        base, city_blocks, asn_blocks, broadcast_blocks
    )
    agg = joined.groupBy(F.col("ip")).agg(
        _best_block("c").alias("_wc"),
        _best_block("a").alias("_wa"),
    )
    cdim = parse_cidr(city_blocks).select(
        _block_pack().alias("_wc"),
        *[F.col(c) for c in CITY_COLS],
        F.col("network").alias("cidr"),
    )
    adim = parse_cidr(asn_blocks).select(
        _block_pack().alias("_wa"), *[F.col(c) for c in ASN_COLS]
    )
    res = (
        agg.join(F.broadcast(cdim), "_wc", "left")
        .join(F.broadcast(adim), "_wa", "left")
    )
    hit = F.col("cidr").isNotNull() & F.col("asn").isNotNull()
    return res.select(
        "ip",
        *[F.when(hit, F.col(c)).alias(c) for c in CITY_COLS],
        F.when(hit, F.col("cidr")).alias("cidr"),
        *[F.when(hit, F.col(c)).alias(c) for c in ASN_COLS],
    )


def get_geo(
    ips: DataFrame, city_blocks: DataFrame, asn_blocks: DataFrame
) -> DataFrame:
    """get_geo (tools/geo.py:101-129): the four-column public shape.
    Unparseable addresses (the reader-exception path) yield empty
    strings; parseable-but-unmatched addresses yield NULLs; hits
    yield (country_iso, state_iso, city_name, org)."""
    valid = ips.withColumn("ip_int", ip_to_long(F.col("ip")))
    looked = lookup_ips(
        valid.filter(F.col("ip_int").isNotNull()).select("ip"),
        city_blocks,
        asn_blocks,
    ).select("ip", "country_iso", "state_iso", "city_name", "org")
    out = valid.select("ip", F.col("ip_int").isNotNull().alias("_ok")).join(
        looked, "ip", "left"
    )
    pick = lambda c: (  # noqa: E731
        F.when(~F.col("_ok"), F.lit("")).otherwise(F.col(c)).alias(c)
    )
    return out.select(
        "ip",
        pick("country_iso"),
        pick("state_iso"),
        pick("city_name"),
        pick("org"),
    )


# ---------------------------------------------------------------------
# IP-geo snapshots for the mitm api_calls lineage
# (mitm_ad_parser/mitm_logs.py:88-107, packages/apks/waydroid.py:179-283)
# ---------------------------------------------------------------------


def _default_surrogate(*cols) -> Column:
    return F.xxhash64(F.concat_ws("|", *cols))


def ip_geo_snapshot_rows(
    flows: DataFrame,
    city_blocks: DataFrame,
    asn_blocks: DataFrame,
    countries: DataFrame,
    surrogate=_default_surrogate,
) -> DataFrame:
    """make_ip_geo_snapshot_df + the snapshot upsert
    (mitm_logs.py:88-107, waydroid.py:179-213): each captured flow's
    ip resolves through get_geo ONCE at parse time (geo data drifts,
    the reference pins the snapshot), the country_iso maps m:1 to
    the countries dim (unmapped stays NULL — the np.isnan→None
    repair), and the row is keyed mitm_uuid with a deterministic pk.

    ``flows``: (mitm_uuid, ip_address, ...).  ``countries``:
    (country_id, alpha2).  Returns (id, mitm_uuid, ip_address,
    country_id, state_iso, city_name, org).

    Plan shape — ONE shuffle end to end: the per-uuid dedup (min ip,
    deterministic where the old dropDuplicates was arbitrary) hash-
    partitions on mitm_uuid; the block candidates arrive by broadcast,
    preserving that partitioning; and the longest-prefix fold groups
    on (mitm_uuid, ip_address), whose ClusteredDistribution the
    existing mitm_uuid partitioning already satisfies — so the
    candidate collapse is exchange-free.  The earlier formulation
    (dedup → distinct ips → lookup → join back on ip) paid three
    full-probe shuffles for the same answer; distinct-ips only wins
    when ip duplication is extreme, and the lookup side is a
    broadcast join either way."""
    dedup = (
        flows.select("mitm_uuid", "ip_address")
        .groupBy("mitm_uuid")
        .agg(F.min("ip_address").alias("ip_address"))
    )
    probe = dedup.withColumn("ip_int", ip_to_long(F.col("ip_address")))
    joined = _join_block_candidates(probe, city_blocks, asn_blocks)
    agg = joined.groupBy("mitm_uuid", "ip_address").agg(
        _best_block("c").alias("_wc"),
        _best_block("a").alias("_wa"),
    )
    cdim = parse_cidr(city_blocks).select(
        _block_pack().alias("_wc"),
        "country_iso", "state_iso", "city_name",
        F.col("network").alias("cidr"),
    )
    adim = parse_cidr(asn_blocks).select(
        _block_pack().alias("_wa"), *[F.col(c) for c in ASN_COLS]
    )
    agg = (
        agg.join(F.broadcast(cdim), "_wc", "left")
        .join(F.broadcast(adim), "_wa", "left")
    )
    # get_geo's ladder (tools/geo.py:101-129): unparseable → empty
    # strings; parseable but missed in EITHER database → NULLs
    ok = ip_to_long(F.col("ip_address")).isNotNull()
    hit = F.col("cidr").isNotNull() & F.col("asn").isNotNull()
    pick = lambda c: F.when(~ok, F.lit("")).when(hit, c)  # noqa: E731
    with_geo = agg.select(
        "mitm_uuid",
        "ip_address",
        pick(F.col("country_iso")).alias("country_iso"),
        pick(F.col("state_iso")).alias("state_iso"),
        pick(F.col("city_name")).alias("city_name"),
        pick(F.col("org")).alias("org"),
    )
    with_country = with_geo.join(
        F.broadcast(countries.select("alpha2", "country_id")),
        with_geo["country_iso"] == F.col("alpha2"),
        "left",
    )
    return with_country.select(
        surrogate(F.col("mitm_uuid")).alias("id"),
        "mitm_uuid",
        "ip_address",
        "country_id",
        "state_iso",
        "city_name",
        "org",
    )


def api_calls_with_geo(calls: DataFrame, snapshots: DataFrame) -> DataFrame:
    """record_mitm_to_db's 1:1 merge (waydroid.py:203-216): api_calls
    rows pick up their flow's ip_geo_snapshot_id by mitm_uuid."""
    return calls.join(
        snapshots.select(
            "mitm_uuid", F.col("id").alias("ip_geo_snapshot_id")
        ),
        "mitm_uuid",
        "left",
    )


def missing_domain_rows(calls: DataFrame, domains_dim: DataFrame) -> DataFrame:
    """insert_missing_ad_domains (waydroid.py:254-283): distinct
    non-null tld_urls not yet in the domains dim, as upsert rows."""
    return (
        calls.filter(F.col("tld_url").isNotNull())
        .select(F.col("tld_url").alias("domain_name"))
        .distinct()
        .join(domains_dim.select("domain_name"), "domain_name", "left_anti")
    )
