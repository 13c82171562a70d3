"""Tests for operators/geoip.py — the bucketed CIDR range join and
the reference's get_geo fallback ladder (tools/geo.py:52-129)."""

from __future__ import annotations

from pyspark.sql import functions as F

from adscrawler_spark.operators import geoip as G


def _city_blocks(spark):
    rows = [
        # network, country_name, country_iso, state_name, state_iso,
        # city_name, zip, latitude, longitude
        ("10.0.0.0/8", "United States", "US", "California", "CA",
         "Mountain View", "94040", 37.4, -122.1),
        ("10.1.0.0/16", "United States", "US", "Texas", "TX",
         "Austin", "78701", 30.3, -97.7),
        ("10.1.2.0/24", "United States", "US", "Texas", "TX",
         "Dallas", "75201", 32.8, -96.8),
        ("192.168.0.0/14", "Germany", "DE", "Berlin", "BE",
         "Berlin", "10115", 52.5, 13.4),
    ]
    return spark.createDataFrame(
        rows,
        "network string, country_name string, country_iso string, "
        "state_name string, state_iso string, city_name string, "
        "zip string, latitude double, longitude double",
    )


def _asn_blocks(spark):
    rows = [
        ("10.0.0.0/8", 15169, "ExampleNet"),
        ("192.168.0.0/16", 3320, "OtherNet"),
    ]
    return spark.createDataFrame(rows, "network string, asn int, org string")


def test_ip_to_long_validity(spark):
    df = spark.createDataFrame(
        [("1.2.3.4",), ("0.0.0.0",), ("255.255.255.255",), ("300.1.2.3",),
         ("1.2.3",), ("1.2.3.4.5",), ("bad",), ("",)],
        ["ip"],
    )
    got = {r.ip: r.v for r in
           df.select("ip", G.ip_to_long(F.col("ip")).alias("v")).collect()}
    assert got["1.2.3.4"] == (1 << 24) + (2 << 16) + (3 << 8) + 4
    assert got["0.0.0.0"] == 0
    assert got["255.255.255.255"] == (1 << 32) - 1
    assert got["300.1.2.3"] is None
    assert got["1.2.3"] is None
    assert got["1.2.3.4.5"] is None
    assert got["bad"] is None
    # round trip
    back = df.filter(F.col("ip") == "1.2.3.4").select(
        G.long_to_ip(G.ip_to_long(F.col("ip"))).alias("ip2")
    ).collect()[0].ip2
    assert back == "1.2.3.4"


def test_explode_cidr_bucket_counts(spark):
    blocks = spark.createDataFrame(
        [("10.0.0.0/8",), ("10.1.0.0/16",), ("10.1.2.0/24",),
         ("192.168.0.0/14",)],
        ["network"],
    )
    out = G.explode_cidr_buckets(blocks)
    counts = {r.network: r.n for r in
              out.groupBy("network").agg(F.count("*").alias("n")).collect()}
    # a /p block coarser than the bucket spans 2^(32 - BUCKET_BITS - p)
    # buckets; finer-or-equal blocks span exactly 1 (parametric so the
    # test tracks the tuned bucket granularity)
    def spans(p: int) -> int:
        return max(1, 1 << max(0, (32 - G.BUCKET_BITS) - p))

    assert counts["10.0.0.0/8"] == spans(8)
    assert counts["192.168.0.0/14"] == spans(14)
    assert counts["10.1.0.0/16"] == spans(16)
    assert counts["10.1.2.0/24"] == spans(24)
    rng = out.filter(F.col("network") == "10.1.2.0/24").collect()[0]
    base = (10 << 24) + (1 << 16) + (2 << 8)
    assert rng.start_ip == base and rng.end_ip == base + 255


def test_lookup_longest_prefix_and_both_hit_rule(spark):
    ips = spark.createDataFrame(
        [("10.1.2.3",),     # matches /8, /16, /24 -> /24 Dallas wins
         ("10.1.9.9",),     # matches /8, /16 -> /16 Austin wins
         ("10.200.0.1",),   # only /8 -> Mountain View
         ("192.168.1.1",),  # city /14 hit, asn /16 hit -> Berlin
         ("192.170.0.1",),  # inside city /14, OUTSIDE asn /16 -> all NULL
         ("172.16.0.1",)],  # no match anywhere -> all NULL
        ["ip"],
    )
    got = {r.ip: r for r in
           G.lookup_ips(ips, _city_blocks(spark), _asn_blocks(spark)).collect()}
    assert got["10.1.2.3"].city_name == "Dallas"
    assert got["10.1.2.3"].cidr == "10.1.2.0/24"
    assert got["10.1.2.3"].org == "ExampleNet"
    assert got["10.1.9.9"].city_name == "Austin"
    assert got["10.200.0.1"].city_name == "Mountain View"
    assert got["10.200.0.1"].asn == 15169
    assert got["192.168.1.1"].city_name == "Berlin"
    assert got["192.168.1.1"].org == "OtherNet"
    # ASN miss nulls the city columns too (reference's single
    # try/except around both readers)
    for col in ("country_iso", "city_name", "cidr", "org", "latitude"):
        assert got["192.170.0.1"][col] is None
        assert got["172.16.0.1"][col] is None


def test_get_geo_fallback_ladder(spark):
    ips = spark.createDataFrame(
        [("10.1.2.3",), ("172.16.0.1",), ("not-an-ip",), ("999.1.1.1",),
         ("10.1.2.3",)],  # duplicate input row survives
        ["ip"],
    )
    rows = G.get_geo(ips, _city_blocks(spark), _asn_blocks(spark)).collect()
    assert len(rows) == 5
    by_ip = {}
    for r in rows:
        by_ip.setdefault(r.ip, []).append(r)
    hit = by_ip["10.1.2.3"][0]
    assert (hit.country_iso, hit.state_iso, hit.city_name, hit.org) == (
        "US", "TX", "Dallas", "ExampleNet")
    assert len(by_ip["10.1.2.3"]) == 2
    miss = by_ip["172.16.0.1"][0]
    assert miss.country_iso is None and miss.org is None
    for bad in ("not-an-ip", "999.1.1.1"):
        r = by_ip[bad][0]
        assert (r.country_iso, r.state_iso, r.city_name, r.org) == ("", "", "", "")


def test_lookup_plan_has_no_cartesian(spark):
    ips = spark.createDataFrame([("10.1.2.3",)], ["ip"])
    plan = G.lookup_ips(
        ips, _city_blocks(spark), _asn_blocks(spark)
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # The block dim is broadcast (one copy per executor, the mmdb
    # analogue) and the longest-prefix resolve is a HASH-aggregable
    # min over the packed ordering long (the min_by-over-struct
    # formulation fell back to SortAggregate), not a window sort
    # over the joined candidates.
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    assert "Window" not in plan
    # Shuffled fallback keeps the bucket equi-join (still no
    # cartesian) when the dim is declared too big to broadcast.
    fb = G.lookup_ips(
        ips, _city_blocks(spark), _asn_blocks(spark),
        broadcast_blocks=False,
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in fb
    assert "BroadcastNestedLoopJoin" not in fb


def test_ip_geo_snapshot_lineage(spark):
    flows = spark.createDataFrame(
        [("u1", "10.1.2.3"), ("u2", "172.16.0.1"), ("u3", "not-an-ip"),
         ("u4", "10.1.2.3")],
        "mitm_uuid string, ip_address string",
    )
    countries = spark.createDataFrame(
        [(1, "US"), (2, "DE")], "country_id int, alpha2 string"
    )
    snaps = G.ip_geo_snapshot_rows(
        flows, _city_blocks(spark), _asn_blocks(spark), countries
    )
    got = {r.mitm_uuid: r for r in snaps.collect()}
    assert set(got) == {"u1", "u2", "u3", "u4"}
    # hit: US resolves through the dim; duplicate ip shares the geo
    assert got["u1"].country_id == 1 and got["u1"].org == "ExampleNet"
    assert got["u4"].country_id == 1
    # unmatched ip and malformed ip leave country_id NULL
    assert got["u2"].country_id is None and got["u2"].org is None
    assert got["u3"].country_id is None and got["u3"].org == ""
    # snapshot ids deterministic per uuid
    assert got["u1"].id is not None and got["u1"].id != got["u4"].id

    calls = spark.createDataFrame(
        [("u1", "https://x.com/a", "x.com"), ("u9", "https://y.io/b", None),
         ("u2", "https://new.net/c", "new.net")],
        "mitm_uuid string, url string, tld_url string",
    )
    with_geo = {r.mitm_uuid: r
                for r in G.api_calls_with_geo(calls, snaps).collect()}
    assert with_geo["u1"].ip_geo_snapshot_id == got["u1"].id
    assert with_geo["u9"].ip_geo_snapshot_id is None

    domains = spark.createDataFrame([("x.com",)], ["domain_name"])
    missing = {r.domain_name
               for r in G.missing_domain_rows(calls, domains).collect()}
    assert missing == {"new.net"}


def test_snapshot_plan_single_shuffle(spark):
    """The snapshot path is ONE hash exchange end to end: the per-uuid
    dedup partitions on mitm_uuid, the block candidates arrive by
    broadcast, and the longest-prefix fold on (mitm_uuid, ip_address)
    reuses that partitioning (subset-key ClusteredDistribution) — the
    earlier dedup → distinct-ips → join-back shape paid three."""
    import re

    flows = spark.createDataFrame(
        [("m1", "10.0.0.5"), ("m2", "bad")],
        "mitm_uuid string, ip_address string",
    )
    countries = spark.createDataFrame(
        [("C0", 11)], "alpha2 string, country_id int"
    )
    df = G.ip_geo_snapshot_rows(
        flows, _city_blocks(spark), _asn_blocks(spark), countries
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
