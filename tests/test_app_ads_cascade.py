"""Tests for adstxt.app_ads_upsert_cascade — batch equivalence with
the reference's per-pub-domain sequential upsert loop
(scrape.py:316-379)."""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from adscrawler_spark.operators import adstxt as AT

ENTRIES_SCHEMA = StructType(
    [
        StructField("pub_domain", LongType()),
        StructField("ad_domain", StringType()),
        StructField("publisher_id", StringType()),
        StructField("relationship", StringType()),
        StructField("certification_auth", StringType()),
        StructField("notes", StringType()),
        StructField("offset", IntegerType()),
    ]
)


def py_sequential_cascade(entries, domains, entrys):
    """The reference loop: per pub_domain (iteration order), upsert
    domains, entrys (insert-only on conflict), then map rows."""
    domains = dict(domains)  # name -> id
    entrys = dict(entrys)    # (ad_id, pub_id, rel) -> (id, cert, notes)
    mapping = set()
    next_dom = [max(domains.values(), default=0)]
    by_pub = {}
    for e in entries:
        by_pub.setdefault(e[0], []).append(e)
    for pub in sorted(by_pub):
        rows = sorted(by_pub[pub], key=lambda e: e[6])
        seen = set()
        for _pub, name, pid, rel, cert, notes, _off in rows:
            if name not in domains:
                next_dom[0] += 1
                domains[name] = 10_000 + next_dom[0]
            key = (domains[name], pid, rel)
            if key in seen:
                continue  # per-crawl drop_duplicates keep='first'
            seen.add(key)
            if key not in entrys:
                entrys[key] = (20_000 + len(entrys), cert, notes)
            mapping.add((pub, key))
    return domains, entrys, mapping


def test_batch_cascade_matches_sequential(spark):
    entries_rows = [
        # pub, ad_domain, publisher_id, rel, cert, notes, offset
        (100, "a.com", "p1", "DIRECT", "c1", None, 0),
        (100, "new1.com", "p2", "RESELLER", "c2", "n2", 1),
        (100, "a.com", "p1", "DIRECT", "IGNORED-dup", None, 2),
        (200, "new1.com", "p2", "RESELLER", "other-cert", "other", 0),
        (200, "new2.com", "p9", "DIRECT", None, None, 1),
        (200, "a.com", "p1", "RESELLER", "c3", None, 2),
    ]
    domains_dim = spark.createDataFrame(
        [(1, "a.com")], "id long, domain_name string"
    )
    entrys_dim = spark.createDataFrame(
        [], "id long, ad_domain long, publisher_id string, "
            "relationship string, certification_auth string, notes string",
    )
    entries = spark.createDataFrame(entries_rows, ENTRIES_SCHEMA)
    doms, ents, mapping = AT.app_ads_upsert_cascade(
        entries, domains_dim, entrys_dim
    )
    doms_c = {r.domain_name: r.id for r in doms.collect()}
    ents_c = ents.collect()
    map_c = mapping.collect()

    py_doms, py_ents, py_map = py_sequential_cascade(
        entries_rows, {"a.com": 1}, {}
    )
    # same domain-name set; existing ids preserved
    assert set(doms_c) == set(py_doms)
    assert doms_c["a.com"] == 1
    # same entry KEY set (ids are surrogates on our side)
    name_by_id = {v: k for k, v in doms_c.items()}
    got_keys = {(name_by_id[r.ad_domain], r.publisher_id, r.relationship)
                for r in ents_c}
    py_name_by_id = {v: k for k, v in py_doms.items()}
    want_keys = {(py_name_by_id[k[0]], k[1], k[2]) for k in py_ents}
    assert got_keys == want_keys
    assert len(ents_c) == len(got_keys)  # keys unique after upsert
    # map pairs agree modulo surrogate ids
    ent_id_to_key = {r.id: (name_by_id[r.ad_domain], r.publisher_id,
                            r.relationship) for r in ents_c}
    got_map = {(r.pub_domain, ent_id_to_key[r.app_ads_entry]) for r in map_c}
    want_map = {(pub, (py_name_by_id[k[0]], k[1], k[2]))
                for pub, k in py_map}
    assert got_map == want_map


def test_canonical_entry_attributes_first_pub_offset(spark):
    # the same (ad_domain, publisher, rel) key arrives from two pubs
    # with different cert/notes; the first (pub, offset) wins
    entries = spark.createDataFrame(
        [
            (200, "x.com", "p", "DIRECT", "late-cert", "late", 0),
            (100, "x.com", "p", "DIRECT", "first-cert", None, 5),
            (100, "x.com", "p", "DIRECT", "dup-in-same-pub", "d", 9),
        ],
        ENTRIES_SCHEMA,
    )
    domains_dim = spark.createDataFrame([], "id long, domain_name string")
    entrys_dim = spark.createDataFrame(
        [], "id long, ad_domain long, publisher_id string, "
            "relationship string, certification_auth string, notes string",
    )
    _doms, ents, mapping = AT.app_ads_upsert_cascade(
        entries, domains_dim, entrys_dim
    )
    rows = ents.collect()
    assert len(rows) == 1
    # first (pub_domain, offset) supplies the canonical attributes
    assert rows[0].certification_auth == "first-cert"
    assert rows[0].notes is None
    assert mapping.count() == 2  # both pubs map to the single entry
