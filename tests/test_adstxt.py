"""ads.txt parser parity: Spark operator vs pure-Python oracle on a
branch-covering fixture corpus (FIXTURES.md F3) plus a seeded fuzz
corpus. Asserts span-sequence equality (kind/text/media_ref/offset) and
entry-set equality per document."""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from adscrawler_spark.operators import adstxt as sp_adstxt
from adscrawler_spark.pyref import adstxt as py_adstxt

FIXTURE_BODIES = {
    "basic3": "adnet.com, pub123, DIRECT\nother.net,pub9,RESELLER",
    "field4": "adnet.com,pub123,DIRECT,certauthxyz",
    "field6": "adnet.com,pub1,RESELLER,cert,extra1,extra2",
    "comments": "# top comment\nadnet.com,pub123,DIRECT\n\n# mid\nother.net,p2,RESELLER\n",
    "spaces_inside": "ad net.com , pu b1 , DIR ECT",
    "mixed_case_rel": "adnet.com,pub1,direct\nother.net,p2,ReSeller-x",
    "both_tokens": "adnet.com,pub1,DIRECTRESELLER",
    "junk_chars": "AD$NET.com,pub*1,DIRECT!\nUPPER.COM,P2,RESELLER",
    "subdomained": "ssp.eu.adnet.com,pub1,DIRECT",
    "missing_pub": "adnet.com,,DIRECT\nadnet.com,pub2,DIRECT",
    "short_row": "adnet.com,pub1\nadnet.com,pub1,DIRECT",
    "dup_rows": "adnet.com,pub1,DIRECT,c1\nadnet.com,pub1,DIRECT,c2\nadnet.com,pub1,RESELLER",
    "all_invalid": "nonsense line\n,,,\n#only DIRECT in comment",
    "html_page": "<html><head><title>x</title></head>DIRECT</html>",
    "no_tokens": "adnet.com,pub1,SOMETHING\nother.net,p2,ELSE",
    "trailing_commas": "adnet.com,pub1,DIRECT,\nadnet.com,pub3,RESELLER,,",
    "crlf": "adnet.com,pub1,DIRECT\r\nother.net,p2,RESELLER\r",
    "unknown_tld": "localhost,pub1,DIRECT\nadnet.unknowntld,p2,RESELLER",
}


def _fuzz_bodies(n=150, seed=42):
    rng = random.Random(seed)
    doms = ["adnet.com", "Other.NET", "s.ub.adnet.co.uk", "weird$ch.ar.com",
            "localhost", "10.0.0.1", "", "#com", "a b.com"]
    rels = ["DIRECT", "RESELLER", "direct", "reseller", "directx",
            "DIRECTRESELLER", "nope", "", "RES ELLER"]
    bodies = {}
    for i in range(n):
        lines = []
        for _ in range(rng.randint(0, 12)):
            r = rng.random()
            if r < 0.1:
                lines.append("# comment %d" % rng.randint(0, 9))
            elif r < 0.18:
                lines.append("")
            else:
                nf = rng.choice([1, 2, 3, 3, 3, 4, 4, 5, 6])
                fields = [rng.choice(doms), "pub%d" % rng.randint(0, 30),
                          rng.choice(rels), "cert%d" % rng.randint(0, 5),
                          "note a", "note,b"][:nf]
                lines.append(",".join(fields))
        bodies[f"fuzz{i:03d}"] = "\n".join(lines)
    return bodies


@pytest.fixture(scope="module")
def corpus():
    c = dict(FIXTURE_BODIES)
    c.update(_fuzz_bodies())
    return c


@pytest.fixture(scope="module")
def spark_out(spark, corpus):
    raw = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(corpus), "body": list(corpus.values())})
    )
    entries, results = sp_adstxt.parse_adstxt_docs(raw)
    spans = sp_adstxt.adstxt_line_spans(raw)
    return (
        entries.toPandas(),
        {r.doc_id: r.crawl_result for r in results.collect()},
        {r.doc_id: r.spans for r in spans.collect()},
    )


def test_span_sequences_match_oracle(spark_out, corpus):
    _, _, spans = spark_out
    for doc_id, body in corpus.items():
        want = py_adstxt.kept_lines(body)
        got = sorted(spans[doc_id], key=lambda s: s.offset)
        assert [s.text for s in got] == want, doc_id
        assert [s.offset for s in got] == list(range(len(want))), doc_id
        assert all(s.kind == "adstxt_line" and s.media_ref is None for s in got), doc_id


def test_crawl_results_match_oracle(spark_out, corpus):
    _, results, _ = spark_out
    for doc_id, body in corpus.items():
        _, want = py_adstxt.parse_body(body)
        assert results[doc_id] == want, (doc_id, body)


def test_entries_match_oracle(spark_out, corpus):
    entries, _, _ = spark_out
    by_doc = {k: g for k, g in entries.groupby("doc_id")}
    for doc_id, body in corpus.items():
        want, code = py_adstxt.parse_body(body)
        got_df = by_doc.get(doc_id)
        if code != 1:
            assert got_df is None or len(got_df) == 0, doc_id
            continue
        got = [
            (r.ad_domain, r.publisher_id, r.relationship,
             r.certification_auth if pd.notna(r.certification_auth) else None,
             r.notes if pd.notna(r.notes) else None)
            for r in got_df.sort_values("offset").itertuples()
        ]
        assert got == want, (doc_id, body)


def test_fixture_branch_expectations(spark_out):
    entries, results, _ = spark_out
    assert results["html_page"] == 3
    assert results["no_tokens"] == 3
    # token appears in a comment → body check passes, clean drops all →
    # AdsTxtEmptyError path (crawl_result=2, scrape.py:293-295)
    assert results["all_invalid"] == 2
    assert results["basic3"] == 1
    assert results["missing_pub"] == 1
    e = entries[entries.doc_id == "both_tokens"]
    assert list(e.relationship) == ["DIRECT"]
    e = entries[entries.doc_id == "junk_chars"]
    assert set(e.ad_domain) == {"adnet.com", "upper.com"}
    e = entries[entries.doc_id == "subdomained"]
    assert list(e.ad_domain) == ["adnet.com"]
    e = entries[entries.doc_id == "dup_rows"].sort_values("offset")
    got = [(r, c if pd.notna(c) else None)
           for r, c in zip(e.relationship, e.certification_auth)]
    assert got == [("DIRECT", "c1"), ("RESELLER", None)]


def test_parse_stays_jvm_side(spark, corpus):
    """Only the PSL collapse is Python; the rest of the parse plan must
    contain exactly one ArrowEvalPython and no row-wise BatchEvalPython."""
    raw = spark.createDataFrame([("d", "a.com,p,DIRECT")], "doc_id string, body string")
    entries, _ = sp_adstxt.parse_adstxt_docs(raw)
    plan = entries._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") <= 1
