"""Full-text search family (functions/textsearch.py): tokenizer
parity with the Python reference model, brute-vs-index answer
equality, lexeme-bucket partition pruning, and plan hygiene.

The reference surface being modeled: pg-ddl store_apps.sql:58,109,144
and developers.sql:37,77,91 — 'simple'-config tsvector columns + GIN
indexes (tokenize + lowercase, no stemming/stopwords)."""

import os

import pytest
from pyspark.sql import functions as F

from adscrawler_spark.functions import textsearch as TS
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_tokenizer_parity_edge_cases(spark):
    cases = [
        "small ring",
        "  Leading AND Trailing!  ",
        "digits 42 mixed a1b2",
        "--only//separators--",
        "",
        "UPPER lower MiXeD",
        "a--b   c",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "id int, txt string"
    )
    got = {
        i: []
        for i in range(len(cases))
    }
    for r in TS.tsvector_rows(df, "id", "txt").orderBy("id", "pos").collect():
        got[r["id"]].append((r["lexeme"], r["pos"]))
    for i, t in enumerate(cases):
        want = [(lx, p + 1) for p, lx in enumerate(TS.py_simple_lexemes(t))]
        assert got[i] == want, (t, got[i], want)


def test_brute_and_index_paths_agree(spark, docs):
    q = "window merge"
    brute = sorted(
        (r["doc_id"], r["rank"])
        for r in TS.search(docs, "doc_id", "text", q).collect()
    )
    postings = TS.build_postings(docs, "doc_id", "text")
    via_ix = sorted(
        (r["doc_id"], r["rank"])
        for r in TS.search_postings(postings, "doc_id", q).collect()
    )
    assert brute == via_ix
    assert len(brute) > 0


def test_query_lexemes_dedupe_and_reject_empty():
    assert TS._query_lexemes("Window  MERGE window") == ["window", "merge"]
    with pytest.raises(ValueError):
        TS.search_postings(None, "doc_id", "---")


def test_posting_write_prunes_to_query_buckets(spark, docs, tmp_path):
    """The 100 TB path: postings written partitionBy(lexeme_bucket);
    a term lookup's scan must carry partition filters (bucket pruning,
    the GIN-index analogue) and still return the exact answer."""
    out = os.path.join(str(tmp_path), "postings")
    TS.build_postings(docs, "doc_id", "text").write.partitionBy(
        "lexeme_bucket"
    ).parquet(out)
    lake = spark.read.parquet(out)
    terms = TS._query_lexemes("window merge")
    buckets = [
        r["lexeme_bucket"]
        for r in lake.filter(F.col("lexeme").isin(terms))
        .select("lexeme_bucket").distinct().collect()
    ]
    pruned = lake.filter(F.col("lexeme_bucket").isin(buckets))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "lexeme_bucket" in plan
    got = sorted(
        (r["doc_id"], r["rank"])
        for r in TS.search_postings(pruned, "doc_id", "window merge").collect()
    )
    want = sorted(
        (r["doc_id"], r["rank"])
        for r in TS.search(docs, "doc_id", "text", "window merge").collect()
    )
    assert got == want


def test_search_plans_are_hygienic(spark, docs):
    """No cartesian/nested-loop anywhere; the brute top-k compiles to
    TakeOrderedAndProject (distributed top-k, no global sort)."""
    brute = (
        TS.search(docs, "doc_id", "text", "window merge")
        .orderBy(F.desc("rank"), "doc_id")
        .limit(100)
    )
    plan = brute._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    via_ix = TS.search_postings(
        TS.build_postings(docs, "doc_id", "text"), "doc_id", "window merge"
    )
    plan2 = via_ix._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan2
    assert "NestedLoopJoin" not in plan2
