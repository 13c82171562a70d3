"""Hand-computed RAKE cases (reference
app_stores/process_keywords.py:243-272 extract_keywords_rake /
rake_nltk; Rose et al. 2010 — via functions/rake.py).  The full
corpus-scale run is oracle-checked in tests/test_oracle_queries.py
(``rake_keywords_topk``); these pin the phrase-break and
degree-over-all-phrases semantics on a worked example."""

from pyspark.sql import Row

from adscrawler_spark.functions import rake


def _doc(spark, text):
    return spark.createDataFrame([Row(doc_id=1, text=text)])


def test_phrases_break_at_punctuation_and_stopwords(spark):
    # '.' from the normalizer and the stopwords 'the'/'and' both break;
    # hyphen/digit runs also become breaks.
    docs = _doc(spark, "Fast photo editor. edit the photo-book 2024 today")
    got = {
        (r.phrase, r.n_tokens)
        for r in rake.candidate_phrases(docs).collect()
    }
    assert got == {
        ("fast photo editor", 3),
        ("edit", 1),
        ("photo", 1),
        ("book", 1),
        ("today", 1),
    }


def test_scores_match_hand_computation(spark):
    # Phrases: [fast photo editor], [edit], [photo].
    # freq: fast 1, photo 2, editor 1, edit 1.
    # deg (sum of containing-phrase length per occurrence):
    #   fast 3, editor 3, photo 3+1=4, edit 1.
    # word scores: fast 3, editor 3, photo 2, edit 1.
    # phrase scores: "fast photo editor" = 3+2+3 = 8, "photo" = 2,
    # "edit" = 1.
    docs = _doc(spark, "fast photo editor. edit the photo")
    got = {
        (r.phrase, r.score, r.rnk)
        for r in rake.rake_topk(docs, top_n=5).collect()
    }
    assert got == {
        ("fast photo editor", 8.0, 1),
        ("photo", 2.0, 2),
        ("edit", 1.0, 3),
    }


def test_long_phrases_feed_degrees_but_are_not_emitted(spark):
    # The 4-token phrase exceeds max_tokens=3 so it never appears in
    # the output, but its tokens still raise 'photo's degree — the
    # reference filters get_ranked_phrases() AFTER scoring.
    docs = _doc(spark, "big fast photo editor suite. the photo")
    out = rake.rake_topk(docs, top_n=5, max_tokens=3).collect()
    phrases = {r.phrase for r in out}
    assert phrases == {"photo"}
    # photo: freq 2, deg 5 + 1 = 6 → word score 3 → phrase score 3.
    assert {(r.phrase, r.score) for r in out} == {("photo", 3.0)}


def test_duplicate_phrases_collapse_to_one_row(spark):
    docs = _doc(spark, "photo editor and photo editor")
    out = rake.rake_topk(docs, top_n=5).collect()
    assert len(out) == 1
    r = out[0]
    # photo/editor each: freq 2, deg 4 → score 2; phrase = 4.
    assert (r.phrase, r.score, r.rnk) == ("photo editor", 4.0, 1)
