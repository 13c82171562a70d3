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


# ---------------------------------------------------------------------
# Property parity vs an independent pure-Python RAKE restatement
# ---------------------------------------------------------------------

import re as _re

from hypothesis import given, settings
from hypothesis import strategies as st

from adscrawler_spark.functions.rake import RAKE_STOPWORDS


def _py_rake(text, top_n=5, max_tokens=3):
    """Sequential restatement of Rose et al. 2010 written directly from
    the paper's definition (degree/frequency word scores over all
    phrases; cap filters output only) — independent of the Spark
    expression tree."""
    stops = set(RAKE_STOPWORDS)
    toks = [t for t in _re.split(r" +", _re.sub(r"[^a-z ]+", " . ", text.lower())) if t]
    phrases, cur = [], []
    for t in toks:
        if t == "." or t in stops:
            if cur:
                phrases.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        phrases.append(cur)
    freq, deg = {}, {}
    for p in phrases:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p)
    seen = {}
    for p in phrases:
        if len(p) > max_tokens:
            continue
        phrase = " ".join(p)
        score = round(sum(deg[w] / freq[w] for w in p), 4)
        seen[phrase] = (len(p), score)
    ranked = sorted(seen.items(), key=lambda kv: (-kv[1][1], kv[0]))
    return [
        (ph, n, sc, i + 1)
        for i, (ph, (n, sc)) in enumerate(ranked[:top_n])
    ]


_WORDS = ["photo", "editor", "fast", "the", "a", "game", "it", "scan",
          "big", "row", "data", "merge", "join", ".", "2024", "x-y"]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30),
        min_size=1,
        max_size=4,
    )
)
def test_rake_matches_python_restatement(spark, docs_words):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    from adscrawler_spark.functions.rake import rake_topk

    got = {}
    for r in rake_topk(df, top_n=5, max_tokens=3).collect():
        got.setdefault(r.doc_id, []).append(
            (r.phrase, r.n_tokens, r.score, r.rnk)
        )
    for i, ws in enumerate(docs_words):
        want = _py_rake(" ".join(ws), top_n=5, max_tokens=3)
        have = sorted(got.get(i, []), key=lambda t: t[3])
        assert have == want, (i, " ".join(ws), have, want)
