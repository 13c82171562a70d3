"""RAKE keyword extraction, Spark-first.

The reference ensembles three per-description keyword extractors
(/root/reference/adscrawler/app_stores/process_keywords.py:243-272
``extract_keywords_rake`` via rake_nltk, plus spaCy noun-chunks and an
NLTK lemma ranker).  spaCy/NLTK need model downloads this environment
doesn't have, and the repo already ports the TF-IDF vectorizer config;
this module ports the one member that is pure algorithm — RAKE (Rapid
Automatic Keyword Extraction, Rose et al. 2010) — as JVM-side
DataFrame ops, no UDF:

1. normalize: lowercase; every run of characters outside ``[a-z ]``
   becomes a ``' . '`` break marker (punctuation/digits break phrases,
   mirroring the reference's ``clean_text`` ladder that turns
   non-alpha runs into periods, process_keywords.py:64-77);
2. candidate phrases: maximal token runs between breaks, where a break
   is the ``'.'`` marker or a stopword (rake_nltk's
   ``extract_keywords_from_text``);
3. per-document word stats over ALL phrases: ``freq(w)`` = occurrence
   count, ``deg(w)`` = sum of the containing phrase's length per
   occurrence (the word co-occurs with itself, so deg ≥ freq);
4. phrase score = Σ over its tokens (with multiplicity) of
   ``deg(w)/freq(w)``; equal phrases in one document collapse to one
   ranked row;
5. the max-token cap filters the RANKED OUTPUT only — exactly the
   reference's post-hoc ``count_tokens(phrase) <= max_tokens`` filter
   on ``get_ranked_phrases()`` (process_keywords.py:255-259), so a
   long phrase still contributes to word degrees even when it can't be
   emitted itself.

Scale shape: every step keys on doc_id (token windows, phrase groups,
word stats) — one hash partitioning reused end to end, no global
state, no collect.  The stopword set is a literal in the plan (a few
hundred strings), not a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# The reference's curated stopwords (process_keywords.py:22-61),
# verbatim.
CUSTOM_STOPWORDS = {
    "your", "our", "my", "their", "his", "her", "its", "what", "which",
    "you", "it", "that", "app", "we", "application", "one", "ones",
    "dont", "us", "takes", "take", "them", "use", "uses", "need",
    "get", "who", "i", "also", "youll", "youre", "whos", "whats",
    "lets", "let", "set", "com", "game",
}

# ``nltk.corpus.stopwords.words('english')`` inlined verbatim (the
# reference unions it in, process_keywords.py:251; the corpus file is
# a static public 179-word list, so no download is needed).  The
# apostrophe forms ("you're", "don't", ...) can never match a token —
# the normalizer maps [^a-z ]+ to a break — but the bare contraction
# stems ("don", "ve", "couldn", ...) do, and they were the visible gap
# vs rake_nltk output.
CORE_ENGLISH_STOPWORDS = {
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had",
    "having", "do", "does", "did", "doing", "a", "an", "the", "and",
    "but", "if", "or", "because", "as", "until", "while", "of", "at",
    "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll",
    "m", "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn",
    "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't",
    "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't",
    "shan", "shan't", "shouldn", "shouldn't", "wasn", "wasn't",
    "weren", "weren't", "won", "won't", "wouldn", "wouldn't",
}

RAKE_STOPWORDS = sorted(CUSTOM_STOPWORDS | CORE_ENGLISH_STOPWORDS)


def candidate_phrases(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """(id, phrase_id, phrase, n_tokens) candidate phrases — maximal
    non-stopword token runs between punctuation/stopword breaks.  The
    phrase_id is the running break count, so downstream can tell two
    occurrences of the same phrase apart."""
    stops = RAKE_STOPWORDS if stopwords is None else sorted(stopwords)
    norm = F.regexp_replace(
        F.lower(F.col(text_col)), r"[^a-z ]+", " . "
    )
    toks = docs.select(
        id_col,
        F.posexplode(
            F.filter(F.split(norm, r" +"), lambda x: x != "")
        ).alias("pos", "tok"),
    )
    is_break = (F.col("tok") == ".") | F.col("tok").isin(stops)
    w = Window.partitionBy(id_col).orderBy("pos")
    grp = toks.withColumn(
        "phrase_id",
        F.sum(is_break.cast("long")).over(w),
    ).filter(~is_break)
    return grp.groupBy(id_col, "phrase_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.count("*").alias("n_tokens"),
    )


def rake_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 10,
    max_tokens: int = 3,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Top-``top_n`` RAKE phrases per document: (id, phrase, n_tokens,
    score, rnk), score rounded to 4 places, ties broken by phrase text
    so the ranking is deterministic.

    RAKE is document-local algebra, so the whole computation stays
    row-local: phrases fold out of the token array with ``aggregate``,
    word degree/frequency and phrase scores are nested higher-order
    expressions, and the per-doc ranking is an ``array_sort`` +
    ``slice``.  The physical plan is one codegen'd projection + a
    posexplode — ZERO exchanges (pinned by
    tests/test_plan_hygiene.py), embarrassingly parallel at any scale.
    An earlier relational formulation (explode → window → three keyed
    shuffles) measured 4.6 s at sf0.1; this one does no shuffle at
    all.  Per-doc cost is O(phrases × unique words) on short texts."""
    stops = RAKE_STOPWORDS if stopwords is None else sorted(stopwords)
    # Single quotes inside a stopword (NLTK's "don't", "shouldn't", …)
    # must be escaped or the embedded SQL expression breaks.
    stops_arr = (
        "array(" + ", ".join("'" + s.replace("'", "\\'") + "'" for s in stops) + ")"
    )
    toks = (
        "filter(split(regexp_replace(lower({text}), '[^a-z ]+', ' . '),"
        " ' +'), x -> x != '')"
    ).format(text=text_col)
    phrases = f"""
        aggregate(
            {toks},
            named_struct(
                'ps', cast(array() as array<array<string>>),
                'cur', cast(array() as array<string>)),
            (acc, t) -> if(
                t = '.' or array_contains({stops_arr}, t),
                named_struct(
                    'ps', if(size(acc.cur) > 0,
                             array_append(acc.ps, acc.cur), acc.ps),
                    'cur', cast(array() as array<string>)),
                named_struct(
                    'ps', acc.ps,
                    'cur', array_append(acc.cur, t))),
            acc -> if(size(acc.cur) > 0,
                      array_append(acc.ps, acc.cur), acc.ps))
    """
    # deg(w) counts every occurrence of w in every phrase weighted by
    # that phrase's length (w co-occurs with itself); freq(w) is w's
    # total occurrence count — over ALL phrases, before the token cap.
    #
    # Intermediates are let-bound via single-element transform(array(x),
    # v -> ...) so each evaluates ONCE per row.  Plain column aliases
    # don't survive: Catalyst's CollapseProject inlines a
    # referenced-once alias into the consuming lambda, re-evaluating
    # the word-score map per TOKEN — measured 12× slower end to end.
    # A lambda variable is bound to its (already evaluated) element,
    # so nesting transforms gives real let semantics.
    scores = """
        map_from_arrays(
            array_distinct(flatten(ph)),
            transform(array_distinct(flatten(ph)), w ->
                aggregate(ph, 0D, (s, p) ->
                    s + double(size(filter(p, x -> x = w)) * size(p)))
                / double(size(filter(flatten(ph), x -> x = w)))))
    """
    ranked = f"""
        slice(
            array_sort(
                array_distinct(filter(
                    transform(ph, p -> named_struct(
                        'phrase', array_join(p, ' '),
                        'n_tokens', size(p),
                        'score', round(
                            aggregate(p, 0D, (s, w) -> s + sc[w]),
                            4))),
                    s -> s.n_tokens <= {max_tokens})),
                (a, b) -> case
                    when a.score > b.score then -1
                    when a.score < b.score then 1
                    when a.phrase < b.phrase then -1
                    when a.phrase > b.phrase then 1
                    else 0 end),
            1, {top_n})
    """
    top = f"""
        transform(array({phrases}), ph ->
            transform(array({scores}), sc -> {ranked})[0])[0]
    """
    # posexplode_OUTER + explicit null filter, NOT plain posexplode:
    # for a non-outer Generate, Catalyst's InferFiltersFromGenerate
    # synthesizes `size(top) > 0 AND isnotnull(top)` and pushes it
    # below the upstream repartition by alias substitution — the
    # ENTIRE tower expression is then re-evaluated inside the filter
    # on the unspread single-partition scan (a serial 17.8s stage at
    # the 10x profile, vs the 32-wide ~1s/task projection).  The rule
    # skips outer generates; the post-generate filter on the output
    # ordinal drops exactly the rows non-outer posexplode drops
    # (null/empty arrays) and cannot be pushed below the Generate.
    return (
        docs.select(id_col, F.expr(top).alias("top"))
        .select(
            id_col,
            F.posexplode_outer("top").alias("pos", "s"),
        )
        .filter(F.col("pos").isNotNull())
        .select(
            id_col,
            F.col("s.phrase").alias("phrase"),
            F.col("s.n_tokens").alias("n_tokens"),
            F.col("s.score").alias("score"),
            (F.col("pos") + 1).alias("rnk"),
        )
    )
