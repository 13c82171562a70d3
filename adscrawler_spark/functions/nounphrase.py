"""POS-lite noun-phrase keyword extraction — the engine's
approximation of the reference's spaCy extractor.

Reference: /root/reference/adscrawler/app_stores/process_keywords.py
:164-193 ``extract_keywords_spacy`` — spaCy ``doc.noun_chunks``
filtered to alpha roots, ≤ ``max_tokens`` tokens, NO stopword token
anywhere in the chunk (NLTK english ∪ CUSTOM_STOPWORDS), then
frequency-ranked top-``top_n`` per document.

The spaCy model is a download this environment lacks, so the chunker
is approximated with the classic shallow-chunking observation the
reference's own filter already enforces: a surviving noun chunk is a
maximal stopword-free token run (determiners/pronouns/conjunctions
are all stopwords, so chunk boundaries and stopword boundaries
coincide), and a base NP always ENDS at its noun head — so runs whose
final token is a known adjective/adverb (an embedded table standing
in for the POS tagger) cannot be noun chunks and are dropped.  This
is a documented approximation: an out-of-table adjective tail (or a
noun-tailed verb phrase) diverges from real POS tagging.

Ranking is deterministic: frequency desc, then phrase asc (the
reference's ``Counter.most_common`` breaks ties by insertion order,
which is corpus-order-dependent; the engine pins the tie-break).

Engine shape: the whole computation is document-local algebra, same
as RAKE — phrases fold out of the token array with ``aggregate``,
counts/ranks are higher-order expressions, and the plan is one
codegen'd projection + a posexplode: ZERO exchanges, embarrassingly
parallel at any scale (pinned by tests/test_plan_hygiene.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from adscrawler_spark.functions.rake import RAKE_STOPWORDS

# The reference's chunk filter drops a chunk when ANY token is a
# stopword — testing ``token.is_stop`` (spaCy's list) OR membership in
# NLTK-english ∪ CUSTOM_STOPWORDS (process_keywords.py:172,186).  The
# engine's base set is the NLTK ∪ CUSTOM union RAKE already embeds;
# this supplement covers the frequently-hit members of spaCy's
# is_stop list that NLTK lacks (a documented partial embedding — the
# full spaCy list is ~326 words).
SPACY_EXTRA_STOPWORDS = frozenset({
    "also", "another", "anyone", "anything", "anywhere", "become",
    "becomes", "came", "cannot", "could", "either", "else",
    "enough", "even", "ever", "every", "everyone", "everything",
    "everywhere", "get", "give", "go", "goes", "keep", "least",
    "less", "made", "make", "many", "may", "might", "move", "must",
    "neither", "never", "next", "nobody", "none", "nothing", "often",
    "per", "please", "put", "quite", "rather", "really", "say",
    "see", "seem", "seems", "several", "show", "side", "since",
    "sometimes", "somewhere", "still", "take", "thereby", "though",
    "thus", "top", "toward", "towards", "upon", "used", "using",
    "various", "via", "well", "whatever", "whenever", "wherever",
    "whether", "within", "without", "would", "yet",
})

NOUN_PHRASE_STOPWORDS = sorted(
    set(RAKE_STOPWORDS) | SPACY_EXTRA_STOPWORDS
)

# POS-lite stand-in for the tagger: frequent English adjectives /
# adverbs that end stopword-free runs in store-listing copy but can
# never head a noun chunk.  Words already in the stopword set are
# simply redundant here.
NON_NOUN_TAILS = sorted({
    "amazing", "anytime", "anywhere", "automatically", "awesome",
    "beautiful", "best", "better", "big", "cool", "different",
    "directly", "easily", "easy", "exciting", "fast", "favorite",
    "free", "fresh", "fun", "good", "great", "happy", "huge",
    "incredible", "instant", "instantly", "little", "new", "nice",
    "perfect", "popular", "powerful", "quick", "quickly", "safe",
    "secure", "simple", "simply", "small", "smart", "special",
    "together", "unique", "unlimited",
})


def _sql_str_array(words: list[str]) -> str:
    return "array(" + ", ".join(
        "'" + w.replace("'", "\\'") + "'" for w in words
    ) + ")"


def noun_phrase_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 10,
    max_tokens: int = 3,
) -> DataFrame:
    """Top-``top_n`` noun-phrase keywords per document:
    (id, phrase, n_tokens, freq, rnk), frequency desc / phrase asc.

    Same normalization as RAKE (non-letters become sentence breaks),
    stopword-delimited runs via the ``aggregate`` fold, then the
    POS-lite tail filter, doc-local frequency counts, and an
    ``array_sort`` + ``slice`` ranking — all inside one projection.
    Per-doc cost is O(runs²) on the distinct-count step; listing
    texts are short."""
    stops_arr = _sql_str_array(list(NOUN_PHRASE_STOPWORDS))
    tails_arr = _sql_str_array(NON_NOUN_TAILS)
    toks = (
        "filter(split(regexp_replace(lower({text}), '[^a-z ]+', ' . '),"
        " ' +'), x -> x != '')"
    ).format(text=text_col)
    runs = f"""
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
    # chunk filter: <= max_tokens tokens and a noun-ish head token
    chunks = f"""
        transform(
            filter({runs}, p ->
                size(p) <= {max_tokens}
                and not array_contains({tails_arr}, element_at(p, -1))),
            p -> array_join(p, ' '))
    """
    # let-bind the chunk array (see rake.py: CollapseProject inlines a
    # referenced-once alias into consuming lambdas — the single-element
    # transform gives real let semantics), then count doc-locally and
    # rank by (freq desc, phrase asc)
    ranked = f"""
        slice(
            array_sort(
                transform(array_distinct(ph), p -> named_struct(
                    'phrase', p,
                    'n_tokens', size(split(p, ' ')),
                    'freq', size(filter(ph, x -> x = p)))),
                (a, b) -> case
                    when a.freq > b.freq then -1
                    when a.freq < b.freq then 1
                    when a.phrase < b.phrase then -1
                    when a.phrase > b.phrase then 1
                    else 0 end),
            1, {top_n})
    """
    top = f"transform(array({chunks}), ph -> {ranked})[0]"
    # posexplode_OUTER + null filter: a non-outer Generate makes
    # InferFiltersFromGenerate duplicate the whole tower into a
    # pushed-down filter that runs serial below the spread
    # repartition (see rake.py for the measured profile); the outer
    # form + post-generate ordinal filter is row-identical.
    return (
        docs.select(id_col, F.expr(top).alias("top"))
        .select(id_col, F.posexplode_outer("top").alias("pos", "s"))
        .filter(F.col("pos").isNotNull())
        .select(
            id_col,
            F.col("s.phrase").alias("phrase"),
            F.col("s.n_tokens").alias("n_tokens"),
            F.col("s.freq").alias("freq"),
            (F.col("pos") + 1).alias("rnk"),
        )
    )


def py_noun_phrase_topk(
    text: str, top_n: int = 10, max_tokens: int = 3
) -> list[tuple[str, int, int, int]]:
    """Pure-python restatement (parity twin for tests): returns
    [(phrase, n_tokens, freq, rnk)] with the same normalization,
    chunk filter, and deterministic ranking."""
    import re
    from collections import Counter

    stops = set(NOUN_PHRASE_STOPWORDS)
    tails = set(NON_NOUN_TAILS)
    toks = [
        t for t in re.sub(r"[^a-z ]+", " . ", text.lower()).split(" ")
        if t
    ]
    runs: list[list[str]] = []
    cur: list[str] = []
    for t in toks:
        if t == "." or t in stops:
            if cur:
                runs.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        runs.append(cur)
    kept = [
        " ".join(r) for r in runs
        if len(r) <= max_tokens and r[-1] not in tails
    ]
    counts = Counter(kept)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [
        (p, len(p.split(" ")), c, i + 1)
        for i, (p, c) in enumerate(ranked[:top_n])
    ]
