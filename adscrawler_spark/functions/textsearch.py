"""Full-text search over name/description columns — the engine's
counterpart to the reference's Postgres ``tsvector`` surface.

The reference declares generated tsvector columns + GIN indexes with
the ``'simple'`` text-search config (no stemming, no stopwords) over
app and developer names, and a description tsvector:
/root/reference/pg-ddl/schema/public/store_apps.sql:58,109,144,
/root/reference/pg-ddl/schema/public/developers.sql:37,77,91,
/root/reference/pg-ddl/schema/public/store_apps_descriptions.sql:38.
No SQL in the repo queries them directly (the search API lives outside
the crawler), so the semantics implemented here are the Postgres
primitives the index exists to serve:

* ``to_tsvector('simple', col)``  → :func:`simple_lexemes` /
  :func:`tsvector_rows` — lowercase, split on non-alphanumeric runs,
  keep every token (no stopword list in 'simple'), record 1-based
  positions.  Deviation, documented: tokenization is ASCII
  ``[a-z0-9]`` (Postgres 'simple' is locale/Unicode-aware); the
  synthetic corpus is ASCII so the outputs coincide.
* the GIN index             → :func:`build_postings` — an inverted
  posting-list table (lexeme, id, nentry, doc_len), bucket column for
  lexeme-partitioned writes so a 100 TB corpus prunes to the buckets
  a query's terms hash into.
* ``plainto_tsquery`` match + rank → :func:`search` /
  :func:`search_postings` — AND semantics (every query lexeme must
  appear), deterministic rank = total query-term occurrences divided
  by document lexeme count (a ts_rank-like length-normalized term
  frequency, chosen over ts_rank's positional weighting so the oracle
  stays ANSI-SQL-expressible; both plans below are verified against
  the same DuckDB oracle).

Scale notes: the brute path is one scan + per-row array ops (no
shuffle until the top-k); the posting path is the 100 TB design —
build once, write partitioned by ``lexeme_bucket``, and a query scans
only the matching buckets (partition pruning on a first-class column)
then hash-aggregates doc_ids.  Neither path ever leaves the JVM.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tokenizer spec shared with the DuckDB oracles and the pyref parity
# model: lowercase → split on /[^a-z0-9]+/ → drop empties → 1-based
# positions over the *filtered* sequence.
_SEP_RE = "[^a-z0-9]+"
DEFAULT_BUCKETS = 64


def simple_lexemes(col) -> F.Column:
    """Array of lexemes for ``to_tsvector('simple', col)`` order-
    preserved (duplicates kept — positions/counts need them)."""
    return F.filter(
        F.split(F.lower(col), _SEP_RE), lambda x: x != F.lit("")
    )


def py_simple_lexemes(text: str) -> list[str]:
    """Driver/test-side reference model of the same tokenizer."""
    return [t for t in re.split(_SEP_RE, text.lower()) if t]


def tsvector_rows(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, lexeme, pos) rows — the tsvector as a relation.

    ``pos`` is the 1-based token position, the same ordinal Postgres
    stores per lexeme; ``group by id, lexeme`` + ``collect_list(pos)``
    reproduces the tsvector's position list exactly.
    """
    return df.select(
        F.col(id_col),
        F.posexplode(simple_lexemes(F.col(text_col))).alias(
            "pos0", "lexeme"
        ),
    ).select(
        id_col, "lexeme", (F.col("pos0") + F.lit(1)).alias("pos")
    )


def build_postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """GIN-analogue inverted index: one row per (lexeme, document).

    Columns: lexeme, <id_col>, nentry (occurrences of the lexeme in
    the document), doc_len (total lexemes in the document — carried
    denormalized so ranking never rejoins the corpus), lexeme_bucket
    (hash bucket for ``partitionBy("lexeme_bucket")`` writes; a query
    touches only the buckets its terms hash into).
    """
    lex = df.select(
        F.col(id_col), simple_lexemes(F.col(text_col)).alias("ls")
    ).select(
        id_col,
        F.size("ls").alias("doc_len"),
        F.explode("ls").alias("lexeme"),
    )
    return (
        lex.groupBy("lexeme", id_col, "doc_len")
        .agg(F.count("*").alias("nentry"))
        .withColumn(
            "lexeme_bucket",
            F.pmod(F.xxhash64("lexeme"), F.lit(n_buckets)).cast("int"),
        )
    )


def _query_lexemes(query: str) -> list[str]:
    """plainto_tsquery('simple', query): tokenize, dedupe, AND-join."""
    out: list[str] = []
    for t in py_simple_lexemes(query):
        if t not in out:
            out.append(t)
    return out


def search(
    df: DataFrame, id_col: str, text_col: str, query: str
) -> DataFrame:
    """Brute-scan plainto AND search: (id, rank).

    Every distinct query lexeme must appear; rank = (total query-term
    occurrences) / doc_len, rounded to 4.  One corpus scan, per-row
    JVM array ops, no shuffle.
    """
    terms = _query_lexemes(query)
    if not terms:
        raise ValueError("empty query after tokenization")
    out = df.select(
        F.col(id_col), simple_lexemes(F.col(text_col)).alias("ls")
    )
    def _match(term: str):
        # single-arg lambda on purpose: a two-arg lambda would be
        # read by F.filter as (element, index)
        return lambda x: x == F.lit(term)

    hits = None
    total = F.lit(0).cast("long")
    for i, t in enumerate(terms):
        cnt = F.size(F.filter("ls", _match(t))).alias(f"n{i}")
        out = out.withColumn(f"n{i}", cnt)
        cond = F.col(f"n{i}") > 0
        hits = cond if hits is None else (hits & cond)
        total = total + F.col(f"n{i}")
    return out.filter(hits).select(
        id_col, F.round(total / F.size("ls"), 4).alias("rank")
    )


def search_postings(
    postings: DataFrame, id_col: str, query: str
) -> DataFrame:
    """Index-path plainto AND search over :func:`build_postings`
    output: same (id, rank) relation as :func:`search`.

    Filters the posting table to the query's lexemes (on a
    lexeme-partitioned lake table this prunes to ≤len(terms)
    buckets), then one hash aggregation: a doc matches when it holds
    all terms; rank sums nentry over terms / doc_len.
    """
    terms = _query_lexemes(query)
    if not terms:
        raise ValueError("empty query after tokenization")
    return (
        postings.filter(F.col("lexeme").isin(terms))
        .groupBy(id_col, "doc_len")
        .agg(
            F.countDistinct("lexeme").alias("_nterms"),
            F.sum("nentry").alias("_total"),
        )
        .filter(F.col("_nterms") == F.lit(len(terms)))
        .select(
            id_col,
            F.round(
                F.col("_total") / F.col("doc_len"), 4
            ).alias("rank"),
        )
    )
