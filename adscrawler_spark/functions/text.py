"""Vectorized text functions (SURVEY.md P7/P8/P16).

Only two need Python (byte-exact UTF-8 truncation and the LID model);
both are Arrow-vectorized pandas UDFs. Keyword text cleaning (P16) is a
pure JVM ``regexp_replace`` chain.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from adscrawler_spark.functions import langmodel

UTF8_MAX_BYTES = 2400


def truncate_utf8_series(s: pd.Series, max_bytes: int = UTF8_MAX_BYTES) -> pd.Series:
    """Byte-cap a string Series at a valid UTF-8 boundary.

    Reference loops dropping bytes until decode succeeds
    (/root/reference/adscrawler/app_stores/utils.py:106-117); on valid
    UTF-8 input that is exactly byte-slice + decode(errors='ignore'),
    which vectorizes. None → '' per the reference."""
    out = s.fillna("").astype(object)
    enc = out.map(lambda v: v.encode("utf-8"))
    needs = enc.map(len) > max_bytes
    if needs.any():
        out.loc[needs] = enc[needs].map(
            lambda b: b[:max_bytes].decode("utf-8", errors="ignore")
        )
    return out


@pandas_udf(StringType())
def truncate_utf8(s: pd.Series) -> pd.Series:
    return truncate_utf8_series(s)


@pandas_udf(StringType())
def detect_language(descriptions: pd.Series) -> pd.Series:
    """Batched LID over prepped snippets (P8). Memoized per unique
    snippet within the Arrow batch; 'zz' on empty/unknown."""
    snippets = descriptions.map(langmodel.prep_snippet)
    uniq = {t: langmodel.detect(t) for t in snippets.unique()}
    return snippets.map(uniq)


def clean_keyword_text(col: Column | str) -> Column:
    """P16 text normalization for keyword extraction — pure Spark chain
    per /root/reference/adscrawler/process/process_keywords.py:81-115:
    control/bullet runs → '. ', apostrophes stripped, URLs removed,
    non-alpha runs → '.', collapse repeats."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[\r\n\t\xa0•]+", ". ")
    c = F.regexp_replace(c, r"['’]", "")
    c = F.regexp_replace(c, r"https?://\S+", " ")
    c = F.regexp_replace(c, r"[^A-Za-z\s]+", ".")
    c = F.regexp_replace(c, r"\.[\s\.]*\.", ". ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def normalize_keyword(col: Column | str) -> Column:
    """Search-term normalization for the keywords table (reference
    insert_new_keywords.sql:6-34): lowercase, quotes/plus → space,
    whitespace collapsed, trimmed.  Validity (non-empty, not a pure
    number group, ≤255 chars) is a separate predicate —
    ``keyword_is_valid`` — so callers can count rejects."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.replace(c, F.lit('"'), F.lit(" "))
    c = F.replace(c, F.lit("+"), F.lit(" "))
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def keyword_is_valid(col: Column | str) -> Column:
    """insert_new_keywords.sql:31-34 exclusions: empty after
    normalization, pure digits, digit/space groups, >255 chars."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        (c != "")
        & ~c.rlike(r"^\d+$")
        & ~c.rlike(r"^[\d\s]+$")
        & (F.length(c) <= 255)
    )
