"""Address → ISO alpha-2 country resolution (SURVEY.md P11).

Reproduces the reference's resolution order
(/root/reference/adscrawler/app_stores/utils.py:15-103):
1. hard-coded alias substrings (south korea, usa, uk, …),
2. longest-first full-name substring match across languages,
3. right-to-left token scan (countries usually end an address),
all over a broadcast-sized name table.  Vectorized pandas UDF with
per-batch memoization over unique addresses.

The name table is a compact public ISO-3166 subset (the reference
loads an equivalent table from its database)."""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# alpha2 -> (alpha3, names in several languages)
_COUNTRIES: dict[str, tuple[str, list[str]]] = {
    "US": ("USA", ["united states", "estados unidos", "états-unis"]),
    "GB": ("GBR", ["united kingdom", "great britain", "reino unido"]),
    "KR": ("KOR", ["korea", "corée", "corea"]),
    "JP": ("JPN", ["japan", "japon", "japón", "日本"]),
    "CN": ("CHN", ["china", "chine", "中国"]),
    "DE": ("DEU", ["germany", "deutschland", "allemagne", "alemania"]),
    "FR": ("FRA", ["france", "francia", "frankreich"]),
    "ES": ("ESP", ["spain", "españa", "espagne", "spanien"]),
    "IT": ("ITA", ["italy", "italia", "italie", "italien"]),
    "NL": ("NLD", ["netherlands", "nederland", "pays-bas", "países bajos"]),
    "SE": ("SWE", ["sweden", "sverige", "suède", "suecia"]),
    "IN": ("IND", ["india", "inde", "indien"]),
    "BR": ("BRA", ["brazil", "brasil", "brésil", "brasilien"]),
    "MX": ("MEX", ["mexico", "méxico", "mexique"]),
    "CA": ("CAN", ["canada", "canadá"]),
    "AU": ("AUS", ["australia", "australie", "australien"]),
    "RU": ("RUS", ["russia", "россия", "russie", "rusia"]),
    "TR": ("TUR", ["turkey", "türkiye", "turquie", "turquía"]),
    "VN": ("VNM", ["vietnam", "viet nam", "việt nam"]),
    "SG": ("SGP", ["singapore", "singapour", "singapur"]),
}

ALIASES: dict[str, str] = {
    "korea, south": "KR",
    "south korea": "KR",
    "republic of korea": "KR",
    "usa": "US",
    "united states of america": "US",
    "uk": "GB",
    "united kingdom": "GB",
}


def build_name_map() -> dict[str, str]:
    """lowercase-name/alpha-code → alpha2 (utils.py:15-34 analog)."""
    out: dict[str, str] = {}
    for a2, (a3, names) in _COUNTRIES.items():
        out[a2] = a2
        out[a3] = a2
        for n in names:
            out[n.lower()] = a2
    return out


_NAME_MAP = build_name_map()
_NAMES_BY_LEN = sorted(_NAME_MAP.items(), key=lambda kv: -len(kv[0]))
_TOKEN = re.compile(r"\b\w+\b", re.UNICODE)


def guess_country(address: str | None) -> str | None:
    """Per-row resolution (shared data, independent of the UDF body —
    used as the oracle in tests)."""
    if not address or not address.strip():
        return None
    low = address.lower()
    for alias, a2 in ALIASES.items():
        if alias in low:
            return a2
    for name, a2 in _NAMES_BY_LEN:
        if name in low:
            return a2
    for token in reversed(_TOKEN.findall(address.upper())):
        if token in _NAME_MAP:
            return _NAME_MAP[token]
    return None


@pandas_udf(StringType())
def resolve_country(addresses: pd.Series) -> pd.Series:
    uniq = {a: guess_country(a) for a in addresses.dropna().unique()}
    return addresses.map(uniq).astype(object).where(addresses.notna(), None)
