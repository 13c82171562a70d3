"""Deterministic language-identification model.

The reference uses fasttext (batched) with a langdetect fallback
(/root/reference/adscrawler/app_stores/google.py:90-161, apple.py:469-487).
Neither package exists in this environment, so the engine ships a
deterministic n-gram/stopword heuristic as *the* LID model: script-block
detection for non-Latin scripts, stopword-ratio scoring for Latin ones,
``"zz"`` when nothing is confident (the reference's failure code).

This module is *model data + scoring function* shared by the Spark
pipeline (via a vectorized pandas UDF) and the pyref oracle — like the
PSL, the data is shared while the pipeline plumbing stays independent.
Chinese intentionally returns ``zh-cn`` so the pipeline's ``zh-*`` →
``zh`` collapse (google.py:241-243, apple.py:485-487) is exercised.
"""

from __future__ import annotations

import re

STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the and of to in is you that it for are with as was on be at by "
        "this have from or one had not but what all were when we there can "
        "an your which their will more about".split()
    ),
    "es": frozenset(
        "el la de que y en los se del las por un para con no una su al es "
        "lo como más pero sus le ya o este sí porque esta entre cuando muy "
        "sobre también hasta donde quien desde todos".split()
    ),
    "fr": frozenset(
        "le de un être et à il avoir ne je son que se qui ce dans en du "
        "elle au pour pas vous par sur faire plus dire me on mon lui nous "
        "comme mais avec tout y aller voir bien où sans".split()
    ),
    "de": frozenset(
        "der die und in den von zu das mit sich des auf für ist im dem "
        "nicht ein eine als auch es an werden aus er hat dass sie nach "
        "wird bei einer um am sind noch wie einem über".split()
    ),
    "pt": frozenset(
        "o a de que e do da em um para é com não uma os no se na por mais "
        "as dos como mas foi ao ele das tem à seu sua ou ser quando muito "
        "há nos já está eu também só pelo pela até isso".split()
    ),
    "it": frozenset(
        "di e il la che è per un in una sono mi si lo ma le ci come io "
        "questo qui hanno tutto del non più anche con ha mio era se della "
        "nel cosa questa molto fare".split()
    ),
    "nl": frozenset(
        "de het een en van ik te dat die in je niet zijn is was op aan "
        "met als voor had er maar om hem dan zou of wat mijn men dit zo "
        "kan geen naar ook nog".split()
    ),
}
_LATIN_ORDER = sorted(STOPWORDS)  # deterministic tie-break

_SCRIPTS: list[tuple[str, re.Pattern[str]]] = [
    ("zh-cn", re.compile(r"[一-鿿]")),
    ("ja", re.compile(r"[぀-ヿ]")),
    ("ko", re.compile(r"[가-힯]")),
    ("ru", re.compile(r"[Ѐ-ӿ]")),
    ("ar", re.compile(r"[؀-ۿ]")),
    ("hi", re.compile(r"[ऀ-ॿ]")),
    ("el", re.compile(r"[Ͱ-Ͽ]")),
    ("he", re.compile(r"[֐-׿]")),
    ("th", re.compile(r"[฀-๿]")),
]

_TOKEN = re.compile(r"[^\W\d_]+", re.UNICODE)
MIN_RATIO = 0.08


def prep_snippet(text: str | None, max_chars: int = 300) -> str:
    """Reference prep (google.py:130-140): 300-char prefix, whitespace
    collapsed to single spaces, stripped."""
    if text is None:
        return ""
    return re.sub(r"\s+", " ", str(text)[:max_chars]).strip()


def detect(text: str) -> str:
    """Language code for a prepped snippet; 'zz' when unknown."""
    if not text:
        return "zz"
    # Non-Latin scripts: majority script block wins (ja kana beats the
    # kanji-shared zh block, so test ja before zh-cn dominance).
    counts = {lang: len(rx.findall(text)) for lang, rx in _SCRIPTS if True}
    total_chars = len(text)
    if counts.get("ja", 0) > 0 and counts["ja"] >= 0.1 * total_chars:
        return "ja"
    best_script = max(counts, key=lambda k: (counts[k], k))
    if counts[best_script] >= 0.3 * total_chars:
        return best_script
    tokens = [t.lower() for t in _TOKEN.findall(text)]
    if not tokens:
        return "zz"
    best_lang, best_ratio = "zz", 0.0
    for lang in _LATIN_ORDER:
        ratio = sum(1 for t in tokens if t in STOPWORDS[lang]) / len(tokens)
        if ratio > best_ratio:
            best_lang, best_ratio = lang, ratio
    return best_lang if best_ratio >= MIN_RATIO else "zz"
