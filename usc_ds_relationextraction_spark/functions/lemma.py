"""Deterministic rule lemmatizer.

The reference lemmatizes via NLTK WordNet with a process-global memo
(``code/DataProcessor/Feature/token_feature.py:8-25``): only pure-alpha
tokens, only for N*/V* POS.  NLTK is not available here, and the tokenizer
is pluggable anyway (SURVEY.md §7.4(1)), so we ship a pure rule lemmatizer
with the *same gating semantics*: non-alpha tokens pass through unchanged,
N* gets noun rules, V* gets verb rules, all other POS pass through.

Executor-local memoization mirrors the reference's ``cached`` dict — the
dictionary lives at module scope so every Arrow batch on an executor
re-uses it (the reference's exact trick, re-expressed).
"""

from __future__ import annotations

import re

_ALPHA = re.compile(r"[a-zA-Z]+$")
_cache: dict[str, str] = {}

# small irregular tables (closed lists, public knowledge)
_IRREG_N = {
    "men": "man", "women": "woman", "children": "child", "people": "person",
    "feet": "foot", "teeth": "tooth", "mice": "mouse", "geese": "goose",
}
_IRREG_V = {
    "was": "be", "were": "be", "is": "be", "are": "be", "been": "be",
    "am": "be", "has": "have", "had": "have", "did": "do", "done": "do",
    "went": "go", "gone": "go", "ran": "run", "met": "meet", "grew": "grow",
    "said": "say", "made": "make", "took": "take", "got": "get",
    "left": "leave", "filed": "file", "found": "find",
}
_VOWELS = set("aeiou")


def _noun_lemma(w: str) -> str:
    lw = w.lower()
    if lw in _IRREG_N:
        return _IRREG_N[lw]
    if lw.endswith("ies") and len(lw) > 4:
        return w[:-3] + "y"
    if lw.endswith(("ses", "xes", "zes", "ches", "shes")):
        return w[:-2]
    if lw.endswith("ss") or len(lw) <= 2:
        return w
    if lw.endswith("s"):
        return w[:-1]
    return w


def _verb_lemma(w: str) -> str:
    lw = w.lower()
    if lw in _IRREG_V:
        return _IRREG_V[lw]
    if lw.endswith("ies") and len(lw) > 4:
        return w[:-3] + "y"
    if lw.endswith("es") and len(lw) > 3:
        return w[:-2] if lw.endswith(("ches", "shes", "sses", "xes", "zes")) else w[:-1]
    if lw.endswith("s") and not lw.endswith("ss") and len(lw) > 2:
        return w[:-1]
    if lw.endswith("ing") and len(lw) > 4:
        stem = w[:-3]
        if len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1].lower() not in _VOWELS:
            stem = stem[:-1]  # running -> run
        elif _needs_e(stem):
            stem = stem + "e"  # making -> make
        return stem
    if lw.endswith("ed") and len(lw) > 3:
        stem = w[:-2]
        if len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1].lower() not in _VOWELS:
            stem = stem[:-1]  # stopped -> stop
        elif _needs_e(stem):
            stem = stem + "e"  # decided -> decide
        return stem
    return w


def _needs_e(stem: str) -> bool:
    """CVC-ish heuristic: join->join (no), decid->decide (yes)."""
    ls = stem.lower()
    return (len(ls) >= 2 and ls[-1] not in _VOWELS and ls[-1] not in "wxy"
            and ls[-2] in _VOWELS and (len(ls) < 3 or ls[-3] not in _VOWELS))


def get_lemma(word: str, pos: str) -> str:
    """Same contract as the reference ``get_lemma``: memoized on
    ``word_pos``; identity for non-alpha; noun/verb rules by POS prefix."""
    key = word + "_" + pos
    hit = _cache.get(key)
    if hit is not None:
        return hit
    if _ALPHA.match(word) is None:
        _cache[key] = word
        return word
    lemma = word
    if pos.startswith("N"):
        lemma = _noun_lemma(word)
    elif pos.startswith("V"):
        lemma = _verb_lemma(word)
    _cache[key] = lemma
    return lemma
