"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Everything is a JVM column expression over whitespace tokens with integer
outputs → exact DuckDB oracles and zero Python in the hot path.  (A BPE-ish
regex tokenizer variant is included for token counting; it is a pure
regexp_extract_all, still JVM-side.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h64

# closed stopword lists (public knowledge, tiny on purpose)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "a", "is", "that", "for", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "les", "des", "en", "du", "que"],
    "de": ["der", "die", "und", "das", "in", "den", "von", "zu", "mit", "ist"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "不", "人", "这"],
}
LANGS = sorted(STOPWORDS)

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(text: Column | str) -> Column:
    # coalesce: NULL text tokenizes to the EMPTY array so every derived
    # metric is a well-defined 0 (not NULL) — split(NULL) would propagate
    # NULL through size()/comparisons under ANSI semantics and diverge
    # from the DuckDB twins' CASE-WHEN zeros (same null-text contract as
    # the dedup shingle path)
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.coalesce(c, F.lit("")), " "),
                    lambda t: t != "")


def _stop_count(toks: Column, words: list[str]) -> Column:
    ws = tuple(words)

    def is_stop(t: Column) -> Column:
        return F.lower(t).isin(*ws)

    return F.size(F.filter(toks, is_stop))


def stopword_votes(toks: Column) -> dict[str, Column]:
    """Per-language stopword hit counts."""
    return {lang: _stop_count(toks, words)
            for lang, words in STOPWORDS.items()}


def _lang_pred(toks: Column) -> tuple[Column, Column, dict[str, Column]]:
    """(lang_pred, best_votes, votes) expressions over a token array.
    Argmax stopword votes; deterministic tie-break on language code;
    'und' (undetermined) when no stopword hits at all."""
    votes = stopword_votes(toks)
    best = F.greatest(*[votes[lg] for lg in LANGS])
    pred = F.lit("und")
    for lg in reversed(LANGS):  # earlier langs win ties → apply in reverse
        pred = F.when(votes[lg] == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return pred, best, votes


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc language prediction (see :func:`_lang_pred`)."""
    toks = ws_tokens(text_col)
    pred, best, votes = _lang_pred(toks)
    sel = [F.col("doc_id"), pred.alias("lang_pred"),
           best.cast("int").alias("best_votes")]
    sel += [votes[lg].cast("int").alias(f"v_{lg}") for lg in LANGS]
    return docs.select(*sel)


def _quality_parts(toks: Column) -> dict[str, Column]:
    """Named integer quality expressions over a token array.

    score = 400*stop_ratio + 300*distinct_ratio + 200*len_ok + 100*punct_ok
    (all ratios in milli-units, bounded — a simple, documented heuristic
    in the Gopher/C4 filter family.)
    """
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    all_stop = None
    for lg in LANGS:
        v = stopword_votes(toks)[lg]
        all_stop = v if all_stop is None else all_stop + v
    n_punct = F.size(F.filter(toks, lambda t: ~t.rlike("[A-Za-z0-9]")))
    sum_len = F.aggregate(toks, F.lit(0),
                          lambda acc, t: acc + F.length(t))
    # floor(double division): exact for these magnitudes and identical in
    # DuckDB (Column has no // operator; integer `div` truncation would
    # also work but floor-of-double keeps the SQL twins one-to-one)
    stop_milli = F.when(n_tok > 0,
                        F.floor(all_stop * 1000 / n_tok)).otherwise(0)
    dist_milli = F.when(n_tok > 0,
                        F.floor(n_distinct * 1000 / n_tok)).otherwise(0)
    len_ok = ((n_tok >= 10) & (n_tok <= 1000)).cast("int")
    punct_ok = F.when(n_tok > 0,
                      (F.floor(n_punct * 1000 / n_tok) < 300).cast("int")
                      ).otherwise(0)
    score = (F.floor(stop_milli * 400 / 1000)
             + F.floor(dist_milli * 300 / 1000)
             + len_ok * 200 + punct_ok * 100)
    return {
        "n_tokens": n_tok.cast("int"),
        "n_distinct": n_distinct.cast("int"),
        "n_stop": all_stop.cast("int"),
        "n_punct": n_punct.cast("int"),
        "sum_tok_len": sum_len.cast("int"),
        "stop_milli": stop_milli.cast("bigint"),
        "distinct_milli": dist_milli.cast("bigint"),
        "quality_milli": score.cast("bigint"),
    }


def quality_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer quality components + composite milli-score
    (see :func:`_quality_parts` for the formula)."""
    parts = _quality_parts(ws_tokens(text_col))
    return docs.select(
        "doc_id", *[c.alias(n) for n, c in parts.items()])


def filter_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-doc filter inputs: ``lang_pred`` + ``quality_milli``
    + ``ws_tokens`` in a SINGLE projection.

    The naive composition (``lang_id ⋈ quality_metrics ⋈ token_counts``
    on doc_id) re-scans the corpus three times and shuffles per-doc rows
    twice; every input here is row-local, so this is one scan and zero
    shuffles — the shape a 100 TB quality gate needs."""
    toks = ws_tokens(text_col)
    pred, _, _ = _lang_pred(toks)
    parts = _quality_parts(toks)
    return docs.select(
        "doc_id", pred.alias("lang_pred"),
        parts["quality_milli"].alias("quality_milli"),
        parts["n_tokens"].alias("ws_tokens"))


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts (token-budget accounting)."""
    toks = ws_tokens(text_col)
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)
    return docs.select(
        "doc_id",
        F.size(toks).cast("int").alias("ws_tokens"),
        F.size(bpe).cast("int").alias("bpe_tokens"),
        F.length(text_col).cast("int").alias("chars"))


def fingerprint(docs: DataFrame, text_col: str = "text",
                k: int = 4, gram: int = 8) -> DataFrame:
    """k-min document fingerprint over character n-grams (winnowing-lite;
    reference analog: content signatures for dedup/lineage)."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {gram - 1}, 1)),"
        f" i -> substring({text_col}, i, {gram}))")
    cols = [_salted_min(grams, f"|fp{j}").alias(f"fp{j}") for j in range(k)]
    return docs.select("doc_id", *cols)


def _salted_min(grams: Column, salt: str) -> Column:
    """min over grams of ``h64(gram || salt)``; -1 when no grams.  (Was
    the MinHash permutation family; MinHash itself moved to the affine
    token-hash mix — ``operators/dedup.py`` — but the char-gram
    fingerprint keeps the salted form: its gram count per doc is O(len)
    with no perms×grams blow-up, and the DuckDB oracle mirrors it.)

    CAUTION: HOF lambdas must take exactly the declared arity — an extra
    default-arg parameter makes PySpark bind it to the element-index
    column.  Close over the salt via this helper instead."""
    def f(s: Column) -> Column:
        return h64(F.concat(s, F.lit(salt)))
    return F.coalesce(F.array_min(F.transform(grams, f)),
                      F.lit(-1).cast("bigint"))
