"""Feature extraction library — SURVEY.md §2.3 (F1-F22).

Byte-format parity with the reference's ``code/DataProcessor/Feature/``
classes is the correctness contract (SURVEY.md §7.1): every emitted string
follows the exact reference format (``HEAD_EM1_<lemma>``,
``CTXT_EM2_LEFT_GRM_<a>_<b>``, ...).  Semantics re-derived from:

 - relation-mention features: ``token_feature.py:28-126``,
   ``other_feature.py:7-59``, ``brown_feature.py:7-25``
 - entity-mention features: ``em_token_feature.py:28-85``,
   ``em_other_feature.py:7-45``, ``em_brown_feature.py:7-25``
 - registration order + window=3: ``ner_feature.py:18-61``

Execution model: one scalar ``pandas_udf`` per mention table — Arrow
batches in, ``array<string>`` out.  Span-variable logic runs as Python
over the batch (the standard Spark-NLP pattern); the per-token lemma is
memoized executor-wide (:mod:`.lemma`), and Brown lookups hit a plain dict
broadcast via closure capture (the dictionary is tiny: SURVEY S5).

One deliberate divergence, documented: the reference's word-shape punct
collapse uses ``\\p{P}`` which Python-2 ``re`` never matched; we collapse
ASCII punctuation to ``.`` properly (SURVEY F20).  Parity is unaffected —
shape features only differ on punctuation-bearing mention tokens.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf

from .lemma import get_lemma

WINDOW = 3  # ner_feature.py:24,26,46,48
BROWN_PREFIXES = [4, 8, 12, 20]  # brown_feature.py:11

_SHAPE_LOWER = re.compile(r"[a-z]+")
_SHAPE_UPPER = re.compile(r"[A-Z]+")
_SHAPE_DIGIT = re.compile(r"[0-9]+")
_SHAPE_PUNCT = re.compile(r"[!-/:-@\[-`{-~]+")


def get_head(pos: list[str], start: int, end: int) -> int:
    """Head = last N*-tagged token in span; stop at IN/','
    (token_feature.py:31-40 / em_token_feature.py:30-39)."""
    head = end - 1
    for i in range(start, end):
        pt = pos[i]
        if pt.startswith("N"):
            head = i
        elif pt == "IN" or pt == ",":
            break
    return head


# executor-wide memo tables, same pattern as the lemma cache: token
# frequency is Zipfian, so per-batch recomputation of shape regexes /
# char-gram slices / Brown prefix emissions is dominated by repeat
# tokens.  Unbounded like the reference's own `cached` dict — size is
# the executor-local distinct-token count, vocabulary-scale not
# corpus-scale.
_shape_cache: dict[str, str] = {}
_char_cache: dict[str, list[str]] = {}
# Brown emissions depend on WHICH dictionary is in play (one worker
# process serves many UDF instances, and tests run several dicts), so
# the memo is per-dict: id(brown) → (pinning ref, lemma → emissions).
# Pinning the dict itself makes id() reuse impossible.
_brown_caches: dict[int, tuple[dict, dict[str, list[str]]]] = {}


def word_shape(token: str) -> str:
    hit = _shape_cache.get(token)
    if hit is not None:
        return hit
    r = _SHAPE_LOWER.sub("a", token)
    r = _SHAPE_UPPER.sub("A", r)
    r = _SHAPE_DIGIT.sub("0", r)
    r = _SHAPE_PUNCT.sub(".", r)
    _shape_cache[token] = r
    return r


def _char_feats(head_tok: str) -> list[str]:
    """EMCharacterFeature strings for one head token (3-grams + boundary
    bigrams), memoized per token."""
    hit = _char_cache.get(head_tok)
    if hit is not None:
        return hit
    fs: list[str] = []
    if len(head_tok) >= 3:
        for i in range(0, len(head_tok) - 2):
            fs.append("CHAR_%s" % head_tok[i:i + 3])
        fs.append("CHAR_:%s" % head_tok[:2])
        fs.append("CHAR_%s:" % head_tok[-2:])
    _char_cache[head_tok] = fs
    return fs


def _brown(lemma: str, brown: dict[str, str], out: list[str]) -> None:
    # miss path (the overwhelmingly common case — the Brown dictionary
    # covers a small vocabulary) costs exactly one dict lookup, same as
    # the unmemoized version; only HIT emissions are memoized (measured:
    # memoizing misses too made RM featurization ~30% slower)
    cluster = brown.get(lemma)
    if cluster is None:
        return
    entry = _brown_caches.get(id(brown))
    if entry is None:
        entry = (brown, {})
        _brown_caches[id(brown)] = entry
    cache = entry[1]
    hit = cache.get(lemma)
    if hit is None:
        hit = []
        for l in BROWN_PREFIXES:
            if len(cluster) >= l:
                hit.append("BROWN_%d_%s" % (l, cluster[:l]))
        hit.append("BROWN_ALL_%s" % cluster)
        cache[lemma] = hit
    out.extend(hit)


def em_features(tokens: list[str], pos: list[str], start: int, end: int,
                brown: dict[str, str],
                lem: list[str] | None = None) -> list[str]:
    """Entity-mention feature strings, registration order per
    ner_feature.py:18-38 (F14-F22).  ``lem`` lets the fused chunk UDF
    compute the sentence-wide lemma array ONCE per turn instead of once
    per chunk (~2.4 chunks/turn on this corpus)."""
    n = len(tokens)
    if lem is None:
        lem = [get_lemma(tokens[i], pos[i]) for i in range(n)]
    out: list[str] = []
    # EMHeadFeature
    h = get_head(pos, start, end)
    out.append("HEAD_%s" % lem[h])
    # EMTokenFeature
    for i in range(start, end):
        out.append("TKN_%s" % lem[i])
    # EMContextFeature(3)
    for i in range(max(0, start - WINDOW), start):
        out.append("CTXT_LEFT_%s" % lem[i])
    for i in range(end, min(n, end + WINDOW)):
        out.append("CTXT_RIGHT_%s" % lem[i])
    # EMContextGramFeature(3)
    for i in range(max(0, start - WINDOW), min(n - 1, end - 1 + WINDOW)):
        t1, t2 = lem[i], lem[i + 1]
        if start <= i < end - 1:
            out.append("GRM_%s_%s" % (t1, t2))
        elif i < start:
            out.append("CTXT_LEFT_GRM_%s_%s" % (t1, t2))
        else:
            out.append("CTXT_RIGHT_GRM_%s_%s" % (t1, t2))
    # EMPosFeature
    for i in range(start, end):
        out.append("POS_%s" % pos[i])
    # EMWordShapeFeature
    for i in range(start, end):
        out.append("SHAPE_%s" % word_shape(tokens[i]))
    # EMLengthFeature
    length = end - start
    out.append("LENGTH_%d" % length if length <= 5 else "LENGTH_>5")
    # EMCharacterFeature (head-token char 3-grams + boundary bigrams)
    out.extend(_char_feats(tokens[h]))
    # EMBrownFeature (span tokens only)
    for i in range(start, end):
        _brown(lem[i], brown, out)
    return out


def rm_features(tokens: list[str], pos: list[str],
                em1s: int, em1e: int, em2s: int, em2e: int,
                num_between: int, brown: dict[str, str],
                em_spans: list[tuple[int, int, list[str]]] | None = None,
                lem: list[str] | None = None) -> list[str]:
    """Relation-mention feature strings, registration order per
    ner_feature.py:40-61 (F1-F12).  ``lem`` lets the grouped UDF compute
    the sentence-wide lemma array ONCE per sentence instead of once per
    pair (sentences average >1 pair on a DS corpus)."""
    n = len(tokens)
    if lem is None:
        lem = [get_lemma(tokens[i], pos[i]) for i in range(n)]
    out: list[str] = []
    # HeadFeature
    h1 = get_head(pos, em1s, em1e)
    h2 = get_head(pos, em2s, em2e)
    out.append("HEAD_EM1_%s" % lem[h1])
    out.append("HEAD_EM2_%s" % lem[h2])
    # EntityMentionTokenFeature
    for i in range(em1s, em1e):
        out.append("TKN_EM1_%s" % lem[i])
    for i in range(em2s, em2e):
        out.append("TKN_EM2_%s" % lem[i])
    # BetweenEntityMentionTokenFeature (order-normalized; FIRST/LAST markers)
    bs, be = (em1e, em2s) if em1s <= em2s else (em2e, em1s)
    for i in range(bs, be):
        if i == bs:
            out.append("FIRST_TKN_BTWN_%s" % lem[i])
        if i == be - 1:
            out.append("LAST_TKN_BTWN_%s" % lem[i])
        out.append("TKN_BTWN_%s" % lem[i])
    # ContextFeature(3)
    for i in range(max(0, em1s - WINDOW), em1s):
        out.append("CTXT_EM1_LEFT_%s" % lem[i])
    for i in range(em1e, min(n, em1e + WINDOW)):
        out.append("CTXT_EM1_RIGHT_%s" % lem[i])
    for i in range(max(0, em2s - WINDOW), em2s):
        out.append("CTXT_EM2_LEFT_%s" % lem[i])
    for i in range(em2e, min(n, em2e + WINDOW)):
        out.append("CTXT_EM2_RIGHT_%s" % lem[i])
    # ContextGramFeature(3)
    for which, (ms, me) in (("EM1", (em1s, em1e)), ("EM2", (em2s, em2e))):
        for i in range(max(0, ms - WINDOW), min(n - 1, me - 1 + WINDOW)):
            t1, t2 = lem[i], lem[i + 1]
            if ms <= i < me - 1:
                out.append("GRM_%s_%s_%s" % (which, t1, t2))
            elif i < ms:
                out.append("CTXT_%s_LEFT_GRM_%s_%s" % (which, t1, t2))
            else:
                out.append("CTXT_%s_RIGHT_GRM_%s_%s" % (which, t1, t2))
    # PosFeature (between tokens, order-normalized)
    for i in range(bs, be):
        out.append("POS_%s" % pos[i])
    # EntityMentionOrderFeature
    if em1s < em2s:
        out.append("EM1_BEFORE_EM2")
    elif em1s > em2s:
        out.append("EM2_BEFORE_EM1")
    # DistanceFeature
    dist = em2s - em1e if em2s >= em1s else em1s - em2e
    out.append("DISTANCE_%d" % dist)
    # NumOfEMBetweenFeature
    out.append("NUM_EMS_BTWEEN_%d" % num_between)
    # SpecialPatternFeature
    if em1e + 1 == em2s and tokens[em1e] == "in":
        out.append("EM1_IN_EM2")
    if em2e + 1 == em1s and tokens[em2e] == "in":
        out.append("EM2_IN_EM1")
    # BrownFeature (sentence-wide, per reference brown_feature.py:18)
    for i in range(n):
        _brown(lem[i], brown, out)
    # EMTypeFeature (optional, requireEmType)
    if em_spans is not None:
        for (s, e, labels) in em_spans:
            if s == em1s and e == em1e:
                for l in labels:
                    out.append("EM1_TYPE_%s" % l)
            if s == em2s and e == em2e:
                for l in labels:
                    out.append("EM2_TYPE_%s" % l)
    return out


# ------------------------------------------------------------ UDF factories
def make_em_features_udf(brown: dict[str, str]):
    """array<string> pandas UDF over (tokens, pos, start, end)."""

    @pandas_udf("array<string>")
    def em_feats(tokens: pd.Series, pos: pd.Series,
                 start: pd.Series, end: pd.Series) -> pd.Series:
        return pd.Series([
            em_features(t, p, int(s), int(e), brown)
            for t, p, s, e in zip(tokens, pos, start, end)
        ])

    return em_feats


def make_chunk_features_udf(brown: dict[str, str]):
    """Fused chunk + featurize: (tokens, pos) →
    array<struct<start, end, surface, feats>> in ONE Arrow pass.

    Scale rationale: the per-mention UDF ships the full (tokens, pos)
    arrays once PER MENTION over Arrow (~2.4x duplication on this corpus)
    and re-derives sentence state per row.  Referencing a JVM chunk
    expression from several columns is no better — Catalyst's project
    collapse inlines (hence re-evaluates) the chunker per reference.
    Fusing the python chunker (np_chunks_py, agreement-tested against the
    JVM chunker) with the feature extractor ships each turn exactly once,
    visits it exactly once, and stays a narrow map — no join, no shuffle,
    no duplicated expression trees."""
    from ..operators.mentions import np_chunks_py

    @pandas_udf("array<struct<start: int, end: int, surface: string,"
                " feats: array<string>>>")
    def chunk_feats(tokens: pd.Series, pos: pd.Series) -> pd.Series:
        out = []
        for t, p in zip(tokens, pos):
            t = list(t)
            p = list(p)
            lem = [get_lemma(t[i], p[i]) for i in range(len(t))]
            row = []
            for c in np_chunks_py(t, p):
                row.append({
                    "start": c["start"], "end": c["end"],
                    "surface": c["surface"],
                    "feats": em_features(t, p, c["start"], c["end"],
                                         brown, lem=lem),
                })
            out.append(row)
        return pd.Series(out)

    return chunk_feats


def make_rm_grouped_features_udf(brown: dict[str, str]):
    """Fused per-sentence RM featurizer: (tokens, pos,
    pairs: array<struct<em1s,em1e,em2s,em2e,numb>>) →
    array<array<string>> aligned with the input pairs.

    Scale rationale (same as the fused chunk UDF): the per-pair UDF
    ships the full (tokens, pos) arrays once PER PAIR over Arrow and
    recomputes the sentence lemma array per pair; grouping pairs by
    their sentence ships and lemmatizes each sentence exactly once.
    The output rides back positionally — callers ``arrays_zip`` it with
    the pairs column, so any extra per-pair fields (mention_key, spans)
    survive without widening the UDF signature."""

    @pandas_udf("array<array<string>>")
    def rm_feats_grouped(tokens: pd.Series, pos: pd.Series,
                         pairs: pd.Series) -> pd.Series:
        out = []
        for t, p, prs in zip(tokens, pos, pairs):
            t = list(t)
            p = list(p)
            lem = [get_lemma(t[i], p[i]) for i in range(len(t))]
            out.append([
                rm_features(t, p, int(pr["em1s"]), int(pr["em1e"]),
                            int(pr["em2s"]), int(pr["em2e"]),
                            int(pr["numb"]), brown, lem=lem)
                for pr in prs
            ])
        return pd.Series(out)

    return rm_feats_grouped


def make_rm_typed_features_udf(brown: dict[str, str]):
    """F12 EMTypeFeature variant: same rm_features body, plus the
    per-turn ``em_spans`` column (array<struct<start,end,labels>>) that
    carries each linked mention's type labels — the reference's
    requireEmType path (ner_feature.py:56-61, em type copy J3)."""

    @pandas_udf("array<string>")
    def rm_typed_feats(tokens: pd.Series, pos: pd.Series,
                       em1s: pd.Series, em1e: pd.Series,
                       em2s: pd.Series, em2e: pd.Series,
                       numb: pd.Series, spans: pd.Series) -> pd.Series:
        out = []
        for t, p, a, b, c, d, k, sp in zip(tokens, pos, em1s, em1e,
                                           em2s, em2e, numb, spans):
            ems = [(s["start"], s["end"], list(s["labels"])) for s in sp]
            out.append(rm_features(t, p, int(a), int(b), int(c), int(d),
                                   int(k), brown, em_spans=ems))
        return pd.Series(out)

    return rm_typed_feats


def make_rm_features_udf(brown: dict[str, str]):
    """array<string> pandas UDF over (tokens, pos, em1s, em1e, em2s, em2e,
    num_between)."""

    @pandas_udf("array<string>")
    def rm_feats(tokens: pd.Series, pos: pd.Series,
                 em1s: pd.Series, em1e: pd.Series,
                 em2s: pd.Series, em2e: pd.Series,
                 numb: pd.Series) -> pd.Series:
        return pd.Series([
            rm_features(t, p, int(a), int(b), int(c), int(d), int(k), brown)
            for t, p, a, b, c, d, k in zip(tokens, pos, em1s, em1e, em2s, em2e, numb)
        ])

    return rm_feats
