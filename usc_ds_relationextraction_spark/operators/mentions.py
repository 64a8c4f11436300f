"""Mention detection: turns → sentences → tokens/POS → NP candidates.

Reference analog: ``nlp_parse.py`` drives CoreNLP then aligns given mention
strings to token spans (P1/P3).  Our engine *detects* candidates itself
(north_star: "segmentation + noun-phrase candidate generation"), then the
DS join (:mod:`.ds_label`) decides which candidates are entities.

Two chunker implementations, tested for agreement:

 - :func:`np_chunks_col` — pure JVM higher-order functions (filter/
   transform over the pos array).  Whole-stage-codegen, zero Python.
 - :func:`np_chunks_udf` — pandas/Arrow UDF (the north_star-named path).

Candidate = maximal run of NNP tokens (proper-noun chunk).  At 100 TB the
chunker is a narrow map over the sentence table — no shuffle; the only
shuffles in this stage are the deterministic repartition by conv_id range.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.tokenize import (pos_tags_col, split_sentences_udf,
                                  tokenize_pos_udf, tokens_col)

CHUNK_SCHEMA = "array<struct<start: int, end: int, surface: string>>"


def sentences_table(turns: DataFrame, use_pandas_udfs: bool = True) -> DataFrame:
    """(conv_id, turn_idx, ...) → one row per sentence with tokens + pos.

    Stable sentence ordering: ``posexplode`` preserves array order, and the
    sentence key (conv_id, turn_idx, sent_idx) is carried everywhere — the
    reference's (articleId, sentId) analog (input_hint W2 invariant).
    """
    if use_pandas_udfs:
        sents = turns.select(
            "conv_id", "turn_idx", "role", "ts",
            F.posexplode(split_sentences_udf()("text")).alias("sent_idx", "sentence"),
        )
        tp = sents.withColumn("tp", tokenize_pos_udf()("sentence"))
        return tp.select(
            "conv_id", "turn_idx", "sent_idx", "role", "ts", "sentence",
            F.col("tp.tokens").alias("tokens"), F.col("tp.pos").alias("pos"),
        )
    # JVM fast path: whitespace tokens + expression tagger, sentence split
    # by regex lookbehind (pre-tokenized corpora only)
    sents = turns.select(
        "conv_id", "turn_idx", "role", "ts",
        F.posexplode(F.split(F.col("text"), r"(?<=[.?!]) ")).alias("sent_idx", "sentence"),
    )
    toks = sents.withColumn("tokens", tokens_col("sentence"))
    return toks.withColumn("pos", pos_tags_col("tokens"))


def np_chunks_col(tokens: Column | str, pos: Column | str) -> Column:
    """Maximal NNP runs as a JVM expression → array<struct<start,end,surface>>.

    start/end are token offsets, end exclusive (reference span convention,
    ``mention.py``).  Stays inside codegen: sequence + filter + transform.
    """
    tk = F.col(tokens) if isinstance(tokens, str) else tokens
    ps = F.col(pos) if isinstance(pos, str) else pos
    n = F.size(ps)
    idxs = F.sequence(F.lit(0), n - 1)

    def is_np(i: Column) -> Column:
        return F.element_at(ps, i + 1) == "NNP"

    starts = F.filter(idxs, lambda i: is_np(i) & ((i == 0) | ~is_np(i - 1)))

    def mk(i: Column) -> Column:
        after = F.filter(idxs, lambda j: (j > i) & ~is_np(j))
        end = F.coalesce(F.array_min(after), n)
        surface = F.array_join(F.slice(tk, i + 1, end - i), " ")
        return F.struct(i.cast("int").alias("start"),
                        end.cast("int").alias("end"),
                        surface.alias("surface"))

    return F.when(n > 0, F.transform(starts, mk)).otherwise(
        F.lit(None).cast(CHUNK_SCHEMA))


_UDF_CACHE: dict[str, object] = {}


def np_chunks_py(tk: list, ps: list) -> list:
    """Plain-python NNP-run chunker (shared by the Arrow UDFs + tests)."""
    out = []
    i, n = 0, len(ps)
    while i < n:
        if ps[i] == "NNP":
            j = i
            while j < n and ps[j] == "NNP":
                j += 1
            out.append({"start": i, "end": j,
                        "surface": " ".join(tk[i:j])})
            i = j
        else:
            i += 1
    return out


def np_chunks_udf():
    """pandas/Arrow twin of :func:`np_chunks_col` (agreement-tested)."""
    if "chunks" in _UDF_CACHE:
        return _UDF_CACHE["chunks"]

    @pandas_udf(CHUNK_SCHEMA)
    def _udf(tokens: pd.Series, pos: pd.Series) -> pd.Series:
        return pd.Series([np_chunks_py(list(t), list(p))
                          for t, p in zip(tokens, pos)])

    _UDF_CACHE["chunks"] = _udf
    return _udf


def candidates_table(sentences: DataFrame, use_pandas_udfs: bool = True) -> DataFrame:
    """Explode NP chunks to one row per candidate mention."""
    chunks = (np_chunks_udf()("tokens", "pos") if use_pandas_udfs
              else np_chunks_col("tokens", "pos"))
    out = sentences.withColumn("chunk", F.explode(chunks))
    return out.select(
        "conv_id", "turn_idx", "sent_idx", "tokens", "pos",
        F.col("chunk.start").alias("start"),
        F.col("chunk.end").alias("end"),
        F.col("chunk.surface").alias("surface"),
    )
