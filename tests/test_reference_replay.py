"""S1 reference-format JSON replay: the engine must run its full feature +
graph build on the reference's own line-JSON corpus format
(``nlp_parse.py:146-155`` / ``mention_reader.py:42-78``) and reproduce the
direct text path byte-for-byte (the fixture serializes the synthetic
pipeline's own parses, so replay == direct is the correctness contract).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as e
from usc_ds_relationextraction_spark.functions.features import (
    make_chunk_features_udf, make_rm_features_udf)
from usc_ds_relationextraction_spark.sources import reference_json as rj

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    path = rj.write_reference_fixture(spark, SF)
    return rj.read_corpus(spark, path).cache()


def test_no_corrupt_lines(spark, corpus):
    assert rj.corrupt_lines(corpus).count() == 0


def test_transcript_shape_roundtrip(spark, corpus):
    """to_transcripts restores the input_hint shape; per-turn text equality
    holds vs the original synthetic corpus (tokens are whitespace-atomic)."""
    t = rj.to_transcripts(corpus)
    assert t.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    orig = e._fx(spark, SF, "transcripts") \
        .select("conv_id", "turn_idx", "text")
    j = t.select("conv_id", "turn_idx",
                 F.col("text").alias("replay_text")) \
        .join(orig, ["conv_id", "turn_idx"])
    assert j.count() == orig.count()
    assert j.where(F.col("replay_text") != F.col("text")).count() == 0


def test_em_features_replay_parity(spark, corpus):
    """EM feature strings computed from the replayed (tokens, pos) — P1
    skipped — equal the direct-path em_feature_strings multiset exactly."""
    tt = rj.turn_tokens(corpus)
    udf = make_chunk_features_udf({})
    z = tt.select("conv_id", "turn_idx",
                  F.explode(udf("toks", "pos")).alias("z"))
    feats = z.select(
        "conv_id", "turn_idx",
        F.col("z.start").alias("start"), F.col("z.end").alias("end"),
        F.explode("z.feats").alias("feature")) \
        .where(F.col("feature").rlike(
            "^(HEAD_|TKN_|POS_|SHAPE_|LENGTH_|CHAR_|CTXT_LEFT_|"
            "CTXT_RIGHT_|GRM_)")) \
        .groupBy("conv_id", "turn_idx", "start", "end", "feature") \
        .agg(F.count("*").alias("n"))
    direct = e.queries()["em_feature_strings"](spark, SF)
    assert feats.count() == direct.count()
    assert feats.exceptAll(direct).count() == 0
    assert direct.exceptAll(feats).count() == 0


def test_rm_features_replay_parity(spark, corpus):
    """RM feature strings over the replayed relationMentions (spans and
    numOfEMBetween taken from the JSON, not recomputed) equal the direct
    pair-generation path."""
    rm = rj.relation_mentions(corpus)
    tt = rj.turn_tokens(corpus)
    brown = {r["word"]: r["cluster"]
             for r in e._fx(spark, SF, "brown_clusters").collect()}
    udf = make_rm_features_udf(brown)
    j = rm.join(tt, ["conv_id", "turn_idx"])
    feats = j.select(
        "conv_id", "turn_idx", "em1_start", "em1_end", "em2_start",
        "em2_end",
        F.explode(udf("toks", "pos", "em1_start", "em1_end", "em2_start",
                      "em2_end", "num_between")).alias("feature"))

    direct_pairs = e._pairs_df(spark, SF).select(
        "conv_id", "turn_idx", "em1_start", "em1_end", "em2_start",
        "em2_end", "num_between").distinct()
    dj = direct_pairs.join(
        e._turn_tokens(spark, SF).select("conv_id", "turn_idx",
                                         "toks", "pos"),
        ["conv_id", "turn_idx"])
    direct = dj.select(
        "conv_id", "turn_idx", "em1_start", "em1_end", "em2_start",
        "em2_end",
        F.explode(udf("toks", "pos", "em1_start", "em1_end", "em2_start",
                      "em2_end", "num_between")).alias("feature"))
    assert feats.count() == direct.count()
    assert feats.exceptAll(direct).count() == 0


def test_graph_build_on_replay(spark, corpus):
    """A3/J4 feature-type co-occurrence built entirely from the replayed
    corpus (features from JSON tokens, types from JSON entityMentions)
    matches the direct-path a3_cooccur_real."""
    tt = rj.turn_tokens(corpus)
    udf = make_chunk_features_udf({})
    z = tt.select("conv_id", "turn_idx",
                  F.explode(udf("toks", "pos")).alias("z"))
    mf = z.select(
        "conv_id", "turn_idx",
        F.col("z.start").alias("start"), F.col("z.end").alias("end"),
        F.explode("z.feats").alias("feature")) \
        .where(F.col("feature").rlike(
            "^(HEAD_|TKN_|POS_|SHAPE_|LENGTH_|CHAR_|CTXT_LEFT_|"
            "CTXT_RIGHT_|GRM_)")).distinct()
    mt = rj.entity_mentions(corpus).select(
        "conv_id", "turn_idx", "start", "end",
        F.explode("labels").alias("type")).distinct()
    g = mf.join(mt, ["conv_id", "turn_idx", "start", "end"]) \
        .groupBy("feature", "type").agg(F.count("*").alias("n"))
    direct = e.queries()["a3_cooccur_real"](spark, SF)
    assert g.count() == direct.count()
    assert g.exceptAll(direct).count() == 0
