"""S1/S2: reference-format JSON corpus reader + replay path.

The reference pipeline serializes each parsed sentence as one JSON object
per line (``/root/reference/code/DataProcessor/nlp_parse.py:146-155``
writes it; ``mention_reader.py:42-78`` decodes it)::

    {"articleId": "...", "sentId": 3,
     "tokens": ["Raymond", "Jung", ...], "pos": ["NNP", "NNP", ...],
     "entityMentions":   [{"start": 0, "end": 2, "labels": ["/person"]}],
     "relationMentions": [{"em1Start": 0, "em1End": 2, "em2Start": 6,
                           "em2End": 8, "numOfEMBetween": 0,
                           "labels": ["/business/person/company"]}]}

Spans are 0-based token offsets, end-exclusive (``tokens[start:end]``).

This module reads that format with an EXPLICIT schema (``spark.read.json``
with schema inference is two full passes at 100 TB — never inferred here),
maps it onto the engine's conversation shape (``articleId → conv_id``,
``sentId → turn_idx``), and feeds the pre-tokenized ``tokens``/``pos``
straight past P1 into the feature library, so the engine can replay the
reference's own pre-parsed corpora (``train_new.json`` / ``test_new.json``)
without re-tokenizing.

Scale shape: the JSON scan is a narrow per-file map (line-delimited JSON
splits by file block); explodes are narrow; the only shuffles are whatever
downstream operators introduce.  A ``.option("mode", "PERMISSIVE")`` +
``_corrupt_record`` column quarantines malformed lines instead of failing
the 1000-executor job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EM_STRUCT = T.StructType([
    T.StructField("start", T.IntegerType()),
    T.StructField("end", T.IntegerType()),
    T.StructField("labels", T.ArrayType(T.StringType())),
])
RM_STRUCT = T.StructType([
    T.StructField("em1Start", T.IntegerType()),
    T.StructField("em1End", T.IntegerType()),
    T.StructField("em2Start", T.IntegerType()),
    T.StructField("em2End", T.IntegerType()),
    T.StructField("numOfEMBetween", T.IntegerType()),
    T.StructField("labels", T.ArrayType(T.StringType())),
])
DEP_STRUCT = T.StructType([
    # real parser arcs, the reference's optional 'dep' field
    # (mention_reader.py:70-73: (type, gov, dep) triples)
    T.StructField("type", T.StringType()),
    T.StructField("gov", T.IntegerType()),
    T.StructField("dep", T.IntegerType()),
])
CORPUS_SCHEMA = T.StructType([
    T.StructField("articleId", T.StringType()),
    T.StructField("sentId", T.IntegerType()),
    T.StructField("tokens", T.ArrayType(T.StringType())),
    T.StructField("pos", T.ArrayType(T.StringType())),
    T.StructField("entityMentions", T.ArrayType(EM_STRUCT)),
    T.StructField("relationMentions", T.ArrayType(RM_STRUCT)),
    T.StructField("dep", T.ArrayType(DEP_STRUCT)),
    T.StructField("_corrupt_record", T.StringType()),
])


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a reference-format line-delimited JSON corpus.

    Malformed lines land in ``_corrupt_record`` (PERMISSIVE) rather than
    failing the job; callers can count/quarantine them.
    """
    return (spark.read.schema(CORPUS_SCHEMA)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path))


def corrupt_lines(corpus: DataFrame) -> DataFrame:
    """Quarantine view: raw text of lines that failed to parse.

    articleId rides along because Spark disallows queries that reference
    ONLY the internal corrupt-record column of a JSON scan.
    """
    return corpus.select("articleId", "_corrupt_record") \
        .where(F.col("_corrupt_record").isNotNull())


def to_transcripts(corpus: DataFrame) -> DataFrame:
    """Map the reference corpus onto the engine's conversation shape
    (BASELINE input_hint): articleId → conv_id, sentId → turn_idx, text =
    space-joined tokens (the reference's own convention — its tokens are
    already whitespace-atomic).  role/tool/ts carry documented defaults:
    the reference corpus has no conversational metadata."""
    return corpus.where(F.col("_corrupt_record").isNull()).select(
        F.col("articleId").alias("conv_id"),
        F.col("sentId").cast("int").alias("turn_idx"),
        F.lit("doc").alias("role"),
        F.array_join("tokens", " ").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def turn_tokens(corpus: DataFrame) -> DataFrame:
    """Pre-tokenized replay twin of ``__spark_entry__._turn_tokens``:
    (conv_id, turn_idx, toks, pos) taken straight from the corpus — P1
    (tokenize+tag) is SKIPPED, exactly the reference replay semantics."""
    return corpus.where(F.col("_corrupt_record").isNull()).select(
        F.col("articleId").alias("conv_id"),
        F.col("sentId").cast("int").alias("turn_idx"),
        F.col("tokens").alias("toks"),
        F.col("pos"),
        F.col("dep"),  # real parser arcs when present, else null
    )


def dep_arcs(corpus: DataFrame) -> DataFrame:
    """Normalized real-parser arc table (one row per arc) from the
    optional ``dep`` field; empty when the corpus carries none."""
    d = corpus.where(F.col("_corrupt_record").isNull()
                     & F.col("dep").isNotNull()).select(
        F.col("articleId").alias("conv_id"),
        F.col("sentId").cast("int").alias("turn_idx"),
        F.explode("dep").alias("a"))
    return d.select("conv_id", "turn_idx",
                    F.col("a.type").alias("dep_type"),
                    F.col("a.gov").alias("gov"),
                    F.col("a.dep").alias("dep"))


def entity_mentions(corpus: DataFrame) -> DataFrame:
    """Normalized entity-mention table (one row per mention)."""
    em = corpus.where(F.col("_corrupt_record").isNull()).select(
        F.col("articleId").alias("conv_id"),
        F.col("sentId").cast("int").alias("turn_idx"),
        "tokens",
        F.explode("entityMentions").alias("em"))
    return em.select(
        "conv_id", "turn_idx",
        F.col("em.start").alias("start"),
        F.col("em.end").alias("end"),
        F.array_join(
            F.slice("tokens", F.col("em.start") + 1,
                    F.col("em.end") - F.col("em.start")), " ")
        .alias("surface"),
        F.col("em.labels").alias("labels"))


def relation_mentions(corpus: DataFrame) -> DataFrame:
    """Normalized relation-mention table (one row per pair)."""
    rm = corpus.where(F.col("_corrupt_record").isNull()).select(
        F.col("articleId").alias("conv_id"),
        F.col("sentId").cast("int").alias("turn_idx"),
        F.explode("relationMentions").alias("rm"))
    return rm.select(
        "conv_id", "turn_idx",
        F.col("rm.em1Start").alias("em1_start"),
        F.col("rm.em1End").alias("em1_end"),
        F.col("rm.em2Start").alias("em2_start"),
        F.col("rm.em2End").alias("em2_end"),
        F.col("rm.numOfEMBetween").alias("num_between"),
        F.col("rm.labels").alias("labels"))


# ------------------------------------------------------------- fixture build
def write_reference_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Round-trip fixture: serialize the synthetic pipeline's own parses
    into the reference JSON format (one line per turn — articleId=conv_id,
    sentId=turn_idx), cached beside the parquet fixtures.

    Everything is re-derived from the deterministic synthetic corpus, so
    replaying this file through the feature library must reproduce the
    direct path byte-for-byte — that equivalence is the replay test.
    """
    import __spark_entry__ as e

    fx = os.path.abspath(
        __import__("usc_ds_relationextraction_spark.sources.synthetic",
                   fromlist=["fixture_dir"]).fixture_dir(sf_dir))
    out = os.path.join(fx, "ref_corpus.jsonl")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out

    tt = e._turn_tokens(spark, sf_dir)  # conv_id, turn_idx, toks, pos

    ems = e._linked_df(spark, sf_dir) \
        .groupBy("conv_id", "turn_idx", "start", "end") \
        .agg(F.sort_array(F.collect_set("entity_type")).alias("labels"))
    em_arr = ems.groupBy("conv_id", "turn_idx").agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("start").cast("int").alias("start"),
            F.col("end").cast("int").alias("end"),
            "labels"))).alias("entityMentions"))

    pairs = e._pairs_df(spark, sf_dir)
    labeled = e._labeled_pairs_df(spark, sf_dir, pairs=pairs)
    rm_labels = labeled.groupBy(
        "conv_id", "turn_idx", "em1_start", "em1_end",
        "em2_start", "em2_end") \
        .agg(F.sort_array(F.collect_set("relation")).alias("labels"))
    rms = pairs.select("conv_id", "turn_idx", "em1_start", "em1_end",
                       "em2_start", "em2_end", "num_between").distinct() \
        .join(rm_labels, ["conv_id", "turn_idx", "em1_start", "em1_end",
                          "em2_start", "em2_end"], "left") \
        .withColumn("labels",
                    F.coalesce("labels", F.array(F.lit("None"))))
    rm_arr = rms.groupBy("conv_id", "turn_idx").agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("em1_start").cast("int").alias("em1Start"),
            F.col("em1_end").cast("int").alias("em1End"),
            F.col("em2_start").cast("int").alias("em2Start"),
            F.col("em2_end").cast("int").alias("em2End"),
            F.col("num_between").cast("int").alias("numOfEMBetween"),
            "labels"))).alias("relationMentions"))

    doc = tt.join(em_arr, ["conv_id", "turn_idx"], "left") \
        .join(rm_arr, ["conv_id", "turn_idx"], "left") \
        .select(F.to_json(F.struct(
            F.col("conv_id").alias("articleId"),
            F.col("turn_idx").cast("int").alias("sentId"),
            F.col("toks").alias("tokens"),
            F.col("pos"),
            F.coalesce("entityMentions",
                       F.array().cast(T.ArrayType(EM_STRUCT).simpleString()))
            .alias("entityMentions"),
            F.coalesce("relationMentions",
                       F.array().cast(T.ArrayType(RM_STRUCT).simpleString()))
            .alias("relationMentions"),
        )).alias("value"))
    doc.coalesce(1).write.mode("overwrite").text(out)
    return out
