"""S1 reference-format JSON replay: driver-contract queries + DuckDB twins.

The fixture (``sources/reference_json.write_reference_fixture``) serializes
the synthetic pipeline's own parses into the reference's line-JSON format
(``nlp_parse.py:146-155`` / ``mention_reader.py:42-78``); these queries
replay it through the explicit-schema reader.  The DuckDB oracles read the
SAME files via ``read_json`` with a matching explicit column spec, so the
two engines exercise two independent JSON decoders over one artifact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import reference_json as rj

# DuckDB explicit column spec — the twin of reference_json.CORPUS_SCHEMA
DUCK_COLUMNS = (
    "{articleId: 'VARCHAR', sentId: 'INTEGER', tokens: 'VARCHAR[]', "
    "pos: 'VARCHAR[]', "
    "entityMentions: 'STRUCT(start INTEGER, \"end\" INTEGER, "
    "labels VARCHAR[])[]', "
    "relationMentions: 'STRUCT(em1Start INTEGER, em1End INTEGER, "
    "em2Start INTEGER, em2End INTEGER, numOfEMBetween INTEGER, "
    "labels VARCHAR[])[]'}"
)


def _corpus(spark: SparkSession, sf: str) -> DataFrame:
    path = rj.write_reference_fixture(spark, sf)
    return rj.read_corpus(spark, path)


def _duck_corpus_sql(fx_dir: str) -> str:
    return (f"read_json('{fx_dir}/ref_corpus.jsonl/part-*.txt', "
            f"format='newline_delimited', columns={DUCK_COLUMNS})")


def s1_reference_replay(spark: SparkSession, sf: str) -> DataFrame:
    """S1: explicit-schema JSON scan → normalized entity-mention table;
    surface text re-derived from the pre-tokenized tokens (slice+join —
    pure JVM, no re-tokenization)."""
    em = rj.entity_mentions(_corpus(spark, sf))
    return em.select(
        "conv_id", "turn_idx", "start", "end", "surface",
        F.array_join("labels", ",").alias("labels"))


def s1_replay_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """S1 (relation side): replayed relationMentions with the reference's
    numOfEMBetween and multi-label sets."""
    rm = rj.relation_mentions(_corpus(spark, sf))
    return rm.select(
        "conv_id", "turn_idx", "em1_start", "em1_end", "em2_start",
        "em2_end", "num_between",
        F.array_join("labels", ",").alias("labels"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "s1_reference_replay": s1_reference_replay,
        "s1_replay_pairs": s1_replay_pairs,
    }


def oracles(fx_dir: str) -> dict[str, str]:
    corpus = _duck_corpus_sql(fx_dir)
    O: dict[str, str] = {}

    O["s1_reference_replay"] = f"""
SELECT articleId AS conv_id, sentId AS turn_idx,
       em.start AS start, em."end" AS "end",
       array_to_string(list_slice(tokens, em.start + 1, em."end"), ' ')
         AS surface,
       array_to_string(em.labels, ',') AS labels
FROM {corpus}, UNNEST(entityMentions) AS u(em)
"""

    O["s1_replay_pairs"] = f"""
SELECT articleId AS conv_id, sentId AS turn_idx,
       rm.em1Start AS em1_start, rm.em1End AS em1_end,
       rm.em2Start AS em2_start, rm.em2End AS em2_end,
       rm.numOfEMBetween AS num_between,
       array_to_string(rm.labels, ',') AS labels
FROM {corpus}, UNNEST(relationMentions) AS u(rm)
"""
    return O
