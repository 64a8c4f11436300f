"""Driver-gate (oracle-checked) entries for the last pytest-only
operators: M4 objective mixer, M5 lr/checkpoint schedule, M6 composite
RM-BCD epoch, S7 embedding writer round-trip, S8 prediction writer
round-trip.

Each query exercises the REAL production code path (the schedule
functions both trainers call, the m1/m2 epoch kernels, the Warehouse
writer, the inference normalize/cut operators) and emits integer-
quantized values so the DuckDB twin hashes exactly.

Reference citations: objective mixing retype.cpp:134-172,183-186
(alias-sampled weights {1, 1, transWeight}); lr decay retype.cpp:241;
RM BCD hplelib.cpp:148-173,520-632; embedding dump hplelib.cpp:122-146;
prediction dump emb_prediction.py:141-147.
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.hashing import h64, h64_duckdb
from ..functions.sampling import AliasTable
from .training import init_embeddings, is_checkpoint_epoch, lr_schedule

M4_ITERS = 10_000
M4_TRANS_WEIGHT = 2.0
M4_NAMES = ("cotype_em", "cotype_rm", "transe")
M5_LR0 = 0.02
M5_EPOCHS = 50
M5_CKPT_EVERY = 10
S7_DIM = 4
S8_THRESHOLD = 0.25
U60 = float(1 << 60)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _wh(spark: SparkSession, sf: str, tag: str):
    from ..sources.catalog import Warehouse
    base = os.path.basename(os.path.normpath(sf))
    return Warehouse(spark, f"/tmp/{tag}_{base}")


# ================================================================== M4
def m4_objective_mix(spark: SparkSession, sf: str) -> DataFrame:
    """M4: the deterministic objective interleave — one Walker–Vose draw
    per iteration over weights {1, 1, transWeight} (the REAL
    ``training.objective_interleave`` schedule, distributed as a pandas
    UDF over the iteration range), rolled up per objective."""
    tbl = AliasTable(np.array([1.0, 1.0, M4_TRANS_WEIGHT]))
    names = np.array(M4_NAMES)

    @pandas_udf("string")
    def draw(it: pd.Series) -> pd.Series:
        idx = tbl.draw_hashed([str(int(i)) for i in it], "m4")
        return pd.Series(names[idx])

    df = spark.range(M4_ITERS).select(F.col("id").alias("iter"),
                                      draw("id").alias("objective"))
    return df.groupBy("objective").agg(
        F.count("*").alias("n_draws"),
        F.min("iter").alias("first_iter"),
        F.max("iter").alias("last_iter"))


def _m4_sql() -> str:
    tbl = AliasTable(np.array([1.0, 1.0, M4_TRANS_WEIGHT]))
    n = tbl.n
    vals = ", ".join(
        f"({i}, {tbl.prob[i]!r}, {int(tbl.alias[i])}, '{M4_NAMES[i]}')"
        for i in range(n))
    u1 = (f"(({h64_duckdb('CAST(i AS VARCHAR) || chr(31) || ' + repr('m4|u1'))}) "
          f"/ {U60!r})")
    u2 = (f"(({h64_duckdb('CAST(i AS VARCHAR) || chr(31) || ' + repr('m4|u2'))}) "
          f"/ {U60!r})")
    return f"""
WITH alias_tbl(ai, prob, alias_i, objective) AS (VALUES {vals}),
iters AS (SELECT i FROM generate_series(0, {M4_ITERS - 1}) AS g(i)),
draws AS (
  SELECT i,
         LEAST(CAST(floor({u1} * {n}) AS BIGINT), {n - 1}) AS col_i,
         {u2} AS u2
  FROM iters
),
picked AS (
  SELECT d.i,
         CASE WHEN d.u2 >= t.prob THEN a.objective
              ELSE t.objective END AS objective
  FROM draws d
  JOIN alias_tbl t ON t.ai = d.col_i
  JOIN alias_tbl a ON a.ai = t.alias_i
)
SELECT objective, CAST(COUNT(*) AS BIGINT) AS n_draws,
       CAST(MIN(i) AS BIGINT) AS first_iter,
       CAST(MAX(i) AS BIGINT) AS last_iter
FROM picked GROUP BY objective
"""


# ================================================================== M5
def m5_lr_schedule(spark: SparkSession, sf: str) -> DataFrame:
    """M5: the epoch scheduler as a generated table — per-epoch lr from
    the REAL ``training.lr_schedule`` (both trainers call it) and the
    checkpoint cadence from ``training.is_checkpoint_epoch``, quantized
    to integer nano-units."""
    @pandas_udf("bigint")
    def lr_nano(ep: pd.Series) -> pd.Series:
        return pd.Series([
            int(math.floor(lr_schedule(M5_LR0, int(e), M5_EPOCHS)
                           * 1000000000.0 + 0.5)) for e in ep])

    @pandas_udf("int")
    def ckpt(ep: pd.Series) -> pd.Series:
        return pd.Series([
            int(is_checkpoint_epoch(int(e), M5_EPOCHS, M5_CKPT_EVERY))
            for e in ep], dtype="int32")

    return spark.range(M5_EPOCHS).select(
        F.col("id").cast("int").alias("epoch"),
        lr_nano("id").alias("lr_nano"),
        ckpt("id").alias("is_ckpt"))


def _m5_sql() -> str:
    return f"""
SELECT CAST(i AS INT) AS epoch,
       CAST(floor(greatest({M5_LR0!r} * (1.0 - (CAST(i AS DOUBLE)
                                                / {float(M5_EPOCHS)!r})),
                           {M5_LR0!r} * 1e-4)
                  * 1000000000.0 + 0.5) AS BIGINT) AS lr_nano,
       CAST(CASE WHEN (i + 1) % {M5_CKPT_EVERY} = 0
                   OR i = {M5_EPOCHS - 1} THEN 1 ELSE 0 END AS INT)
         AS is_ckpt
FROM generate_series(0, {M5_EPOCHS - 1}) AS g(i)
"""


# ================================================================== M6
def m6_rm_bcd_epoch(spark: SparkSession, sf: str) -> DataFrame:
    """M6: one composite CoType-RM BCD epoch — the SGNS and PLE per-draw
    gradient rows of the already-gated m1/m2 doubles merged through the
    REAL BCD accumulate semantics (``_agg_grads``: per-node elementwise
    sum + draw count) in a single pass."""
    from .training_doubles import m1_sgns_epoch, m2_ple_epoch
    u = m1_sgns_epoch(spark, sf).unionByName(m2_ple_epoch(spark, sf))
    sums = [F.sum(f"g{i}").alias(f"sg{i}") for i in range(S7_DIM)]
    return u.groupBy("node_set", "node_id").agg(
        F.count("*").alias("n_rows"), *sums,
        F.sum("cnt_milli").alias("cnt_milli_sum"))


def _m6_sql(e) -> str:
    from .training_doubles import _m1_sql, _m2_sql
    sg = ", ".join(f"CAST(SUM(g{i}) AS BIGINT) AS sg{i}"
                   for i in range(S7_DIM))
    return f"""
SELECT node_set, node_id, CAST(COUNT(*) AS BIGINT) AS n_rows, {sg},
       CAST(SUM(cnt_milli) AS BIGINT) AS cnt_milli_sum
FROM (
  SELECT * FROM ({_m1_sql()})
  UNION ALL BY NAME
  SELECT * FROM ({_m2_sql(e)})
) u
GROUP BY node_set, node_id
"""


# ================================================================== S7
def s7_embedding_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S7: embedding writer/reader round-trip — the REAL deterministic
    init (``training.init_embeddings``) written through the REAL
    ``Warehouse.write`` (lineage metrics row included) and read back;
    output is the read-back table quantized ×10^6.  The oracle
    recomputes the init formula directly, so hash agreement proves the
    write→read cycle is the identity."""
    ids = _t(spark, sf, "part").select(
        F.col("p_partkey").cast("long").alias("node_id"))
    emb = init_embeddings(ids, "node_id", dim=S7_DIM, salt="s7")
    wh = _wh(spark, sf, "s7_roundtrip")
    back = wh.write("s7_embeddings", emb)
    cols = [F.floor(F.col("vec")[i].cast("double") * 1000000.0 + 0.5)
            .cast("bigint").alias(f"q{i}") for i in range(S7_DIM)]
    return back.select("id", *cols)


def _s7_sql() -> str:
    comps = []
    for i in range(S7_DIM):
        h = h64_duckdb(f"CAST(p_partkey AS VARCHAR) || '|{i}|s7'")
        r = f"CAST((({h} % 1000003) / 1000003.0 - 0.5) / {S7_DIM} AS REAL)"
        comps.append(f"CAST(floor(CAST({r} AS DOUBLE) * 1000000.0 + 0.5) "
                     f"AS BIGINT) AS q{i}")
    return f"""
SELECT CAST(p_partkey AS BIGINT) AS id, {', '.join(comps)}
FROM part
"""


# ================================================================== S8
def s8_prediction_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S8: prediction writer round-trip — deterministic scores through
    the REAL ``inference.min_max_normalize`` (P11, reference
    zero-initialized min/max) + ``threshold_cut`` (P12), written via
    ``Warehouse.write`` and read back, quantized ×10^6."""
    from ..functions.hashing import u01
    from .inference import min_max_normalize, threshold_cut
    e = _t(spark, sf, "events").select(
        "event_id", u01("event_id", "s8").alias("score"))
    cut = threshold_cut(min_max_normalize(e, "score"), S8_THRESHOLD)
    wh = _wh(spark, sf, "s8_roundtrip")
    back = wh.write("s8_predictions",
                    cut.select("event_id", "score_norm"))
    return back.select(
        "event_id",
        F.floor(F.col("score_norm") * 1000000.0 + 0.5).cast("bigint")
        .alias("score_ppm"))


def _s8_sql() -> str:
    u = (f"(({h64_duckdb('CAST(event_id AS VARCHAR) || chr(31) || ' + repr('s8'))}) "
         f"/ {U60!r})")
    return f"""
WITH scored AS (SELECT event_id, {u} AS score FROM events),
mm AS (SELECT least(MIN(score), 0.0) AS mn,
              greatest(MAX(score), 0.0) AS mx FROM scored),
norm AS (
  SELECT event_id, (score - mn) / (mx - mn + 1e-8) AS sn
  FROM scored, mm
)
SELECT event_id,
       CAST(floor(sn * 1000000.0 + 0.5) AS BIGINT) AS score_ppm
FROM norm WHERE sn > {S8_THRESHOLD!r}
"""


# ================================================================== M9
# The zoo's count-based member, driver-gated: a multinomial Naive-Bayes
# sufficient-statistic voter (binary features, add-zero smoothing,
# unnormalized integer scores).  Every other M9 family trains by
# iterative optimization (float, engine-specific) and stays pytest-only;
# this member's fit IS a groupBy-count, so train AND predict are exactly
# expressible in both engines — the oracle checks the whole
# split/fit/score/argmax protocol, not a stub.
# Reference: the zoo harness Classifier/Classifier.py:16-41 drives
# interchangeable fit/predict members over the same feature rows; the
# class protocol (exact sorted label set, 'None' fallback) matches
# plans/baselines.py and M10 (evaluation.py:82-111).
M9_SPLIT_MOD = 5          # every 5th mention (by portable hash) is test
M9_CLASS_CAP = 1000       # injective-fold bound, as SO5
M9_VOTE_SCALE = 1000      # prior-normalization fixed-point scale; kept
#                           small so votes·M9_CLASS_CAP fits int64 at
#                           10^12-mention corpus scale (see m9_nb_vote)


def m9_nb_vote(spark: SparkSession, sf: str) -> DataFrame:
    """M9: NB count-voter over the REAL F1-F11 feature strings and the
    REAL DS gold sets — deterministic 80/20 split, per-(feature, class)
    train counts, test score = sum of matched counts, argmax class with
    (votes DESC, class ASC) tie-break, 'None' when no feature matched.

    Scale shape: fit is one shuffle (groupBy feature, class); scoring
    joins the corpus-scale feature table to the stats table on
    ``feature`` — a SKEWED key (structural features like EM1_BEFORE_EM2
    appear in every mention), so this join rides AQE skew-join splitting
    per session defaults; the stats table is NOT broadcast (it grows
    with vocab × classes)."""
    from .parity_queries import _gold_pred, _pair_key, rm_feature_strings

    k = _pair_key().alias("k")
    mf = rm_feature_strings(spark, sf).select(k, "feature").distinct()
    gp = _gold_pred(spark, sf).select("k", "gold_set")
    is_test = F.pmod(h64(F.concat(F.col("k"), F.lit("|m9split"))),
                     F.lit(M9_SPLIT_MOD)) == 0

    rows = mf.join(gp, "k")
    train = rows.where(~is_test)
    stats = train.groupBy("feature",
                          F.col("gold_set").alias("cls")) \
        .agg(F.count("*").alias("cnt"))
    # class priors: mentions per class in train (the NB denominator —
    # without it count-voting degenerates to the majority class) + a
    # dense class id for the injective tie-break fold
    w = Window.orderBy("cls")
    classes = train.select("k", F.col("gold_set").alias("cls")) \
        .distinct().groupBy("cls").agg(F.count("*").alias("n_c")) \
        .select("cls", "n_c", (F.row_number().over(w) - 1).alias("cls_id"))

    test = rows.where(is_test)
    votes = test.join(stats, "feature") \
        .groupBy("k", "cls").agg(F.sum("cnt").alias("raw_votes")) \
        .join(F.broadcast(classes), "cls") \
        .withColumn("votes", F.expr(
            # floor(raw·S/n) computed divide-FIRST via r = q·n + m ⇒
            # q·S + floor(m·S/n): raw_votes*S directly would overflow
            # int64 (ANSI error) at corpus-scale structural-feature
            # counts.  Bound: raw ≤ 10^12 mentions ⇒ q·S ≤ 10^15 and the
            # fold's further ×M9_CLASS_CAP stays ≤ 10^18 < 2^63.
            f"(raw_votes div n_c) * {M9_VOTE_SCALE}"
            f" + ((raw_votes % n_c) * {M9_VOTE_SCALE}) div n_c"))
    fold = (F.col("votes") * M9_CLASS_CAP
            + (M9_CLASS_CAP - 1 - F.col("cls_id")))
    pred = votes.groupBy("k").agg(
        F.max_by("cls", fold).alias("pred_set"),
        F.max("votes").alias("votes"))

    out = gp.where(is_test).join(pred, "k", "left")
    return out.select(
        "k", "gold_set",
        F.coalesce("pred_set", F.lit("None")).alias("pred_set"),
        F.coalesce("votes", F.lit(0)).cast("bigint").alias("votes"),
        (F.coalesce("pred_set", F.lit("None")) == F.col("gold_set"))
        .cast("int").alias("correct"))


def _m9_sql(e) -> str:
    from .parity_queries import (K7, _gold_pred_sql,
                                 _rm_feature_strings_sql)
    key = ("conv_id || '|' || turn_idx || '|' || sent_id || '|' || "
           "em1_start || '|' || em1_end || '|' || em2_start || '|' || "
           "em2_end")
    split = (f"({h64_duckdb('k || ' + repr('|m9split'))} "
             f"% {M9_SPLIT_MOD}) = 0")
    return f"""
WITH rmf AS MATERIALIZED ({_rm_feature_strings_sql(e)}
  SELECT {K7}, feature FROM rfeats),
g AS MATERIALIZED ({_gold_pred_sql(e)} SELECT k, gold_set FROM gp),
mf AS (SELECT DISTINCT {key} AS k, feature FROM rmf),
rows_ AS MATERIALIZED (
  SELECT mf.k, mf.feature, g.gold_set,
         {split.replace('md5(k ', 'md5(mf.k ')} AS is_test
  FROM mf JOIN g ON mf.k = g.k
),
stats AS (
  SELECT feature, gold_set AS cls, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM rows_ WHERE NOT is_test GROUP BY feature, gold_set
),
classes AS (
  SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_c,
         CAST(row_number() OVER (ORDER BY cls) - 1 AS BIGINT) AS cls_id
  FROM (SELECT DISTINCT k, gold_set AS cls FROM rows_ WHERE NOT is_test)
  GROUP BY cls
),
raw AS (
  SELECT r.k, s.cls, CAST(SUM(s.cnt) AS BIGINT) AS raw_votes
  FROM rows_ r JOIN stats s ON r.feature = s.feature
  WHERE r.is_test GROUP BY r.k, s.cls
),
votes AS (
  SELECT raw.k, raw.cls, c.cls_id,
         CAST((raw.raw_votes // c.n_c) * {M9_VOTE_SCALE}
              + ((raw.raw_votes % c.n_c) * {M9_VOTE_SCALE}) // c.n_c
              AS BIGINT) AS votes
  FROM raw JOIN classes c ON raw.cls = c.cls
),
pred AS (
  SELECT v.k,
         arg_max(v.cls, v.votes * {M9_CLASS_CAP}
                        + ({M9_CLASS_CAP} - 1 - v.cls_id)) AS pred_set,
         MAX(v.votes) AS votes
  FROM votes v
  GROUP BY v.k
),
tg AS (SELECT k, gold_set FROM g WHERE {split})
SELECT tg.k, tg.gold_set,
       coalesce(p.pred_set, 'None') AS pred_set,
       CAST(coalesce(p.votes, 0) AS BIGINT) AS votes,
       CAST(coalesce(p.pred_set, 'None') = tg.gold_set AS INT) AS correct
FROM tg LEFT JOIN pred p ON tg.k = p.k
"""


# ================================================================== S2
def s2_stream_triples(spark: SparkSession, sf: str) -> DataFrame:
    """S2: the REAL Structured-Streaming extraction path, driver-gated —
    ``readStream`` over the transcript fixture, the production
    stream-static join extractor (``ingest.turn_local_triples_join``:
    fused Arrow pair UDF + three broadcast stream-static joins), memory
    sink under an ``availableNow`` trigger, then the drained table
    distinct-canonicalized (append mode forbids distinct in-stream).

    The oracle is the INDEPENDENT batch derivation (the relational pairs
    chain + bidirectional fact join in DuckDB), so hash agreement proves
    stream ≡ batch end-to-end — the same property test_streaming checks
    in pytest, now under the driver's hash protocol."""
    import tempfile

    from ..sources import synthetic as syn
    from ..streaming.ingest import turn_local_triples_join
    import __spark_entry__ as e
    fxd = syn.ensure_fixtures(spark, sf)
    src = os.path.join(fxd, "transcripts.parquet")
    schema = spark.read.parquet(src).schema
    turns = spark.readStream.schema(schema).parquet(src)
    trip = turn_local_triples_join(
        turns, e._fx(spark, sf, "kb_aliases"), e._fx(spark, sf, "kb_facts"))
    qn = "s2_gate_triples"
    for q in spark.streams.active:
        if q.name == qn:
            q.stop()
    ck = tempfile.mkdtemp(prefix="s2_gate_ck_")
    q = (trip.writeStream.format("memory").queryName(qn)
         .outputMode("append").option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(qn) \
        .select("subj", "pred", "obj", "conv_id", "turn_idx").distinct()


def _s2_sql(e) -> str:
    return f"""
WITH {e._sql_pairs().lstrip()},
trips AS (
  SELECT p.em1_text AS subj, f.relation AS pred, p.em2_text AS obj,
         p.conv_id, p.turn_idx
  FROM pairs p JOIN {e._fx_sql('kb_facts')} f
    ON p.em1_entity = f.subj_id AND p.em2_entity = f.obj_id
  UNION ALL
  SELECT p.em2_text, f.relation, p.em1_text, p.conv_id, p.turn_idx
  FROM pairs p JOIN {e._fx_sql('kb_facts')} f
    ON p.em2_entity = f.subj_id AND p.em1_entity = f.obj_id
)
SELECT DISTINCT subj, pred, obj, conv_id, turn_idx FROM trips
"""


# ------------------------------------------------------------- registry
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "m4_objective_mix": m4_objective_mix,
        "m5_lr_schedule": m5_lr_schedule,
        "m6_rm_bcd_epoch": m6_rm_bcd_epoch,
        "s7_embedding_roundtrip": s7_embedding_roundtrip,
        "s8_prediction_roundtrip": s8_prediction_roundtrip,
        "m9_nb_vote": m9_nb_vote,
        "s2_stream_triples": s2_stream_triples,
    }


def oracles() -> dict[str, str]:
    import __spark_entry__ as e
    return {
        "m4_objective_mix": _m4_sql(),
        "m5_lr_schedule": _m5_sql(),
        "m6_rm_bcd_epoch": _m6_sql(e),
        "s7_embedding_roundtrip": _s7_sql(),
        "s8_prediction_roundtrip": _s8_sql(),
        "m9_nb_vote": _m9_sql(e),
        "s2_stream_triples": _s2_sql(e),
    }
