"""Driver-gate queries for operators previously covered only by pytest:
P9 (None-label weight), A9/J6 (mention embedding = mean of feature
embeddings, real operator), M8 (None fallback on zero score), A5
(degree^0.75 cumulative sampling table).

Engine-parity rules as everywhere: integer quantization, portable md5
hash, and — for A5 — ``x^0.75 = sqrt(x·sqrt(x))``: IEEE 754 mandates
correctly-rounded sqrt/multiply, so the expression is bit-identical
across engines, unlike ``pow(x, 0.75)`` whose libm rounding may differ
in the last ulp between the JVM and DuckDB.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import h64, h64_duckdb
from ..operators import graphs

EMB_DIM = 8
NEG_LABEL_WEIGHT = 0.25
VOCAB_MIN_FREQ = 50
N_TYPES = 4


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _entry():
    import __spark_entry__ as entry
    return entry


# ----------------------------------------------------------------- P9
def p9_none_weight(spark: SparkSession, sf: str) -> DataFrame:
    """P9: the real ``graphs.mention_type_graph`` with the None-label
    discount (pruning_heuristics.py:66-67) over the DS-labeled pair
    universe — gold sets from facts, 'None' otherwise."""
    from .parity_queries import _gold_pred
    gp = _gold_pred(spark, sf).select(
        F.col("k").alias("mention_key"),
        F.split("gold_set", ",").alias("labels"))
    g = graphs.mention_type_graph(gp, NEG_LABEL_WEIGHT)
    return g.select(
        "mention_id", "type_id",
        F.floor(F.col("w") * 1000 + 0.5).cast("bigint").alias("w_milli"))


def _p9_sql(e) -> str:
    from .parity_queries import _gold_pred_sql
    hk = h64_duckdb("k")
    hl = h64_duckdb("label")
    return _gold_pred_sql(e) + f"""
, lab9 AS (
  SELECT DISTINCT {hk} AS mention_id, label
  FROM gp, UNNEST(string_split(gold_set, ',')) AS u(label)
)
SELECT mention_id, {hl} AS type_id,
       CASE WHEN label = 'None'
            THEN CAST({int(NEG_LABEL_WEIGHT * 1000)} AS BIGINT)
            ELSE CAST(1000 AS BIGINT) END AS w_milli
FROM lab9
"""


# ------------------------------------------------------------- A9/J6
def f_token_key(i: int) -> str:
    """DuckDB expr for the feature-embedding hash key 'token|e|<i>'."""
    return f"token || '|e|{i}'"


def y_label_key(i: int) -> str:
    """DuckDB expr for the type-embedding hash key '<label>|y|<i>'."""
    return f"label || '|y|{i}'"


def _feature_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic quantized feature-embedding dimension: one row per
    vocab token (freq >= VOCAB_MIN_FREQ over documents), vec[i] =
    h64(token|'e'|i) % 2001 ∈ [0, 2000] (nonnegative keeps every
    downstream division engine-portable)."""
    from .parity_queries import _doc_toks
    voc = _doc_toks(spark, sf).groupBy("token") \
        .agg(F.count("*").alias("freq")).where(f"freq >= {VOCAB_MIN_FREQ}")
    comps = [
        F.pmod(h64(F.concat_ws("|", "token", F.lit("e"), F.lit(str(i)))),
               F.lit(2001)).cast("float")
        for i in range(EMB_DIM)
    ]
    return voc.select("token", F.array(*comps).alias("vec"))


def _sql_femb() -> str:
    from .parity_queries import _sql_doc_toks
    comps = ", ".join(
        f"({h64_duckdb(f_token_key(i))} % 2001) AS e{i}"
        for i in range(EMB_DIM))
    return f"""{_sql_doc_toks()},
voc AS (SELECT token FROM doc_toks GROUP BY token
        HAVING COUNT(*) >= {VOCAB_MIN_FREQ}),
femb AS (SELECT token, {comps} FROM voc)"""


def a9_mention_emb_mean(spark: SparkSession, sf: str) -> DataFrame:
    """A9/J6: the REAL ``inference.mention_embeddings`` operator
    (broadcast feature-embedding join + per-dim AVG, emb_prediction.py:
    80-89), mention = document, features = vocab tokens.  Output
    quantized floor(avg·1000 + 0.5): integer sums < 2^53 keep the double
    average exact and order-independent, so the quantization is portable."""
    from ..plans.inference import mention_embeddings
    from .parity_queries import _doc_toks
    mf = _doc_toks(spark, sf).select(
        F.col("doc_id").alias("mention_id"),
        F.col("token").alias("feature_id"))
    femb = _feature_embeddings(spark, sf) \
        .select(F.col("token").alias("id"), "vec")
    me = mention_embeddings(mf, femb, dim=EMB_DIM)
    return me.select(
        F.col("mention_id").alias("doc_id"),
        *[F.floor(F.col("vec")[i] * 1000 + 0.5).cast("bigint")
          .alias(f"m{i}") for i in range(EMB_DIM)])


def _a9_sql() -> str:
    ms = ", ".join(
        f"CAST(floor(AVG(CAST(e{i} AS DOUBLE)) * 1000 + 0.5) AS BIGINT)"
        f" AS m{i}" for i in range(EMB_DIM))
    return f"""WITH {_sql_femb()}
SELECT d.doc_id, {ms}
FROM doc_toks d JOIN femb f ON d.token = f.token
GROUP BY d.doc_id
"""


# ----------------------------------------------------------------- M8
def m8_none_fallback(spark: SparkSession, sf: str) -> DataFrame:
    """M8 (emb_prediction.py:133-135): argmax type score with the None
    fallback at score == 0.  Mention vec = per-doc SUM of vocab-token
    embeddings CENTERED at -1000 (so docs whose tokens all miss the vocab
    gate produce the all-zero vector); type vecs are derived integers;
    scores are exact integer dot products.  Docs with no vocab tokens at
    all keep a zero vector via the left join."""
    from .parity_queries import _doc_toks
    d = _t(spark, sf, "documents").select("doc_id")
    femb = _feature_embeddings(spark, sf)
    toks = _doc_toks(spark, sf)
    j = toks.join(F.broadcast(femb), on="token")
    sums = [F.sum(F.col("vec")[i].cast("bigint") - 1000).alias(f"s{i}")
            for i in range(EMB_DIM)]
    mv = j.groupBy("doc_id").agg(*sums)
    mv = d.join(mv, on="doc_id", how="left") \
        .select("doc_id", *[F.coalesce(F.col(f"s{i}"), F.lit(0))
                            .alias(f"s{i}") for i in range(EMB_DIM)])
    types = spark.range(N_TYPES).select(
        F.concat(F.lit("label_"), F.col("id")).alias("label"),
        *[(F.pmod(h64(F.concat_ws("|", F.concat(F.lit("label_"), F.col("id")),
                                  F.lit("y"), F.lit(str(i)))),
                  F.lit(2001)) - 1000).alias(f"y{i}")
          for i in range(EMB_DIM)])
    crossed = mv.crossJoin(F.broadcast(types))
    dot = sum(F.col(f"s{i}") * F.col(f"y{i}") for i in range(EMB_DIM))
    scored = crossed.select("doc_id", "label", dot.alias("score"))
    best = scored.groupBy("doc_id").agg(
        F.max(F.struct(F.col("score"), F.col("label"))).alias("mx"))
    return best.select(
        "doc_id",
        F.when(F.col("mx.score") == 0, F.lit("None"))
         .otherwise(F.col("mx.label")).alias("pred_label"),
        F.col("mx.score").alias("best_score"))


def _m8_sql() -> str:
    ss = ", ".join(
        f"coalesce(SUM(CAST(e{i} AS BIGINT) - 1000), 0) AS s{i}"
        for i in range(EMB_DIM))
    ys = ", ".join(
        f"({h64_duckdb(y_label_key(i))} % 2001 - 1000) AS y{i}"
        for i in range(EMB_DIM))
    dot = " + ".join(f"s{i} * y{i}" for i in range(EMB_DIM))
    return f"""WITH {_sql_femb()},
mv AS (
  SELECT d.doc_id, {ss}
  FROM documents d
  LEFT JOIN (SELECT t.doc_id AS td, f.*
             FROM doc_toks t JOIN femb f ON t.token = f.token) q
    ON d.doc_id = q.td
  GROUP BY d.doc_id
),
types AS (
  SELECT 'label_' || i AS label FROM UNNEST(generate_series(0, {N_TYPES - 1})) AS g(i)
),
tvec AS (SELECT label, {ys} FROM types),
scored AS (
  SELECT mv.doc_id, t.label, CAST({dot} AS BIGINT) AS score
  FROM mv CROSS JOIN tvec t
),
best AS (
  SELECT doc_id, label, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, label DESC) AS rk
  FROM scored
)
SELECT doc_id,
       CASE WHEN score = 0 THEN 'None' ELSE label END AS pred_label,
       score AS best_score
FROM best WHERE rk = 1
"""


# ----------------------------------------------------------------- A5
def a5_cumulative_table(spark: SparkSession, sf: str) -> DataFrame:
    """A5: the degree^0.75 inverse-CDF sampling table (hplelib.cpp:
    296-327 replacement, SURVEY §4): per-node weighted degree (A4) →
    w75 = floor(sqrt(deg·sqrt(deg))·1000) → running cumulative sum in
    node order.  At scale the window is over the NODE table (vocab-sized);
    the searchsorted draw happens executor-side against the broadcast
    array (plans/training.py)."""
    li = _t(spark, sf, "lineitem")
    deg = li.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_quantity") * 100 + 0.5).cast("bigint"))
        .alias("deg_c"))
    w75 = F.floor(F.sqrt(F.col("deg_c") * F.sqrt(F.col("deg_c"))) * 1000) \
        .cast("bigint")
    t = deg.select("l_partkey", "deg_c", w75.alias("w75_milli"))
    w = Window.orderBy("l_partkey") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return t.withColumn("cum_milli",
                        F.sum("w75_milli").over(w).cast("bigint"))


_A5_SQL = """
WITH deg AS (
  SELECT l_partkey,
         CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS deg_c
  FROM lineitem GROUP BY l_partkey
),
w AS (
  SELECT l_partkey, deg_c,
         CAST(floor(sqrt(deg_c * sqrt(deg_c)) * 1000) AS BIGINT)
           AS w75_milli
  FROM deg
)
SELECT l_partkey, deg_c, w75_milli,
       CAST(SUM(w75_milli) OVER (ORDER BY l_partkey
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_milli
FROM w
"""


# ------------------------------------------------------------ F13/F23
def f13_dep_features(spark: SparkSession, sf: str) -> DataFrame:
    """F13/F23 (pattern-arc approximation, functions/dependencies.py):
    the real pandas UDF over NP-chunk mentions, byte-checked against an
    independent SQL arc derivation — reference emission format
    DEP_gov:/DEP_dep: with the N/V + accepted-type filters."""
    from ..functions.dependencies import make_dep_features_udf
    e = _entry()
    m = e._mentions_df(spark, sf).select("conv_id", "turn_idx",
                                         "start", "end")
    tt = e._turn_tokens(spark, sf).select("conv_id", "turn_idx",
                                          "toks", "pos")
    j = m.join(tt, ["conv_id", "turn_idx"])
    udf = make_dep_features_udf()
    f = j.select("conv_id", "turn_idx", "start", "end",
                 F.explode(udf("toks", "pos", "start", "end"))
                 .alias("feature"))
    return f.groupBy("conv_id", "turn_idx", "start", "end", "feature") \
        .agg(F.count("*").alias("n"))


def _f13_sql(e) -> str:
    from .parity_queries import _sql_lems
    return f"""
WITH {e._sql_mentions().lstrip()},
{_sql_lems()},
nbr AS (
  SELECT conv_id, turn_idx, pos, token, tag,
         lead(tag) OVER w AS tag_n,
         lag(tag) OVER w AS tag_p
  FROM lems
  WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY pos)
),
arcs AS (
  SELECT conv_id, turn_idx, 'amod' AS dt, pos + 1 AS gov, pos AS dep
  FROM nbr WHERE tag LIKE 'JJ%' AND tag_n LIKE 'N%'
  UNION ALL
  SELECT conv_id, turn_idx, 'nn', pos + 1, pos
  FROM nbr WHERE tag LIKE 'N%' AND tag_n LIKE 'N%'
  UNION ALL
  SELECT conv_id, turn_idx, 'nsubj', pos + 1, pos
  FROM nbr WHERE tag LIKE 'N%' AND tag_n LIKE 'V%'
  UNION ALL
  SELECT conv_id, turn_idx, 'dobj', pos, pos + 1
  FROM nbr WHERE tag LIKE 'V%' AND tag_n LIKE 'N%'
  UNION ALL
  SELECT conv_id, turn_idx, 'prep_' || lower(token), pos - 1, pos + 1
  FROM nbr WHERE tag = 'IN' AND tag_n LIKE 'N%'
        AND (tag_p LIKE 'N%' OR tag_p LIKE 'V%')
),
govf AS (
  SELECT m.conv_id, m.turn_idx, m.start, m."end",
         'DEP_gov:' || a.dt || ':' || l.lemma || '='
           || substr(l.tag, 1, 1) AS feature
  FROM mentions m
  JOIN arcs a ON a.conv_id = m.conv_id AND a.turn_idx = m.turn_idx
             AND a.gov BETWEEN m.start + 1 AND m."end"
  JOIN lems l ON l.conv_id = a.conv_id AND l.turn_idx = a.turn_idx
             AND l.pos = a.dep
  WHERE substr(l.tag, 1, 1) IN ('N', 'V')
),
depf AS (
  SELECT m.conv_id, m.turn_idx, m.start, m."end",
         'DEP_dep:' || a.dt || ':' || l.lemma || '='
           || substr(l.tag, 1, 1) AS feature
  FROM mentions m
  JOIN arcs a ON a.conv_id = m.conv_id AND a.turn_idx = m.turn_idx
             AND a.dep BETWEEN m.start + 1 AND m."end"
  JOIN lems l ON l.conv_id = a.conv_id AND l.turn_idx = a.turn_idx
             AND l.pos = a.gov
  WHERE substr(l.tag, 1, 1) IN ('N', 'V')
)
SELECT conv_id, turn_idx, start, "end", feature, COUNT(*) AS n
FROM (SELECT * FROM govf UNION ALL SELECT * FROM depf)
GROUP BY conv_id, turn_idx, start, "end", feature
"""


# ------------------------------------------------------------ registry
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "p9_none_weight": p9_none_weight,
        "a9_mention_emb_mean": a9_mention_emb_mean,
        "m8_none_fallback": m8_none_fallback,
        "a5_cumulative_table": a5_cumulative_table,
        "f13_dep_features": f13_dep_features,
    }


def oracles() -> dict[str, str]:
    e = _entry()
    return {
        "p9_none_weight": _p9_sql(e),
        "a9_mention_emb_mean": _a9_sql(),
        "m8_none_fallback": _m8_sql(),
        "a5_cumulative_table": _A5_SQL,
        "f13_dep_features": _f13_sql(e),
    }
