"""One-epoch BCD training doubles — driver-gate (oracle-checked) entries
for the M1/M2/M3 objectives that previously had pytest coverage only.

Each query runs the REAL executor-side gradient code from
``plans/training.py`` (``_sgns_block`` / ``_ple_block`` /
``transe_step`` / ``corrupted_triples_simple``) through mapInPandas for
exactly one epoch, with the numeric kernels swapped for engine-portable
twins where the production defaults are not bit-reproducible in SQL:

 - sigmoid: the reference's OWN precomputed 1000-bin table
   (hplelib.cpp:289-293) — bin values are fixed doubles, inlined as
   literals in the DuckDB twin, so no cross-libm exp trust is needed.
 - uniforms: md5-derived (functions/sampling.hashed_u01), the same
   portable-hash construction every other oracle uses, instead of the
   pandas-hash fast path.
 - dot products: explicit left-associated component sums (dim=4), the
   same evaluation order SQL uses.

Per-draw gradient ROWS are emitted and quantized BEFORE any cross-row
aggregation — every arithmetic step is a single IEEE-754 operation with
identical rounding in both engines, so the value-hash comparison is
exact, not approximate.  (The production epoch loop then aggregates with
plain F.sum — covered by dozens of existing oracle queries.)

All gradient math cites: SGNS hplelib.cpp:400-463, PLE 465-518, TransE
723-768/913-963; corruption pairing J10 anti-join (training.py).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from functools import reduce
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h64, h64_duckdb, h64_py
from ..functions.sampling import SigmoidTable, hashed_u01
from .training import (GRAD_SCHEMA, _ple_block, _sgns_block,
                       corrupted_triples_simple, init_embeddings,
                       init_matrix, transe_step)

DIM = 4
NEGATIVES = 2
VOCAB_MIN_FREQ = 50
PLE_ALPHA = 0.0001  # L2 decay, retype.cpp default


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _entry():
    import __spark_entry__ as entry
    return entry


def _portable_dot(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Left-associated component sum — the order SQL evaluates
    ``a0*b0 + a1*b1 + ...``; einsum/BLAS may reorder/FMA."""
    return reduce(lambda acc, i: acc + A[:, i] * B[:, i],
                  range(1, A.shape[1]), A[:, 0] * B[:, 0])


def _md5_u01(keys: pd.Series, salt: int) -> np.ndarray:
    """Portable twin of training._hash_u01 (same signature)."""
    return hashed_u01(list(keys), f"sg{salt}")


def _init_vec_sql(id_expr: str, salt: str, dim: int = DIM,
                  as_real: bool = False) -> list[str]:
    """DuckDB twins of init_embeddings (as_real=True: the Spark side casts
    each component to float32) / init_matrix (doubles)."""
    out = []
    for i in range(dim):
        h = h64_duckdb(f"{id_expr} || '|{i}|{salt}'")
        e = f"((({h} % 1000003) / 1000003.0 - 0.5) / {dim})"
        out.append(f"CAST({e} AS REAL)" if as_real else e)
    return out


def _quantized(grads: DataFrame, scale: int) -> DataFrame:
    cols = [F.floor(F.col("grad")[i] * scale + 0.5).cast("bigint")
            .alias(f"g{i}") for i in range(DIM)]
    return grads.select("node_set", "node_id", *cols,
                        F.floor(F.col("cnt") * 1000 + 0.5).cast("bigint")
                        .alias("cnt_milli"))


# ===================================================================== M1
def _m1_edges(spark: SparkSession, sf: str) -> DataFrame:
    """mention–feature graph: doc → vocab token (freq ≥ 50), w = count."""
    from .parity_queries import _doc_toks
    toks = _doc_toks(spark, sf)
    voc = toks.groupBy("token").agg(F.count("*").alias("freq")) \
        .where(f"freq >= {VOCAB_MIN_FREQ}").select("token")
    e = toks.join(F.broadcast(voc), on="token") \
        .groupBy("doc_id", "token").agg(F.count("*").alias("cnt"))
    return e.select(F.col("doc_id").cast("long").alias("u_id"),
                    h64("token").alias("v_id"),
                    F.col("cnt").cast("double").alias("w"))


def m1_sgns_epoch(spark: SparkSession, sf: str) -> DataFrame:
    """M1: one BCD epoch of the REAL ``_sgns_block`` (SGNS with K=2
    negatives drawn from the degree^0.75 inverse CDF) over the
    document–token graph; per-draw gradient rows quantized ×10^6."""
    edges = _m1_edges(spark, sf)
    # driver-side feature state (small vocab — the trainer's own layout)
    deg = edges.groupBy("v_id").agg(F.sum("w").alias("d")) \
        .orderBy("v_id").toPandas()
    v_ids = deg["v_id"].to_numpy(dtype=np.int64)
    d = deg["d"].to_numpy(dtype=np.float64)
    w75 = np.floor(np.sqrt(d * np.sqrt(d)) * 1000).astype(np.int64)
    cum = np.cumsum(w75)
    neg_cum = cum.astype(np.float64) / float(cum[-1])
    V = init_matrix(v_ids, DIM, "f")
    v_i2r = {int(i): r for r, i in enumerate(v_ids)}
    tbl = SigmoidTable()
    b = spark.sparkContext.broadcast((v_ids, neg_cum, V, v_i2r, tbl))

    with_vec = edges.join(
        init_embeddings(edges.select(F.col("u_id").alias("mention_id"))
                        .distinct(), "mention_id", DIM, "m")
        .select(F.col("id").alias("u_id"), F.col("vec").alias("u_vec")),
        on="u_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, cumv, Vm, i2r, sig = b.value
        for batch in batches:
            if not len(batch):
                continue
            U = np.stack(batch["u_vec"].values).astype(np.float64)
            frames = _sgns_block(
                U, batch["u_id"].values, batch["v_id"].values,
                batch["w"].values.astype(np.float64), Vm, i2r, ids, cumv,
                "mention", "feature", epoch=0, negatives=NEGATIVES,
                sigmoid_fn=sig.value, u01_fn=_md5_u01,
                dot_fn=_portable_dot)
            yield pd.concat(frames, ignore_index=True)

    grads = with_vec.mapInPandas(run, schema=GRAD_SCHEMA)
    return _quantized(grads, 1_000_000)


def _m1_sql() -> str:
    from .parity_queries import _sql_doc_toks
    tbl = SigmoidTable()
    uv = _init_vec_sql("CAST(u_id AS VARCHAR)", "m", as_real=True)
    vv = {side: _init_vec_sql(f"CAST({side} AS VARCHAR)", "f")
          for side in ("v_id", "n0", "n1")}
    dot = {s: "(" + " + ".join(f"({uv[i]} * {vv[s][i]})"
                               for i in range(DIM)) + ")"
           for s in ("v_id", "n0", "n1")}
    sig = {s: tbl.sql_case(f"f_{k}")
           for k, s in (("pos", "v_id"), ("n0", "n0"), ("n1", "n1"))}
    # hashed_u01 hashes str(key) + chr(31) + salt with salt='sg<k>'
    u = {k: (f"(({h64_duckdb('key || chr(31) || ' + repr('sg' + k))}) "
             f"/ {float(1 << 60)!r})") for k in ("0", "1")}
    gq = " , ".join(
        f"CAST(floor(grad_{i} * 1000000 + 0.5) AS BIGINT) AS g{i}"
        for i in range(DIM))
    pos_rows = ", ".join(f"(g * {uv[i]}) AS grad_{i}" for i in range(DIM))
    n0_rows = ", ".join(f"(gn0 * {uv[i]}) AS grad_{i}" for i in range(DIM))
    n1_rows = ", ".join(f"(gn1 * {uv[i]}) AS grad_{i}" for i in range(DIM))
    # u-side accumulation order: ((g*Vv) + gn0*Vn0) + gn1*Vn1
    u_rows = ", ".join(
        f"(((g * {vv['v_id'][i]}) + (gn0 * {vv['n0'][i]})) "
        f"+ (gn1 * {vv['n1'][i]})) AS grad_{i}" for i in range(DIM))
    return f"""
WITH {_sql_doc_toks()},
voc AS (SELECT token FROM doc_toks GROUP BY token
        HAVING COUNT(*) >= {VOCAB_MIN_FREQ}),
edges AS (
  SELECT CAST(t.doc_id AS BIGINT) AS u_id,
         {h64_duckdb('t.token')} AS v_id,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM doc_toks t JOIN voc v ON t.token = v.token
  GROUP BY t.doc_id, t.token
),
degs AS (
  SELECT v_id, CAST(SUM(w) AS DOUBLE) AS d FROM edges GROUP BY v_id
),
cumt AS (
  SELECT v_id,
         CAST(SUM(CAST(floor(sqrt(d * sqrt(d)) * 1000) AS BIGINT))
              OVER (ORDER BY v_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum
  FROM degs
),
total AS (SELECT MAX(cum) AS tot FROM cumt),
cumf AS (
  SELECT v_id,
         CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS hi,
         coalesce(CAST(lag(cum) OVER (ORDER BY v_id) AS DOUBLE)
                  / CAST(tot AS DOUBLE), -1.0) AS lo
  FROM cumt, total
),
keyed AS (
  SELECT u_id, v_id, w,
         {u['0']} AS u0, {u['1']} AS u1
  FROM (SELECT u_id, v_id, w,
               CAST(u_id AS VARCHAR) || '_' || CAST(v_id AS VARCHAR) AS key
        FROM edges)
),
drawn AS (
  -- searchsorted(cum, u, 'left'): the unique row with lo < u <= hi
  SELECT k.u_id, k.v_id, k.w, c0.v_id AS n0, c1.v_id AS n1
  FROM keyed k
  JOIN cumf c0 ON c0.hi >= k.u0 AND c0.lo < k.u0
  JOIN cumf c1 ON c1.hi >= k.u1 AND c1.lo < k.u1
),
scored AS (
  SELECT u_id, v_id, w, n0, n1,
         {dot['v_id']} AS f_pos, {dot['n0']} AS f_n0, {dot['n1']} AS f_n1
  FROM drawn
),
gg AS (
  SELECT u_id, v_id, w, n0, n1,
         ((1.0 - {sig['v_id']}) * w) AS g,
         ((0.0 - {sig['n0']}) * w) AS gn0,
         ((0.0 - {sig['n1']}) * w) AS gn1
  FROM scored
),
rows_ AS (
  SELECT 'feature' AS node_set, v_id AS node_id, {pos_rows}, w AS cnt
  FROM gg
  UNION ALL
  SELECT 'feature', n0, {n0_rows}, w FROM gg
  UNION ALL
  SELECT 'feature', n1, {n1_rows}, w FROM gg
  UNION ALL
  SELECT 'mention', u_id, {u_rows}, w FROM gg
)
SELECT node_set, node_id, {gq},
       CAST(floor(cnt * 1000 + 0.5) AS BIGINT) AS cnt_milli
FROM rows_
"""


# ===================================================================== M2
def m2_ple_epoch(spark: SparkSession, sf: str) -> DataFrame:
    """M2: one BCD epoch of the REAL ``_ple_block`` (PLE partial-label
    margin, hplelib.cpp:465-518) over the DS-labeled pair universe —
    candidate types from the gold sets, hash-init embeddings, per-row
    gradient rows quantized ×10^9.

    Scores feed only the argmax picks (robust to last-ulp BLAS
    differences); every EMITTED number is a one-op product/sum of
    identically-derived doubles, so the quantized hash is exact."""
    from .gate_queries import _type_vocab
    from .parity_queries import _gold_pred
    gp = _gold_pred(spark, sf).select("k", "gold_set")
    vocab = _type_vocab(spark, sf)
    names = [r["name"] for r in vocab.collect()]
    # type ids are h64(name); Y row layout is sorted-id order
    y_ids = np.sort(np.array([h64_py(n) for n in names], dtype=np.int64))
    Y = init_matrix(y_ids, DIM, "y")
    b = spark.sparkContext.broadcast((y_ids, Y))

    ments = gp.select(
        h64("k").alias("u_id"), "k",
        F.transform(F.split("gold_set", ","), lambda s: h64(s))
        .alias("cand_ids"))
    with_vec = ments.join(
        init_embeddings(ments.select(F.col("u_id").alias("mention_id")),
                        "mention_id", DIM, "m")
        .select(F.col("id").alias("u_id"), F.col("vec").alias("u_vec")),
        on="u_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, Ym = b.value
        i2r = {int(i): r for r, i in enumerate(ids)}
        for batch in batches:
            if not len(batch):
                continue
            M = np.stack(batch["u_vec"].values).astype(np.float64)
            frames = _ple_block(M, batch["u_id"].values,
                                batch["cand_ids"].values, Ym, i2r, ids,
                                PLE_ALPHA, "type")
            for fr in frames:
                yield fr

    grads = with_vec.mapInPandas(run, schema=GRAD_SCHEMA)
    return _quantized(grads, 1_000_000_000)


def _m2_sql(e) -> str:
    from .parity_queries import _gold_pred_sql
    mv = _init_vec_sql(f"CAST({h64_duckdb('k')} AS VARCHAR)", "m",
                       as_real=True)
    yv = _init_vec_sql("CAST(y_id AS VARCHAR)", "y")
    dot = "(" + " + ".join(f"(m{i} * y{i})" for i in range(DIM)) + ")"
    gq = ", ".join(
        f"CAST(floor(grad_{i} * 1000000000 + 0.5) AS BIGINT) AS g{i}"
        for i in range(DIM))
    gm = ", ".join(
        f"((CAST(-{PLE_ALPHA!r} AS DOUBLE) * p.m{i})"
        f" + (yp.y{i} - yn.y{i})) AS grad_{i}"
        for i in range(DIM))
    return _gold_pred_sql(e) + f"""
, labs AS (
  SELECT DISTINCT label FROM (
    SELECT relation AS label FROM {e._fx_sql('kb_facts')}
    UNION SELECT 'None')
),
yids AS (
  SELECT label, {h64_duckdb('label')} AS y_id FROM labs
),
yvec AS (
  SELECT y_id, row_number() OVER (ORDER BY y_id) - 1 AS yrow,
         {', '.join(f'{yv[i]} AS y{i}' for i in range(DIM))}
  FROM yids
),
ments AS (
  SELECT k, {h64_duckdb('k')} AS u_id, gold_set FROM gp
),
mvec AS (
  SELECT k, u_id, gold_set,
         {', '.join(f'{mv[i]} AS m{i}' for i in range(DIM))}
  FROM ments
),
cands AS (
  SELECT m.k, {h64_duckdb('u.label')} AS cand_id
  FROM ments m, UNNEST(string_split(m.gold_set, ',')) AS u(label)
),
scored AS (
  -- left join, not a correlated IN: 250x faster in DuckDB, same truth
  SELECT m.k, m.u_id, y.y_id, y.yrow,
         (c.cand_id IS NOT NULL) AS is_cand,
         {dot} AS s
  FROM mvec m CROSS JOIN yvec y
  LEFT JOIN cands c ON c.k = m.k AND c.cand_id = y.y_id
),
-- np.argmax: first maximal row in y-row order, within/outside the mask
pos AS (
  SELECT k, y_id AS pos_id, s AS s_pos FROM (
    SELECT k, y_id, s, row_number() OVER (
      PARTITION BY k ORDER BY s DESC, yrow ASC) AS rk
    FROM scored WHERE is_cand)
  WHERE rk = 1
),
neg AS (
  SELECT k, y_id AS neg_id, s AS s_neg FROM (
    SELECT k, y_id, s, row_number() OVER (
      PARTITION BY k ORDER BY s DESC, yrow ASC) AS rk
    FROM scored WHERE NOT is_cand)
  WHERE rk = 1
),
pn AS (
  SELECT p.*, n.neg_id, n.s_neg, pos.s_pos, pos.pos_id
  FROM mvec p JOIN pos ON p.k = pos.k JOIN neg n ON p.k = n.k
),
viol AS (SELECT * FROM pn WHERE s_pos - s_neg < 1.0),
rows_ AS (
  -- violated: +M into pos type, -M into neg type
  SELECT 'type' AS node_set, pos_id AS node_id,
         {', '.join(f'CAST(m{i} AS DOUBLE) AS grad_{i}' for i in range(DIM))},
         1.0 AS cnt
  FROM viol
  UNION ALL
  SELECT 'type', neg_id,
         {', '.join(f'(-CAST(m{i} AS DOUBLE)) AS grad_{i}' for i in range(DIM))},
         1.0
  FROM viol
  -- mention rows: gm = -alpha*M (+ Y[pos]-Y[neg] when violated)
  UNION ALL
  SELECT 'mention', p.u_id, {gm}, 1.0
  FROM viol p JOIN yvec yp ON p.pos_id = yp.y_id
              JOIN yvec yn ON p.neg_id = yn.y_id
  UNION ALL
  SELECT 'mention', p.u_id,
         {', '.join(f'(CAST(-{PLE_ALPHA!r} AS DOUBLE) * p.m{i}) AS grad_{i}'
                    for i in range(DIM))},
         1.0
  FROM pn p WHERE NOT (s_pos - s_neg < 1.0)
)
SELECT node_set, node_id, {gq},
       CAST(floor(cnt * 1000 + 0.5) AS BIGINT) AS cnt_milli
FROM rows_
"""


# ===================================================================== M3
def _m3_triples(spark: SparkSession, sf: str) -> DataFrame:
    e = _entry()
    p = e._labeled_pairs_df(spark, sf)
    k = lambda *cols: F.concat_ws("_", *cols)  # noqa: E731
    return p.select(
        h64(k("conv_id", "turn_idx", "sent_id", "em1_start", "em1_end"))
        .alias("h_id"),
        h64(k("conv_id", "turn_idx", "sent_id", "em2_start", "em2_end"))
        .alias("t_id"),
        h64(k("conv_id", "turn_idx", "sent_id", "em1_start", "em1_end",
              "em2_start", "em2_end")).alias("r_id")).distinct()


def m3_transe_epoch(spark: SparkSession, sf: str) -> DataFrame:
    """M3: one BCD epoch of the REAL ``transe_step`` + the REAL
    ``corrupted_triples_simple`` corruption (with its J10 anti-join)
    over DS mention triples.  Sign gradients are exact integers — no
    quantization risk at all."""
    tri = _m3_triples(spark, sf)
    ct = corrupted_triples_simple(tri, epoch=0)
    ids = tri.select(F.col("h_id").alias("mention_id")) \
        .unionByName(tri.select(F.col("t_id").alias("mention_id"))) \
        .unionByName(tri.select(F.col("r_id").alias("mention_id"))) \
        .distinct()
    vecs = init_embeddings(ids, "mention_id", DIM, "m")
    tw = ct
    for cid, vname in (("h_id", "h_vec"), ("t_id", "t_vec"),
                       ("r_id", "r_vec"), ("tc_id", "tc_vec")):
        tw = tw.join(vecs.select(F.col("id").alias(cid),
                                 F.col("vec").alias(vname)), on=cid)
    grads = transe_step(tw, epoch=0)
    cols = [F.col("grad")[i].cast("bigint").alias(f"g{i}")
            for i in range(DIM)]
    return grads.select("node_set", "node_id", *cols,
                        F.col("cnt").cast("bigint").alias("cnt_i"))


def _m3_sql(e) -> str:
    vec = {s: _init_vec_sql(f"CAST({s} AS VARCHAR)", "m", as_real=True)
           for s in ("h_id", "t_id", "r_id", "tc_id")}
    dp = [f"((h{i} + r{i}) - t{i})" for i in range(DIM)]
    dn = [f"((h{i} + r{i}) - c{i})" for i in range(DIM)]
    sabs = lambda ds: "(((abs(%s) + abs(%s)) + abs(%s)) + abs(%s))" % tuple(ds)  # noqa: E731
    sgn = lambda x: f"(CASE WHEN {x} > 0 THEN 1 WHEN {x} < 0 THEN -1 ELSE 0 END)"  # noqa: E731
    key_b = "CAST(h_id AS VARCHAR) || '|' || t_id || '|' || r_id || '|0'"
    key_o = "CAST(h_id AS VARCHAR) || '#' || t_id || '#' || r_id || '#0'"
    hsel = ", ".join(f"((-sp{i}) + sn{i}) AS grad_{i}" for i in range(DIM))
    tsel = ", ".join(f"sp{i} AS grad_{i}" for i in range(DIM))
    csel = ", ".join(f"(-sn{i}) AS grad_{i}" for i in range(DIM))
    k5 = "conv_id || '_' || turn_idx || '_' || sent_id || '_'"
    return f"""
WITH {e._sql_pairs().lstrip()},
tri AS (
  SELECT DISTINCT
    {h64_duckdb(k5 + " || p.em1_start || '_' || p.em1_end")} AS h_id,
    {h64_duckdb(k5 + " || p.em2_start || '_' || p.em2_end")} AS t_id,
    {h64_duckdb(k5 + " || p.em1_start || '_' || p.em1_end || '_' || p.em2_start || '_' || p.em2_end")}
      AS r_id
  FROM pairs p
  JOIN {e._fx_sql('kb_facts')} f
    ON (p.em1_entity = f.subj_id AND p.em2_entity = f.obj_id)
    OR (p.em2_entity = f.subj_id AND p.em1_entity = f.obj_id)
),
bkt AS (
  SELECT h_id, t_id, r_id,
         ({h64_duckdb(key_b)} % 64) AS bucket,
         row_number() OVER (PARTITION BY ({h64_duckdb(key_b)} % 64)
                            ORDER BY {h64_duckdb(key_o)}) AS rn
  FROM tri
),
nb AS (SELECT bucket, COUNT(*) AS n FROM bkt GROUP BY bucket),
paired AS (
  SELECT a.h_id, a.t_id, a.r_id, s.t_id AS tc_id
  FROM bkt a JOIN nb ON a.bucket = nb.bucket
  JOIN bkt s ON s.bucket = a.bucket AND s.rn = a.rn % nb.n + 1
  WHERE s.t_id <> a.t_id
),
ct AS (
  SELECT p.* FROM paired p
  WHERE NOT EXISTS (SELECT 1 FROM tri o
                    WHERE o.h_id = p.h_id AND o.t_id = p.tc_id
                      AND o.r_id = p.r_id)
),
vecs AS (
  SELECT h_id, t_id, r_id, tc_id,
         {', '.join(f'{vec["h_id"][i]} AS h{i}' for i in range(DIM))},
         {', '.join(f'{vec["t_id"][i]} AS t{i}' for i in range(DIM))},
         {', '.join(f'{vec["r_id"][i]} AS r{i}' for i in range(DIM))},
         {', '.join(f'{vec["tc_id"][i]} AS c{i}' for i in range(DIM))}
  FROM ct
),
dd AS (
  SELECT *, {', '.join(f'{dp[i]} AS dp{i}' for i in range(DIM))},
         {', '.join(f'{dn[i]} AS dn{i}' for i in range(DIM))}
  FROM vecs
),
viol AS (
  SELECT *,
         {', '.join(f"{sgn(f'dp{i}')} AS sp{i}" for i in range(DIM))},
         {', '.join(f"{sgn(f'dn{i}')} AS sn{i}" for i in range(DIM))}
  FROM dd
  WHERE {sabs([f'dp{i}' for i in range(DIM)])} + 1.0
        > {sabs([f'dn{i}' for i in range(DIM)])}
),
rows_ AS (
  SELECT 'mention' AS node_set, h_id AS node_id, {hsel}, 1 AS cnt_i
  FROM viol
  UNION ALL
  SELECT 'mention', t_id, {tsel}, 1 FROM viol
  UNION ALL
  SELECT 'mention', r_id, {hsel}, 1 FROM viol
  UNION ALL
  SELECT 'mention', tc_id, {csel}, 1 FROM viol
)
SELECT node_set, node_id,
       {', '.join(f'CAST(grad_{i} AS BIGINT) AS g{i}' for i in range(DIM))},
       CAST(cnt_i AS BIGINT) AS cnt_i
FROM rows_
"""


# --------------------------------------------------------------- registry
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "m1_sgns_epoch": m1_sgns_epoch,
        "m2_ple_epoch": m2_ple_epoch,
        "m3_transe_epoch": m3_transe_epoch,
    }


def oracles() -> dict[str, str]:
    e = _entry()
    return {
        "m1_sgns_epoch": _m1_sql(),
        "m2_ple_epoch": _m2_sql(e),
        "m3_transe_epoch": _m3_sql(e),
    }
