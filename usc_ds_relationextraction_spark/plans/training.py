"""Joint embedding training — BCD re-expression (SURVEY.md §2.8 M1-M6).

The reference trains 50-d embeddings of mentions/features/types with
Hogwild pthreads (``retype.cpp:256-266``): lock-free shared-memory SGD —
a construct with no Spark analog.  The reference itself ships a
**block-coordinate-descent mode** (``hplelib.cpp:148-173,520-632``,
``retype-rm.cpp:169-193``): accumulate per-node error vectors over a full
pass, then apply ``vec += err/grad_cnt``.  That semantics maps 1:1 onto
Spark: per-partition gradient computation (mapInPandas, Arrow-batched
NumPy) → ``groupBy(node).agg(elementwise sum)`` → apply.

State placement (the scale decision):
 - **mention embeddings**: distributed (id, vec) DataFrame — 10^12
   mentions never touch the driver; per-epoch updates join-apply +
   ``localCheckpoint`` to truncate lineage.
 - **feature/type embeddings**: driver NumPy matrices, broadcast per
   epoch — the reference holds exactly these in shared memory for the
   same reason (small: |F|×50, |Y|×50).  Up to ~10^7 features this is
   executor-resident; beyond that the lookup flips to a join (the grad
   path already speaks DataFrames, only the snapshot changes).

Objectives (CoType-RM, the reference's published variant; M6):
 - SGNS (LINE 2nd order) on mention–feature and feature–type graphs
   (``hplelib.cpp:400-463``): σ-loss with K negatives drawn from the
   degree^0.75 distribution via inverse-CDF searchsorted on a broadcast
   cumulative array (replacing the reference's 4·10^8-slot unigram table,
   ``hplelib.cpp:296-327`` — SURVEY §4).
 - PLE partial-label margin on mention–type (``hplelib.cpp:465-518``):
   pos = argmax score over candidate types, neg = argmax over
   non-candidates, hinge margin 1, L2 decay α.

Randomness: `pd.util.hash_pandas_object` over edge keys ⊕ (epoch, k) —
platform-stable, partition-count independent → reproducible at any
parallelism (the N vs 4N scaling evidence depends on this).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import h64
from ..sources.catalog import Warehouse

GRAD_SCHEMA = "node_set string, node_id long, grad array<double>, cnt double"


def init_embeddings(nodes: DataFrame, id_col: str, dim: int = 50,
                    salt: str = "init") -> DataFrame:
    """Deterministic word2vec-style init: uniform(-0.5, 0.5)/dim per
    component, derived from (id, component, salt) hashes — identical on
    any partitioning (reference seeds gsl rand48 at 314159265,
    retype.cpp:230-233; we need partition-independence instead)."""
    comps = [
        ((F.pmod(h64(F.concat_ws("|", F.col(id_col).cast("string"),
                                 F.lit(str(i)), F.lit(salt))),
                 F.lit(1000003)) / 1000003.0 - 0.5) / dim).cast("float")
        for i in range(dim)
    ]
    return nodes.select(F.col(id_col).alias("id"),
                        F.array(*comps).alias("vec"))


def init_matrix(ids: np.ndarray, dim: int, salt: str) -> np.ndarray:
    """Driver-side twin of :func:`init_embeddings` (same hash recipe)."""
    from ..functions.hashing import h64_py
    out = np.empty((len(ids), dim), dtype=np.float64)
    for r, nid in enumerate(ids):
        for i in range(dim):
            out[r, i] = ((h64_py(f"{nid}|{i}|{salt}") % 1000003)
                         / 1000003.0 - 0.5) / dim
    return out


def _agg_grads(grads: DataFrame, dim: int) -> DataFrame:
    """groupBy(node_set, node_id) elementwise sum — `dim` native SUM aggs
    (whole-stage codegen; no UDAF)."""
    sums = [F.sum(F.col("grad")[i]).alias(f"g{i}") for i in range(dim)]
    out = grads.groupBy("node_set", "node_id").agg(
        F.sum("cnt").alias("cnt"), *sums)
    return out.select(
        "node_set", "node_id", "cnt",
        F.array(*[F.col(f"g{i}") for i in range(dim)]).alias("grad"))


def _hash_u01(keys: pd.Series, salt: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(keys, index=False).values
    h = (h * np.uint64(2654435761) + np.uint64(salt * 1000003 + 12345)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))


def _lookup(id2row: dict, ids: np.ndarray) -> np.ndarray:
    return np.fromiter((id2row[int(i)] for i in ids), dtype=np.int64,
                       count=len(ids))


def _sgns_block(U: np.ndarray, u_ids, v_ids, w, V: np.ndarray, v_i2r,
                neg_ids, neg_cum, u_set: str, v_set: str, epoch: int,
                negatives: int) -> list[pd.DataFrame]:
    """SGNS gradients for one (sub)batch; returns grad-row frames.

    cnt = w: the reference SAMPLES edges ∝ w (alias table,
    hplelib.cpp:285-286) so each draw contributes an unweighted gradient;
    the full-pass BCD analog is the weighted MEAN — grad carries w, so
    the divisor must too.
    """
    Vv = V[_lookup(v_i2r, v_ids)]
    s = _sigmoid(np.einsum("ij,ij->i", U, Vv))
    g = (1.0 - s) * w
    gu = g[:, None] * Vv
    out = [pd.DataFrame({"node_set": v_set, "node_id": v_ids.astype(np.int64),
                         "grad": list(g[:, None] * U), "cnt": w})]
    key = pd.Series(u_ids).astype(str) + "_" + pd.Series(v_ids).astype(str)
    for k in range(negatives):
        u01 = _hash_u01(key, epoch * 7919 + k)
        nidx = np.searchsorted(neg_cum, u01, side="left")
        nid = neg_ids[np.clip(nidx, 0, len(neg_ids) - 1)]
        Vn = V[_lookup(v_i2r, nid)]
        sn = _sigmoid(np.einsum("ij,ij->i", U, Vn))
        gn = (0.0 - sn) * w
        gu += gn[:, None] * Vn
        out.append(pd.DataFrame({"node_set": v_set,
                                 "node_id": nid.astype(np.int64),
                                 "grad": list(gn[:, None] * U), "cnt": w}))
    out.append(pd.DataFrame({"node_set": u_set,
                             "node_id": u_ids.astype(np.int64),
                             "grad": list(gu), "cnt": w}))
    return out


def _ple_block(M: np.ndarray, u_ids, cands, Y: np.ndarray, y_i2r,
               y_ids, alpha: float) -> list[pd.DataFrame]:
    """PLE margin gradients (hplelib.cpp:465-518): pos = argmax over
    candidate types, neg = argmax over non-candidates, hinge margin 1,
    L2 decay α on the mention."""
    nY = len(y_ids)
    S = M @ Y.T
    rows = {"node_set": [], "node_id": [], "grad": [], "cnt": []}
    for i, cand in enumerate(cands):
        crow = [y_i2r[int(c)] for c in cand if int(c) in y_i2r]
        if not crow or len(crow) == nY:
            continue
        mask = np.zeros(nY, dtype=bool)
        mask[crow] = True
        si = S[i]
        pos = np.where(mask)[0][np.argmax(si[mask])]
        neg = np.where(~mask)[0][np.argmax(si[~mask])]
        gm = -alpha * M[i]
        if si[pos] - si[neg] < 1.0:  # margin violated
            gm = gm + (Y[pos] - Y[neg])
            rows["node_set"] += ["type", "type"]
            rows["node_id"] += [int(y_ids[pos]), int(y_ids[neg])]
            rows["grad"] += [M[i].copy(), -M[i]]
            rows["cnt"] += [1.0, 1.0]
        rows["node_set"].append("mention")
        rows["node_id"].append(int(u_ids[i]))
        rows["grad"].append(gm)
        rows["cnt"].append(1.0)
    return [pd.DataFrame(rows)] if rows["node_id"] else []


def unified_grad_step(edges: DataFrame, bcast, epoch: int, negatives: int,
                      alpha: float) -> DataFrame:
    """Single mapInPandas pass over the unified edge table.

    Row kinds: 0 = SGNS mention–feature (u_vec column), 1 = SGNS
    feature–type (both sides from broadcast), 2 = PLE mention–type
    (u_vec + cand_ids).  One UDF invocation per epoch keeps the per-epoch
    Spark job count constant — the driver loop is the only iteration.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        f_i2r, F_mat, neg_f, y_i2r, Y_mat, neg_y, y_ids = bcast.value
        for b in batches:
            if len(b) == 0:
                continue
            frames: list[pd.DataFrame] = []
            k0 = b[b["kind"] == 0]
            if len(k0):
                U = np.stack(k0["u_vec"].values).astype(np.float64)
                frames += _sgns_block(
                    U, k0["u_id"].values, k0["v_id"].values,
                    k0["w"].values.astype(np.float64), F_mat, f_i2r,
                    neg_f[0], neg_f[1], "mention", "feature",
                    epoch, negatives)
            k1 = b[b["kind"] == 1]
            if len(k1):
                U = F_mat[_lookup(f_i2r, k1["u_id"].values)]
                frames += _sgns_block(
                    U, k1["u_id"].values, k1["v_id"].values,
                    k1["w"].values.astype(np.float64), Y_mat, y_i2r,
                    neg_y[0], neg_y[1], "feature", "type",
                    epoch, negatives)
            k2 = b[b["kind"] == 2]
            if len(k2):
                M = np.stack(k2["u_vec"].values).astype(np.float64)
                frames += _ple_block(M, k2["u_id"].values,
                                     k2["cand_ids"].values, Y_mat, y_i2r,
                                     y_ids, alpha)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return edges.mapInPandas(run, schema=GRAD_SCHEMA)


class CoTypeRMTrainer:
    """CoType-RM (M6): SGNS(M–F) + SGNS(F–Y) + PLE(M–Y), epoch-synchronous
    BCD, per-epoch lr decay (retype.cpp:241), checkpoint every k epochs."""

    def __init__(self, spark: SparkSession, wh: Warehouse, prefix: str,
                 dim: int = 50, negatives: int = 3, lr: float = 0.02,
                 alpha: float = 0.0001, checkpoint_every: int = 10):
        self.spark = spark
        self.wh = wh
        self.prefix = prefix
        self.dim = dim
        self.negatives = negatives
        self.lr0 = lr
        self.alpha = alpha
        self.checkpoint_every = checkpoint_every

    # ---------------------------------------------------------- helpers
    def _name(self, s: str) -> str:
        return f"{self.prefix}_emb_{s}"

    def _matrix_df(self, ids: np.ndarray, mat: np.ndarray) -> DataFrame:
        rows = [(int(i), [float(x) for x in mat[r]])
                for r, i in enumerate(ids)]
        return self.spark.createDataFrame(rows, "id long, vec array<float>")

    def _checkpoint(self, epoch: int, lr: float, emb_m: DataFrame,
                    f_ids, F_mat, y_ids, Y_mat) -> DataFrame:
        wh = self.wh
        emb_m = wh.write(self._name("mention"), emb_m)
        wh.write(self._name("feature"), self._matrix_df(f_ids, F_mat))
        wh.write(self._name("type"), self._matrix_df(y_ids, Y_mat))
        wh.write(self._name("meta"), self.spark.createDataFrame(
            [(epoch, float(lr))], "epoch int, lr double"))
        return emb_m

    # ------------------------------------------------------------- train
    def train(self, mention_feature: DataFrame, feature_type: DataFrame,
              mention_type: DataFrame, epochs: int = 50,
              resume: bool = True, verbose: bool = False) -> dict[str, DataFrame]:
        import time as _time
        spark, dim = self.spark, self.dim
        sc = spark.sparkContext

        # driver-side small matrices (features, types)
        f_ids = np.sort(np.array(
            [r["feature_id"] for r in mention_feature.select("feature_id")
             .union(feature_type.select("feature_id")).distinct().collect()],
            dtype=np.int64))
        y_ids = np.sort(np.array(
            [r["type_id"] for r in mention_type.select("type_id")
             .union(feature_type.select("type_id")).distinct().collect()],
            dtype=np.int64))
        f_i2r = {int(i): r for r, i in enumerate(f_ids)}
        y_i2r = {int(i): r for r, i in enumerate(y_ids)}

        start_epoch = 0
        if resume and self.wh.exists(self._name("meta")):
            meta = self.wh.read(self._name("meta")).collect()[0]
            start_epoch = meta["epoch"] + 1
            emb_m = self.wh.read(self._name("mention"))
            frows = self.wh.read(self._name("feature")).collect()
            F_mat = np.zeros((len(f_ids), dim))
            for r in frows:
                F_mat[f_i2r[r["id"]]] = r["vec"]
            yrows = self.wh.read(self._name("type")).collect()
            Y_mat = np.zeros((len(y_ids), dim))
            for r in yrows:
                Y_mat[y_i2r[r["id"]]] = r["vec"]
        else:
            emb_m = init_embeddings(
                mention_feature.select("mention_id").distinct(),
                "mention_id", dim, "m")
            F_mat = init_matrix(f_ids, dim, "f")
            Y_mat = init_matrix(y_ids, dim, "y")
        if start_epoch >= epochs:
            return {"mention": emb_m,
                    "feature": self._matrix_df(f_ids, F_mat),
                    "type": self._matrix_df(y_ids, Y_mat)}

        # static per-run prep (negative tables from weighted degrees, A4/A5)
        def neg_table(graph, col):
            rows = graph.groupBy(col).agg(F.sum("w").alias("d")) \
                .orderBy(col).collect()
            ids = np.array([r[col] for r in rows], dtype=np.int64)
            w = np.array([r["d"] for r in rows], dtype=np.float64) ** 0.75
            cum = np.cumsum(w)
            return ids, cum / cum[-1]

        neg_f = neg_table(mention_feature, "feature_id")
        neg_y = neg_table(feature_type, "type_id")

        # unified static edge table: one UDF pass per epoch over all three
        # objectives (kind 0: SGNS M–F, 1: SGNS F–Y, 2: PLE M–Y); the F–Y
        # side needs no mention join (both endpoints live in broadcasts)
        mf = mention_feature.select(
            F.lit(0).alias("kind"), F.col("mention_id").alias("u_id"),
            F.col("feature_id").alias("v_id"), "w",
            F.lit(None).cast("array<long>").alias("cand_ids"))
        fy = feature_type.select(
            F.lit(1).alias("kind"), F.col("feature_id").alias("u_id"),
            F.col("type_id").alias("v_id"), "w",
            F.lit(None).cast("array<long>").alias("cand_ids"))
        # v_id = 0 (not NULL): a null in an int64 column degrades the whole
        # Arrow batch to float64 in pandas, corrupting 60-bit hash ids
        cand = (mention_type.groupBy("mention_id")
                .agg(F.collect_list("type_id").alias("cand_ids"))
                .select(F.lit(2).alias("kind"),
                        F.col("mention_id").alias("u_id"),
                        F.lit(0).cast("long").alias("v_id"),
                        F.lit(1.0).alias("w"), "cand_ids"))
        m_edges = mf.unionByName(cand) \
            .repartition(int(spark.conf.get("spark.sql.shuffle.partitions")),
                         "u_id").localCheckpoint(eager=True)
        fy = fy.localCheckpoint(eager=True)

        # A/B on-disk checkpoints for the mention table: flat lineage,
        # no accumulation of in-memory checkpoint blocks across epochs
        ab = [self.wh.path(self._name("mention_a")),
              self.wh.path(self._name("mention_b"))]
        emb_m.write.mode("overwrite").parquet(ab[0])
        emb_m = spark.read.parquet(ab[0])

        negatives, alpha = self.negatives, self.alpha
        for epoch in range(start_epoch, epochs):
            _t0 = _time.time()
            lr = max(self.lr0 * (1.0 - epoch / float(epochs)),
                     self.lr0 * 1e-4)
            bcast = sc.broadcast((f_i2r, F_mat, neg_f, y_i2r, Y_mat,
                                  neg_y, y_ids))

            m_named = emb_m.select(F.col("id").alias("u_id"),
                                   F.col("vec").alias("u_vec"))
            with_vec = m_edges.join(m_named, on="u_id", how="left") \
                .unionByName(fy.withColumn(
                    "u_vec", F.lit(None).cast("array<float>")))
            grads = unified_grad_step(with_vec, bcast, epoch, negatives, alpha)
            agg = _agg_grads(grads, dim).localCheckpoint(eager=True)

            # apply: features/types on the driver (small), mentions via join
            for r in agg.where(F.col("node_set").isin("feature", "type")) \
                    .collect():
                tgt, i2r = ((F_mat, f_i2r) if r["node_set"] == "feature"
                            else (Y_mat, y_i2r))
                row = i2r.get(r["node_id"])
                if row is not None:
                    tgt[row] += lr * np.asarray(r["grad"]) / r["cnt"]

            mg = agg.where(F.col("node_set") == "mention") \
                .select(F.col("node_id").alias("id"), "grad", "cnt")
            new_m = emb_m.join(mg, on="id", how="left").select(
                "id",
                F.when(F.col("grad").isNotNull(),
                       F.zip_with("vec", "grad",
                                  lambda v, gr: (v + F.lit(lr) * gr
                                                 / F.col("cnt")).cast("float")))
                .otherwise(F.col("vec")).alias("vec"))
            tgt_path = ab[(epoch + 1) % 2]
            new_m.write.mode("overwrite").parquet(tgt_path)
            emb_m = spark.read.parquet(tgt_path)
            agg.unpersist()
            bcast.unpersist()

            if (epoch + 1) % self.checkpoint_every == 0 or epoch == epochs - 1:
                emb_m = self._checkpoint(epoch, lr, emb_m,
                                         f_ids, F_mat, y_ids, Y_mat)
            if verbose:
                print(f"[train {self.prefix}] epoch {epoch} lr={lr:.5f} "
                      f"wall={_time.time() - _t0:.1f}s", flush=True)

        return {"mention": emb_m,
                "feature": self._matrix_df(f_ids, F_mat),
                "type": self._matrix_df(y_ids, Y_mat)}


# ---------------------------------------------------------------- joint mode
def transe_step(triples_with_vecs: DataFrame, epoch: int) -> DataFrame:
    """TransE BCD pass (M3, hplelib.cpp:723-768,913-963).

    Input rows: (h_id, t_id, r_id, h_vec, t_vec, r_vec, tc_id, tc_vec)
    where tc is the deterministically-paired corrupted tail (already
    filtered against observed triples — the J10 left-anti).  Margin-1
    sign-gradient on ‖h+r−t‖₁ vs ‖h+r−tc‖₁; all touched rows are emitted
    for the BCD apply, and the caller projects them to the unit ball
    (the reference projects after each update, hplelib.cpp:746-767).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            H = np.stack(b["h_vec"].values).astype(np.float64)
            T = np.stack(b["t_vec"].values).astype(np.float64)
            R = np.stack(b["r_vec"].values).astype(np.float64)
            TC = np.stack(b["tc_vec"].values).astype(np.float64)
            d_pos = H + R - T
            d_neg = H + R - TC
            s_pos = np.abs(d_pos).sum(axis=1)
            s_neg = np.abs(d_neg).sum(axis=1)
            viol = s_pos + 1.0 > s_neg  # margin 1 (hplelib.cpp:934)
            if not viol.any():
                continue
            sp = np.sign(d_pos[viol])
            sn = np.sign(d_neg[viol])
            rows = []
            for ids, grads in (
                (b["h_id"].values[viol], -sp + sn),
                (b["t_id"].values[viol], sp),
                (b["r_id"].values[viol], -sp + sn),
                (b["tc_id"].values[viol], -sn),
            ):
                rows.append(pd.DataFrame({
                    "node_set": "mention", "node_id": ids.astype(np.int64),
                    "grad": list(grads),
                    "cnt": np.ones(viol.sum())}))
            yield pd.concat(rows, ignore_index=True)

    return triples_with_vecs.mapInPandas(run, schema=GRAD_SCHEMA)


def corrupted_triples_simple(triples: DataFrame, epoch: int,
                             n_buckets: int = 64) -> DataFrame:
    """Simpler deterministic corruption: shift pairing via double window."""
    key = F.concat_ws("|", F.col("h_id"), F.col("t_id"), F.col("r_id"),
                      F.lit(str(epoch)))
    t = triples.withColumn("bucket", F.pmod(h64(key), F.lit(n_buckets)))
    w = Window.partitionBy("bucket").orderBy(h64(F.concat_ws(
        "#", F.col("h_id"), F.col("t_id"), F.col("r_id"), F.lit(str(epoch)))))
    t = t.withColumn("rn", F.row_number().over(w))
    shifted = t.select(F.col("bucket").alias("bucket_s"),
                       F.col("rn").alias("rn_s"),
                       F.col("t_id").alias("tc_id"))
    n_per = t.groupBy("bucket").agg(F.count("*").alias("nb"))
    t = t.join(n_per, on="bucket").withColumn(
        "rn_next", F.col("rn") % F.col("nb") + 1)
    paired = t.join(shifted, (F.col("bucket") == F.col("bucket_s")) &
                    (F.col("rn_next") == F.col("rn_s"))) \
        .select("h_id", "t_id", "r_id", "tc_id") \
        .where(F.col("tc_id") != F.col("t_id"))
    # J10: corrupted triple must not be observed
    obs = triples.select(F.col("h_id"), F.col("t_id").alias("tc_id"),
                         F.col("r_id"))
    return paired.join(obs, on=["h_id", "tc_id", "r_id"], how="left_anti")


class CoTypeJointTrainer(CoTypeRMTrainer):
    """Joint mode (M1-M5): CoType-RM objectives + TransE coupling over the
    (em1, em2, rm) mention-triple table (retype.cpp mode 'j').

    EM and RM mention ids share one distributed embedding table (disjoint
    hash id spaces); TransE is the only objective touching EM rows here —
    the em-side feature nets run as a separate CoTypeRMTrainer('em') when
    full parity is needed.  Objective mixing: the reference alias-samples
    {1,1,transWeight} (retype.cpp:183-186); BCD runs every objective every
    epoch — transWeight folds into the gradient scale.
    """

    def __init__(self, *args, trans_weight: float = 1.0, **kw):
        super().__init__(*args, **kw)
        self.trans_weight = trans_weight

    def train(self, mention_feature: DataFrame, feature_type: DataFrame,
              mention_type: DataFrame, triples: DataFrame | None = None,
              epochs: int = 50, resume: bool = True,
              verbose: bool = False) -> dict[str, DataFrame]:
        if triples is None:
            return super().train(mention_feature, feature_type,
                                 mention_type, epochs, resume, verbose)
        self._triples = triples.select(
            F.col("em1_id").alias("h_id"), F.col("em2_id").alias("t_id"),
            F.col("rm_id").alias("r_id")).localCheckpoint(eager=True)
        # widen the mention id space: EM ids enter via the triple table
        extra = self._triples.select(F.col("h_id").alias("mention_id")) \
            .union(self._triples.select("t_id")) \
            .union(self._triples.select("r_id")).distinct()
        mf_ids = mention_feature.select("mention_id").distinct()
        self._all_mentions = mf_ids.union(extra).distinct()
        return self._train_joint(mention_feature, feature_type,
                                 mention_type, epochs, resume, verbose)

    def _train_joint(self, mention_feature, feature_type, mention_type,
                     epochs, resume, verbose):
        """Same epoch loop as the base class plus a TransE pass whose
        gradients merge into the one BCD apply."""
        import time as _time
        spark, dim = self.spark, self.dim
        sc = spark.sparkContext

        f_ids = np.sort(np.array(
            [r["feature_id"] for r in mention_feature.select("feature_id")
             .union(feature_type.select("feature_id")).distinct().collect()],
            dtype=np.int64))
        y_ids = np.sort(np.array(
            [r["type_id"] for r in mention_type.select("type_id")
             .union(feature_type.select("type_id")).distinct().collect()],
            dtype=np.int64))
        f_i2r = {int(i): r for r, i in enumerate(f_ids)}
        y_i2r = {int(i): r for r, i in enumerate(y_ids)}

        emb_m = init_embeddings(self._all_mentions, "mention_id", dim, "m")
        F_mat = init_matrix(f_ids, dim, "f")
        Y_mat = init_matrix(y_ids, dim, "y")

        def neg_table(graph, col):
            rows = graph.groupBy(col).agg(F.sum("w").alias("d")) \
                .orderBy(col).collect()
            ids = np.array([r[col] for r in rows], dtype=np.int64)
            w = np.array([r["d"] for r in rows], dtype=np.float64) ** 0.75
            cum = np.cumsum(w)
            return ids, cum / cum[-1]

        neg_f = neg_table(mention_feature, "feature_id")
        neg_y = neg_table(feature_type, "type_id")

        mf = mention_feature.select(
            F.lit(0).alias("kind"), F.col("mention_id").alias("u_id"),
            F.col("feature_id").alias("v_id"), "w",
            F.lit(None).cast("array<long>").alias("cand_ids"))
        fy = feature_type.select(
            F.lit(1).alias("kind"), F.col("feature_id").alias("u_id"),
            F.col("type_id").alias("v_id"), "w",
            F.lit(None).cast("array<long>").alias("cand_ids"))
        cand = (mention_type.groupBy("mention_id")
                .agg(F.collect_list("type_id").alias("cand_ids"))
                .select(F.lit(2).alias("kind"),
                        F.col("mention_id").alias("u_id"),
                        F.lit(0).cast("long").alias("v_id"),
                        F.lit(1.0).alias("w"), "cand_ids"))
        m_edges = mf.unionByName(cand) \
            .repartition(int(spark.conf.get("spark.sql.shuffle.partitions")),
                         "u_id").localCheckpoint(eager=True)
        fy = fy.localCheckpoint(eager=True)
        ab = [self.wh.path(self._name("mention_a")),
              self.wh.path(self._name("mention_b"))]
        emb_m.write.mode("overwrite").parquet(ab[0])
        emb_m = spark.read.parquet(ab[0])

        for epoch in range(epochs):
            _t0 = _time.time()
            lr = max(self.lr0 * (1.0 - epoch / float(epochs)),
                     self.lr0 * 1e-4)
            bcast = sc.broadcast((f_i2r, F_mat, neg_f, y_i2r, Y_mat,
                                  neg_y, y_ids))
            m_named = emb_m.select(F.col("id").alias("u_id"),
                                   F.col("vec").alias("u_vec"))
            with_vec = m_edges.join(m_named, on="u_id", how="left") \
                .unionByName(fy.withColumn(
                    "u_vec", F.lit(None).cast("array<float>")))
            g_base = unified_grad_step(with_vec, bcast, epoch,
                                       self.negatives, self.alpha)

            # TransE pass: corrupt, join the four vectors, sign-grad
            ct = corrupted_triples_simple(self._triples, epoch)
            mv = emb_m
            tw = ct
            for cid, vname in (("h_id", "h_vec"), ("t_id", "t_vec"),
                               ("r_id", "r_vec"), ("tc_id", "tc_vec")):
                mv_r = mv.select(F.col("id").alias(cid),
                                 F.col("vec").alias(vname))
                tw = tw.join(mv_r, on=cid)
            g_tr = transe_step(tw, epoch)
            if self.trans_weight != 1.0:
                g_tr = g_tr.withColumn(
                    "grad", F.transform(
                        "grad", lambda x: x * F.lit(self.trans_weight)))

            agg = _agg_grads(g_base.unionByName(g_tr), dim) \
                .localCheckpoint(eager=True)
            for r in agg.where(
                    F.col("node_set").isin("feature", "type")).collect():
                tgt, i2r = ((F_mat, f_i2r) if r["node_set"] == "feature"
                            else (Y_mat, y_i2r))
                row = i2r.get(r["node_id"])
                if row is not None:
                    tgt[row] += lr * np.asarray(r["grad"]) / r["cnt"]

            mg = agg.where(F.col("node_set") == "mention") \
                .select(F.col("node_id").alias("id"), "grad", "cnt")
            new_m = emb_m.join(mg, on="id", how="left").select(
                "id",
                F.when(F.col("grad").isNotNull(),
                       F.zip_with("vec", "grad",
                                  lambda v, gr: (v + F.lit(lr) * gr
                                                 / F.col("cnt")).cast("float")))
                .otherwise(F.col("vec")).alias("vec"))
            # unit-ball projection (hplelib.cpp:746-767): L2 norm > 1 → /norm
            norm = F.sqrt(F.aggregate(
                "vec", F.lit(0.0), lambda acc, x: acc + x * x))
            new_m = new_m.select(
                "id",
                F.when(norm > 1.0,
                       F.transform("vec", lambda x: (x / norm).cast("float")))
                .otherwise(F.col("vec")).alias("vec"))
            tgt_path = ab[(epoch + 1) % 2]
            new_m.write.mode("overwrite").parquet(tgt_path)
            emb_m = spark.read.parquet(tgt_path)
            agg.unpersist()
            bcast.unpersist()
            if (epoch + 1) % self.checkpoint_every == 0 or epoch == epochs - 1:
                emb_m = self._checkpoint(epoch, lr, emb_m,
                                         f_ids, F_mat, y_ids, Y_mat)
            if verbose:
                print(f"[joint {self.prefix}] epoch {epoch} lr={lr:.5f} "
                      f"wall={_time.time() - _t0:.1f}s", flush=True)

        return {"mention": emb_m,
                "feature": self._matrix_df(f_ids, F_mat),
                "type": self._matrix_df(y_ids, Y_mat)}
