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
   A/B parquet checkpoints to truncate lineage.
 - **feature/type embeddings**: driver NumPy matrices, broadcast per
   epoch — the reference holds exactly these in shared memory for the
   same reason (small: |F|×50, |Y|×50).  The per-epoch gradient apply is
   Arrow-batched (``toPandas`` → vectorized ``+=``), never a Row-object
   ``collect()``.  ``SMALL_MATRIX_LIMIT`` guards the placement: beyond
   ~10^7 nodes the broadcast+driver-apply flips to the join-based apply
   (the same code path mentions already use — gradients stay DataFrames
   end-to-end; only the lookup side changes, negatives pre-sampled as
   edges instead of broadcast-CDF draws).

Namespaces: the reference's joint mode interleaves the EM-side nets
(PLE+SG over entity-mention graphs) with the RM-side nets and TransE in
one epoch loop (``retype.cpp:149-161``).  Here each side is an
*embedding namespace* — its own feature/type matrices and negative
tables — and the unified edge table carries an ``ns`` column, so ONE
mapInPandas pass per epoch still covers every objective of every
namespace (mention embeddings are shared across namespaces; EM/RM
mention ids are disjoint 60-bit key hashes).

Objectives (CoType-RM, the reference's published variant; M6):
 - SGNS (LINE 2nd order) on mention–feature and feature–type graphs
   (``hplelib.cpp:400-463``): σ-loss with K negatives drawn from the
   degree^0.75 distribution via inverse-CDF searchsorted on a broadcast
   cumulative array (replacing the reference's 4·10^8-slot unigram table,
   ``hplelib.cpp:296-327`` — SURVEY §4).
 - PLE partial-label margin on mention–type (``hplelib.cpp:465-518``):
   pos = argmax score over candidate types, neg = argmax over
   non-candidates, hinge margin 1, L2 decay α.
 - TransE margin loss over (em1, em2, rm) mention triples
   (``hplelib.cpp:723-768,913-963``) in joint mode.

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

# flip point for the feature/type matrices: rows×dim doubles ≈ 8 GB at
# 2·10^7×50 — past this the broadcast snapshot + driver apply must become
# a join-based lookup/apply (documented above).  Enforced, not aspirational:
# _build_space raises so the misconfiguration fails loudly, not as an OOM.
SMALL_MATRIX_LIMIT = 20_000_000


def lr_schedule(lr0: float, epoch: int, epochs: int) -> float:
    """M5 per-epoch lr decay (retype.cpp:241): linear decay to a 1e-4
    floor.  Single source of truth for both trainers AND the
    ``m5_lr_schedule`` driver-gate oracle — every operation is one IEEE
    op so the SQL twin reproduces it bit-exactly."""
    return max(lr0 * (1.0 - epoch / float(epochs)), lr0 * 1e-4)


def is_checkpoint_epoch(epoch: int, epochs: int, every: int) -> bool:
    """M5 checkpoint cadence: every ``every`` epochs and at the end."""
    return (epoch + 1) % every == 0 or epoch == epochs - 1


def objective_interleave(n_iters: int, trans_weight: float = 1.0,
                         salt: str = "m4") -> "pd.DataFrame":
    """M4 objective mixer — the reference's joint epoch alias-samples
    which objective each iteration optimizes with weights
    {1, 1, transWeight} over {CoType-EM, CoType-RM, TransE}
    (retype.cpp:134-172,183-186).  Our BCD epochs run every objective
    every pass (transWeight folds into the gradient scale), so this
    deterministic interleave is the REFERENCE-shaped schedule: the same
    Walker–Vose table every other sampler uses, keyed on the iteration
    index (resume/replay-stable).  Returns a pandas frame
    (iter, objective)."""
    from ..functions.sampling import AliasTable
    tbl = AliasTable(np.array([1.0, 1.0, trans_weight]))
    names = np.array(["cotype_em", "cotype_rm", "transe"])
    keys = [str(i) for i in range(n_iters)]
    idx = tbl.draw_hashed(keys, salt)
    return pd.DataFrame({"iter": np.arange(n_iters, dtype=np.int64),
                         "objective": names[idx]})


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
    """Driver-side twin of :func:`init_embeddings` (same hash recipe —
    one md5 PER (id, component), so it stays SQL-expressible for the
    oracle doubles in plans/training_doubles).  Correctness-tier: the
    trainer itself uses :func:`init_matrix_fast` (rows×dim md5 calls
    would serialize the driver at the SMALL_MATRIX_LIMIT scale)."""
    from ..functions.hashing import h64_py
    out = np.empty((len(ids), dim), dtype=np.float64)
    for r, nid in enumerate(ids):
        for i in range(dim):
            out[r, i] = ((h64_py(f"{nid}|{i}|{salt}") % 1000003)
                         / 1000003.0 - 0.5) / dim
    return out


def init_matrix_fast(ids: np.ndarray, dim: int, salt: str) -> np.ndarray:
    """At-scale deterministic init: ONE md5 per node id seeds a
    splitmix64 stream whose per-component outputs are vectorized numpy —
    rows md5 calls + dim array passes instead of rows×dim md5 calls
    (the round-2 driver-scale defect).  Same uniform(-0.5,0.5)/dim range
    as :func:`init_matrix`; partition/resume-deterministic because the
    seed depends only on (id, salt)."""
    from ..functions.hashing import h64_py
    seeds = np.array([h64_py(f"{int(i)}|{salt}") for i in ids],
                     dtype=np.uint64)
    out = np.empty((len(ids), dim), dtype=np.float64)
    x = seeds.copy()
    g = np.uint64(0x9E3779B97F4A7C15)
    c1 = np.uint64(0xBF58476D1CE4E5B9)
    c2 = np.uint64(0x94D049BB133111EB)
    for i in range(dim):
        x = x + g  # wraps mod 2^64
        z = x.copy()
        z ^= z >> np.uint64(30)
        z *= c1
        z ^= z >> np.uint64(27)
        z *= c2
        z ^= z >> np.uint64(31)
        out[:, i] = ((z % np.uint64(1000003)).astype(np.float64)
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
                negatives: int, sigmoid_fn=None, u01_fn=None,
                dot_fn=None) -> list[pd.DataFrame]:
    """SGNS gradients for one (sub)batch; returns grad-row frames.

    cnt = w: the reference SAMPLES edges ∝ w (alias table,
    hplelib.cpp:285-286) so each draw contributes an unweighted gradient;
    the full-pass BCD analog is the weighted MEAN — grad carries w, so
    the divisor must too.

    The three numeric kernels are pluggable so the oracle-gate double
    (plans/training_doubles.py m1_sgns_epoch) can run THIS code path with
    engine-portable twins — the reference's binned sigmoid table
    (hplelib.cpp:289-293), md5-derived uniforms, and a left-associated
    dot — while production keeps the fast defaults (exact sigmoid,
    pandas-hash uniforms, einsum).
    """
    sigmoid_fn = sigmoid_fn or _sigmoid
    u01_fn = u01_fn or _hash_u01
    dot_fn = dot_fn or (lambda A, B: np.einsum("ij,ij->i", A, B))
    Vv = V[_lookup(v_i2r, v_ids)]
    s = sigmoid_fn(dot_fn(U, Vv))
    g = (1.0 - s) * w
    gu = g[:, None] * Vv
    out = [pd.DataFrame({"node_set": v_set, "node_id": v_ids.astype(np.int64),
                         "grad": list(g[:, None] * U), "cnt": w})]
    key = pd.Series(u_ids).astype(str) + "_" + pd.Series(v_ids).astype(str)
    for k in range(negatives):
        u01 = u01_fn(key, epoch * 7919 + k)
        nidx = np.searchsorted(neg_cum, u01, side="left")
        nid = neg_ids[np.clip(nidx, 0, len(neg_ids) - 1)]
        Vn = V[_lookup(v_i2r, nid)]
        sn = sigmoid_fn(dot_fn(U, Vn))
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
               y_ids, alpha: float, type_set: str) -> list[pd.DataFrame]:
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
            rows["node_set"] += [type_set, type_set]
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
    (u_vec + cand_ids).  Rows carry ``ns`` (embedding namespace, e.g.
    'rm'/'em'); ``bcast.value`` maps each namespace to its
    (f_i2r, F_mat, neg_f, y_i2r, Y_mat, neg_y, y_ids) snapshot.  One UDF
    invocation per epoch covers every objective of every namespace —
    the driver loop is the only iteration.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        spaces = bcast.value
        for b in batches:
            if len(b) == 0:
                continue
            frames: list[pd.DataFrame] = []
            for ns, sp in spaces.items():
                f_i2r, F_mat, neg_f, y_i2r, Y_mat, neg_y, y_ids = sp
                nb = b[b["ns"] == ns]
                if not len(nb):
                    continue
                k0 = nb[nb["kind"] == 0]
                if len(k0):
                    U = np.stack(k0["u_vec"].values).astype(np.float64)
                    frames += _sgns_block(
                        U, k0["u_id"].values, k0["v_id"].values,
                        k0["w"].values.astype(np.float64), F_mat, f_i2r,
                        neg_f[0], neg_f[1], "mention", f"feature@{ns}",
                        epoch, negatives)
                k1 = nb[nb["kind"] == 1]
                if len(k1):
                    U = F_mat[_lookup(f_i2r, k1["u_id"].values)]
                    frames += _sgns_block(
                        U, k1["u_id"].values, k1["v_id"].values,
                        k1["w"].values.astype(np.float64), Y_mat, y_i2r,
                        neg_y[0], neg_y[1], f"feature@{ns}", f"type@{ns}",
                        epoch, negatives)
                k2 = nb[nb["kind"] == 2]
                if len(k2):
                    M = np.stack(k2["u_vec"].values).astype(np.float64)
                    frames += _ple_block(M, k2["u_id"].values,
                                         k2["cand_ids"].values, Y_mat,
                                         y_i2r, y_ids, alpha,
                                         f"type@{ns}")
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return edges.mapInPandas(run, schema=GRAD_SCHEMA)


# --------------------------------------------------------- driver-side state
class _Space:
    """Per-namespace driver state: feature/type matrices + neg tables."""

    __slots__ = ("ns", "f_ids", "f_i2r", "F_mat", "neg_f",
                 "y_ids", "y_i2r", "Y_mat", "neg_y")

    def __init__(self, ns, f_ids, F_mat, neg_f, y_ids, Y_mat, neg_y):
        self.ns = ns
        self.f_ids, self.F_mat, self.neg_f = f_ids, F_mat, neg_f
        self.y_ids, self.Y_mat, self.neg_y = y_ids, Y_mat, neg_y
        self.f_i2r = {int(i): r for r, i in enumerate(f_ids)}
        self.y_i2r = {int(i): r for r, i in enumerate(y_ids)}

    def snapshot(self):
        return (self.f_i2r, self.F_mat, self.neg_f,
                self.y_i2r, self.Y_mat, self.neg_y, self.y_ids)

    def targets(self) -> dict:
        return {f"feature@{self.ns}": (self.F_mat, self.f_i2r),
                f"type@{self.ns}": (self.Y_mat, self.y_i2r)}


def _ids_pd(df: DataFrame, col: str) -> np.ndarray:
    """Distinct ids → sorted int64 array via Arrow (no Row collect)."""
    pdf = df.select(F.col(col).alias("id")).distinct().toPandas()
    return np.sort(pdf["id"].to_numpy(dtype=np.int64))


def _neg_table(graph: DataFrame, col: str):
    """degree^0.75 inverse-CDF sampling table (A4/A5) — Arrow-fetched.

    Integer milli-weights (``floor(sqrt(d·sqrt(d))·1000)`` — the
    IEEE-exact ^0.75), cumulated in int64: exact associativity means the
    distributed twin (``training_large.build_cdf``'s bucketed two-pass
    prefix sum) reproduces every cumulative value bit-for-bit, so the
    broadcast and join paths select identical negatives."""
    pdf = graph.groupBy(col).agg(F.sum("w").alias("d")) \
        .orderBy(col).toPandas()
    ids = pdf[col].to_numpy(dtype=np.int64)
    d = pdf["d"].to_numpy(dtype=np.float64)
    w75 = np.floor(np.sqrt(d * np.sqrt(d)) * 1000).astype(np.int64)
    cum = np.cumsum(w75)
    return ids, cum.astype(np.float64) / float(cum[-1])


def _build_space(ns: str, mention_feature: DataFrame,
                 feature_type: DataFrame, mention_type: DataFrame,
                 dim: int) -> _Space:
    f_ids = _ids_pd(mention_feature.select("feature_id")
                    .union(feature_type.select("feature_id")), "feature_id")
    y_ids = _ids_pd(mention_type.select("type_id")
                    .union(feature_type.select("type_id")), "type_id")
    if (len(f_ids) + len(y_ids)) > SMALL_MATRIX_LIMIT:
        raise ValueError(
            f"namespace {ns}: {len(f_ids)}+{len(y_ids)} nodes exceeds "
            f"SMALL_MATRIX_LIMIT={SMALL_MATRIX_LIMIT}; CoTypeRMTrainer "
            "flips to training_large.train_large before reaching here — "
            "the joint trainer's namespaces do not flip yet (extend "
            "train_large's namespace handling if an EM-side vocab "
            "outgrows the driver)")
    return _Space(ns, f_ids, init_matrix_fast(f_ids, dim, "f"),
                  _neg_table(mention_feature, "feature_id"),
                  y_ids, init_matrix_fast(y_ids, dim, "y"),
                  _neg_table(feature_type, "type_id"))


def _edge_tables(ns: str, mention_feature: DataFrame,
                 feature_type: DataFrame, mention_type: DataFrame):
    """(mention-anchored edges, feature-type edges) for one namespace.

    v_id = 0 (not NULL) in PLE rows: a null in an int64 column degrades
    the whole Arrow batch to float64 in pandas, corrupting 60-bit ids.
    """
    nsc = F.lit(ns).alias("ns")
    mf = mention_feature.select(
        F.lit(0).alias("kind"), F.col("mention_id").alias("u_id"),
        F.col("feature_id").alias("v_id"), "w",
        F.lit(None).cast("array<long>").alias("cand_ids"), nsc)
    fy = feature_type.select(
        F.lit(1).alias("kind"), F.col("feature_id").alias("u_id"),
        F.col("type_id").alias("v_id"), "w",
        F.lit(None).cast("array<long>").alias("cand_ids"), nsc)
    cand = (mention_type.groupBy("mention_id")
            .agg(F.collect_list("type_id").alias("cand_ids"))
            .select(F.lit(2).alias("kind"),
                    F.col("mention_id").alias("u_id"),
                    F.lit(0).cast("long").alias("v_id"),
                    F.lit(1.0).alias("w"), "cand_ids", nsc))
    return mf.unionByName(cand), fy


def _apply_small_grads(agg: DataFrame, lr: float, spaces: dict) -> None:
    """Feature/type gradient apply — ONE Arrow `toPandas` per epoch, then
    vectorized row-indexed `+=` into the driver matrices.  Zero Row-object
    collect: at 10^6-10^7 nodes this is a few hundred MB through Arrow,
    vs multi-GB of boxed Python lists through the old collect() path."""
    targets: dict = {}
    for sp in spaces.values():
        targets.update(sp.targets())
    pdf = agg.where(F.col("node_set").isin(*targets.keys())).toPandas()
    for node_set, (mat, i2r) in targets.items():
        sub = pdf[pdf["node_set"] == node_set]
        if not len(sub):
            continue
        rows = np.fromiter((i2r.get(int(i), -1)
                            for i in sub["node_id"].to_numpy()),
                           dtype=np.int64, count=len(sub))
        ok = rows >= 0
        if not ok.any():
            continue
        G = np.stack(sub["grad"].to_numpy()[ok]).astype(np.float64)
        c = sub["cnt"].to_numpy()[ok].astype(np.float64)
        # node ids are unique after _agg_grads' groupBy → plain fancy-index
        mat[rows[ok]] += lr * G / c[:, None]


class CoTypeRMTrainer:
    """CoType-RM (M6): SGNS(M–F) + SGNS(F–Y) + PLE(M–Y), epoch-synchronous
    BCD, per-epoch lr decay (retype.cpp:241), checkpoint every k epochs."""

    def __init__(self, spark: SparkSession, wh: Warehouse, prefix: str,
                 dim: int = 50, negatives: int = 3, lr: float = 0.02,
                 alpha: float = 0.0001, checkpoint_every: int = 10,
                 small_matrix_limit: int = SMALL_MATRIX_LIMIT):
        self.spark = spark
        self.wh = wh
        self.prefix = prefix
        self.dim = dim
        self.negatives = negatives
        self.lr0 = lr
        self.alpha = alpha
        self.checkpoint_every = checkpoint_every
        # feature/type placement flip point — overridable so tests can
        # force the join-based path on small fixtures
        self.small_matrix_limit = small_matrix_limit

    # ---------------------------------------------------------- helpers
    def _name(self, s: str) -> str:
        return f"{self.prefix}_emb_{s}"

    def _space_name(self, part: str, ns: str) -> str:
        """Primary namespace keeps the legacy names (resume compat)."""
        return self._name(part if ns == self.prefix else f"{part}_{ns}")

    def _matrix_df(self, ids: np.ndarray, mat: np.ndarray) -> DataFrame:
        """Arrow-batched checkpoint frame: a pandas DataFrame crosses via
        Arrow in columnar batches — no boxed Python row tuples (the
        round-2 driver-scale defect: tens of GB of boxed floats at the
        SMALL_MATRIX_LIMIT flip point)."""
        pdf = pd.DataFrame({"id": ids.astype(np.int64),
                            "vec": list(mat.astype(np.float32))})
        return self.spark.createDataFrame(pdf,
                                          schema="id long, vec array<float>")

    def _checkpoint(self, epoch: int, lr: float, emb_m: DataFrame,
                    spaces: dict) -> DataFrame:
        wh = self.wh
        emb_m = wh.write(self._name("mention"), emb_m)
        for ns, sp in spaces.items():
            wh.write(self._space_name("feature", ns),
                     self._matrix_df(sp.f_ids, sp.F_mat))
            wh.write(self._space_name("type", ns),
                     self._matrix_df(sp.y_ids, sp.Y_mat))
        wh.write(self._name("meta"), self.spark.createDataFrame(
            [(epoch, float(lr))], "epoch int, lr double"))
        return emb_m

    def _load_matrix(self, name: str, ids: np.ndarray, i2r: dict) -> np.ndarray:
        """Arrow fetch + one vectorized scatter (no per-row Python loop)."""
        pdf = self.wh.read(name).toPandas()
        mat = np.zeros((len(ids), self.dim))
        if not len(pdf):
            return mat
        rows = np.fromiter((i2r.get(int(i), -1)
                            for i in pdf["id"].to_numpy()),
                           dtype=np.int64, count=len(pdf))
        ok = rows >= 0
        if ok.any():
            mat[rows[ok]] = np.stack(pdf["vec"].to_numpy()[ok])
        return mat

    def _result(self, emb_m: DataFrame, spaces: dict) -> dict:
        out = {"mention": emb_m}
        for ns, sp in spaces.items():
            fk = "feature" if ns == self.prefix else f"feature_{ns}"
            yk = "type" if ns == self.prefix else f"type_{ns}"
            out[fk] = self._matrix_df(sp.f_ids, sp.F_mat)
            out[yk] = self._matrix_df(sp.y_ids, sp.Y_mat)
        return out

    # ------------------------------------------------------------- train
    def train(self, mention_feature: DataFrame, feature_type: DataFrame,
              mention_type: DataFrame, epochs: int = 50,
              resume: bool = True, verbose: bool = False) -> dict[str, DataFrame]:
        import time as _time
        spark, dim = self.spark, self.dim
        sc = spark.sparkContext
        ns = self.prefix

        # placement flip: past the limit the feature state cannot live on
        # the driver — hand off to the join-based trainer (same
        # objectives/schedule, feature embeddings as a DataFrame,
        # negatives pre-sampled through the distributed inverse CDF)
        n_nodes = (mention_feature.select("feature_id")
                   .union(feature_type.select("feature_id"))
                   .distinct().count()
                   + feature_type.select("type_id")
                   .union(mention_type.select("type_id"))
                   .distinct().count())
        if n_nodes > self.small_matrix_limit:
            from .training_large import train_large
            return train_large(self, mention_feature, feature_type,
                               mention_type, epochs, resume=resume,
                               verbose=verbose)

        space = _build_space(ns, mention_feature, feature_type,
                             mention_type, dim)
        spaces = {ns: space}

        start_epoch = 0
        if resume and self.wh.exists(self._name("meta")):
            meta = self.wh.read(self._name("meta")).collect()[0]
            start_epoch = meta["epoch"] + 1
            emb_m = self.wh.read(self._name("mention"))
            space.F_mat = self._load_matrix(self._name("feature"),
                                            space.f_ids, space.f_i2r)
            space.Y_mat = self._load_matrix(self._name("type"),
                                            space.y_ids, space.y_i2r)
        else:
            emb_m = init_embeddings(
                mention_feature.select("mention_id").distinct(),
                "mention_id", dim, "m")
        if start_epoch >= epochs:
            return self._result(emb_m, spaces)

        # unified static edge table: one UDF pass per epoch over all three
        # objectives (kind 0: SGNS M–F, 1: SGNS F–Y, 2: PLE M–Y); the F–Y
        # side needs no mention join (both endpoints live in broadcasts)
        m_edges, fy = _edge_tables(ns, mention_feature, feature_type,
                                   mention_type)
        m_edges = m_edges.repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")),
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
            lr = lr_schedule(self.lr0, epoch, epochs)
            bcast = sc.broadcast({ns: space.snapshot()})

            m_named = emb_m.select(F.col("id").alias("u_id"),
                                   F.col("vec").alias("u_vec"))
            with_vec = m_edges.join(m_named, on="u_id", how="left") \
                .unionByName(fy.withColumn(
                    "u_vec", F.lit(None).cast("array<float>")))
            grads = unified_grad_step(with_vec, bcast, epoch, negatives, alpha)
            agg = _agg_grads(grads, dim).localCheckpoint(eager=True)

            # apply: features/types Arrow-batched on the driver (small),
            # mentions via join (distributed)
            _apply_small_grads(agg, lr, spaces)

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
                emb_m = self._checkpoint(epoch, lr, emb_m, spaces)
            if verbose:
                print(f"[train {self.prefix}] epoch {epoch} lr={lr:.5f} "
                      f"wall={_time.time() - _t0:.1f}s", flush=True)

        return self._result(emb_m, spaces)


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
    """Joint mode (M1-M5): CoType objectives + TransE coupling over the
    (em1, em2, rm) mention-triple table (retype.cpp mode 'j').

    Reference joint training interleaves the EM-side PLE+SG nets with the
    RM nets and TransE in one epoch (``retype.cpp:149-161``).  Pass
    ``em_graphs`` (mention_feature / feature_type / mention_type of the
    entity-mention side) and those objectives join the SAME per-epoch
    mapInPandas pass as an 'em' embedding namespace — separate
    feature/type matrices + negative tables, shared distributed mention
    table (EM/RM mention ids are disjoint key hashes; TransE couples the
    two sides through it).  Objective mixing: the reference alias-samples
    {1, 1, transWeight} (retype.cpp:183-186); BCD runs every objective
    every epoch — transWeight folds into the gradient scale.
    """

    def __init__(self, *args, trans_weight: float = 1.0, **kw):
        super().__init__(*args, **kw)
        self.trans_weight = trans_weight

    def train(self, mention_feature: DataFrame, feature_type: DataFrame,
              mention_type: DataFrame, triples: DataFrame | None = None,
              epochs: int = 50, resume: bool = True,
              verbose: bool = False,
              em_graphs: dict[str, DataFrame] | None = None
              ) -> dict[str, DataFrame]:
        if triples is None:
            return super().train(mention_feature, feature_type,
                                 mention_type, epochs, resume, verbose)
        # placement flip (joint): past the limit every namespace's
        # feature state moves to the join-based path (type matrices stay
        # broadcast); TransE already runs on the distributed mention
        # table, so only the SGNS/PLE state placement changes
        n_nodes = (mention_feature.select("feature_id")
                   .union(feature_type.select("feature_id"))
                   .distinct().count()
                   + feature_type.select("type_id")
                   .union(mention_type.select("type_id"))
                   .distinct().count())
        if em_graphs is not None:
            n_nodes += (em_graphs["mention_feature"].select("feature_id")
                        .union(em_graphs["feature_type"]
                               .select("feature_id")).distinct().count()
                        + em_graphs["feature_type"].select("type_id")
                        .union(em_graphs["mention_type"].select("type_id"))
                        .distinct().count())
        if n_nodes > self.small_matrix_limit:
            from .training_large import train_large_joint
            return train_large_joint(self, mention_feature, feature_type,
                                     mention_type, triples, em_graphs,
                                     epochs, resume=resume,
                                     verbose=verbose)
        self._triples = triples.select(
            F.col("em1_id").alias("h_id"), F.col("em2_id").alias("t_id"),
            F.col("rm_id").alias("r_id")).localCheckpoint(eager=True)
        # widen the mention id space: EM ids enter via the triple table
        # (and via the EM nets' own graphs when em_graphs is given)
        extra = self._triples.select(F.col("h_id").alias("mention_id")) \
            .union(self._triples.select("t_id")) \
            .union(self._triples.select("r_id")).distinct()
        mf_ids = mention_feature.select("mention_id").distinct()
        if em_graphs is not None:
            mf_ids = mf_ids.union(
                em_graphs["mention_feature"].select("mention_id")).distinct()
        self._all_mentions = mf_ids.union(extra).distinct()
        return self._train_joint(mention_feature, feature_type,
                                 mention_type, em_graphs, epochs, resume,
                                 verbose)

    def _train_joint(self, mention_feature, feature_type, mention_type,
                     em_graphs, epochs, resume, verbose):
        """Same epoch loop as the base class plus the EM namespace and a
        TransE pass whose gradients merge into the one BCD apply."""
        import time as _time
        spark, dim = self.spark, self.dim
        sc = spark.sparkContext
        ns = self.prefix

        spaces = {ns: _build_space(ns, mention_feature, feature_type,
                                   mention_type, dim)}
        m_edges, fy = _edge_tables(ns, mention_feature, feature_type,
                                   mention_type)
        if em_graphs is not None:
            spaces["em"] = _build_space(
                "em", em_graphs["mention_feature"],
                em_graphs["feature_type"], em_graphs["mention_type"], dim)
            em_m, em_fy = _edge_tables(
                "em", em_graphs["mention_feature"],
                em_graphs["feature_type"], em_graphs["mention_type"])
            m_edges = m_edges.unionByName(em_m)
            fy = fy.unionByName(em_fy)

        # resume (north_rule): same contract as the base trainer — meta
        # records the last finished epoch; every namespace reloads its
        # checkpointed matrices and the mention table resumes from disk
        start_epoch = 0
        if resume and self.wh.exists(self._name("meta")):
            meta = self.wh.read(self._name("meta")).collect()[0]
            start_epoch = meta["epoch"] + 1
            emb_m = self.wh.read(self._name("mention"))
            for n, sp in spaces.items():
                sp.F_mat = self._load_matrix(
                    self._space_name("feature", n), sp.f_ids, sp.f_i2r)
                sp.Y_mat = self._load_matrix(
                    self._space_name("type", n), sp.y_ids, sp.y_i2r)
        else:
            emb_m = init_embeddings(self._all_mentions, "mention_id",
                                    dim, "m")
        if start_epoch >= epochs:
            return self._result(emb_m, spaces)

        m_edges = m_edges.repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")),
            "u_id").localCheckpoint(eager=True)
        fy = fy.localCheckpoint(eager=True)
        ab = [self.wh.path(self._name("mention_a")),
              self.wh.path(self._name("mention_b"))]
        emb_m.write.mode("overwrite").parquet(ab[0])
        emb_m = spark.read.parquet(ab[0])

        for epoch in range(start_epoch, epochs):
            _t0 = _time.time()
            lr = lr_schedule(self.lr0, epoch, epochs)
            bcast = sc.broadcast({n: s.snapshot()
                                  for n, s in spaces.items()})
            m_named = emb_m.select(F.col("id").alias("u_id"),
                                   F.col("vec").alias("u_vec"))
            with_vec = m_edges.join(m_named, on="u_id", how="left") \
                .unionByName(fy.withColumn(
                    "u_vec", F.lit(None).cast("array<float>")))
            g_base = unified_grad_step(with_vec, bcast, epoch,
                                       self.negatives, self.alpha)

            # TransE pass: corrupt, join the four vectors, sign-grad
            ct = corrupted_triples_simple(self._triples, epoch)
            tw = ct
            for cid, vname in (("h_id", "h_vec"), ("t_id", "t_vec"),
                               ("r_id", "r_vec"), ("tc_id", "tc_vec")):
                mv_r = emb_m.select(F.col("id").alias(cid),
                                    F.col("vec").alias(vname))
                tw = tw.join(mv_r, on=cid)
            g_tr = transe_step(tw, epoch)
            if self.trans_weight != 1.0:
                g_tr = g_tr.withColumn(
                    "grad", F.transform(
                        "grad", lambda x: x * F.lit(self.trans_weight)))

            agg = _agg_grads(g_base.unionByName(g_tr), dim) \
                .localCheckpoint(eager=True)
            _apply_small_grads(agg, lr, spaces)

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
                emb_m = self._checkpoint(epoch, lr, emb_m, spaces)
            if verbose:
                print(f"[joint {self.prefix}] epoch {epoch} lr={lr:.5f} "
                      f"wall={_time.time() - _t0:.1f}s", flush=True)

        return self._result(emb_m, spaces)
