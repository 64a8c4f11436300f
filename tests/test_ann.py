"""ANN semantics: IVF nprobe recall is monotone and bounded by exact
brute force — the property that justifies nprobe as the scale-time
recall lever (the oracle gate already pins exact values; this pins the
RELATIONSHIP between the variants)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from usc_ds_relationextraction_spark.operators.similarity import (
    ann_topk_ivf, ann_topk_ivf_nprobe, int_dot, quantized)

SF = "/root/testdata/sf0.001"
K = 5


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _exact_topk(spark) -> dict:
    """Brute-force top-k by the same integer dot product (small tier)."""
    e = _emb(spark).select("vec_id", quantized("embedding").alias("q"))
    qs = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq"))
    sc = qs.crossJoin(e.withColumnRenamed("vec_id", "nn_id")) \
        .where(F.col("query_id") != F.col("nn_id")) \
        .select("query_id", "nn_id",
                int_dot(F.col("qq"), F.col("q")).alias("qdot"))
    ranked = sc.withColumn(
        "rk", F.row_number().over(
            Window.partitionBy("query_id")
            .orderBy(F.desc("qdot"), F.col("nn_id")))) \
        .where(F.col("rk") <= K)
    out: dict = {}
    for r in ranked.collect():
        out.setdefault(r.query_id, set()).add(r.nn_id)
    return out


def _got(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.nn_id)
    return out


def test_ivf_nprobe_recall_monotone(spark):
    dim = len(_emb(spark).select("embedding").first()[0])
    exact = _exact_topk(spark)
    g1 = _got(ann_topk_ivf(_emb(spark), dim, k=K))
    g2 = _got(ann_topk_ivf_nprobe(_emb(spark), dim, k=K, nprobe=2))

    def recall(got: dict) -> float:
        hit = sum(len(got.get(q, set()) & nn) for q, nn in exact.items())
        tot = sum(len(nn) for nn in exact.values())
        return hit / tot

    r1, r2 = recall(g1), recall(g2)
    # candidate sets grow with nprobe, so top-k recall cannot drop;
    # both variants return full result sets for every query
    assert r2 >= r1 > 0
    assert set(g2) == set(exact)


def test_ivf_nprobe_candidates_superset(spark):
    """Every nprobe=1 neighbor with a score above the nprobe=2 kth score
    survives — the probe-2 result never silently loses a probe-1 hit."""
    dim = len(_emb(spark).select("embedding").first()[0])
    s1 = {(r.query_id, r.nn_id, r.qdot)
          for r in ann_topk_ivf(_emb(spark), dim, k=K).collect()}
    rows2 = ann_topk_ivf_nprobe(_emb(spark), dim, k=K, nprobe=2).collect()
    s2 = {(r.query_id, r.nn_id, r.qdot) for r in rows2}
    kth = {}
    for r in rows2:
        kth[r.query_id] = min(kth.get(r.query_id, r.qdot), r.qdot)
    for (q, nn, dot) in s1:
        if dot > kth.get(q, float("inf")):
            assert (q, nn, dot) in s2


def test_kmeans_codebook_and_recall_100k(spark):
    """Learned-codebook properties at 100k vectors (the scale drive the
    Arrow assign path never gets from unit fixtures): k cells survive,
    every vector lands in exactly one cell, and nprobe recall against
    exact brute force is monotone and material."""
    import numpy as np

    from usc_ds_relationextraction_spark.operators.similarity import (
        _assign_cells_col, ivf_kmeans_codebook)

    n, dim, cells = 100_000, 16, 64
    comp = ("cast(pmod(cast(conv(substring(md5(concat(id, '|', i)), 1, 15),"
            " 16, 10) as bigint), 2001) - 1000 as float) / 1000.0")
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(f"transform(sequence(1, {dim}), i -> cast({comp} as float))")
        .alias("embedding")).cache()
    cell_ids, C = ivf_kmeans_codebook(emb, dim, n_cells=cells, iters=2)
    assert 2 <= len(cell_ids) <= cells
    assert C.shape == (len(cell_ids), dim)

    base = emb.select("vec_id", quantized("embedding").alias("q")) \
        .withColumn("cell", _assign_cells_col("q", cell_ids, C)).cache()
    # total membership == n and every cell id is from the codebook
    sizes = {r.cell: r.n for r in
             base.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    assert sum(sizes.values()) == n
    assert set(sizes) <= set(int(c) for c in cell_ids)

    # exact top-k for 5 queries via NumPy on the driver (ground truth)
    qn = 5
    pdf = base.select("vec_id", "q").toPandas().sort_values("vec_id")
    M = np.array([np.asarray(v, dtype=np.int64) for v in pdf["q"]])
    ids = pdf["vec_id"].to_numpy()
    exact = {}
    for qi in range(qn):
        neg = -(M @ M[qi])
        # exclude self AFTER negation (negating int64-min overflows to
        # itself, which made the self row sort FIRST, not last)
        neg[qi] = np.iinfo(np.int64).max
        # top-K by (dot desc, id asc) — matches the operators' tie rule
        order = np.lexsort((ids, neg))[:K]
        exact[qi] = set(int(ids[j]) for j in order)

    from usc_ds_relationextraction_spark.operators.similarity import \
        ann_topk_ivf_nprobe as np_ivf
    g1 = _got(np_ivf(emb, dim, n_queries=qn, k=K, nprobe=1,
                     n_cells=cells, iters=2))
    g4 = _got(np_ivf(emb, dim, n_queries=qn, k=K, nprobe=4,
                     n_cells=cells, iters=2))

    def recall(got):
        return sum(len(got.get(q, set()) & nn)
                   for q, nn in exact.items()) / (qn * K)

    r1, r4 = recall(g1), recall(g4)
    assert r4 >= r1
    assert r4 >= 0.4   # probing 4/64 cells must recover a material share
    emb.unpersist()
    base.unpersist()
