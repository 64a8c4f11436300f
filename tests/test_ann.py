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
