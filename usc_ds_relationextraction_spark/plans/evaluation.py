"""Evaluation (SURVEY.md M10/M11, W4): reference protocol replicated.

``evaluate_rm_neg`` (evaluation.py:82-111): over mentions,
 - gold positive  ⇔ gold label-set ≠ {None}
 - predicted positive ⇔ predicted label-set ≠ {None}
 - true positive ⇔ predicted positive AND predicted set == gold set
 - P = TP/pred⁺, R = TP/gold⁺, F1 = 2PR/(P+R), each with the reference's
   +1e-8 denominators.

Threshold sweep (tune_threshold.py:42-115): θ ∈ {0, 0.01, …, 1.0} via a
crossJoin against a literal threshold table, one grouped agg, argmax F1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_sets(df: DataFrame, id_col: str = "mention_id",
               label_col: str = "type_id") -> DataFrame:
    return df.groupBy(id_col).agg(
        F.sort_array(F.collect_set(label_col)).alias("labels"))


def evaluate_rm_neg(predictions: DataFrame, ground_truth: DataFrame,
                    none_type_id: int) -> dict[str, float]:
    """predictions/ground_truth: (mention_id, type_id) rows (multi-label)."""
    pred = label_sets(predictions)
    gold = label_sets(ground_truth).withColumnRenamed("labels", "gold")
    none_set = F.array(F.lit(none_type_id).cast("long"))

    pos_gt = gold.where(F.col("gold") != none_set).count()
    pred_pos = pred.where(F.col("labels") != none_set)
    joined = pred_pos.join(gold, on="mention_id", how="left")
    pos_pred = pred_pos.count()
    true_pos = joined.where(F.col("gold").isNotNull()
                            & (F.col("labels") == F.col("gold"))).count()

    precision = true_pos / (pos_pred + 1e-8)
    recall = true_pos / (pos_gt + 1e-8)
    f1 = 2 * precision * recall / (precision + recall + 1e-8)
    return {"precision": precision, "recall": recall, "f1": f1,
            "pos_pred": pos_pred, "pos_gt": pos_gt, "true_pos": true_pos}


def sweep_thresholds(normalized: DataFrame, ground_truth: DataFrame,
                     none_type_id: int, steps: int = 100) -> DataFrame:
    """W4/M11: single-pass sweep — crossJoin(thresholds) → agg per θ.

    Single-label predictions assumed (the reference's prediction file has
    one (type, score) per mention — emb_prediction.py:141-147), so exact
    set equality reduces to type equality against single-label gold;
    multi-label gold rows can never match and only count in pos_gt.
    """
    spark = normalized.sparkSession
    th = spark.range(0, steps + 1).select(
        (F.col("id") / steps).alias("theta"))
    gold = label_sets(ground_truth).withColumnRenamed("labels", "gold")
    none_set = F.array(F.lit(none_type_id).cast("long"))
    pos_gt = gold.where(F.col("gold") != none_set).count()

    p = normalized.select("mention_id", "type_id", "score_norm") \
        .join(gold, on="mention_id", how="left")
    crossed = p.crossJoin(F.broadcast(th)).where(
        F.col("score_norm") > F.col("theta"))
    per = crossed.groupBy("theta").agg(
        F.sum(F.when(F.col("type_id") != none_type_id, 1).otherwise(0)
              ).alias("pos_pred"),
        F.sum(F.when((F.col("type_id") != none_type_id)
                     & (F.col("gold") == F.array(F.col("type_id"))), 1)
              .otherwise(0)).alias("true_pos"),
    )
    out = per.withColumn("precision",
                         F.col("true_pos") / (F.col("pos_pred") + 1e-8)) \
        .withColumn("recall", F.col("true_pos") / (pos_gt + 1e-8))
    return out.withColumn(
        "f1", 2 * F.col("precision") * F.col("recall")
        / (F.col("precision") + F.col("recall") + 1e-8)).orderBy("theta")


def best_threshold(sweep: DataFrame) -> dict:
    row = sweep.orderBy(F.desc("f1"), "theta").limit(1).collect()[0]
    return {k: row[k] for k in ("theta", "precision", "recall", "f1")}
