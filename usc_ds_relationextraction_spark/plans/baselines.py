"""M9-lite: feature-based classifier baseline (Spark ML).

The reference ships a baseline-classifier zoo (``code/Classifier/
Classifier.py:16-41`` — Perceptron / PLSVM / HierarchySVM / CLPL /
Logistic) used as its de-facto regression check against the embedding
model (SURVEY §5.2).  The full zoo is descoped (COVERAGE.md); this module
restores the cross-model sanity check with THREE Spark-ML families over
the same ``(mention, feature, label)`` rows the embedding trainer
consumes: multinomial logistic regression (zoo: Logistic), LinearSVC
one-vs-rest (zoo: PLSVM's hinge family), and a single-layer softmax
network (zoo: Perceptron) — log-loss, hinge, and mistake-driven-linear,
one shared vectorize/index/evaluate scaffold.

Protocol parity with M10 (``evaluation.py:82-111``): the class is the
EXACT sorted label set (multi-label mentions keep their full set as one
class, matching evaluate_rm_neg's set-equality TP rule), 'None' is a
class but never a positive.

Scale shape: CountVectorizer + LogisticRegression are both distributed
JVM implementations (L-BFGS with tree-aggregated gradients); the only
driver state is the coefficient matrix (|classes| × vocab) — same
placement rule as the embedding trainer's type matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NONE_LABEL = "None"


def _mention_rows(feature_rows: DataFrame) -> DataFrame:
    """(mention_key, labels, feature, is_test) → one row per mention with
    the feature bag and the exact-set class string."""
    return feature_rows.groupBy("mention_key", "is_test").agg(
        F.collect_list("feature").alias("feats"),
        F.array_join(F.sort_array(F.array_distinct(F.flatten(
            F.collect_list("labels")))), ",").alias("label_set"))


def _train_eval(feature_rows: DataFrame, make_estimator,
                vocab_size: int = 1 << 18) -> dict:
    """Shared scaffold: vectorize + index on the train split, fit the
    estimator from ``make_estimator()``, evaluate P/R/F1 on the test
    split with the M10 None-exclusion protocol."""
    from pyspark.ml.feature import CountVectorizer, StringIndexer

    rows = _mention_rows(feature_rows).cache()
    train = rows.where(~F.col("is_test"))
    test = rows.where(F.col("is_test"))

    cv = CountVectorizer(inputCol="feats", outputCol="fvec",
                         vocabSize=vocab_size, binary=True)
    cv_model = cv.fit(train)
    si = StringIndexer(inputCol="label_set", outputCol="y",
                       handleInvalid="keep")
    si_model = si.fit(train)

    # fitted dimensions, for estimators whose topology is size-dependent
    # (the perceptron's layer spec); +1 class for the indexer's
    # handleInvalid='keep' bucket on unseen test label sets
    n_features = len(cv_model.vocabulary)
    n_classes = len(si_model.labelsArray[0]) + 1
    model = make_estimator(n_features, n_classes).fit(
        si_model.transform(cv_model.transform(train)))

    pred = model.transform(si_model.transform(cv_model.transform(test)))
    labels = list(si_model.labelsArray[0])
    mapping = F.element_at(
        F.array(*[F.lit(x) for x in labels] + [F.lit(NONE_LABEL)]),
        F.col("prediction").cast("int") + 1)
    scored = pred.select("mention_key", "label_set",
                         mapping.alias("pred_set"))

    agg = scored.agg(
        F.sum(F.when(F.col("label_set") != NONE_LABEL, 1).otherwise(0))
        .alias("pos_gt"),
        F.sum(F.when(F.col("pred_set") != NONE_LABEL, 1).otherwise(0))
        .alias("pos_pred"),
        F.sum(F.when((F.col("pred_set") != NONE_LABEL)
                     & (F.col("pred_set") == F.col("label_set")), 1)
              .otherwise(0)).alias("tp")).collect()[0]
    p = agg["tp"] / max(agg["pos_pred"], 1)
    r = agg["tp"] / max(agg["pos_gt"], 1)
    f1 = 2 * p * r / max(p + r, 1e-12)
    rows.unpersist()
    return {"precision": p, "recall": r, "f1": f1,
            "pos_gt": agg["pos_gt"], "pos_pred": agg["pos_pred"],
            "tp": agg["tp"], "n_classes": len(labels),
            "vocab": len(cv_model.vocabulary), "model": model}


def train_eval_logistic(feature_rows: DataFrame, max_iter: int = 40,
                        reg_param: float = 1e-4,
                        vocab_size: int = 1 << 18) -> dict:
    """Multinomial logistic regression baseline (the reference zoo's
    Logistic member, Classifier.py:16-41)."""
    from pyspark.ml.classification import LogisticRegression

    def make(_n_features, _n_classes):
        return LogisticRegression(featuresCol="fvec", labelCol="y",
                                  maxIter=max_iter, regParam=reg_param,
                                  family="multinomial")

    return _train_eval(feature_rows, make, vocab_size)


def train_eval_svm(feature_rows: DataFrame, max_iter: int = 30,
                   reg_param: float = 1e-4,
                   vocab_size: int = 1 << 18) -> dict:
    """Margin-based second family: LinearSVC one-vs-rest — the Spark-ML
    analog of the reference zoo's PLSVM (hinge loss, Classifier.py:16-41;
    the partial-label relaxation collapses to standard hinge when every
    mention carries one label set, this repo's exact-set protocol).
    Both families sharing one scaffold makes the cross-model regression
    check two-family, per the round-2 verdict."""
    from pyspark.ml.classification import LinearSVC, OneVsRest

    def make(_n_features, _n_classes):
        svc = LinearSVC(featuresCol="fvec", labelCol="y",
                        maxIter=max_iter, regParam=reg_param)
        return OneVsRest(classifier=svc, featuresCol="fvec", labelCol="y",
                         parallelism=4)

    return _train_eval(feature_rows, make, vocab_size)


def train_eval_perceptron(feature_rows: DataFrame, max_iter: int = 60,
                          vocab_size: int = 1 << 14) -> dict:
    """Third family: single-layer softmax network — the Spark-ML analog
    of the reference zoo's Perceptron member (Classifier.py:16-41;
    mistake-driven linear separator ≈ one linear layer trained by
    gradient steps).  ``MultilayerPerceptronClassifier`` with
    ``layers=[vocab, n_classes]`` is exactly that network: no hidden
    layer, softmax output, L-BFGS over tree-aggregated gradients — same
    distributed placement as the other two families.

    The layer spec uses the FITTED dimensions the scaffold passes in
    (actual CountVectorizer vocabulary; |train labels| + the indexer's
    handleInvalid='keep' bucket).  Vocab is capped below the LR/SVC
    default:
    the MLP weight matrix is materialized densely per task, so
    vocab × classes is the executor-memory term to bound."""
    from pyspark.ml.classification import MultilayerPerceptronClassifier

    def make(n_features, n_classes):
        return MultilayerPerceptronClassifier(
            featuresCol="fvec", labelCol="y", maxIter=max_iter,
            layers=[n_features, n_classes], seed=7, solver="l-bfgs")

    return _train_eval(feature_rows, make, vocab_size)
