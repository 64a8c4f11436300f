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

import pandas as pd

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


# --------------------------------------------------------------------------
# M9 families 4-5: the multi-label ENTITY-typing members of the zoo.
#
# The reference runs CLPL and HierarchySVM over entity mentions
# (``Classifier/Classifier_em.py`` drives ``fit_em``/``predict_em``) with a
# type hierarchy loaded from supertype.txt (``Classifier/TypeHierarchy.py:
# 38-47``).  Our label vocabulary carries the same information in the path
# string itself (``/person/politician`` -> parent ``/person``), so the
# hierarchy is derived, not configured.  Both families evaluate with the
# multi-label micro-P/R/F1 the reference's EM protocol implies (gold and
# prediction are path-closed label SETS).
# --------------------------------------------------------------------------


def _type_hierarchy(labels: list[str]) -> dict[str, str]:
    """child -> parent mapping from path prefixes (the derived analog of
    the reference's supertype.txt, TypeHierarchy.py:38-47)."""
    parent: dict[str, str] = {}
    for lab in labels:
        segs = lab.strip("/").split("/")
        for i in range(1, len(segs)):
            child = "/" + "/".join(segs[: i + 1])
            parent[child] = "/" + "/".join(segs[:i])
    return parent


def _path_close(labels: list[str]) -> list[str]:
    """Expand a label set with every ancestor prefix (the reference's
    get_type_path expansion, TypeHierarchy.py:49-57), sorted."""
    out = set()
    for lab in labels:
        segs = lab.strip("/").split("/")
        for i in range(1, len(segs) + 1):
            out.add("/" + "/".join(segs[:i]))
    return sorted(out)


def _em_mention_rows(feature_rows: DataFrame) -> DataFrame:
    """One row per entity mention: sorted feature bag + path-closed gold
    label array (multi-label, unlike the RM exact-set scaffold)."""
    rows = feature_rows.groupBy("mention_key", "is_test").agg(
        F.sort_array(F.collect_set("feature")).alias("feats"),
        F.sort_array(F.array_distinct(F.flatten(
            F.collect_set("labels")))).alias("raw_labels"))

    @F.pandas_udf("array<string>")
    def close(raw: pd.Series) -> pd.Series:
        return raw.map(lambda ls: _path_close(list(ls)))

    return rows.withColumn("gold", close("raw_labels"))


def _micro_prf(scored: DataFrame) -> dict:
    """Multi-label micro P/R/F1 over (gold: array, pred: array) rows."""
    agg = scored.agg(
        F.sum(F.size(F.array_intersect("pred", "gold"))).alias("tp"),
        F.sum(F.size("pred")).alias("n_pred"),
        F.sum(F.size("gold")).alias("n_gold")).collect()[0]
    p = agg["tp"] / max(agg["n_pred"], 1)
    r = agg["tp"] / max(agg["n_gold"], 1)
    return {"precision": p, "recall": r,
            "f1": 2 * p * r / max(p + r, 1e-12),
            "tp": agg["tp"], "n_pred": agg["n_pred"],
            "n_gold": agg["n_gold"]}


def train_eval_clpl(feature_rows: DataFrame, lambda_reg: float = 1e-4,
                    max_iter: int = 50, threshold: float = 0.0,
                    sample_size: int = 10,
                    vocab_size: int = 1 << 13) -> dict:
    """CLPL partial-label baseline (zoo member 4, ``Classifier/CLPL.py``).

    The reference's reduction (CLPL.py:19-57): each mention becomes ONE
    positive binary example whose features are replicated into every gold
    label's block of an expanded ``V*L`` feature space with weight
    ``1/|y|``, plus up to ``sample_size`` negative examples (features in
    one sampled non-label block, weight 1).  A single binary hinge
    learner (reference: Pegasos, CLPL.py:102-140) trains on the expanded
    set — here ``LinearSVC`` (same hinge + L2 objective, tree-aggregated
    distributed gradients) with ``fitIntercept=False`` to match Pegasos's
    intercept-free weight vector.  Negative sampling is derandomized
    (seeded per mention_key) so the run is resume/engine stable.

    Prediction (CLPL.py:59-98): per-label block scores; argmax label plus
    its ancestors, then greedy thresholded descent into the argmax's
    subtree.  Scores are a broadcast (L×V) matrix column-gather inside an
    Arrow UDF — no per-row Python in the scoring path.

    Scale shape: the expanded training set is ``(1+sample_size)·|train|``
    rows of sparse vectors — linear in mentions, built executor-side; the
    only driver state is the V*L coefficient vector, same placement rule
    as the embedding trainer's matrices.
    """
    import random as _random

    import numpy as np
    from pyspark.ml.classification import LinearSVC
    from pyspark.ml.linalg import SparseVector, VectorUDT

    rows = _em_mention_rows(feature_rows).cache()
    train = rows.where(~F.col("is_test"))
    test = rows.where(F.col("is_test"))

    from pyspark.ml.feature import CountVectorizer
    cv_model = CountVectorizer(inputCol="feats", outputCol="_unused",
                               vocabSize=vocab_size, binary=True).fit(train)
    vocab = list(cv_model.vocabulary)
    v_size = len(vocab)
    # label vocabulary via distinct-explode — only |types| rows reach the
    # driver, never the mention table
    labels = sorted(r["l"] for r in train.select(
        F.explode("gold").alias("l")).distinct().collect())
    l_size = len(labels)
    parent = _type_hierarchy(labels)
    spark = feature_rows.sparkSession
    b_feat = spark.sparkContext.broadcast({f: i for i, f in enumerate(vocab)})
    b_lab = spark.sparkContext.broadcast({l: i for i, l in enumerate(labels)})

    def expand(pdfs):
        """mapInPandas: mention -> 1 positive + k negative expanded rows
        (index/value arrays; vector assembly happens in the udf below)."""
        fmap, lmap = b_feat.value, b_lab.value
        for pdf in pdfs:
            out = {"mention_key": [], "idx": [], "val": [], "y": []}
            for mk, feats, gold in zip(pdf["mention_key"], pdf["feats"],
                                       pdf["gold"]):
                fidx = sorted(fmap[f] for f in feats if f in fmap)
                y = sorted(lmap[l] for l in gold if l in lmap)
                if not fidx or not y:
                    continue
                w = 1.0 / len(y)
                pos = [f + v_size * lid for lid in y for f in fidx]
                out["mention_key"].append(mk)
                out["idx"].append(pos)
                out["val"].append([w] * len(pos))
                out["y"].append(1)
                ny = sorted(set(range(l_size)) - set(y))
                rng = _random.Random(hash(mk) & 0xFFFFFFFF)
                k = min(sample_size, len(ny))
                for lid in (rng.sample(ny, k) if k else []):
                    neg = [f + v_size * lid for f in fidx]
                    out["mention_key"].append(mk)
                    out["idx"].append(neg)
                    out["val"].append([1.0] * len(neg))
                    out["y"].append(0)
            yield pd.DataFrame(out)

    schema = ("mention_key string, idx array<int>, val array<double>, "
              "y int")
    expanded = train.select("mention_key", "feats", "gold") \
        .mapInPandas(expand, schema=schema)
    # SparseVector assembly: plain udf (VectorUDT is not Arrow-mappable);
    # runs once per expanded TRAINING example at fit time, not in any
    # corpus-scale hot path.
    to_vec = F.udf(
        lambda i, v: SparseVector(v_size * l_size, list(i), list(v)),
        VectorUDT())
    svc = LinearSVC(featuresCol="fvec", labelCol="y", maxIter=max_iter,
                    regParam=lambda_reg, fitIntercept=False)
    model = svc.fit(expanded.withColumn("fvec", to_vec("idx", "val")))

    # (L, V) score matrix: coef[f + V*lid] -> M[lid, f]
    mat = np.asarray(model.coefficients.toArray(),
                     dtype=np.float64).reshape(l_size, v_size)
    b_mat = spark.sparkContext.broadcast(mat)
    children: dict[int, list[int]] = {}
    for c, p in parent.items():
        if c in b_lab.value and p in b_lab.value:
            children.setdefault(b_lab.value[p], []).append(b_lab.value[c])
    b_children = spark.sparkContext.broadcast(children)
    b_parent = spark.sparkContext.broadcast(
        {b_lab.value[c]: b_lab.value[p] for c, p in parent.items()
         if c in b_lab.value and p in b_lab.value})

    @F.pandas_udf("array<string>")
    def clpl_predict(feats_s: pd.Series) -> pd.Series:
        fmap = b_feat.value
        m = b_mat.value
        kids, par = b_children.value, b_parent.value
        inv = labels  # closure from driver: lid -> label string

        def one(feats):
            fidx = [fmap[f] for f in feats if f in fmap]
            if not fidx:
                return []
            scores = m[:, fidx].sum(axis=1)
            top = int(scores.argmax())
            out = {top}
            t = top
            while t in par:            # ancestors of argmax (CLPL.py:81-84)
                out.add(par[t])
                t = par[t]
            t = top                    # thresholded descent (CLPL.py:86-97)
            while t is not None:
                cs = kids.get(t, [])
                if not cs:
                    break
                best = max(cs, key=lambda c: scores[c])
                if scores[best] > threshold:
                    out.add(best)
                    t = best
                else:
                    break
            return sorted(inv[i] for i in out)

        return feats_s.map(one)

    scored = test.select("gold",
                         clpl_predict("feats").alias("pred"))
    res = _micro_prf(scored)
    rows.unpersist()
    res.update({"n_classes": l_size, "vocab": v_size, "model": model})
    return res


def train_eval_hierarchy_svm(feature_rows: DataFrame, max_iter: int = 30,
                             reg_param: float = 1e-4,
                             threshold: float = 0.1,
                             vocab_size: int = 1 << 14) -> dict:
    """HierarchySVM baseline (zoo member 5, ``Classifier/HierarchySVM.py``).

    Reference semantics: one one-vs-all multiclass hinge classifier per
    hierarchy level — the root level over root types (no Other class,
    HierarchySVM.py:10-13), then per parent type a child classifier over
    its subtypes plus an Other class (class 0).  ``fit_em``
    (HierarchySVM.py:32-70): a mention contributes one root-level row per
    matching root label; a child classifier trains on the mentions
    carrying its parent label, class = matching subtype else Other.
    ``predict_em`` (HierarchySVM.py:72-86): the argmax root is ALWAYS
    emitted; descent into a subtype requires its margin > threshold and
    stops at Other.

    Spark shape: the root fit plus |roots-with-children| child fits, each
    a distributed ``LinearSVC`` one-vs-rest (hinge, like the reference's
    MulticlassSVM 'ova'); all share one fitted CountVectorizer.  Child
    training sets are filtered subsets — no shuffle beyond the fits
    themselves; prediction is two model.transform passes and a join.
    """
    from pyspark.ml.classification import LinearSVC, OneVsRest
    from pyspark.ml.feature import CountVectorizer
    from pyspark.ml.functions import vector_to_array

    rows = _em_mention_rows(feature_rows).cache()
    train = rows.where(~F.col("is_test"))
    test = rows.where(F.col("is_test"))

    cv_model = CountVectorizer(inputCol="feats", outputCol="fvec",
                               vocabSize=vocab_size, binary=True).fit(train)
    all_labels = sorted(r["l"] for r in train.select(
        F.explode("gold").alias("l")).distinct().collect())
    parent = _type_hierarchy(all_labels)
    roots = sorted(l for l in all_labels if l not in parent)
    children = {r: sorted(c for c, p in parent.items() if p == r)
                for r in roots}

    def ovr():
        svc = LinearSVC(featuresCol="fvec", labelCol="y",
                        maxIter=max_iter, regParam=reg_param)
        return OneVsRest(classifier=svc, featuresCol="fvec",
                         labelCol="y", parallelism=4)

    tr_vec = cv_model.transform(train).cache()
    te_vec = cv_model.transform(test).cache()

    # -- level 0: one row per matching root label (fit_em:44-55)
    root_lit = F.array(*[F.lit(r) for r in roots])
    l0_train = tr_vec.select(
        "fvec", F.explode(F.array_intersect("gold", root_lit)).alias("lab"))
    root_id = {r: i for i, r in enumerate(roots)}
    lab_to_y = F.element_at(
        F.map_from_arrays(root_lit,
                          F.array(*[F.lit(float(i))
                                    for i in range(len(roots))])),
        F.col("lab"))
    l0_model = ovr().fit(l0_train.withColumn("y", lab_to_y))

    # -- per-root child classifiers: subtypes + Other=0 (fit_em:57-70)
    child_models = {}
    for r, subs in children.items():
        if not subs:
            continue
        sub_lit = F.array(*[F.lit(s) for s in subs])
        subset = tr_vec.where(F.array_contains("gold", r))
        hit = F.array_intersect("gold", sub_lit)
        y = F.when(F.size(hit) > 0,
                   F.array_position(sub_lit, F.element_at(hit, 1))
                   .cast("double")).otherwise(F.lit(0.0))
        sub_train = subset.withColumn("y", y)
        if sub_train.select("y").distinct().count() < 2:
            continue
        child_models[r] = ovr().fit(sub_train)

    # -- predict: argmax root always emitted (predict_em:84-85 level==0)
    root_inv = F.array(*[F.lit(r) for r in roots])
    l0_pred = l0_model.transform(te_vec).withColumn(
        "root", F.element_at(root_inv,
                             F.col("prediction").cast("int") + 1))
    parts = []
    plain = l0_pred.where(
        ~F.col("root").isin(list(child_models)) if child_models
        else F.lit(True))
    parts.append(plain.select("mention_key", "gold",
                              F.array("root").alias("pred")))
    for r, cm in child_models.items():
        subs = children[r]
        sub = l0_pred.where(F.col("root") == r) \
            .drop("prediction", "rawPrediction")
        cp = cm.transform(sub)
        # margin of the winning class (reference thresholds the raw
        # multiclass score, predict_em:74-82)
        margin = F.array_max(vector_to_array("rawPrediction"))
        sub_inv = F.array(*[F.lit(s) for s in subs])
        child_lab = F.when(
            (F.col("prediction") > 0) & (margin > F.lit(threshold)),
            F.element_at(sub_inv, F.col("prediction").cast("int")))
        pred = F.when(child_lab.isNotNull(),
                      F.array(F.col("root"), child_lab)) \
            .otherwise(F.array(F.col("root")))
        parts.append(cp.select("mention_key", "gold", pred.alias("pred")))

    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionByName(p)
    res = _micro_prf(scored.select("gold", F.sort_array("pred")
                                   .alias("pred")))
    tr_vec.unpersist()
    te_vec.unpersist()
    rows.unpersist()
    res.update({"n_classes": len(all_labels),
                "n_roots": len(roots),
                "n_child_models": len(child_models),
                "vocab": len(cv_model.vocabulary)})
    return res
