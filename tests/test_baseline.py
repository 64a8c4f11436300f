"""M9-lite regression check: the Spark-ML logistic baseline over the same
feature rows the embedding trainer consumes must reach a competitive F1 —
drift here flags a broken feature pipeline independent of the embedding
path (the reference uses its classifier zoo the same way, SURVEY §5.2).
"""

from __future__ import annotations

import pytest

from usc_ds_relationextraction_spark.plans.baselines import (
    train_eval_logistic)
from usc_ds_relationextraction_spark.plans.pipeline import KGPipeline
from usc_ds_relationextraction_spark.sources import synthetic as syn


@pytest.fixture(scope="module")
def rm_rows(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("whb"))
    turns = syn.transcripts(spark, 50)
    brown = {r.word: r.cluster for r in syn.brown_clusters(spark).collect()}
    pipe = KGPipeline(spark, wh)
    pipe.run_graphs(turns, syn.kb_aliases(spark), syn.kb_facts(spark), brown)
    return pipe.wh.read("rm_feature_rows")


def test_logistic_baseline_f1(rm_rows):
    m = train_eval_logistic(rm_rows)
    assert m["pos_gt"] > 50
    assert m["f1"] >= 0.85, m
    assert m["n_classes"] >= 3
    assert m["vocab"] > 100


def test_svm_baseline_f1(rm_rows):
    """Second family (margin/hinge — the PLSVM analog): LinearSVC
    one-vs-rest through the same scaffold and protocol."""
    from usc_ds_relationextraction_spark.plans.baselines import (
        train_eval_svm)
    m = train_eval_svm(rm_rows)
    assert m["pos_gt"] > 50
    assert m["f1"] >= 0.85, m
    assert m["n_classes"] >= 3


def test_perceptron_baseline_f1(rm_rows):
    """Third family (mistake-driven linear — the Perceptron analog):
    single-layer softmax MLP, layer spec taken from the fitted
    vectorizer/indexer dimensions."""
    from usc_ds_relationextraction_spark.plans.baselines import (
        train_eval_perceptron)
    m = train_eval_perceptron(rm_rows)
    assert m["pos_gt"] > 50
    assert m["f1"] >= 0.85, m
    assert m["n_classes"] >= 3


@pytest.fixture(scope="module")
def em_rows(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("whem"))
    turns = syn.transcripts(spark, 50)
    brown = {r.word: r.cluster for r in syn.brown_clusters(spark).collect()}
    pipe = KGPipeline(spark, wh)
    pipe.run_graphs(turns, syn.kb_aliases(spark), syn.kb_facts(spark), brown)
    return pipe.wh.read("em_feature_rows")


def test_clpl_baseline_f1(em_rows):
    """Fourth family (partial-label reduction + Pegasos-style hinge — the
    CLPL analog, Classifier/CLPL.py): expanded V*L feature space, one
    binary LinearSVC, hierarchy-aware prediction."""
    from usc_ds_relationextraction_spark.plans.baselines import (
        train_eval_clpl)
    m = train_eval_clpl(em_rows)
    assert m["n_gold"] > 100
    assert m["n_classes"] >= 5          # roots + subtypes
    assert m["f1"] >= 0.80, m


def test_hierarchy_svm_baseline_f1(em_rows):
    """Fifth family (per-level one-vs-all hinge — the HierarchySVM
    analog, Classifier/HierarchySVM.py): root classifier + per-root
    subtype classifiers with an Other class, thresholded descent."""
    from usc_ds_relationextraction_spark.plans.baselines import (
        train_eval_hierarchy_svm)
    m = train_eval_hierarchy_svm(em_rows)
    assert m["n_gold"] > 100
    assert m["n_roots"] >= 3            # person / organization / location
    assert m["n_child_models"] >= 1
    assert m["f1"] >= 0.80, m


def test_type_hierarchy_derivation():
    """Path-prefix hierarchy matches the reference's supertype semantics
    (TypeHierarchy.py:38-57): parents derived, closure adds ancestors."""
    from usc_ds_relationextraction_spark.plans.baselines import (
        _path_close, _type_hierarchy)
    labs = ["/person/politician", "/person", "/location/city"]
    h = _type_hierarchy(labs)
    assert h == {"/person/politician": "/person",
                 "/location/city": "/location"}
    assert _path_close(["/person/politician"]) == [
        "/person", "/person/politician"]
