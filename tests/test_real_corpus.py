"""Real-English reference-format corpus: replay-gate quality + rule-POS
agreement (the round-3 'fixture-tuned POS' blind spot, now measured).

The corpus (tests/fixtures/real_corpus) is hand-authored natural English
with gold PTB tags — generated deterministically by
scripts/make_real_corpus.py, committed as fixtures."""

from __future__ import annotations

import json
import os

DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "fixtures", "real_corpus")


def _lines(fn):
    out = []
    with open(os.path.join(DIR, fn)) as f:
        for line in f:
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                out.append(None)  # the deliberate corrupt line
    return out


def test_fixture_shape():
    train, test = _lines("train_new.json"), _lines("test_new.json")
    assert sum(1 for x in train if x is None) == 1  # corrupt quarantine
    assert len(train) >= 90 and len(test) >= 25
    d = next(x for x in train if x)
    assert set(d) == {"articleId", "sentId", "tokens", "pos",
                      "entityMentions", "relationMentions"}
    assert len(d["tokens"]) == len(d["pos"])


def test_rule_tagger_agreement_on_real_english():
    """The rule tagger vs gold PTB tags on real English — 0.823 at
    round 3, ≥0.93 after the round-4 closed-class extension, ≥0.95
    after the round-5 participle/suffix-miss extension (measured
    0.975 on the 10× corpus)."""
    from usc_ds_relationextraction_spark.functions.tokenize import _tag_one
    tot = ok = 0
    for fn in ("train_new.json", "test_new.json"):
        for d in _lines(fn):
            if d is None:
                continue
            for t, g in zip(d["tokens"], d["pos"]):
                tot += 1
                ok += _tag_one(t) == g
    assert tot > 1000
    assert ok / tot >= 0.95, f"agreement {ok / tot:.3f}"


def test_replay_gate_on_real_corpus(spark, tmp_path):
    """End-to-end replay (features → graphs → train → predict → M10) on
    the 10× real-English corpus at the COMMITTED operating point —
    θ=0.12, 300 epochs, frozen from the scripts/tune_replay.py sweep
    (θ-plateau [0.02, 0.21] all score identically, so the committed θ
    sits mid-plateau, not on a cliff).  Deterministic training lands
    P=0.9355 / R=0.9667 / F1=0.9508 (31 predicted, 30 gold, 29 hits)
    with exactly one quarantined corrupt line."""
    from usc_ds_relationextraction_spark.plans.replay import replay_gate
    res = replay_gate(spark, str(tmp_path / "wh"),
                      os.path.join(DIR, "train_new.json"),
                      os.path.join(DIR, "test_new.json"),
                      epochs=300, lr=0.25, theta=0.12)
    assert res["n_corrupt"] == 1
    assert res["theta_used"] == 0.12
    m = res["metrics"]
    assert m["f1"] >= 0.90, m
    assert m["precision"] >= 0.93, m
    assert m["recall"] >= 0.90, m
    assert res["n_triples"] >= 25
