"""M4/M5 schedule operators: the driver-gate queries and the trainer
helpers must be the same computation."""

from __future__ import annotations

from usc_ds_relationextraction_spark.plans import gate_round4 as g4
from usc_ds_relationextraction_spark.plans.training import (
    is_checkpoint_epoch, lr_schedule, objective_interleave)

SF = "/root/testdata/sf0.01"


def test_objective_interleave_matches_m4_query(spark):
    pdf = objective_interleave(g4.M4_ITERS, g4.M4_TRANS_WEIGHT)
    counts = pdf.groupby("objective").size().to_dict()
    rows = g4.m4_objective_mix(spark, SF).collect()
    assert {r.objective: r.n_draws for r in rows} == counts
    # transWeight=2 → TransE drawn ~half the time
    assert counts["transe"] > counts["cotype_em"]
    assert counts["transe"] > counts["cotype_rm"]


def test_lr_schedule_floor_and_decay():
    assert lr_schedule(0.02, 0, 50) == 0.02
    assert lr_schedule(0.02, 25, 50) == 0.02 * 0.5
    # past the linear zero-crossing the 1e-4 floor holds
    assert lr_schedule(0.02, 50, 50) == 0.02 * 1e-4
    assert lr_schedule(0.02, 49, 50) > lr_schedule(0.02, 50, 50)


def test_checkpoint_cadence():
    marks = [e for e in range(50) if is_checkpoint_epoch(e, 50, 10)]
    assert marks == [9, 19, 29, 39, 49]
    # final epoch always checkpoints even off-cadence
    assert is_checkpoint_epoch(6, 7, 10)
