"""Alias-method sampler (A6): distributional correctness + determinism."""

from __future__ import annotations

import numpy as np
import pytest

from usc_ds_relationextraction_spark.functions.sampling import (AliasTable,
                                                                hashed_u01)


def test_alias_table_matches_weights():
    w = np.array([1.0, 2.0, 3.0, 4.0, 0.0, 10.0])
    t = AliasTable(w)
    keys = [f"k{i}" for i in range(200_000)]
    draws = t.draw_hashed(keys, "test")
    counts = np.bincount(draws, minlength=len(w)).astype(np.float64)
    freq = counts / counts.sum()
    expect = w / w.sum()
    # zero-weight bucket never drawn; others within 2% absolute
    assert counts[4] == 0
    np.testing.assert_allclose(freq, expect, atol=0.02)


def test_alias_draws_deterministic():
    t = AliasTable(np.array([3.0, 1.0, 2.0]))
    keys = [f"e{i}" for i in range(1000)]
    a = t.draw_hashed(keys, "s")
    b = t.draw_hashed(keys, "s")
    np.testing.assert_array_equal(a, b)
    # different salt → different draws
    c = t.draw_hashed(keys, "s2")
    assert (a != c).any()


def test_alias_table_rejects_bad_weights():
    with pytest.raises(ValueError):
        AliasTable(np.array([]))
    with pytest.raises(ValueError):
        AliasTable(np.array([0.0, 0.0]))
    with pytest.raises(ValueError):
        AliasTable(np.array([1.0, -1.0]))


def test_hashed_u01_range_and_mean():
    u = hashed_u01([str(i) for i in range(50_000)], "u")
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.01
