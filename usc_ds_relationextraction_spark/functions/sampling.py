"""Walker–Vose alias-method sampling (SURVEY.md A6).

Reference: ``code/Model/retype/ransampl.c:23-100`` — O(1) weighted draws
used for edge sampling (``hplelib.cpp:285-286``) and the objective mixer
(``retype.cpp:183-186``).  This is the NumPy re-expression: the table
builds in O(n), a batch of draws is fully vectorized, and determinism
comes from hashed uniforms (never ``np.random`` state) so any partition /
resume / replay produces identical draws (north_rule).

The BCD trainers (plans/training.py) default to full-pass expectation
weighting — the reference's own deterministic mode — but the sampled-SGD
path (reference mode 'j') needs draws ∝ weight; ``AliasTable`` provides
them with the exact reference algorithm.
"""

from __future__ import annotations

import hashlib

import numpy as np


class AliasTable:
    """Walker–Vose alias table over nonnegative weights.

    Build: O(n) (ransampl_set, ransampl.c:48-94).
    Draw:  O(1) per sample — pick a column with u1, take it or its alias
           by comparing u2 against the column's cutoff (ransampl_draw,
           ransampl.c:96-100).
    """

    def __init__(self, weights: np.ndarray):
        w = np.asarray(weights, dtype=np.float64)
        if w.ndim != 1 or len(w) == 0:
            raise ValueError("weights must be a non-empty 1-d array")
        if (w < 0).any():
            raise ValueError("weights must be nonnegative")
        total = w.sum()
        if total <= 0:
            raise ValueError("weights must sum to > 0")
        n = len(w)
        self.n = n
        prob = w * (n / total)
        self.prob = np.empty(n, dtype=np.float64)
        self.alias = np.empty(n, dtype=np.int64)
        small = [i for i in range(n) if prob[i] < 1.0]
        large = [i for i in range(n) if prob[i] >= 1.0]
        while small and large:
            s = small.pop()
            l = large.pop()
            self.prob[s] = prob[s]
            self.alias[s] = l
            prob[l] = prob[l] - (1.0 - prob[s])
            (small if prob[l] < 1.0 else large).append(l)
        for i in large:
            self.prob[i] = 1.0
            self.alias[i] = i
        for i in small:  # numerical leftovers
            self.prob[i] = 1.0
            self.alias[i] = i

    def draw(self, u1: np.ndarray, u2: np.ndarray) -> np.ndarray:
        """Vectorized ransampl_draw: indices from two uniform arrays."""
        col = np.minimum((u1 * self.n).astype(np.int64), self.n - 1)
        take_alias = u2 >= self.prob[col]
        return np.where(take_alias, self.alias[col], col)

    def draw_hashed(self, keys, salt: str) -> np.ndarray:
        """Deterministic draws keyed on strings — resume/replay-stable."""
        u1 = hashed_u01(keys, salt + "|u1")
        u2 = hashed_u01(keys, salt + "|u2")
        return self.draw(u1, u2)


class SigmoidTable:
    """The reference's precomputed 1000-bin sigmoid table
    (``code/Model/retype/hplelib.cpp:289-293``, word2vec convention):
    ``table[i] = e/(e+1)`` with ``e = exp((i/1000·2 − 1)·6)``; lookups
    clamp to {0, 1} outside ±MAX_EXP and index with
    ``int((x + 6)·(1000/(2·6)))``.

    Because each bin VALUE is a fixed double, a lookup is engine-portable:
    the DuckDB twin inlines the same 1000 literals (generated from this
    class), so training-gradient doubles can be oracle-checked without
    trusting two libm ``exp`` implementations to round identically.
    """

    SIZE = 1000          # EXP_TABLE_SIZE, hplelib.h:12
    MAX_EXP = 6.0        # hplelib.h:13

    def __init__(self) -> None:
        i = np.arange(self.SIZE, dtype=np.float64)
        e = np.exp((i / self.SIZE * 2.0 - 1.0) * self.MAX_EXP)
        self.table = e / (e + 1.0)

    def value(self, x: np.ndarray) -> np.ndarray:
        """Vectorized table lookup with the word2vec clamp."""
        x = np.asarray(x, dtype=np.float64)
        idx = np.floor((x + self.MAX_EXP)
                       * (self.SIZE / (2.0 * self.MAX_EXP))).astype(np.int64)
        out = self.table[np.clip(idx, 0, self.SIZE - 1)]
        return np.where(x >= self.MAX_EXP, 1.0,
                        np.where(x <= -self.MAX_EXP, 0.0, out))

    def sql_case(self, expr: str) -> str:
        """DuckDB expression computing the SAME lookup via an inline
        literal array (1-indexed list_extract)."""
        # every branch CAST to DOUBLE: DuckDB parses decimal literals as
        # DECIMAL, and decimal arithmetic (exact) can differ from the
        # IEEE double ops numpy performs by one ulp
        lits = ", ".join(repr(float(v)) for v in self.table)
        idx = (f"CAST(floor(({expr} + {self.MAX_EXP!r}) * "
               f"{self.SIZE / (2.0 * self.MAX_EXP)!r}) AS BIGINT)")
        return (f"(CASE WHEN {expr} >= {self.MAX_EXP!r} "
                f"THEN CAST(1.0 AS DOUBLE) "
                f"WHEN {expr} <= {-self.MAX_EXP!r} THEN CAST(0.0 AS DOUBLE) "
                f"ELSE CAST(list_extract([{lits}], "
                f"CAST(LEAST(GREATEST({idx}, 0), {self.SIZE - 1}) AS INT)"
                f" + 1) AS DOUBLE) END)")


def hashed_u01(keys, salt: str) -> np.ndarray:
    """md5-derived uniforms in [0,1) per key — the same portable-hash
    construction as functions.hashing (60-bit prefix / 2^60)."""
    out = np.empty(len(keys), dtype=np.float64)
    sb = salt.encode("utf-8")
    for i, k in enumerate(keys):
        h = hashlib.md5(str(k).encode("utf-8") + b"\x1f" + sb).hexdigest()
        out[i] = int(h[:15], 16) / float(1 << 60)
    return out
