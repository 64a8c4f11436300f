"""Token-subsequence span alignment (P3 ``find_index``) — fused Arrow scan.

Why this module exists: the HOF form of P3 (kept below the queries in
:mod:`..plans.parity_queries` as the agreement twin) joins the turn table
to the alias dimension on ``arrays_overlap`` — a condition no hash join
can serve, so Catalyst plans a BroadcastNestedLoopJoin that evaluates
O(|turns| x |aliases|) INTERPRETED overlap checks; each surviving pair
then pays an interpreted ``filter(sequence)/slice`` window scan, and
CollapseProject re-inlines the ``hits`` expression at every downstream
reference (the same pathology class fixed in ``streaming/ingest.py``
and ``functions/sketches.py``).  At 10^12 turns the nested-loop factor
alone is disqualifying.

The fused form scans each turn ONCE against a first-token-indexed alias
dictionary (Aho–Corasick-lite): per token position, hash-probe the
aliases whose first token matches, verify the k-token window.  One Arrow
crossing per batch and NO join at all — at scale this is a narrow map
over the turn table with a broadcast dictionary (the KB alias dict is
dimension-scale by definition: the same broadcast contract as the S5
Brown dict, ``functions/features.py:100-121``, and J1's broadcast side).
Work drops from O(T·A) interpreted checks to O(T·n) hash probes.

Hit semantics are IDENTICAL to the HOF/DuckDB forms: 1-based start
positions ``i`` with ``toks[i-1 : i-1+k] == alias_tokens``, ascending,
aliases tokenized by the same whitespace-split-drop-empties rule as
:func:`..functions.tokenize.tokens_col`; turns with no hit are dropped.
``tests/test_spans.py`` asserts fused ≡ HOF row-for-row and the driver's
DuckDB oracle for p3_* is unchanged.

Reference: ``DataProcessor/nlp_parse.py:162-178`` (find_index, first
occurrence), ``:82-96`` (resume-after-match / successive occurrences).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

HITS_SCHEMA = "array<struct<alias: string, hits: array<int>>>"


def _tok_ws(s: str) -> list[str]:
    """Python twin of ``tokenize.tokens_col`` (split on ' ', drop '')."""
    return [t for t in (s or "").split(" ") if t]


def build_alias_index(aliases: list[str]) -> dict[str, list[tuple[str, list[str]]]]:
    """first_token -> [(alias_string, alias_tokens), ...] — insertion order
    follows the input list; hit emission order per turn is first-match
    order, which the order-insensitive consumers don't depend on."""
    idx: dict[str, list[tuple[str, list[str]]]] = {}
    seen: set[str] = set()
    for a in aliases:
        if a in seen:       # exact-duplicate alias strings collapse here
            continue        # (align_spans also .distinct()s the dim)
        seen.add(a)
        at = _tok_ws(a)
        if at:
            idx.setdefault(at[0], []).append((a, at))
    return idx


def scan_tokens(row: list[str],
                idx: dict[str, list[tuple[str, list[str]]]]
                ) -> list[tuple[str, list[int]]]:
    """Pure scan kernel (shared by the UDF closure and property tests):
    every (alias, 1-based ascending hit starts) with ≥1 hit in ``row``."""
    n = len(row)
    found: dict[str, list[int]] = {}
    for p in range(n):
        cands = idx.get(row[p])
        if not cands:
            continue
        for alias, at in cands:
            k = len(at)
            if p + k <= n and row[p:p + k] == at:
                found.setdefault(alias, []).append(p + 1)
    return list(found.items())


def align_spans(turns: DataFrame, alias_df: DataFrame,
                toks_col: str = "toks",
                alias_col: str = "alias") -> DataFrame:
    """(conv_id, turn_idx, toks) x alias dim -> one row per (turn, alias)
    with ``hits`` = every 1-based start of the alias token-subsequence.

    The alias dimension is collected to the driver and shipped as a
    broadcast variable into the UDF closure — dictionary-scale by
    contract (a KB alias list does not grow with the corpus).  The scan
    itself is a narrow map: no shuffle, no join.
    """
    alias_rows = [r[0] for r in
                  alias_df.select(alias_col).distinct().collect()]
    sc = turns.sparkSession.sparkContext
    bc = sc.broadcast(build_alias_index(alias_rows))

    @pandas_udf(HITS_SCHEMA)
    def scan(toks: pd.Series) -> pd.Series:
        idx = bc.value
        return pd.Series([
            scan_tokens(list(arr) if arr is not None else [], idx)
            for arr in toks])

    # explode drops empty arrays -> turns with no hit vanish, exactly as
    # the HOF form's  WHERE size(hits) > 0
    return turns.select(
        "conv_id", "turn_idx",
        F.explode(scan(toks_col)).alias("m")
    ).select("conv_id", "turn_idx",
             F.col("m.alias").alias("alias"),
             F.col("m.hits").alias("hits"))
