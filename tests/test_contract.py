"""Driver-contract invariants: queries()/oracle_sql() stay aligned, and
the generated DuckDB rule twins (POS tagger, lemmatizer) agree with the
Python implementations on a broad deterministic token sample."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entry
from usc_ds_relationextraction_spark.functions.lemma import get_lemma
from usc_ds_relationextraction_spark.functions.tokenize import _tag_one
from usc_ds_relationextraction_spark.plans.parity_queries import (
    _sql_lems, _sql_pos_tag, _sql_word_shape)
from usc_ds_relationextraction_spark.functions.features import word_shape

TOKENS = [
    "Alice", "Smith", "works", "worked", "working", "runs", "running",
    "stopped", "cities", "buses", "boxes", "churches", "wishes", "glass",
    "glasses", "is", "was", "were", "men", "children", "met", "grew",
    "filed", "decided", "joined", "a", "an", "the", "in", "on", "42",
    "3rd", "e-mail", "O'Brien", ".", ",", "?", "said", "made", "dogs",
    "ladies", "tries", "freeing", "seeing", "agreed", "used", "uses",
    "Jones", "Corp", "summarize", "yes", "ss", "s", "I",
]


def test_query_oracle_keys_align():
    q = entry.queries()
    o = entry.oracle_sql()
    # every oracle refers to an implemented query
    missing = set(o) - set(q)
    assert not missing, f"oracles without queries: {missing}"
    # the vast majority of queries carry a SQL oracle; only explicitly
    # non-SQL-expressible ops (stubbed codecs etc.) may omit one
    no_oracle = set(q) - set(o)
    assert no_oracle <= {"mm_decode_features"}, no_oracle


def test_sql_pos_tagger_agrees_with_python():
    con = duckdb.connect()
    expr = _sql_pos_tag("token")
    rows = con.execute(
        f"SELECT token, {expr} AS tag FROM (SELECT UNNEST(?) AS token)",
        [TOKENS]).fetchall()
    for tok, tag in rows:
        assert tag == _tag_one(tok), (tok, tag, _tag_one(tok))


def test_sql_lemmatizer_agrees_with_python():
    con = duckdb.connect()
    # run every token through every POS the gate distinguishes
    sql = f"""
WITH toks AS (
  SELECT 'c' AS conv_id, 0 AS turn_idx,
         row_number() OVER () AS pos, token
  FROM (SELECT UNNEST(?) AS token)
),
{_sql_lems()}
SELECT token, tag, lemma FROM lems
"""
    rows = con.execute(sql, [TOKENS]).fetchall()
    for tok, tag, lemma in rows:
        assert lemma == get_lemma(tok, tag), (tok, tag, lemma,
                                              get_lemma(tok, tag))


def test_sql_word_shape_agrees_with_python():
    con = duckdb.connect()
    samples = ["Alice", "ABC-12", "a1B2", "O'Brien", "...", "x", "McDonald"]
    expr = _sql_word_shape("t")
    rows = con.execute(
        f"SELECT t, {expr} FROM (SELECT UNNEST(?) AS t)", [samples]).fetchall()
    for t, s in rows:
        assert s == word_shape(t), (t, s, word_shape(t))
