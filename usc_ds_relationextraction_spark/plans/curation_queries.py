"""Oracle-gated queries for the curation family
(:mod:`..operators.curation`): decontamination, PII scrubbing,
repetition metrics, stratified sampling, sequence packing.

Every query has an exact DuckDB twin below — same md5-derived hashing
(:mod:`..functions.hashing`), same null-text contract as
``extended_queries._sql_doc_toks`` (NULL text → empty token list →
0-valued metrics on both engines), same column names and integer types.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation as C
from .extended_queries import _h_sql, _sql_doc_toks, _t

# ---------------------------------------------------------------------------
# deterministic PII augmentation (the synthetic docs carry no PII, so the
# query plants some — a pure function of doc_id, mirrored in the oracle)

_PII_PLANTS: list[tuple[int, str]] = [
    (7, " contact user7@example.com"),
    (11, " from 192.168.1.77"),
    (13, " ssn 123-45-6789"),
    (17, " call 555-867-5309"),
]


def _augment_pii(docs: DataFrame) -> DataFrame:
    aug = F.coalesce(F.col("text"), F.lit(""))
    for mod, s in _PII_PLANTS:
        aug = F.concat(aug, F.when(F.pmod("doc_id", F.lit(mod)) == 0,
                                   F.lit(s)).otherwise(F.lit("")))
    return docs.withColumn("text", aug)


def _sql_pii_aug() -> str:
    parts = " || ".join(
        f"CASE WHEN doc_id % {m} = 0 THEN '{s}' ELSE '' END"
        for m, s in _PII_PLANTS)
    return ("aug AS (SELECT doc_id, coalesce(text, '') || "
            f"{parts} AS text FROM documents)")


# ---------------------------------------------------------------------------
# queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    Q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    def decontam(s: SparkSession, sf: str) -> DataFrame:
        train, ev = C.split_eval(_t(s, sf, "documents"))
        return C.decontaminate(train, ev)

    def pii(s: SparkSession, sf: str) -> DataFrame:
        return C.pii_metrics(_augment_pii(_t(s, sf, "documents")))

    def corpus_gate(s: SparkSession, sf: str) -> DataFrame:
        """The EXTENDED pretraining-corpus gate: the corpus_filter
        verdict (dedup-canonical + language + quality) composed with the
        curation signals — eval-set contamination, repetition, and PII
        counts — into one per-doc keep/drop row.  Drop priority:
        duplicate > contaminated > language > quality > repetition
        (PII never drops — it reports for downstream redaction, the
        production semantics).  Eval-split docs are not training
        candidates and carry no verdict (inner join on the decontam
        side).  All four signal families join 1:1 on doc_id (uniform
        key); dedup's shuffles are the only non-trivial ones, exactly
        as in corpus_filter."""
        from .extended_queries import corpus_filter_verdicts
        docs = _t(s, sf, "documents")
        train, ev = C.split_eval(docs)
        base = corpus_filter_verdicts(docs)
        dec = C.decontaminate(train, ev).select("doc_id", "n_hits")
        rep = C.repetition_metrics(docs).select(
            "doc_id", "top_tok_milli", "dup3_milli")
        pii_df = C.pii_metrics(_augment_pii(docs)).select(
            "doc_id", "pii_total")
        j = (base.join(dec, "doc_id").join(rep, "doc_id")
             .join(pii_df, "doc_id"))
        return C.compose_gate_verdict(j)

    def gate_stats(s: SparkSession, sf: str) -> DataFrame:
        """Per-drop-reason accounting over the extended gate — docs,
        contaminated-n-gram hits, and PII instances per verdict class
        (the filtering job's budget report, `corpus_filter_stats`'s
        sibling for the extended gate).  One partial-aggregated groupBy
        on a 6-value key."""
        return (corpus_gate(s, sf).groupBy("drop_reason")
                .agg(F.count("*").cast("bigint").alias("n_docs"),
                     F.sum("n_hits").cast("bigint").alias("n_contam_hits"),
                     F.sum("pii_total").cast("bigint").alias("n_pii")))

    Q["cur_decontam"] = decontam
    Q["cur_pii_scrub"] = pii
    Q["cur_corpus_gate"] = corpus_gate
    Q["cur_gate_stats"] = gate_stats
    Q["cur_repetition"] = lambda s, sf: C.repetition_metrics(
        _t(s, sf, "documents"))
    Q["cur_token_rarity"] = lambda s, sf: C.token_rarity(
        _t(s, sf, "documents"))
    Q["cur_sample_stratified"] = lambda s, sf: C.stratified_sample(
        _t(s, sf, "documents"))
    Q["cur_pack_sequences"] = lambda s, sf: C.pack_sequences(
        _t(s, sf, "documents"))
    Q["cur_pack_shuffled"] = lambda s, sf: C.pack_sequences(
        _t(s, sf, "documents"), shuffled=True)

    def pack_chunks(s: SparkSession, sf: str) -> DataFrame:
        """Packing-efficiency manifest: per (stratum, chunk) the count
        of docs STARTING there, their total tokens, and how many
        straddle into the next chunk — the report a packing job emits
        (owning-chunk accounting: a straddler's tokens are counted
        where it starts, so per-stratum token sums tie out exactly to
        the corpus).  One partial-aggregated groupBy on
        (stratum, chunk_id) over pack_sequences — no extra scan."""
        p = C.pack_sequences(_t(s, sf, "documents"))
        return (p.groupBy("stratum", "chunk_id")
                .agg(F.count("*").cast("int").alias("n_docs"),
                     F.sum("n_tok").cast("bigint").alias("n_tokens"),
                     F.sum("straddle").cast("int").alias("n_straddle")))
    Q["cur_pack_chunks"] = pack_chunks
    return Q


# ---------------------------------------------------------------------------
# DuckDB twins


def _sql_hash_gram(n: int, name: str) -> str:
    """Rolling-hash n-gram list CTE — the exact integer arithmetic of
    ``operators.dedup.shingle_hashes`` (requires ``tok_h`` in scope).
    Summing all window terms before the single ``& MASK60`` equals the
    Spark side's mask-per-addition (mod arithmetic; sum < 2⁶² fits
    int64)."""
    from ..functions.hashing import (MASK60, minhash_mix_sql,
                                     shingle_coeffs)
    terms = " + ".join(minhash_mix_sql(f"th[i + {j}]", c)
                       for j, c in enumerate(shingle_coeffs(n)))
    return (f"{name} AS (SELECT doc_id, CASE WHEN len(th) >= {n} "
            f"THEN list_transform(generate_series(1, len(th) - {n - 1}),"
            f" i -> (({terms}) & {MASK60})) "
            "ELSE CAST([] AS BIGINT[]) END AS g FROM tok_h)")


_DUP_MILLI = ("CASE WHEN len({a}) > 0 THEN CAST(floor((len({a}) - "
              "len(list_distinct({a}))) * 1000 / len({a})) AS BIGINT) "
              "ELSE 0 END")


def oracles() -> dict[str, str]:
    O: dict[str, str] = {}
    m = C.EVAL_MOD

    O["cur_decontam"] = f"""WITH {_sql_doc_toks()},
tok_h AS (SELECT doc_id, toks, list_transform(toks, t -> {_h_sql('t')})
          AS th FROM doc_toks),
{_sql_hash_gram(C.DECONTAM_NGRAM, "sh5")},
tr_sh AS (SELECT DISTINCT doc_id, unnest(g) AS s FROM sh5
          WHERE doc_id % {m} <> 0),
ev_sh AS (SELECT DISTINCT unnest(g) AS s FROM sh5
          WHERE doc_id % {m} = 0),
hits AS (SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_hits
         FROM tr_sh JOIN ev_sh USING (s) GROUP BY doc_id),
base AS (SELECT doc_id, CAST(greatest(len(toks) - {C.DECONTAM_NGRAM - 1},
         0) AS INTEGER) AS n_ngrams FROM doc_toks
         WHERE doc_id % {m} <> 0)
SELECT base.doc_id, n_ngrams,
       CAST(coalesce(n_hits, 0) AS INTEGER) AS n_hits,
       CAST(coalesce(n_hits, 0) > 0 AS INTEGER) AS contaminated
FROM base LEFT JOIN hits USING (doc_id)"""

    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS INTEGER)"
        f" AS n_{name}" for name, pat, _ in C.PII_PATTERNS)
    total = " + ".join(f"n_{name}" for name, _, _ in C.PII_PATTERNS)
    red = "text"
    for _, pat, repl in C.PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    O["cur_pii_scrub"] = f"""WITH {_sql_pii_aug()},
c AS (SELECT doc_id, {counts}, md5({red}) AS redacted_md5 FROM aug)
SELECT doc_id, {", ".join(f"n_{n}" for n, _, _ in C.PII_PATTERNS)},
       CAST({total} AS INTEGER) AS pii_total, redacted_md5 FROM c"""

    O["cur_repetition"] = f"""WITH {_sql_doc_toks()},
tok_h AS (SELECT doc_id, toks, list_transform(toks, t -> {_h_sql('t')})
          AS th FROM doc_toks),
{_sql_hash_gram(2, "g2")},
{_sql_hash_gram(3, "g3")},
top AS (SELECT doc_id, max(c) AS top_c FROM (
    SELECT doc_id, t, COUNT(*) AS c FROM (
        SELECT doc_id, unnest(toks) AS t FROM doc_toks)
    GROUP BY doc_id, t) GROUP BY doc_id)
SELECT d.doc_id, CAST(len(d.toks) AS INTEGER) AS n_tok,
  {_DUP_MILLI.format(a="d.toks")} AS dup_tok_milli,
  {_DUP_MILLI.format(a="g2.g")} AS dup2_milli,
  {_DUP_MILLI.format(a="g3.g")} AS dup3_milli,
  CASE WHEN len(d.toks) > 0 THEN CAST(floor(coalesce(top_c, 0) * 1000
       / len(d.toks)) AS BIGINT) ELSE 0 END AS top_tok_milli
FROM doc_toks d JOIN g2 USING (doc_id) JOIN g3 USING (doc_id)
LEFT JOIN top USING (doc_id)"""

    O["cur_token_rarity"] = f"""WITH {_sql_doc_toks()},
tk AS (SELECT doc_id, unnest(toks) AS tok FROM doc_toks),
freq AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok),
tot AS (SELECT SUM(c) AS n_total FROM freq),
fp AS (SELECT tok, CAST((c * 1000000) // n_total AS BIGINT) AS f_ppm
       FROM freq, tot),
pd AS (SELECT doc_id, COUNT(*) AS n_tok, SUM(f_ppm) AS sum_ppm
       FROM tk JOIN fp USING (tok) GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(pd.n_tok, 0) AS INTEGER) AS n_tok,
       CAST(coalesce(pd.sum_ppm // pd.n_tok, 0) AS BIGINT) AS rarity_ppm
FROM (SELECT doc_id FROM documents) d LEFT JOIN pd USING (doc_id)"""

    h_rate = "(('0x' || substr(md5('rate|' || source), 1, 15))::BIGINT)"
    h_draw = (f"(('0x' || substr(md5('{C.SAMPLE_SALT}|' || "
              "CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)")
    O["cur_sample_stratified"] = f"""SELECT doc_id, stratum, rate_milli,
       CAST(draw AS INTEGER) AS draw
FROM (SELECT doc_id, source AS stratum,
             CAST(100 + ({h_rate} % 900) AS INTEGER) AS rate_milli,
             {h_draw} % 1000 AS draw
      FROM documents)
WHERE draw < rate_milli"""

    # the extended gate composes the ALREADY-EXACT twins as derived
    # tables (DuckDB allows WITH RECURSIVE inside a subquery), so the
    # composition can never drift from its parts
    from .extended_queries import oracles as _ext_oracles
    base_sql = _ext_oracles()["corpus_filter"]
    g = C.GATE_REP_MILLI  # corpus-calibrated: sf0.01 top_tok p90=139
    O["cur_corpus_gate"] = f"""SELECT b.doc_id, b.lang_pred,
  b.quality_milli, b.is_canonical, d.n_hits, r.top_tok_milli,
  r.dup3_milli, p.pii_total,
  CAST(b.is_canonical = 1 AND d.n_hits = 0
       AND b.lang_pred = '{C.GATE_LANG}'
       AND b.quality_milli >= {C.GATE_QUALITY_MIN}
       AND r.top_tok_milli <= {g}
       AND r.dup3_milli <= {g} AS INTEGER) AS keep,
  CASE WHEN b.is_canonical = 0 THEN 'duplicate'
       WHEN d.n_hits > 0 THEN 'contaminated'
       WHEN b.lang_pred <> '{C.GATE_LANG}' THEN 'language'
       WHEN b.quality_milli < {C.GATE_QUALITY_MIN} THEN 'quality'
       WHEN r.top_tok_milli > {g} OR r.dup3_milli > {g}
            THEN 'repetition'
       ELSE 'kept' END AS drop_reason
FROM ({base_sql}) b
JOIN ({O["cur_decontam"]}) d ON b.doc_id = d.doc_id
JOIN ({O["cur_repetition"]}) r ON b.doc_id = r.doc_id
JOIN ({O["cur_pii_scrub"]}) p ON b.doc_id = p.doc_id"""

    def _pack_sql(order_expr: str) -> str:
        """The ONE pack-oracle template — ordered and shuffled variants
        differ only in the window's ORDER BY (a blind string-replace
        here once risked corrupting silently when the base SQL
        changed)."""
        b = C.PACK_BUDGET
        return f"""WITH {_sql_doc_toks()},
t AS (SELECT d.doc_id, s.source, CAST(len(d.toks) AS BIGINT) AS n_tok
      FROM doc_toks d JOIN documents s USING (doc_id))
SELECT doc_id, source AS stratum, n_tok,
  CAST(SUM(n_tok) OVER w - n_tok AS BIGINT) AS start_off,
  CAST(floor((SUM(n_tok) OVER w - n_tok) / {b}) AS BIGINT) AS chunk_id,
  CASE WHEN n_tok > 0 THEN CAST(floor((SUM(n_tok) OVER w - 1) / {b})
       <> floor((SUM(n_tok) OVER w - n_tok) / {b}) AS INTEGER)
       ELSE 0 END AS straddle
FROM t
WINDOW w AS (PARTITION BY source ORDER BY {order_expr}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""

    O["cur_pack_sequences"] = _pack_sql("doc_id")

    O["cur_gate_stats"] = f"""SELECT drop_reason,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_hits) AS BIGINT) AS n_contam_hits,
       CAST(SUM(pii_total) AS BIGINT) AS n_pii
FROM ({O["cur_corpus_gate"]}) GROUP BY drop_reason"""

    from ..functions.hashing import h64_duckdb
    # doc_id tie-break mirrors the Spark side (collision determinism)
    O["cur_pack_shuffled"] = _pack_sql(
        h64_duckdb("'pack|' || CAST(doc_id AS VARCHAR)") + ", doc_id")

    O["cur_pack_chunks"] = f"""SELECT stratum, chunk_id,
       CAST(COUNT(*) AS INTEGER) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(straddle) AS INTEGER) AS n_straddle
FROM ({O["cur_pack_sequences"]}) GROUP BY stratum, chunk_id"""
    return O
