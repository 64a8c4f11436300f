"""Training-data curation operators beyond the reference's own pipeline:
decontamination, PII scrubbing, repetition metrics, stratified sampling,
and sequence packing.

These are the corpus-hygiene stages a 100 TB LLM training-data pipeline
runs between raw ingest and the KG/feature stages the reference covers
(public-knowledge designs: GPT-3 App. C n-gram decontamination, Gopher
App. A repetition rules, C4 heuristic filters, concat-and-chunk sequence
packing).  Everything is JVM column expressions / window functions —
zero Python in the hot path — with engine-portable md5 hashing
(:mod:`..functions.hashing`) so every query carries an exact DuckDB twin
(:mod:`..plans.curation_queries`).

Scale shapes (100 TB notes inline per operator):
  * decontaminate — eval-set shingles are benchmark-sized (≤ millions of
    rows); broadcast semi-join keeps the corpus side a narrow map.
  * pii_metrics  — pure per-row regex, one projection, no shuffle.
  * repetition_metrics — duplicate-n-gram fractions are row-local HOFs;
    only the top-token share needs a (doc_id, token) groupBy, which
    map-side combines on uniform keys.
  * stratified_sample — rate is a pure function of the stratum key, so
    sampling is a stateless filter: no rates join, no shuffle, and
    resume-safe (md5, not rand()).
  * pack_sequences — one window per stratum; at corpus scale partition
    the stream further (e.g. (source, shard)) so each window's state is
    bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h64
from ..functions.hof import let
from ..functions.text_analysis import ws_tokens
from .dedup import shingle_hashes

# ---------------------------------------------------------------------------
# decontamination

DECONTAM_NGRAM = 5
# deterministic eval-set carve-out for tests/benches: ~3.4% of doc_ids
EVAL_MOD = 29


def split_eval(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Deterministic (train, eval) split on ``doc_id % EVAL_MOD`` —
    stands in for a real benchmark table in tests and oracles."""
    is_eval = F.pmod(F.col("doc_id"), F.lit(EVAL_MOD)) == 0
    return docs.where(~is_eval), docs.where(is_eval)


def decontaminate(train: DataFrame, eval_docs: DataFrame,
                  ngram: int = DECONTAM_NGRAM) -> DataFrame:
    """Per-train-doc n-gram overlap against an eval/benchmark set
    (GPT-3-style decontamination, word n-grams instead of 13-grams
    because the synthetic docs are short).

    Returns ``(doc_id, n_ngrams, n_hits, contaminated)`` for EVERY train
    doc — ``n_hits`` = distinct train-doc shingles also present anywhere
    in the eval set, ``contaminated`` = 1 iff any hit.

    Shingles are matched by 60-bit rolling hash (``shingle_hashes``) —
    no per-shingle string allocation, int64 join keys, and the standard
    decontamination trade: a cross-set collision (≈2⁻⁶⁰ per comparison)
    over-flags one n-gram; the DuckDB twin computes identical hashes so
    the gate stays exact.

    Scale: the eval side is benchmark-sized BY CONTRACT (a benchmark
    suite, not a second corpus), so its distinct shingle set is
    broadcast and the train side never shuffles — explode → broadcast
    semi-join → per-doc count is a narrow map + partial agg on doc_id
    (already the scan partitioning).  The adaptive probe chooser is
    deliberately NOT used here: its bounded ``limit(N+1).count()`` probe
    sits above a distinct() and would run the full eval dedup eagerly at
    DataFrame-construction time; for an explicitly-contracted small side
    the static hint is the right tool.
    """
    tr_toks = ws_tokens("text")
    # n_ngrams ≡ max(n_tok − (ngram−1), 0): no shingle build needed
    base = train.select("doc_id",
                        F.greatest(F.size(tr_toks) - (ngram - 1),
                                   F.lit(0)).cast("int").alias("n_ngrams"))
    tr_sh = (train
             .select("doc_id", F.explode(shingle_hashes(tr_toks, ngram))
                     .alias("sh"))
             .distinct())
    ev_sh = (eval_docs
             .select(F.explode(shingle_hashes(ws_tokens("text"), ngram))
                     .alias("sh"))
             .distinct())
    hits = (tr_sh.join(F.broadcast(ev_sh), on="sh")
            .groupBy("doc_id")
            .agg(F.count("*").cast("int").alias("n_hits")))
    return (base.join(hits, on="doc_id", how="left")
            .select("doc_id", "n_ngrams",
                    F.coalesce("n_hits", F.lit(0)).cast("int")
                    .alias("n_hits"))
            .withColumn("contaminated",
                        (F.col("n_hits") > 0).cast("int")))


# ---------------------------------------------------------------------------
# PII scrubbing

# RE2- and Java-regex-compatible (no backrefs / lookaround): the SAME
# pattern strings run in Spark and in the DuckDB oracle.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement) — applied in order; EMAIL before IP so
    # "user@h1.2.3.4"-style strings resolve deterministically.
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),  # 3-2-4 ≠ phone's 3-3-4
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """Apply every ``PII_PATTERNS`` replacement in order, each global —
    THE one definition of redaction, shared by :func:`pii_metrics` (which
    proves it via ``redacted_md5``) and the pipeline's ``turns_curated``
    stage (which ships it).  NULL input stays NULL (redaction never
    invents text); callers wanting the empty-string contract coalesce
    first, as ``pii_metrics`` does."""
    for _, pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return col


def pii_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII hit counts + md5 of the redacted text.

    Counts are taken per pattern on the ORIGINAL text (so overlapping
    families report independently); redaction applies the patterns in
    ``PII_PATTERNS`` order, each replacement global.  Emitting
    ``md5(redacted)`` instead of the text keeps the gate row narrow while
    still proving byte-identical redaction.  Pure per-row regex — one
    projection, no shuffle, no Python.
    """
    aug = F.coalesce(F.col(text_col), F.lit(""))
    sel: list[Column] = [F.col("doc_id")]
    total = None
    for name, pat, _ in PII_PATTERNS:
        n = F.size(F.regexp_extract_all(aug, F.lit(pat), F.lit(0)))
        sel.append(n.cast("int").alias(f"n_{name}"))
        total = n if total is None else total + n
    sel.append(total.cast("int").alias("pii_total"))
    sel.append(F.md5(redact_pii(aug)).alias("redacted_md5"))
    return docs.select(*sel)


# ---------------------------------------------------------------------------
# repetition metrics (Gopher-family duplicate-n-gram rules)


def _dup_milli(arr: Column) -> Column:
    """``arr`` must be a let-bound lambda variable or cheap column ref —
    it is referenced three times (see :mod:`..functions.hof`)."""
    n = F.size(arr)
    return F.when(
        n > 0, F.floor((n - F.size(F.array_distinct(arr))) * 1000 / n)
    ).otherwise(F.lit(0)).cast("bigint")


def repetition_metrics(docs: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """Per-doc repetition profile: duplicate-token / -bigram / -trigram
    fractions (milli-units) plus the most-frequent-token share.

    The duplicate fractions are row-local (``size − size∘array_distinct``
    — no shuffle); the n-gram arrays are 60-bit rolling HASHES
    (``shingle_hashes``: md5 per token + integer window combine), not
    joined strings — 4× faster at 200k docs (no per-shingle string
    allocation) and value-identical across engines because the DuckDB
    twin evaluates the same integer arithmetic (within-doc hash
    collision ≈ 2⁻⁶⁰ shifts a fraction by 1‰ identically on BOTH sides).
    The top-token share needs real multiplicity, so it is the one
    shuffle: explode → (doc_id, tok) count → per-doc max, both aggs
    map-side combined on keys no hotter than the corpus' hottest token
    within one doc.
    """
    # one let-bound tokenize per row feeding all four metrics; each gram
    # array is itself bound once before its three references in
    # _dup_milli (unbound, the inlined split() made this 15× slower)
    row_local = docs.select("doc_id", let(ws_tokens(text_col), lambda t:
        F.struct(
            F.size(t).cast("int").alias("n_tok"),
            _dup_milli(t).alias("dup_tok_milli"),
            let(shingle_hashes(t, 2), _dup_milli).alias("dup2_milli"),
            let(shingle_hashes(t, 3), _dup_milli).alias("dup3_milli"),
        )).alias("m")).select("doc_id", "m.*")
    top = (docs.select("doc_id", F.explode(ws_tokens(text_col)).alias("tok"))
           .groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
           .groupBy("doc_id").agg(F.max("c").alias("top_c")))
    return (row_local.join(top, on="doc_id", how="left")
            .select("doc_id", "n_tok", "dup_tok_milli", "dup2_milli",
                    "dup3_milli",
                    F.when(F.col("n_tok") > 0,
                           F.floor(F.coalesce("top_c", F.lit(0))
                                   * 1000 / F.col("n_tok")))
                    .otherwise(0).cast("bigint").alias("top_tok_milli")))


# ---------------------------------------------------------------------------
# corpus-statistics scoring (unigram-LM-style quality proxy, integer-safe)


def token_rarity(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc mean token frequency in ppm — the integer-exact analog of
    unigram-LM quality scoring (docs made of corpus-rare tokens score
    low; boilerplate made of corpus-dominant tokens scores high).

    Transcendental ``ln`` is banned from the gate (last-ulp drift across
    engines), so the score is pure integer arithmetic: per token
    ``f_ppm = (count(token)·10⁶) div N`` over the whole corpus, per doc
    ``rarity_ppm = Σ f_ppm div n_tok``.

    Scale: pass 1 builds the corpus frequency table (one map-side-
    combined groupBy on tokens — vocabulary-sized output; a Zipf head
    absorbs into the partial agg); pass 2 joins it back to the exploded
    corpus as a PLAIN equi-join and lets AQE pick the physical strategy
    from the aggregate's RUNTIME size — a curated vocabulary converts to
    a broadcast join dynamically, while a raw 100 TB web vocabulary
    (every typo is a token) shuffle-joins.  Neither a static
    ``F.broadcast`` hint (OOM risk on the unbounded vocab) nor the
    probe-based chooser (its ``limit(N+1).count()`` probe above the
    aggregation would run the full frequency pass eagerly at
    construction time, then again at execution) is appropriate here —
    AQE's dynamic join selection is exactly this case.
    """
    toks = (docs.select("doc_id", F.explode(ws_tokens(text_col))
                        .alias("tok")))
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("n_total"))
    f_ppm = (freq.crossJoin(F.broadcast(total))
             .select("tok", F.expr("(c * 1000000) div n_total")
                     .cast("bigint").alias("f_ppm")))
    per_doc = (toks.join(f_ppm, "tok")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_tok"),
                    F.sum("f_ppm").alias("sum_ppm")))
    return (docs.select("doc_id").join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_tok", F.lit(0)).cast("int")
                    .alias("n_tok"),
                    F.coalesce(F.expr("sum_ppm div n_tok"), F.lit(0))
                    .cast("bigint").alias("rarity_ppm")))


# ---------------------------------------------------------------------------
# stratified sampling

SAMPLE_SALT = "smp1"


def stratum_rate_milli(stratum: Column) -> Column:
    """Deterministic per-stratum keep rate in [100, 1000) milli-units —
    a stand-in for a curated domain-mixing table; because it is a pure
    function of the stratum key the sampler needs NO rates join."""
    return (F.lit(100) + F.pmod(h64(F.concat(F.lit("rate|"), stratum)),
                                F.lit(900))).cast("int")


def stratified_sample(docs: DataFrame,
                      stratum_col: str = "source") -> DataFrame:
    """Deterministic stratified (per-source) sampling: keep a doc iff
    ``h64(salt|doc_id) mod 1000 < rate_milli(stratum)``.

    md5-derived, not ``rand()``: partition-count independent and
    resume-safe (the same doc set survives a checkpoint restart — the
    north_rule's determinism contract).  Stateless filter, no shuffle;
    at 100 TB this composes with any upstream scan untouched.
    """
    stratum = F.col(stratum_col)
    rate = stratum_rate_milli(stratum)
    draw = F.pmod(
        h64(F.concat(F.lit(SAMPLE_SALT + "|"),
                     F.col("doc_id").cast("string"))), F.lit(1000))
    return (docs.select("doc_id", stratum.alias("stratum"),
                        rate.alias("rate_milli"), draw.alias("draw"))
            .where(F.col("draw") < F.col("rate_milli"))
            .select("doc_id", "stratum", "rate_milli",
                    F.col("draw").cast("int").alias("draw")))


# ---------------------------------------------------------------------------
# extended gate verdict

GATE_REP_MILLI = 150
GATE_QUALITY_MIN = 450
GATE_LANG = "en"


def compose_gate_verdict(j: DataFrame) -> DataFrame:
    """The extended-gate verdict over a joined signal row
    ``(doc_id, lang_pred, quality_milli, is_canonical, n_hits,
    top_tok_milli, dup3_milli, pii_total)`` — drop priority
    duplicate > contaminated > language > quality > repetition; PII
    never drops (it reports for downstream redaction).  Pure row-local
    projection; factored out so the priority order is unit-testable
    apart from the corpus-scale composition (`cur_corpus_gate`)."""
    dup = F.col("is_canonical") == 0
    cont = F.col("n_hits") > 0
    bad_lang = F.col("lang_pred") != GATE_LANG
    low_q = F.col("quality_milli") < GATE_QUALITY_MIN
    rep_bad = (F.col("top_tok_milli") > GATE_REP_MILLI) | \
        (F.col("dup3_milli") > GATE_REP_MILLI)
    reason = (F.when(dup, "duplicate").when(cont, "contaminated")
              .when(bad_lang, "language").when(low_q, "quality")
              .when(rep_bad, "repetition").otherwise("kept"))
    return j.select(
        "doc_id", "lang_pred", "quality_milli", "is_canonical",
        "n_hits", "top_tok_milli", "dup3_milli", "pii_total",
        (~(dup | cont | bad_lang | low_q | rep_bad)).cast("int")
        .alias("keep"), reason.alias("drop_reason"))


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk)

PACK_BUDGET = 128


def pack_sequences(docs: DataFrame, budget: int = PACK_BUDGET,
                   stratum_col: str = "source",
                   shuffled: bool = False) -> DataFrame:
    """Concat-and-chunk packing: within each stratum, documents are
    concatenated in ``doc_id`` order and the token stream is cut every
    ``budget`` tokens (the standard LLM pre-training packing).  Each doc
    reports its start offset, owning chunk, and whether it straddles a
    chunk boundary.

    ``shuffled=True`` orders the stream by a deterministic md5 key
    instead of ``doc_id`` — the standard shuffle-then-chunk (adjacent
    corpus docs should not land in the same context window); md5, not
    ``rand()``, so the permutation is partition-count independent and
    resume-safe, like every other draw in the engine.  ``doc_id`` is the
    explicit tie-break: on a (2⁻⁶⁰) hash collision an un-tiebroken sort
    is arbitrary per engine/run, and every offset after the tie would
    diverge — unlike the engine's other collision cases, which err
    identically on both sides.

    One running-sum window per stratum (``rows unbounded preceding``) —
    at corpus scale partition the stream finer ((source, shard)) so each
    window is bounded; the assignment stays deterministic because it
    depends only on the prefix sum within the stratum.
    """
    n_tok = F.size(ws_tokens("text")).cast("bigint")
    order = ([h64(F.concat(F.lit("pack|"),
                           F.col("doc_id").cast("string"))), "doc_id"]
             if shuffled else [F.col("doc_id")])
    w = (Window.partitionBy(stratum_col).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    end = F.sum(n_tok).over(w)
    chunk = F.floor((end - n_tok) / budget).cast("bigint")
    last_chunk = F.when(n_tok > 0, F.floor((end - 1) / budget)) \
        .otherwise(chunk)
    return docs.select(
        "doc_id", F.col(stratum_col).alias("stratum"),
        n_tok.alias("n_tok"), (end - n_tok).alias("start_off"),
        chunk.alias("chunk_id"),
        (last_chunk != chunk).cast("int").alias("straddle"))
