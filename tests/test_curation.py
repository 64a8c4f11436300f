"""Curation-family unit tests (operators/curation.py): crafted inputs
with hand-computed expectations — the oracle gate covers corpus-scale
agreement; these pin the semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usc_ds_relationextraction_spark.operators import curation as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string,"
                                       " source string")


def test_decontaminate_planted_overlap(spark):
    # eval doc 0 shares the 5-gram "a b c d e" with train doc 1 only
    docs = _docs(spark, [
        (0, "x a b c d e y", "s0"),          # eval (0 % 29 == 0)
        (1, "q q a b c d e z", "s0"),        # train, contaminated
        (2, "u v w x y z a1 b1", "s0"),      # train, clean
        (3, "tiny", "s0"),                   # train, no 5-grams
    ])
    train, ev = C.split_eval(docs)
    out = {r["doc_id"]: r for r in C.decontaminate(train, ev).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_hits"] == 1 and out[1]["contaminated"] == 1
    assert out[1]["n_ngrams"] == 4
    assert out[2]["n_hits"] == 0 and out[2]["contaminated"] == 0
    assert out[3]["n_ngrams"] == 0 and out[3]["contaminated"] == 0


def test_pii_metrics_counts_and_redaction(spark):
    docs = _docs(spark, [
        (0, "mail a@b.com and c.d@e.org plus ip 10.0.0.1", "s"),
        (1, "ssn 123-45-6789 phone 555-867-5309", "s"),
        (2, "clean text only", "s"),
        (3, None, "s"),
    ])
    out = {r["doc_id"]: r for r in C.pii_metrics(docs).collect()}
    assert (out[0]["n_email"], out[0]["n_ip"]) == (2, 1)
    assert out[0]["pii_total"] == 3
    # ssn (3-2-4) and phone (3-3-4) do not cross-match
    assert (out[1]["n_ssn"], out[1]["n_phone"]) == (1, 1)
    assert out[1]["n_email"] == 0
    assert out[2]["pii_total"] == 0
    assert out[3]["pii_total"] == 0  # null-text contract
    # redaction changes the hash only where something matched
    import hashlib
    clean_md5 = hashlib.md5(b"clean text only").hexdigest()
    assert out[2]["redacted_md5"] == clean_md5
    red1 = "ssn <SSN> phone <PHONE>"
    assert out[1]["redacted_md5"] == hashlib.md5(red1.encode()).hexdigest()


def test_repetition_metrics(spark):
    docs = _docs(spark, [
        (0, "a a a a", "s"),         # 3 dup tokens of 4; top share 1000
        (1, "a b c d", "s"),         # all unique
        (2, "a b a b a b", "s"),     # bigrams: 5 total, 2 distinct
        (3, "", "s"),
    ])
    out = {r["doc_id"]: r for r in C.repetition_metrics(docs).collect()}
    assert out[0]["dup_tok_milli"] == 750 and out[0]["top_tok_milli"] == 1000
    assert out[1]["dup_tok_milli"] == 0 and out[1]["top_tok_milli"] == 250
    assert out[2]["dup2_milli"] == 600  # (5-2)/5
    assert out[3]["n_tok"] == 0 and out[3]["top_tok_milli"] == 0


def test_token_rarity(spark):
    # corpus: "a" appears 6 of 8 tokens (750000 ppm), "b"/"c" 125000 each
    docs = _docs(spark, [
        (0, "a a a a", "s"),       # all dominant: 750000
        (1, "a a b c", "s"),       # (750000*2 + 125000*2) div 4 = 437500
        (2, "", "s"),
    ])
    out = {r["doc_id"]: r for r in C.token_rarity(docs).collect()}
    assert out[0]["rarity_ppm"] == 750000
    assert out[1]["rarity_ppm"] == 437500
    assert out[2]["rarity_ppm"] == 0 and out[2]["n_tok"] == 0


def test_stratified_sample_deterministic_and_rate_bounded(spark):
    rows = [(i, f"text {i}", f"src{i % 4}") for i in range(400)]
    docs = _docs(spark, rows)
    a = sorted(r["doc_id"] for r in C.stratified_sample(docs).collect())
    b = sorted(r["doc_id"] for r in
               C.stratified_sample(docs.repartition(7)).collect())
    assert a == b  # partition-count independent (md5, not rand)
    out = C.stratified_sample(docs).collect()
    for r in out:
        assert 100 <= r["rate_milli"] < 1000
        assert r["draw"] < r["rate_milli"]


def test_pack_sequences_offsets_and_straddle(spark):
    # one stratum; token counts 100, 50, 30 with budget 128:
    # doc0 [0,100) chunk0; doc1 [100,150) chunk0 straddles into chunk1;
    # doc2 [150,180) chunk1.
    docs = _docs(spark, [
        (0, " ".join(["t"] * 100), "s"),
        (1, " ".join(["t"] * 50), "s"),
        (2, " ".join(["t"] * 30), "s"),
    ])
    out = {r["doc_id"]: r for r in C.pack_sequences(docs).collect()}
    assert (out[0]["start_off"], out[0]["chunk_id"],
            out[0]["straddle"]) == (0, 0, 0)
    assert (out[1]["start_off"], out[1]["chunk_id"],
            out[1]["straddle"]) == (100, 0, 1)
    assert (out[2]["start_off"], out[2]["chunk_id"],
            out[2]["straddle"]) == (150, 1, 0)


def test_pack_sequences_empty_doc(spark):
    docs = _docs(spark, [(0, " ".join(["t"] * 128), "s"), (1, "", "s")])
    out = {r["doc_id"]: r for r in C.pack_sequences(docs).collect()}
    assert (out[1]["n_tok"], out[1]["straddle"]) == (0, 0)
    assert out[1]["chunk_id"] == 1  # starts exactly at the boundary


def test_gate_verdict_priority(spark):
    """Drop priority duplicate > contaminated > language > quality >
    repetition; PII never drops."""
    rows = [
        # doc, lang, q, canon, hits, top, dup3, pii
        (0, "en", 500, 0, 1, 999, 999, 5),   # everything bad -> duplicate
        (1, "en", 100, 1, 1, 999, 0, 0),     # no dup -> contaminated
        (2, "fr", 100, 1, 0, 999, 0, 0),     # -> language
        (3, "en", 100, 1, 0, 999, 0, 0),     # -> quality
        (4, "en", 500, 1, 0, 151, 0, 0),     # -> repetition (top)
        (5, "en", 500, 1, 0, 0, 151, 0),     # -> repetition (dup3)
        (6, "en", 500, 1, 0, 150, 150, 7),   # PII alone never drops
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang_pred string,"
                               " quality_milli bigint, is_canonical int,"
                               " n_hits int, top_tok_milli bigint,"
                               " dup3_milli bigint, pii_total int")
    out = {r["doc_id"]: r for r in C.compose_gate_verdict(df).collect()}
    expect = {0: "duplicate", 1: "contaminated", 2: "language",
              3: "quality", 4: "repetition", 5: "repetition", 6: "kept"}
    for d, reason in expect.items():
        assert out[d]["drop_reason"] == reason, (d, out[d])
        assert out[d]["keep"] == int(reason == "kept")


def test_pack_shuffled_permutes_but_conserves(spark):
    """Shuffled packing: same per-stratum token mass and chunk count as
    ordered packing, different (deterministic) doc order."""
    docs = _docs(spark, [(i, " ".join(["t"] * (10 + i % 7)), "s")
                         for i in range(40)])
    a = C.pack_sequences(docs)
    b = C.pack_sequences(docs, shuffled=True)
    tot = lambda df: df.groupBy().sum("n_tok").collect()[0][0]
    assert tot(a) == tot(b)
    # NOTE: max chunk_id is NOT order-invariant (it depends on which doc
    # the ordering places last), so only token mass is asserted equal
    # the permutation is real: some doc gets a different start offset
    j = (a.select("doc_id", "start_off")
         .join(b.select("doc_id", F.col("start_off").alias("s2")),
               "doc_id"))
    assert j.where("start_off <> s2").count() > 0
    # and deterministic across partitionings
    c = C.pack_sequences(docs.repartition(5), shuffled=True)
    assert b.exceptAll(c).count() == 0 and c.exceptAll(b).count() == 0
