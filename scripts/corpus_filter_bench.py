"""corpus_filter at scale: the end-to-end pretraining-corpus gate
(MinHash-LSH candidates → exact-Jaccard verify → connected-components
canonicalization → fused language/quality metrics → keep/drop verdicts
→ token-mass accounting) over a synthesized corpus with an ENGINEERED
verdict distribution, so the run is simultaneously a throughput bench
and an at-scale correctness check.

Corpus construction (text is a pure function of doc_id, so duplicate
groups are exact by construction):
  - doc_id %10==0 copies doc_id-1's text; doc_id %100==1 copies
    doc_id-2's (which doc_id-1 also copied) → clusters of size 2 and 3,
    the 3-clusters exercising transitive closure;
  - doc_id %20==3 (never a copy source/target) draws its every-3rd
    token from the German stopword list → lang_pred 'de' → 'language';
  - doc_id %20==7 is 5 repeated tokens → quality_milli < 450 →
    'quality';
  - everything else is English-stopword-salted hash words → 'kept'.
Expected counts are computed in closed form and asserted against the
measured drop_reason histogram.

Appends one JSON line to BENCH_CORPUS.jsonl.

Usage: python scripts/corpus_filter_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _cpu_canary  # noqa: E402
from usc_ds_relationextraction_spark.functions.text_analysis import (  # noqa: E402
    STOPWORDS)
from usc_ds_relationextraction_spark.operators import dedup  # noqa: E402
from usc_ds_relationextraction_spark.plans.extended_queries import (  # noqa: E402
    cluster_canonical_docs, corpus_filter_verdicts)
from usc_ds_relationextraction_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_CORPUS.jsonl")


def _sql_arr(words: list[str]) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


def synth(spark, n_docs: int, base: str) -> str:
    path = f"{base}/cdocs_{n_docs}.parquet"
    if not os.path.exists(path):
        ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
        # text is generated from eff (the copy-source id), making
        # duplicate groups byte-identical by construction
        eff = ("CASE WHEN doc_id % 10 = 0 AND doc_id > 0 THEN doc_id - 1 "
               "WHEN doc_id % 100 = 1 AND doc_id > 1 THEN doc_id - 2 "
               "ELSE doc_id END")
        h = ("cast(conv(substring(md5(concat(eff, '_', i)), 1, 15), "
             "16, 10) as bigint)")
        word = f"concat('w', pmod({h}, 1000))"
        en = f"element_at({_sql_arr(STOPWORDS['en'])}, "\
             f"1 + cast(pmod({h}, 10) as int))"
        de = f"element_at({_sql_arr(STOPWORDS['de'])}, "\
             f"1 + cast(pmod({h}, 10) as int))"
        mk = ("array_join(transform(sequence(1, 24), i -> "
              "CASE WHEN i % 3 = 0 THEN {stop} ELSE {word} END), ' ')")
        docs = ids.select(
            "doc_id", F.expr(eff).alias("eff")).select(
            "doc_id",
            F.expr(
                "CASE WHEN eff % 20 = 3 THEN " + mk.format(stop=de,
                                                           word=word)
                # low-quality docs must be (a) unique per doc — identical
                # texts would form one giant duplicate cluster and drop as
                # 'duplicate' — and (b) recognizably English — zero
                # stopword votes would drop as 'language' first.  5 tokens
                # ('the' + 4x one salted word): lang 'en', score 300 < 450
                # the repeated word is 'q<eff>' — unique per doc BY
                # CONSTRUCTION (a 1000-word hash vocabulary collides for
                # ~37% of 1000 draws, silently merging docs into
                # byte-identical duplicate clusters)
                + " WHEN eff % 20 = 7 THEN concat('the', repeat("
                "concat(' q', eff), 4))"
                " ELSE " + mk.format(stop=en, word=word)
                + " END").alias("text"))
        docs.write.mode("overwrite").parquet(path)
    return path


def expected(n: int) -> dict[str, int]:
    dup10 = len(range(10, n, 10))
    dup100 = len(range(101, n, 100))
    lang = sum(1 for i in range(3, n, 20))
    qual = sum(1 for i in range(7, n, 20))
    return {"duplicate": dup10 + dup100, "language": lang,
            "quality": qual, "kept": n - dup10 - dup100 - lang - qual}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    canary_sec, _ = _cpu_canary()
    spark = get_spark(app_name="corpus_filter_bench", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(synth(spark, n_docs, "/tmp/corpus_bench"))

    stages: dict[str, float] = {}

    t0 = time.time()
    n_cand = dedup.lsh_candidate_pairs(docs).count()
    stages["lsh_candidates"] = round(time.time() - t0, 2)

    t0 = time.time()
    n_ver = dedup.verified_near_dups(docs, min_jaccard_milli=200).count()
    stages["verify_jaccard"] = round(time.time() - t0, 2)

    t0 = time.time()
    n_nondup = cluster_canonical_docs(docs).where(
        F.col("is_canonical") == 0).count()
    stages["connected_components"] = round(time.time() - t0, 2)

    # the real job end-to-end (recomputes the chain above from the scan:
    # this wall is THE headline, the stage walls are accounting)
    t0 = time.time()
    hist = {r["drop_reason"]: (r["n"], r["toks"]) for r in
            corpus_filter_verdicts(docs)
            .groupBy("drop_reason")
            .agg(F.count("*").alias("n"),
                 F.sum("ws_tokens").alias("toks")).collect()}
    wall = round(time.time() - t0, 2)

    want = expected(n_docs)
    got = {k: v[0] for k, v in hist.items()}
    assert got == want, f"engineered distribution mismatch: {got} != {want}"
    assert n_nondup == want["duplicate"]

    row = {
        "op": "corpus_filter_end_to_end", "n_docs": n_docs,
        "sec": wall, "docs_per_sec": int(n_docs / wall),
        "stage_sec": stages,
        "lsh_candidate_pairs": n_cand, "verified_pairs": n_ver,
        "verdicts": {k: {"n_docs": v[0], "n_tokens": int(v[1])}
                     for k, v in sorted(hist.items())},
        "distribution_check": "exact-match",
        "cpu_canary_md5_2m_sec": canary_sec,
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
