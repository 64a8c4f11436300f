"""Curation-family scale bench (operators/curation.py) at ≥200k docs.

Synthesizes deterministic ~60-token documents to parquet under /tmp and
times each curation operator end-to-end (forced full-column evaluation
via a hash probe — a bare count() prunes the projected metrics).  The
"naive" twin of the repetition metrics (unbound string-shingle HOFs —
the CollapseProject re-evaluation pathology, see functions/hof.py) runs
at a capped size for the per-row comparison.

Appends one JSON line per run to BENCH_CURATION.jsonl with before/after
1-min loadavg so rows are comparable across ambient host load.

Usage: python scripts/curation_bench.py [n_docs] [naive_cap]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from usc_ds_relationextraction_spark.functions.text_analysis import (  # noqa: E402
    ws_tokens)
from usc_ds_relationextraction_spark.operators import curation as C  # noqa: E402
from usc_ds_relationextraction_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_CURATION.jsonl")


def synth(spark, n: int):
    path = f"/tmp/curation_bench/docs_{n}.parquet"
    # _SUCCESS guard: a run killed mid-write leaves the dir existing but
    # partial — bare exists() would silently bench a truncated corpus
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tok = ("concat('w', pmod(cast(conv(substring(md5(concat(doc_id, "
               "'_', i)), 1, 15), 16, 10) as bigint), 500))")
        (spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.expr(f"array_join(transform(sequence(1, 60), i -> {tok}),"
                   " ' ')").alias("text"),
            F.concat(F.lit("src"), F.pmod(F.col("id"), F.lit(8))
                     .cast("string")).alias("source"))
         .write.mode("overwrite").parquet(path))
    return path


def loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def timed(label: str, df, rows: int, results: list):
    """min-of-2 steady walls + cold wall, full-column hash probe."""
    walls = []
    for _ in range(3):
        t0 = time.time()
        df.agg(F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1 << 40)))
               ).collect()
        walls.append(time.time() - t0)
    cold, steady = walls[0], min(walls[1:])
    row = {"op": label, "rows": rows, "sec": round(steady, 2),
           "rows_per_sec": int(rows / steady),
           "cold_sec": round(cold, 2)}
    results.append(row)
    print(json.dumps(row), flush=True)


def _unbound_shingles(toks, n):
    """The PRE-FIX shingle builder, preserved verbatim so the naive twin
    keeps measuring the real pathology: the slice lambda references the
    unbound ``toks`` expression, so CollapseProject inlines the full
    split() per shingle — O(tokens²) per row.  The library version
    (`dedup.shingles`) now let-binds its input and no longer exhibits
    this."""
    k = F.size(toks) - (n - 1)
    return F.when(
        k > 0,
        F.transform(F.sequence(F.lit(1), k),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    ).otherwise(F.array().cast("array<string>"))


def repetition_naive(docs):
    """The pre-fix formulation: unbound string-shingle HOFs (each
    reference re-evaluates the full split+transform subtree)."""
    toks = ws_tokens("text")

    def dup(arr):
        n = F.size(arr)
        return F.when(n > 0, F.floor(
            (n - F.size(F.array_distinct(arr))) * 1000 / n)) \
            .otherwise(F.lit(0)).cast("bigint")

    row_local = docs.select(
        "doc_id", F.size(toks).cast("int").alias("n_tok"),
        dup(toks).alias("dup_tok_milli"),
        dup(_unbound_shingles(toks, 2)).alias("dup2_milli"),
        dup(_unbound_shingles(toks, 3)).alias("dup3_milli"))
    top = (docs.select("doc_id", F.explode(toks).alias("tok"))
           .groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
           .groupBy("doc_id").agg(F.max("c").alias("top_c")))
    return (row_local.join(top, on="doc_id", how="left")
            .select("doc_id", "n_tok", "dup_tok_milli", "dup2_milli",
                    "dup3_milli",
                    F.when(F.col("n_tok") > 0,
                           F.floor(F.coalesce("top_c", F.lit(0))
                                   * 1000 / F.col("n_tok")))
                    .otherwise(0).cast("bigint").alias("top_tok_milli")))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    load_before = loadavg1()
    spark = get_spark(app_name="curation_bench", master="local[32]",
                      shuffle_partitions=32)
    docs = spark.read.parquet(synth(spark, n))
    docs_cap = docs.where(F.col("doc_id") < cap)

    results: list[dict] = []
    tr, ev = C.split_eval(docs)
    timed("repetition", C.repetition_metrics(docs), n, results)
    timed("repetition_naive", repetition_naive(docs_cap), cap, results)
    timed("decontam", C.decontaminate(tr, ev), n, results)
    timed("pii_scrub", C.pii_metrics(docs), n, results)
    timed("sample_stratified", C.stratified_sample(docs), n, results)
    timed("pack_sequences", C.pack_sequences(docs), n, results)

    with open(OUT, "a") as f:
        f.write(json.dumps({
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "n_docs": n,
            "naive_cap": cap, "loadavg_before": load_before,
            "loadavg_after": loadavg1(), "results": results}) + "\n")


if __name__ == "__main__":
    main()
