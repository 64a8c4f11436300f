"""Substring-dedup (shared_span_runs) at scale: LSH-bounded vs all-pairs.

Synthesizes N docs over a 1k-word hash vocabulary where 10% of docs
duplicate a 12-token window of their neighbor's text (real duplicated
spans, the thing the operator exists to find), then times:
  - spans_lsh   : shared_span_runs bounded to MinHash-LSH candidates
                  (the 100 TB shape) over all N docs
  - spans_all   : the unbounded inverted-index tier at a capped doc count
Appends one JSON line to BENCH_SKETCH.jsonl (same file as the other
sketch-family benches).

Usage: python scripts/substring_bench.py [n_docs] [all_pairs_cap]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from usc_ds_relationextraction_spark.operators import dedup  # noqa: E402
from usc_ds_relationextraction_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_SKETCH.jsonl")


def synth(spark, n_docs: int, base: str):
    path = f"{base}/sdocs_{n_docs}.parquet"
    if not os.path.exists(path):
        ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
        tok = ("concat('w', pmod(cast(conv(substring(md5(concat(doc_id, "
               "'_', i)), 1, 15), 16, 10) as bigint), 1000))")
        base_text = (f"array_join(transform(sequence(1, 24), i -> {tok}), "
                     "' ')")
        # every 10th doc replaces tokens 7..18 with the PREVIOUS doc's
        # tokens 7..18 -> a guaranteed 12-token duplicated span
        prev_tok = tok.replace("concat(doc_id,", "concat(doc_id - 1,")
        dup_text = ("array_join(concat("
                    f"transform(sequence(1, 6), i -> {tok}), "
                    f"transform(sequence(7, 18), i -> {prev_tok}), "
                    f"transform(sequence(19, 24), i -> {tok})), ' ')")
        docs = ids.select(
            "doc_id",
            F.expr(f"CASE WHEN doc_id % 10 = 0 AND doc_id > 0 "
                   f"THEN {dup_text} ELSE {base_text} END").alias("text"))
        docs.write.mode("overwrite").parquet(path)
    return path


def timed(label, df, rows, results):
    t0 = time.time()
    got = df.agg(F.count("*").alias("n"),
                 F.max("span_tokens").alias("mx")).collect()[0]
    dt = time.time() - t0
    row = {"op": label, "rows": rows, "sec": round(dt, 2),
           "rows_per_sec": int(rows / dt),
           "spans_found": int(got["n"]), "max_span": int(got["mx"] or 0)}
    results.append(row)
    print(json.dumps(row), flush=True)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark(app_name="substring_bench", master="local[32]",
                      shuffle_partitions=32)
    path = synth(spark, n_docs, "/tmp/substring_bench")
    docs = spark.read.parquet(path)
    docs_cap = docs.where(F.col("doc_id") < cap)

    results: list[dict] = []
    timed("substring_spans_lsh",
          dedup.shared_span_runs(
              docs, min_tokens=5,
              candidates=dedup.lsh_candidate_pairs(docs)),
          n_docs, results)
    timed("substring_spans_allpairs",
          dedup.shared_span_runs(docs_cap, min_tokens=5), cap, results)

    with open(OUT, "a") as f:
        f.write(json.dumps({"ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                            "bench": "substring_spans", "n_docs": n_docs,
                            "allpairs_cap": cap,
                            "results": results}) + "\n")


if __name__ == "__main__":
    main()
