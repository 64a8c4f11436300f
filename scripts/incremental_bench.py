"""Incremental KG maintenance vs from-scratch recompute.

north_rule's regime (10^12 turns) forbids recomputing the canonical edge
table per micro-batch; `incremental_agg_sink` folds each batch's delta
into the running table instead.  This bench quantifies the asymmetry the
design claims at sandbox scale: with the corpus arriving in B batches,

  recompute   reads corpus-so-far every batch       → O(B * corpus) scan
  incremental reads each batch once + the AGGREGATE → O(corpus + B * |table|)

and |edge table| << |corpus| (every turn contributes rows, few distinct
edges).  The parquet mode's full-rewrite-per-version is the honest
sandbox cost; Iceberg MERGE at scale drops the B*|table| term to
B*|delta-touched files|.

Usage: python scripts/incremental_bench.py [n_convs] [n_batches]
Appends one JSON line to BENCH_INCREMENTAL.jsonl and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from usc_ds_relationextraction_spark.session import get_spark  # noqa: E402
from usc_ds_relationextraction_spark.sources import synthetic as syn  # noqa: E402
from usc_ds_relationextraction_spark.sources.catalog import (  # noqa: E402
    incremental_agg_sink, read_current_version)
from usc_ds_relationextraction_spark.streaming.ingest import (  # noqa: E402
    turn_local_triples_join)

N_CONVS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
ROOT = f"/tmp/incr_bench_{N_CONVS}_{N_BATCHES}"


def main() -> None:
    spark = get_spark(app_name="incr_bench", master="local[16]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # one corpus, hash-partitioned into B disjoint arrival batches
    full_corpus = syn.transcripts(spark, N_CONVS)
    batches = []
    for b in range(N_BATCHES):
        d = os.path.join(ROOT, f"batch{b}")
        if not os.path.exists(os.path.join(d, "_SUCCESS")):
            full_corpus.where(
                F.abs(F.xxhash64("conv_id")) % N_BATCHES == b) \
                .write.mode("overwrite").parquet(d)
        batches.append(d)
    aliases, facts = syn.kb_aliases(spark), syn.kb_facts(spark)

    def evidence(df):
        return turn_local_triples_join(df, aliases, facts) \
            .select("subj", "pred", "obj", F.lit(1).alias("n_support"))

    # -------- path A: recompute the edge table from scratch per batch
    t0 = time.time()
    for b in range(N_BATCHES):
        full = spark.read.parquet(*batches[: b + 1])
        out = evidence(full).groupBy("subj", "pred", "obj") \
            .agg(F.sum("n_support").alias("n_support"))
        out.write.mode("overwrite").parquet(os.path.join(ROOT, "recompute"))
    t_recompute = time.time() - t0

    # -------- path B: incremental additive merge per batch
    target = os.path.join(ROOT, "incremental")
    shutil.rmtree(target, ignore_errors=True)
    sink = incremental_agg_sink(spark, target,
                                ["subj", "pred", "obj"], ["n_support"])
    t0 = time.time()
    for b in range(N_BATCHES):
        sink(evidence(spark.read.parquet(batches[b])), b)
    t_incr = time.time() - t0

    # equivalence: the two paths must agree exactly
    a = spark.read.parquet(os.path.join(ROOT, "recompute"))
    bdf = read_current_version(spark, target)
    sym = a.unionByName(bdf).groupBy("subj", "pred", "obj", "n_support") \
        .count().where("count <> 2").count()
    n_edges = bdf.count()
    n_turns = spark.read.parquet(*batches).count()
    out = {
        "mode": "incremental_vs_recompute",
        "n_convs": N_CONVS, "n_turns": n_turns, "n_batches": N_BATCHES,
        "n_edges": n_edges,
        "wall_recompute_sec": round(t_recompute, 2),
        "wall_incremental_sec": round(t_incr, 2),
        "speedup": round(t_recompute / t_incr, 2),
        "tables_equal": sym == 0,
    }
    assert sym == 0, "incremental table diverged from recompute"
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_INCREMENTAL.jsonl"),
            "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
