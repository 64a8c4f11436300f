"""Fused Arrow span scan vs HOF/BNLJ form at realistic dictionary scale.

The P3 hit table's original form joins turns to the alias dimension on
``arrays_overlap`` — a BroadcastNestedLoopJoin evaluating O(T·A)
interpreted checks — then runs an interpreted filter(sequence)/slice
window scan per surviving pair.  The fused form (operators/spans.py)
scans each turn once against a broadcast first-token alias index inside
one pandas UDF: O(T·n) hash probes, no join.

This bench synthesizes T turns (the real synthetic transcript corpus)
and an A-entry alias dictionary (the 300-ish real fixture aliases plus
hash-generated two-token aliases over the same surface vocabulary, so a
realistic fraction of probes partially match), then times both forms.
The HOF form runs at a capped turn count — at full T it is the known
pathology.  Appends one JSON line to BENCH_SPANS.jsonl.

Usage: python scripts/span_bench.py [n_convs] [n_aliases] [hof_cap_turns]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from usc_ds_relationextraction_spark.functions.tokenize import (  # noqa: E402
    tokens_col)
from usc_ds_relationextraction_spark.operators.spans import (  # noqa: E402
    align_spans, align_spans_sharded)
from usc_ds_relationextraction_spark.session import get_spark  # noqa: E402
from usc_ds_relationextraction_spark.sources import synthetic as syn  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_SPANS.jsonl")


def alias_dim(spark, n_aliases: int):
    """Real fixture aliases + generated two-token combinations over the
    same first-name/surname surface vocabulary (so first-token probes
    fire but full matches stay rare — the realistic KB-dictionary mix)."""
    real = syn.kb_aliases(spark).select("alias")
    toks = real.select(F.explode(tokens_col("alias")).alias("t")) \
        .distinct() \
        .select("t", (F.row_number().over(Window.orderBy("t")) - 1)
                .alias("i"))
    nt = toks.count()
    # real first token (so the fused scan's first-token probe fires on
    # every occurrence) + unique hashed second token (so the full match
    # fails) — the worst realistic probe load for the fused form, and
    # one more broadcast row apiece for the BNLJ form
    gen = spark.range(max(0, n_aliases)) \
        .select((F.col("id") % nt).alias("i1"),
                F.concat(F.lit("zq"), F.substring(F.md5(
                    F.col("id").cast("string")), 1, 10)).alias("t2"))
    a = toks.select(F.col("i").alias("i1"), F.col("t").alias("t1"))
    gen2 = gen.join(F.broadcast(a), "i1") \
        .select(F.concat_ws(" ", "t1", "t2").alias("alias"))
    return real.unionByName(gen2).distinct()


def hof_hits(tt, al_df):
    al = al_df.withColumn("atoks", tokens_col("alias"))
    j = tt.join(F.broadcast(al), F.arrays_overlap("toks", "atoks"))
    k, n = F.size("atoks"), F.size("toks")
    hits = F.when(
        n >= k,
        F.filter(F.sequence(F.lit(1), n - k + 1),
                 lambda i: F.slice("toks", i, k) == F.col("atoks")),
    ).otherwise(F.array().cast("array<int>"))
    out = j.select("conv_id", "turn_idx", "alias", hits.alias("hits"))
    return out.where(F.size("hits") > 0)


def timed(label, df, rows, results):
    t0 = time.time()
    n_out = df.agg(F.count("*").alias("n"),
                   F.sum(F.size("hits")).alias("h")).collect()[0]
    dt = time.time() - t0
    row = {"op": label, "turns": rows, "sec": round(dt, 2),
           "turns_per_sec": int(rows / dt),
           "match_rows": int(n_out["n"]), "hits": int(n_out["h"] or 0)}
    results.append(row)
    print(json.dumps(row), flush=True)


def giant_alias_dim(spark, n_aliases: int, n_matching: int = 3_000):
    """A non-broadcastable KB-shaped dictionary: the overwhelming mass of
    a real 1e8-entity alias list never appears in any given corpus shard
    (unique-ish entity-name first tokens), so the bulk here gets hashed
    first tokens the corpus cannot contain; a bounded ``n_matching``
    subset reuses real corpus first tokens (probe fires, full match
    fails) and the ~300 real fixture aliases actually match.  This is
    the fan-out contract of the sharded scan made explicit: candidate
    volume = Σ_t occ(t)·dict(t), so dictionary mass on corpus-hub tokens
    is the adversarial case — real KBs concentrate mass on entity
    surface forms instead."""
    real = syn.kb_aliases(spark).select("alias")
    toks = real.select(F.explode(tokens_col("alias")).alias("t")) \
        .distinct() \
        .select("t", (F.row_number().over(Window.orderBy("t")) - 1)
                .alias("i"))
    nt = toks.count()
    a = toks.select(F.col("i").alias("i1"), F.col("t").alias("t1"))
    match_gen = spark.range(max(0, n_matching)) \
        .select((F.col("id") % nt).alias("i1"),
                F.concat(F.lit("zq"), F.substring(F.md5(
                    F.col("id").cast("string")), 1, 10)).alias("t2")) \
        .join(F.broadcast(a), "i1") \
        .select(F.concat_ws(" ", "t1", "t2").alias("alias"))
    bulk = spark.range(max(0, n_aliases - n_matching)).select(
        F.concat(F.lit("zk"),
                 F.substring(F.md5(F.col("id").cast("string")), 1, 10),
                 F.lit(" zq"),
                 F.substring(F.md5(F.concat(F.col("id").cast("string"),
                                            F.lit("b"))), 1, 10))
        .alias("alias"))
    return real.unionByName(match_gen).unionByName(bulk)


def main_giant():
    """`python scripts/span_bench.py giant [n_convs] [n_aliases]` —
    the dictionary-too-big-to-broadcast regime (default 5M aliases >
    skew.BROADCAST_ROW_LIMIT): only align_spans_sharded can run it; the
    adaptive align_spans() chooser is asserted to route here."""
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
    n_aliases = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000_000
    spark = get_spark(app_name="span_bench_giant", master="local[32]",
                      shuffle_partitions=64)
    base = f"/tmp/span_bench/turns_{n_convs}.parquet"
    if not os.path.exists(base):
        syn.transcripts(spark, n_convs) \
            .select("conv_id", "turn_idx", "text") \
            .write.mode("overwrite").parquet(base)
    turns = spark.read.parquet(base)
    n_turns = turns.count()
    tt = turns.select("conv_id", "turn_idx", tokens_col("text").alias("toks"))
    dim_path = f"/tmp/span_bench/giant_dim_{n_aliases}.parquet"
    if not os.path.exists(dim_path):
        giant_alias_dim(spark, n_aliases).write.mode(
            "overwrite").parquet(dim_path)
    al = spark.read.parquet(dim_path)
    n_al = al.count()
    print(f"turns={n_turns} aliases={n_al} (giant regime)", flush=True)

    from usc_ds_relationextraction_spark.operators import skew, spans
    assert n_al > skew.BROADCAST_ROW_LIMIT, "not the giant regime"
    # the adaptive chooser must route a >limit dim to the sharded form
    spans._SPAN_PROBE_CACHE.clear()
    chosen = spans.align_spans(tt.limit(50), al)
    probed = next(iter(spans._SPAN_PROBE_CACHE.values()))
    assert probed > skew.BROADCAST_ROW_LIMIT, "chooser probe missed"
    chosen.agg(F.count("*")).collect()   # warm workers via sharded path

    results: list[dict] = []
    timed("span_sharded_giant", align_spans_sharded(tt, al),
          n_turns, results)
    with open(OUT, "a") as f:
        f.write(json.dumps({
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "mode": "giant", "n_turns": n_turns, "n_aliases": n_al,
            "results": results}) + "\n")


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_aliases = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    hof_cap = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000
    spark = get_spark(app_name="span_bench", master="local[32]",
                      shuffle_partitions=32)

    base = f"/tmp/span_bench/turns_{n_convs}.parquet"
    if not os.path.exists(base):
        syn.transcripts(spark, n_convs) \
            .select("conv_id", "turn_idx", "text") \
            .write.mode("overwrite").parquet(base)
    turns = spark.read.parquet(base)
    n_turns = turns.count()
    tt = turns.select("conv_id", "turn_idx", tokens_col("text").alias("toks"))
    al = alias_dim(spark, n_aliases).cache()
    n_al = al.count()
    print(f"turns={n_turns} aliases={n_al}", flush=True)

    results: list[dict] = []
    # warm python workers / broadcast once
    align_spans(tt.limit(200), al).agg(F.count("*")).collect()

    # deterministic cap subset (orderBy before limit) so appended
    # BENCH_SPANS.jsonl rows are comparable run-to-run
    tt_cap = tt.join(
        turns.select("conv_id").distinct()
        .orderBy("conv_id").limit(hof_cap // 18 + 1),
        "conv_id")
    n_cap = tt_cap.count()
    timed("span_fused_arrow", align_spans(tt, al), n_turns, results)
    timed("span_sharded_join", align_spans_sharded(tt, al), n_turns, results)
    timed("span_hof_bnlj", hof_hits(tt_cap, al), n_cap, results)

    with open(OUT, "a") as f:
        f.write(json.dumps({
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "n_turns": n_turns, "n_aliases": n_al,
            "hof_cap_turns": n_cap, "results": results}) + "\n")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "giant":
        main_giant()
    else:
        main()
