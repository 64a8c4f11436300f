"""Two-parallelism scaling evidence (BASELINE.json north_rule).

No real cluster exists in the sandbox, so N vs 4N executors is evidenced
as local[8] vs local[32] over the SAME input (the driver's sanctioned
stand-in): run the end-to-end triple-extraction pipeline at both levels,
report throughput at each plus scaling efficiency
    eff = (throughput_32 / throughput_8) / 4.

Usage: python scripts/scaling_bench.py [n_convs] [repeats]
Appends a JSON line to BENCH_SCALING.jsonl and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from usc_ds_relationextraction_spark.session import get_spark  # noqa: E402
from usc_ds_relationextraction_spark.sources import synthetic as syn  # noqa: E402

_pos = [a for a in sys.argv[1:] if a.isdigit()]
N_CONVS = int(os.environ.get("SCALING_NCONVS") or
              (_pos[0] if _pos and "--level" not in sys.argv else 20000))
REPEATS = int(os.environ.get("SCALING_REPEATS") or
              (_pos[1] if len(_pos) > 1 and "--level" not in sys.argv else 3))
CORPUS = f"/tmp/scaling_corpus_{N_CONVS}"


def prepare() -> int:
    """Materialize the shared corpus once (outside all timers)."""
    spark = get_spark(app_name="prep", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        syn.transcripts(spark, N_CONVS).repartition(256, "conv_id") \
            .write.mode("overwrite").parquet(CORPUS)
    n = spark.read.parquet(CORPUS).count()
    spark.stop()
    return n


def run_level(cores: int) -> float:
    """Best-of-REPEATS wall for the full triple pipeline at `cores`."""
    spark = get_spark(app_name=f"scale{cores}", master=f"local[{cores}]",
                      shuffle_partitions=2 * cores)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F
    from usc_ds_relationextraction_spark.functions.tokenize import (
        pos_tags_col, tokens_col)
    from usc_ds_relationextraction_spark.operators.mentions import np_chunks_col

    def pipeline():
        t = spark.read.parquet(CORPUS)
        tt = t.withColumn("toks", tokens_col("text")) \
            .withColumn("pos", pos_tags_col("toks"))
        cand = tt.withColumn(
            "chunk", F.explode(np_chunks_col("toks", "pos"))) \
            .select("conv_id", "turn_idx", "toks",
                    F.col("chunk.start").alias("start"),
                    F.col("chunk.end").alias("end"),
                    F.col("chunk.surface").alias("surface"))
        cand = cand.withColumn(
            "sent_id",
            F.size(F.filter(F.slice("toks", 1, F.col("start")),
                            lambda x: x.isin(".", "?", "!"))).cast("int")) \
            .drop("toks")
        al = syn.kb_aliases(spark).select(
            F.col("alias").alias("surface"), "entity_id")
        ems = cand.join(F.broadcast(al), on="surface").select(
            "conv_id", "turn_idx", "sent_id", "start", "end", "surface",
            "entity_id").distinct()
        a = ems.select("conv_id", "turn_idx", "sent_id",
                       F.col("start").alias("s1"),
                       F.col("surface").alias("em1_text"),
                       F.col("entity_id").alias("em1_entity"))
        b = ems.select("conv_id", "turn_idx", "sent_id",
                       F.col("start").alias("s2"),
                       F.col("surface").alias("em2_text"),
                       F.col("entity_id").alias("em2_entity"))
        p = a.join(b, on=["conv_id", "turn_idx", "sent_id"]) \
            .where(F.col("s1") < F.col("s2"))
        facts = syn.kb_facts(spark)
        both = facts.select(F.col("subj_id").alias("em1_entity"),
                            F.col("obj_id").alias("em2_entity"), "relation",
                            F.lit("fwd").alias("direction")) \
            .unionByName(facts.select(
                F.col("obj_id").alias("em1_entity"),
                F.col("subj_id").alias("em2_entity"), "relation",
                F.lit("rev").alias("direction")))
        tri = p.join(F.broadcast(both), on=["em1_entity", "em2_entity"]) \
            .select(
                F.when(F.col("direction") == "fwd", F.col("em1_text"))
                 .otherwise(F.col("em2_text")).alias("subj"),
                F.col("relation").alias("pred"),
                F.when(F.col("direction") == "fwd", F.col("em2_text"))
                 .otherwise(F.col("em1_text")).alias("obj"),
                "conv_id", "turn_idx").distinct()
        return tri

    # warm-up (JIT, code cache) then timed repeats
    pipeline().write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        pipeline().write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    spark.stop()
    return best


def _subprocess_level(cores: int) -> float:
    """Each level runs in a FRESH python process: PySpark local mode keeps
    one JVM per process, so in-process back-to-back sessions inherit heap/
    JIT state from the previous level and skew the comparison."""
    import subprocess
    env = dict(os.environ, SCALING_NCONVS=str(N_CONVS),
               SCALING_REPEATS=str(REPEATS))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--level", str(cores)],
        capture_output=True, text=True, check=True, env=env)
    return float(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if "--level" in sys.argv:
        print(run_level(int(sys.argv[sys.argv.index("--level") + 1])))
        return
    n_turns = prepare()
    t8 = _subprocess_level(8)
    t32 = _subprocess_level(32)
    thr8 = n_turns / t8
    thr32 = n_turns / t32
    eff = (thr32 / thr8) / 4.0
    out = {
        "n_convs": N_CONVS, "n_turns": n_turns,
        "wall_8c_sec": round(t8, 2), "wall_32c_sec": round(t32, 2),
        "turns_per_sec_8c": round(thr8, 1),
        "turns_per_sec_32c": round(thr32, 1),
        "speedup_8_to_32": round(thr32 / thr8, 3),
        "scaling_efficiency_Nto4N": round(eff, 3),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_SCALING.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
