"""Skew-mitigation evidence (north_rule: "explicit skew mitigation — key
salting for hub entities, AQE skew-join splitting").

Scenario: the DS alias join at 100 TB scale when the alias dictionary is
too large to broadcast (1e8+ aliases) — a SHUFFLE join on the mention
surface, where hub surfaces (entity 0 draws ~20% of all mentions via the
u^3 skew in the generator) overload single reduce tasks.

Three physical strategies over the SAME join, broadcast disabled:
  plain_noaqe : shuffle hash join, AQE off      (the naive baseline)
  plain_aqe   : shuffle join + AQE skew-join splitting
  salted_noaqe: operators.skew.salted_join — manual salting, AQE off
                (what we ship for engines/versions where AQE cannot see
                 the skew, e.g. when the skew is post-join in a groupBy)

Usage: python scripts/skew_bench.py [n_convs] — appends to
BENCH_SKEW.jsonl and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from usc_ds_relationextraction_spark.functions.hashing import h64  # noqa: E402
from usc_ds_relationextraction_spark.operators.skew import salted_join  # noqa: E402
from usc_ds_relationextraction_spark.session import get_spark  # noqa: E402
from usc_ds_relationextraction_spark.sources import synthetic as syn  # noqa: E402
from usc_ds_relationextraction_spark.functions.tokenize import (  # noqa: E402
    pos_tags_col, tokens_col)
from usc_ds_relationextraction_spark.operators.mentions import \
    np_chunks_col  # noqa: E402

_pos = [a for a in sys.argv[1:] if a.isdigit()]
N_CONVS = int(_pos[0]) if _pos and "--run" not in sys.argv else int(
    os.environ.get("SKEW_NCONVS", "60000"))
CORPUS = f"/tmp/scaling_corpus_{N_CONVS}"
DIM_COPIES = 4000  # inflate the 190-row alias dim past broadcast size


def build(spark):
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        syn.transcripts(spark, N_CONVS).repartition(256, "conv_id") \
            .write.mode("overwrite").parquet(CORPUS)
    cand = (spark.read.parquet(CORPUS)
            .withColumn("toks", tokens_col("text"))
            .withColumn("pos", pos_tags_col("toks"))
            .withColumn("chunk", F.explode(np_chunks_col("toks", "pos")))
            .select("conv_id", "turn_idx",
                    F.col("chunk.surface").alias("surface")))
    cand.write.mode("overwrite").parquet("/tmp/skew_candidates")

    # inflated alias dimension: DIM_COPIES hash-variants per alias; variant
    # 0 keeps the real surface so the join still hits
    al = syn.kb_aliases(spark)
    big_dim = al.crossJoin(spark.range(DIM_COPIES).withColumnRenamed("id", "v")) \
        .select(
            F.when(F.col("v") == 0, F.col("alias"))
            .otherwise(F.concat_ws("#", "alias", F.col("v").cast("string")))
            .alias("surface"),
            "entity_id", "entity_type")
    big_dim.write.mode("overwrite").parquet("/tmp/skew_dim")


def run_strategy(cores: int, strategy: str) -> dict:
    spark = get_spark(
        app_name=f"skew-{strategy}", master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled":
                "true" if strategy == "plain_aqe" else "false",
            "spark.sql.adaptive.skewJoin.enabled":
                "true" if strategy == "plain_aqe" else "false",
        })
    spark.sparkContext.setLogLevel("ERROR")
    cand = spark.read.parquet("/tmp/skew_candidates")
    dim = spark.read.parquet("/tmp/skew_dim")

    def job():
        if strategy == "salted_noaqe":
            j = salted_join(
                cand, dim, on=["surface"], n_salts=16,
                big_unique=F.concat_ws("_", "conv_id", "turn_idx", "surface"),
                broadcast_small=False)
        else:
            j = cand.join(dim, on="surface")
        return j.groupBy("entity_id").agg(F.count("*").alias("n"))

    job().write.mode("overwrite").format("noop").save()  # warm-up
    t0 = time.time()
    job().write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    n = job().count()

    # the skew mechanism itself: rows landing on the heaviest reduce key
    # (this is what exceeds executor memory at the 100 TB regime, long
    # before sandbox-scale wall clocks diverge)
    if strategy == "salted_noaqe":
        from usc_ds_relationextraction_spark.operators.skew import with_salt
        keyed = with_salt(
            cand, F.concat_ws("_", "conv_id", "turn_idx", "surface"), 16) \
            .groupBy("surface", "__salt").count()
    else:
        keyed = cand.groupBy("surface").count()
    stats = keyed.agg(F.max("count").alias("mx"),
                      F.expr("percentile_approx(count, 0.5)").alias("med")) \
        .collect()[0]
    spark.stop()
    return {"strategy": strategy, "wall_s": round(wall, 2), "groups": n,
            "max_reduce_key_rows": int(stats["mx"]),
            "median_reduce_key_rows": int(stats["med"])}


def main() -> None:
    prep = get_spark(app_name="skew-prep", master="local[32]",
                     shuffle_partitions=64)
    prep.sparkContext.setLogLevel("ERROR")
    build(prep)
    n_cand = prep.read.parquet("/tmp/skew_candidates").count()
    n_dim = prep.read.parquet("/tmp/skew_dim").count()
    prep.stop()

    import subprocess
    results = []
    env = dict(os.environ, SKEW_NCONVS=str(N_CONVS))
    for strat in ("plain_noaqe", "plain_aqe", "salted_noaqe"):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", strat],
            capture_output=True, text=True, check=True, env=env)
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))

    rec = {"n_convs": N_CONVS, "n_candidates": n_cand, "n_dim_rows": n_dim,
           "cores": 16, "results": results}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_SKEW.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    if "--run" in sys.argv:
        print(json.dumps(run_strategy(16, sys.argv[sys.argv.index("--run") + 1])))
    else:
        main()
