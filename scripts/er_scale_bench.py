"""Scale check for the entity-resolution operator: resolve_entities at
1M synthetic entities (vs the 100-entity driver fixture).

Structure is generated, not loaded: entities come in 8-member "families"
sharing one blocking token (df=8, inside the [2,16] window), and
families chain in groups of four — family f shares bridge token ``b{f}``
with family f+1 for f%4 in {0,1,2} (df=16, still in-window) — so the
true components are 32-member chains with graph diameter ~4 and the
min-label propagation genuinely needs multiple rounds.  Unique
per-entity tokens (df=1) are dropped by min_df.  The expected component
count is exact, so the run verifies correctness at scale, not just wall
time.

Usage: python scripts/er_scale_bench.py [n_entities]
Prints one JSON line; append-logged to BENCH_ER.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from usc_ds_relationextraction_spark.session import get_spark  # noqa: E402
from usc_ds_relationextraction_spark.plans.kg_materialize import (  # noqa: E402
    resolve_entities)

FAMILY = 8
CHAIN = 4  # families per chained component


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    assert n % (FAMILY * CHAIN) == 0, "n must be a multiple of 32"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="er_scale", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    f_idx = (F.col("id") / FAMILY).cast("long")  # family index
    up = F.when(f_idx % CHAIN != CHAIN - 1,
                F.concat(F.lit("b"), f_idx.cast("string")))
    down = F.when(f_idx % CHAIN != 0,
                  F.concat(F.lit("b"), (f_idx - 1).cast("string")))
    alias = F.concat_ws(
        " ",
        F.concat(F.lit("fam"), f_idx.cast("string")),
        up, down,
        F.concat(F.lit("uniq"), F.col("id").cast("string")))
    aliases = spark.range(n).select(
        F.concat(F.lit("E"), F.format_string("%09d", F.col("id")))
         .alias("entity_id"),
        alias.alias("alias"))

    t0 = time.time()
    comps = resolve_entities(aliases)
    n_rows = comps.count()
    n_comps = comps.select("component_id").distinct().count()
    wall = time.time() - t0

    expect = n // (FAMILY * CHAIN)
    out = {"op": "resolve_entities", "n_entities": n,
           "n_components": n_comps, "expected_components": expect,
           "correct": bool(n_comps == expect and n_rows == n),
           "wall_s": round(wall, 1),
           "entities_per_sec": round(n / wall, 1), "cpus": cpus}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_ER.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
