"""IVF-flat ANN recall/cost curve at bench scale (VERDICT r4 item 8).

Grid: n_cells x nprobe over N deterministic 64-d vectors; recall@k is
measured against exact driver-side NumPy brute force (same quantized
int64 dot + (dot desc, id asc) tie rule as the operators).  The sqrt(N)
rule says n_cells ~ 1000 at N=1e6 — the grid brackets it.

Two data shapes:
  default ("uniform"): i.i.d. uniform components — the adversarial
    floor.  Uniform random vectors in 64-d have NO cluster structure,
    so IVF recall is bounded by the candidate fraction times a modest
    directional lift (~8-10x observed); this is the worst case, not a
    defect (real embedding corpora are clustered).
  --clustered: planted-cluster shape (1024 centers, small per-vector
    noise) — the realistic-embedding case IVF is designed for; recall
    at nprobe=4 should approach 1.0 because true neighbors share the
    query's planted cell.

Usage: python scripts/ann_bench.py [n_rows] [--clustered]
Appends one JSON line per run to BENCH_ANN.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K = 10
QN = 10
DIM = 64


def main() -> None:
    _pos = [a for a in sys.argv[1:] if a.isdigit()]
    n_rows = int(_pos[0]) if _pos else 1_000_000
    clustered = "--clustered" in sys.argv
    from pyspark.sql import functions as F

    from usc_ds_relationextraction_spark.operators.similarity import (
        ann_topk_ivf_nprobe, brute_force_topk)
    from usc_ds_relationextraction_spark.session import get_spark

    spark = get_spark(app_name="ann_bench", master="local[32]",
                      shuffle_partitions=32,
                      extra_conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic 64-d vectors in [-1, 1]: one JVM xxhash64 per
    # component (codegen'd — no Python in the generator).  Clustered
    # shape plants 1024 centers and adds +-0.05 noise per component, so
    # a vector's true neighbors overwhelmingly share its planted center.
    shape = "clustered" if clustered else "uniform"
    pq = f"/tmp/ann_bench_{shape}_{n_rows}.parquet"
    comp = ("cast(pmod(xxhash64(concat(cast(id as string), '|', "
            "cast(i as string))), 2001) - 1000 as float) / 1000.0")
    center = ("cast(pmod(xxhash64(concat(cast(pmod(xxhash64(cast(id as "
              "string)), 1024) as string), '#', cast(i as string))), "
              "2001) - 1000 as float) / 1000.0")
    noise = ("(cast(pmod(xxhash64(concat(cast(id as string), '~', "
             "cast(i as string))), 101) - 50 as float) / 1000.0)")
    gen = f"({center} + {noise})" if clustered else comp
    if not os.path.exists(os.path.join(pq, "_SUCCESS")):
        spark.range(n_rows).select(
            F.col("id").alias("vec_id"),
            F.expr(f"transform(sequence(0, {DIM - 1}), "
                   f"i -> cast({gen} as float))").alias("embedding")) \
            .write.mode("overwrite").parquet(pq)
    emb = spark.read.parquet(pq)

    # exact ground truth on the driver: quantized int64 dot, ties to
    # the smaller id — bitwise the operators' rule
    import pyarrow.dataset as ds
    tbl = ds.dataset(pq).to_table()
    ids = tbl["vec_id"].to_numpy()
    flat = np.asarray(tbl["embedding"].combine_chunks().flatten(),
                      dtype=np.float64)
    M = np.floor(flat * 1000 + 0.5).astype(np.int64).reshape(-1, DIM)
    order_ids = np.argsort(ids)
    ids, M = ids[order_ids], M[order_ids]
    exact: dict[int, set[int]] = {}
    for qi in range(QN):
        neg = -(M @ M[qi])
        neg[qi] = np.iinfo(np.int64).max  # exclude self (negate-safe)
        top = np.lexsort((ids, neg))[:K]
        exact[qi] = set(int(ids[j]) for j in top)

    def recall(df) -> float:
        got: dict[int, set[int]] = {}
        for r in df.collect():
            got.setdefault(r.query_id, set()).add(r.nn_id)
        hit = sum(len(got.get(q, set()) & nn) for q, nn in exact.items())
        return hit / (QN * K)

    def loadavg() -> float:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])

    results = []
    load0 = loadavg()

    # the cost baseline every IVF point is traded against
    t0 = time.time()
    r_bf = recall(brute_force_topk(emb, n_queries=QN, k=K))
    bf_sec = time.time() - t0
    results.append({"op": "brute_force", "cells": 0, "nprobe": 0,
                    "recall_at_10": round(r_bf, 4),
                    "sec": round(bf_sec, 2)})
    print(results[-1], flush=True)

    for cells in (64, 256, 1024):
        for nprobe in (1, 2, 4):
            t0 = time.time()
            df = ann_topk_ivf_nprobe(emb, DIM, n_queries=QN, k=K,
                                     nprobe=nprobe, n_cells=cells, iters=2)
            r = recall(df)
            sec = time.time() - t0
            results.append({"op": "ivf", "cells": cells, "nprobe": nprobe,
                            "recall_at_10": round(r, 4),
                            "sec": round(sec, 2),
                            "cand_frac": round(nprobe / cells, 4)})
            print(results[-1], flush=True)

    row = {"ts": datetime.now().isoformat(timespec="seconds"),
           "bench": "ann_ivf_recall", "shape": shape,
           "n_rows": n_rows, "dim": DIM, "k": K, "n_queries": QN,
           "loadavg_before": load0, "loadavg_after": loadavg(),
           "results": results}
    with open(os.path.join(REPO, "BENCH_ANN.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
