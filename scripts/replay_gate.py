"""spark-submit job: real-corpus replay gate (see plans/replay.py).

Usage (via scripts/replay.sh, which packages + spark-submits):
  scripts/replay.sh <dir>            # expects <dir>/train_new.json
                                     #     and <dir>/test_new.json
  scripts/replay.sh <dir> --epochs 100 --warehouse /tmp/replay_wh \
                          --dep-features

Prints one JSON line REPLAY_GATE_RESULT {...} with tuned-threshold
P/R/F1 (the BASELINE.json P/R >= 0.95 parity numbers for the dropped-in
corpus), corrupt-line count, triple count, and completed stages.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus_dir",
                    help="directory with train_new.json + test_new.json "
                         "(reference nlp_parse.py output format)")
    ap.add_argument("--warehouse", default=None)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--lr", type=float, default=0.25)
    ap.add_argument("--train-file", default="train_new.json")
    ap.add_argument("--test-file", default="test_new.json")
    ap.add_argument("--brown-file", default=None,
                    help="optional word<TAB>cluster file (reference "
                         "brown format)")
    ap.add_argument("--dep-features", action="store_true",
                    help="emit DEP_ features from the corpus's real "
                         "parser arcs ('dep' field) alongside the "
                         "token families")
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder
             .appName("kg-replay-gate")
             .config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from usc_ds_relationextraction_spark.plans.replay import replay_gate

    brown: dict[str, str] = {}
    if args.brown_file:
        with open(args.brown_file) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) >= 2:
                    brown[parts[0]] = parts[1]

    wh = args.warehouse or os.path.join(args.corpus_dir, "_replay_wh")
    t0 = time.time()
    res = replay_gate(
        spark, wh,
        os.path.join(args.corpus_dir, args.train_file),
        os.path.join(args.corpus_dir, args.test_file),
        brown=brown, epochs=args.epochs, lr=args.lr,
        dep_features=args.dep_features)
    m = res["metrics"]
    out = {
        "corpus_dir": args.corpus_dir, "warehouse": wh,
        "theta": res["best"]["theta"],
        "precision": round(m["precision"], 4),
        "recall": round(m["recall"], 4),
        "f1": round(m["f1"], 4),
        "n_corrupt_lines": res["n_corrupt"],
        "n_triples": res["n_triples"],
        "stages": res["stages"],
        "wall_s": round(time.time() - t0, 2),
    }
    print("REPLAY_GATE_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
