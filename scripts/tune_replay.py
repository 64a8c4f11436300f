"""Tune the real-corpus replay gate operating point (round-5 corpus).

Runs replay_gate's exact pipeline at several epoch counts on the
regenerated 10x real-English fixtures and prints the full threshold
sweep for each, so a single committed theta with P>=0.95 AND R>=0.9
(F1>=0.9) can be chosen for tests/test_real_corpus.py.
"""
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from usc_ds_relationextraction_spark.session import get_spark  # noqa: E402

DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "real_corpus")


def main() -> None:
    spark = get_spark(app_name="tune_replay", master="local[32]",
                      shuffle_partitions=32,
                      extra_conf={"spark.driver.memory": "12g"})
    spark.sparkContext.setLogLevel("ERROR")
    from usc_ds_relationextraction_spark.plans.replay import replay_gate

    epoch_grid = [int(x) for x in (sys.argv[1:] or ["40", "80", "120"])]
    for epochs in epoch_grid:
        wh = tempfile.mkdtemp(prefix=f"tune_replay_{epochs}_")
        try:
            res = replay_gate(spark, wh,
                              os.path.join(DIR, "train_new.json"),
                              os.path.join(DIR, "test_new.json"),
                              epochs=epochs, lr=0.25)
            print(f"\n=== epochs={epochs} best={res['best']} "
                  f"metrics={res['metrics']}")
            # re-derive the sweep for the full operating curve
            from usc_ds_relationextraction_spark.plans.evaluation import (
                sweep_thresholds)
            from usc_ds_relationextraction_spark.plans.inference import (
                mention_embeddings, min_max_normalize, score_types)
            from usc_ds_relationextraction_spark.plans.pipeline import (
                KGPipeline)
            from usc_ds_relationextraction_spark.plans.training import (
                CoTypeRMTrainer)
            from usc_ds_relationextraction_spark.functions.hashing import (
                h64_py)
            pipe = KGPipeline(spark, wh)
            rows = pipe.wh.read("replay_rm_feature_rows")
            g = pipe.graph_tables(rows, "rm")
            trainer = CoTypeRMTrainer(spark, pipe.wh, "rm", lr=0.25)
            embs = trainer.train(g["mention_feature"], g["feature_type"],
                                 g["mention_type"], epochs=epochs)
            none_id = h64_py("None")
            gt = g["mention_type_test"].select("mention_id", "type_id")
            me = mention_embeddings(g["mention_feature_test"],
                                    embs["feature"])
            scored = score_types(spark, me, embs["type"], "cosine", none_id)
            normalized = min_max_normalize(scored).localCheckpoint()
            sweep = sweep_thresholds(normalized, gt, none_id)
            rows_ = (sweep.where(F.col("precision") >= 0.90)
                     .orderBy(F.desc("f1")).limit(15).collect())
            for r in rows_:
                print(f"  theta={r['theta']:.2f} P={r['precision']:.4f} "
                      f"R={r['recall']:.4f} F1={r['f1']:.4f}")
        finally:
            shutil.rmtree(wh, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
