"""End-to-end KG-construction pipeline (SURVEY.md §7.2 step 2 and beyond).

Stage DAG over the warehouse (each stage checkpointed + metered):

  transcripts ─► sentences ─► candidates ─► entity_mentions ─► rm_pairs
       │                                         │                │
       └── (window W2 turn ordering) ── triples_ds (direct DS) ◄──┘

``triples_ds`` is the flagship output before any learning: every DS-labeled
pair materializes as canonicalized (subj, pred, obj) edges — the reference's
``convertPredictionToJson.py`` output shape, with subj/obj = mention
surfaces and pred = relation name (SURVEY.md §3.3).  The learned-inference
path (plans/training.py + plans/inference.py) replaces the direct labels
with embedding-scored predictions over the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ds_label, mentions, pairs as pairs_op
from ..sources.catalog import Warehouse


class KGPipeline:
    def __init__(self, spark: SparkSession, warehouse_dir: str,
                 n_salts: int = 8, use_pandas_udfs: bool = True,
                 partitions: int | None = None):
        self.spark = spark
        self.wh = Warehouse(spark, warehouse_dir)
        self.n_salts = n_salts
        self.use_pandas_udfs = use_pandas_udfs
        self.partitions = partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions"))

    # ------------------------------------------------------------- stages
    def sentences(self, turns: DataFrame) -> DataFrame:
        def build():
            # repartition-by-range on conv_id (north_rule): co-locates a
            # conversation's turns; downstream sentence-keyed ops stay local
            t = turns.repartitionByRange(self.partitions, "conv_id", "turn_idx")
            return mentions.sentences_table(t, self.use_pandas_udfs)
        return self.wh.ensure("sentences", build, bucket_hint="conv_id")

    def candidates(self, sentences: DataFrame) -> DataFrame:
        return self.wh.ensure(
            "candidates",
            lambda: mentions.candidates_table(sentences, self.use_pandas_udfs),
            bucket_hint="conv_id")

    def entity_mentions(self, candidates: DataFrame, aliases: DataFrame) -> DataFrame:
        def build():
            linked = ds_label.link_entities(candidates, aliases, self.n_salts)
            return ds_label.entity_mentions(linked)
        return self.wh.ensure("entity_mentions", build, bucket_hint="mention_key")

    def rm_pairs(self, ems: DataFrame, facts: DataFrame) -> DataFrame:
        def build():
            cand = pairs_op.rm_candidates(ems)
            return pairs_op.label_pairs(cand, facts)
        return self.wh.ensure("rm_pairs", build, bucket_hint="mention_key")

    def triples_ds(self, rm: DataFrame) -> DataFrame:
        """Direct distant-supervision triples (no learning): one edge per
        (pair, relation label) with fact direction applied."""
        def build():
            fwd = rm.select(
                F.col("em1Text").alias("subj"),
                F.explode("labels_fwd").alias("pred"),
                F.col("em2Text").alias("obj"),
                "conv_id", "turn_idx", "mention_key",
            )
            rev = rm.select(
                F.col("em2Text").alias("subj"),
                F.explode("labels_rev").alias("pred"),
                F.col("em1Text").alias("obj"),
                "conv_id", "turn_idx", "mention_key",
            )
            return fwd.unionByName(rev)
        return self.wh.ensure("triples_ds", build, bucket_hint="conv_id")

    # ------------------------------------------------------------ full run
    def run(self, turns: DataFrame, aliases: DataFrame,
            facts: DataFrame) -> DataFrame:
        s = self.sentences(turns)
        c = self.candidates(s)
        e = self.entity_mentions(c, aliases)
        r = self.rm_pairs(e, facts)
        return self.triples_ds(r)
