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

from ..functions.features import (make_em_features_udf,
                                  make_rm_grouped_features_udf)
from ..functions.hashing import h64
from ..operators import ds_label, graphs, mentions, pairs as pairs_op, vocab
from ..sources.catalog import Warehouse


class KGPipeline:
    def __init__(self, spark: SparkSession, warehouse_dir: str,
                 n_salts: int = 8, use_pandas_udfs: bool = True,
                 partitions: int | None = None, curate: bool = False):
        self.spark = spark
        # curate is a CONSTRUCTOR flag, not a run() parameter, and it
        # suffixes the warehouse root: every downstream stage's
        # checkpoint is derived from (possibly redacted) text, so a raw
        # and a curated run must never share 'sentences'/... tables —
        # with a shared namespace, toggling the flag against an existing
        # warehouse would silently resume stale raw-derived stages (and
        # the learned path would ignore the flag entirely).
        self.curate = curate
        self.wh = Warehouse(spark, warehouse_dir +
                            ("_curated" if curate else ""))
        self.n_salts = n_salts
        self.use_pandas_udfs = use_pandas_udfs
        self.partitions = partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions"))

    # ------------------------------------------------------------- stages
    def curated_turns(self, turns: DataFrame) -> DataFrame:
        """Opt-in corpus-hygiene stage ahead of extraction: PII
        redaction over the turn text (`operators/curation.PII_PATTERNS`,
        applied globally in order), checkpointed like every stage so a
        resume never re-scans the raw corpus.  OFF by default
        (constructor flag ``curate=False``, which also namespaces the
        warehouse): redaction rewrites text, and the per-turn
        text-equality contract vs the reference holds only on raw turns.
        Pure per-row regex — adds no shuffle ahead of `sentences`'s
        repartition-by-range."""
        def build():
            from ..operators.curation import redact_pii
            return turns.withColumn("text", redact_pii(F.col("text")))
        return self.wh.ensure("turns_curated", build, bucket_hint="conv_id")

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

    # --------------------------------------------- features / vocab / graphs
    def with_split(self, df: DataFrame) -> DataFrame:
        """Deterministic 80/20 conv-level train/test split (hash, not rand)."""
        return df.withColumn(
            "is_test", F.pmod(h64(F.concat(F.col("conv_id"), F.lit("|split"))),
                              F.lit(5)) == 0)

    def rm_feature_rows(self, rm: DataFrame, sentences: DataFrame,
                        brown: dict[str, str]) -> DataFrame:
        """RM features F1-F12: join pairs back to sentence tokens/pos
        (sentence-key equi-join, dense key), extract, explode."""
        def build():
            sent = sentences.select("conv_id", "turn_idx", "sent_idx",
                                    "tokens", "pos")
            # one row per sentence: the grouped UDF ships/lemmatizes each
            # sentence once for all its pairs (the groupBy partitions on
            # the join key, so the join reuses that exchange)
            grouped = rm.groupBy("conv_id", "turn_idx", "sent_idx").agg(
                F.collect_list(F.struct(
                    F.col("mention_key"), F.col("labels"),
                    F.col("em1Start").alias("em1s"),
                    F.col("em1End").alias("em1e"),
                    F.col("em2Start").alias("em2s"),
                    F.col("em2End").alias("em2e"),
                    F.col("numOfEMBetween").alias("numb"))).alias("pairs"))
            j = grouped.join(sent, on=["conv_id", "turn_idx", "sent_idx"])
            udf = make_rm_grouped_features_udf(brown)
            z = j.withColumn("feats_list", udf("tokens", "pos", "pairs")) \
                .select("conv_id",
                        F.explode(F.arrays_zip("pairs", "feats_list"))
                         .alias("z"))
            out = z.select(
                "conv_id",
                F.col("z.pairs.mention_key").alias("mention_key"),
                F.col("z.pairs.labels").alias("labels"),
                F.explode(F.array_distinct("z.feats_list"))
                 .alias("feature"))
            return self.with_split(out)
        return self.wh.ensure("rm_feature_rows", build, bucket_hint="mention_key")

    def em_feature_rows(self, ems: DataFrame, sentences: DataFrame,
                        brown: dict[str, str]) -> DataFrame:
        """EM features F14-F22 (same join shape)."""
        def build():
            sent = sentences.select("conv_id", "turn_idx", "sent_idx",
                                    "tokens", "pos")
            j = ems.join(sent, on=["conv_id", "turn_idx", "sent_idx"])
            udf = make_em_features_udf(brown)
            feats = j.withColumn("features", udf("tokens", "pos", "start", "end"))
            out = feats.select(
                "conv_id", "mention_key", "labels",
                F.explode(F.array_distinct("features")).alias("feature"))
            return self.with_split(out)
        return self.wh.ensure("em_feature_rows", build, bucket_hint="mention_key")

    def graph_tables(self, feature_rows: DataFrame, prefix: str,
                     neg_label_weight: float = 1.0) -> dict[str, DataFrame]:
        """Vocab + the three bipartite graphs + train/test variants."""
        train = feature_rows.where(~F.col("is_test"))
        test = feature_rows.where(F.col("is_test"))

        voc = self.wh.ensure(f"{prefix}_features",
                             lambda: vocab.build_vocab(train))
        mentions_lab = feature_rows.select(
            "mention_key", "labels", "is_test").distinct()
        types = self.wh.ensure(
            f"{prefix}_types",
            lambda: vocab.build_type_vocab(
                mentions_lab.where(~F.col("is_test"))
                .select("mention_key", F.explode("labels").alias("label")),
            ))

        mf_train = self.wh.ensure(
            f"{prefix}_mention_feature",
            lambda: graphs.mention_feature_graph(vocab.gate_to_vocab(train, voc)))
        mf_test = self.wh.ensure(
            f"{prefix}_mention_feature_test",
            lambda: graphs.mention_feature_graph(vocab.gate_to_vocab(test, voc)))
        mt_train = self.wh.ensure(
            f"{prefix}_mention_type",
            lambda: graphs.mention_type_graph(
                mentions_lab.where(~F.col("is_test")), neg_label_weight))
        mt_test = self.wh.ensure(
            f"{prefix}_mention_type_test",
            lambda: graphs.mention_type_graph(mentions_lab.where(F.col("is_test"))))
        ft = self.wh.ensure(
            f"{prefix}_feature_type",
            lambda: graphs.feature_type_graph(mf_train, mt_train))
        return {"features": voc, "types": types,
                "mention_feature": mf_train, "mention_feature_test": mf_test,
                "mention_type": mt_train, "mention_type_test": mt_test,
                "feature_type": ft}

    def triples_mention(self, rm: DataFrame) -> DataFrame:
        return self.wh.ensure("triples_mention",
                              lambda: graphs.rm_em_triples(rm))

    def kg_tables(self, aliases: DataFrame,
                  facts: DataFrame) -> dict[str, DataFrame]:
        """Canonical entity/edge materialization (north_rule: "entity
        linking, canonicalization, graph materialize") — run after
        :meth:`run`; reads the candidates + rm_pairs stages."""
        from . import kg_materialize as kg
        linked = ds_label.link_entities(self.wh.read("candidates"),
                                        aliases, self.n_salts)
        nodes = self.wh.ensure(
            "kg_entities", lambda: kg.entity_nodes(linked, aliases),
            bucket_hint="entity_id")
        pairs = self.wh.read("rm_pairs")
        edges = self.wh.ensure(
            "kg_edges",
            lambda: kg.canonical_edges_from_pairs(pairs, facts, aliases),
            bucket_hint="subj_id")
        comps = self.wh.ensure(
            "kg_components", lambda: kg.resolve_entities(aliases),
            bucket_hint="entity_id")
        return {"kg_entities": nodes, "kg_edges": edges,
                "kg_components": comps}

    # ------------------------------------------------------------ full run
    def run(self, turns: DataFrame, aliases: DataFrame,
            facts: DataFrame) -> DataFrame:
        if self.curate:
            turns = self.curated_turns(turns)
        s = self.sentences(turns)
        c = self.candidates(s)
        e = self.entity_mentions(c, aliases)
        r = self.rm_pairs(e, facts)
        return self.triples_ds(r)

    def run_graphs(self, turns: DataFrame, aliases: DataFrame,
                   facts: DataFrame, brown: dict[str, str],
                   neg_label_weight: float = 1.0) -> dict[str, DataFrame]:
        """Full graph-construction DAG (SURVEY §7.2 step 4)."""
        self.run(turns, aliases, facts)
        s = self.wh.read("sentences")
        e = self.wh.read("entity_mentions")
        r = self.wh.read("rm_pairs")
        rm_rows = self.rm_feature_rows(r, s, brown)
        em_rows = self.em_feature_rows(e, s, brown)
        out = {"rm": self.graph_tables(rm_rows, "rm", neg_label_weight),
               "em": self.graph_tables(em_rows, "em", neg_label_weight)}
        self.triples_mention(r)
        return out

    # ------------------------------------------------- learned inference
    def run_learned(self, turns: DataFrame, aliases: DataFrame,
                    facts: DataFrame, brown: dict[str, str],
                    epochs: int = 40, lr: float = 0.25,
                    sim: str = "cosine", threshold: float | None = None,
                    joint: bool = False) -> dict:
        """§7.2 steps 5-7: train embeddings, predict types for the test
        split, tune the threshold on the sweep, materialize learned triples
        (convertPredictionToJson semantics), evaluate P/R/F1."""
        from ..functions.hashing import h64_py
        from . import evaluation as ev
        from . import inference as inf
        from .training import CoTypeJointTrainer, CoTypeRMTrainer

        g = self.run_graphs(turns, aliases, facts, brown)
        rm = g["rm"]
        if joint:
            # full reference joint semantics (retype.cpp:149-161): EM-side
            # PLE+SG nets train in the same epoch as RM nets + TransE
            trainer = CoTypeJointTrainer(self.spark, self.wh, "rm", lr=lr)
            embs = trainer.train(rm["mention_feature"], rm["feature_type"],
                                 rm["mention_type"],
                                 self.wh.read("triples_mention"),
                                 epochs=epochs, em_graphs=g["em"])
        else:
            trainer = CoTypeRMTrainer(self.spark, self.wh, "rm", lr=lr)
            embs = trainer.train(rm["mention_feature"], rm["feature_type"],
                                 rm["mention_type"], epochs=epochs)
        none_id = h64_py("None")
        gt = rm["mention_type_test"].select("mention_id", "type_id")
        me = inf.mention_embeddings(rm["mention_feature_test"],
                                    embs["feature"])
        scored = inf.score_types(self.spark, me, embs["type"], sim, none_id)
        normalized = inf.min_max_normalize(scored).localCheckpoint()
        sweep = ev.sweep_thresholds(normalized, gt, none_id)
        best = ev.best_threshold(sweep)
        theta = threshold if threshold is not None else best["theta"]
        preds = normalized.where(F.col("score_norm") > theta).select(
            "mention_id", "type_id", F.col("score_norm").alias("score"))
        metrics = ev.evaluate_rm_neg(preds.select("mention_id", "type_id"),
                                     gt, none_id)
        rm_pairs = self.wh.read("rm_pairs").withColumn(
            "is_test", F.pmod(h64(F.concat(F.col("conv_id"),
                                           F.lit("|split"))), F.lit(5)) == 0
        ).where("is_test")
        triples = inf.materialize_triples(preds, rm_pairs, rm["types"])
        triples = self.wh.write("triples_learned", triples)
        return {"embs": embs, "best": best, "theta": theta,
                "metrics": metrics, "triples": triples}
