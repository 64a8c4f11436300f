"""Incremental KG materialization: the additive-merge sink
(`sources.catalog.incremental_agg_sink`) and its streaming wiring
(`streaming.ingest.stream_kg_edges`).

Contract under test: a canonical edge table maintained as per-micro-batch
additive deltas (atomic pointer commit, exactly-once under batch replay)
equals the batch aggregate over the same extraction — the streaming twin
of `plans.kg_materialize.canonical_edges` for corpora too large to
re-aggregate from scratch."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from usc_ds_relationextraction_spark.sources.catalog import (
    incremental_agg_sink, merge_additive_sql, read_current_version)


def test_merge_additive_sql_shape():
    sql = merge_additive_sql("kg.edges", "batch_view",
                             ["subj", "pred", "obj"], ["n_support"])
    assert sql == (
        "MERGE INTO kg.edges t USING batch_view s "
        "ON t.subj = s.subj AND t.pred = s.pred AND t.obj = s.obj "
        "WHEN MATCHED THEN UPDATE SET t.n_support = t.n_support + s.n_support "
        "WHEN NOT MATCHED THEN INSERT *")


def _rows(spark, data):
    return spark.createDataFrame(
        data, "subj string, pred string, obj string, n_support long")


def test_incremental_sink_merges_and_replays(spark, tmp_path):
    """Two batches fold additively; replaying a committed batch (the only
    replay foreachBatch can issue) is a no-op in both crash windows."""
    target = str(tmp_path / "edges")
    sink = incremental_agg_sink(spark, target,
                                ["subj", "pred", "obj"], ["n_support"])
    sink(_rows(spark, [("a", "r", "b", 1), ("a", "r", "b", 1),
                       ("c", "r", "d", 1)]), 0)
    sink(_rows(spark, [("a", "r", "b", 1), ("e", "r", "f", 1)]), 1)
    got = {(r.subj, r.pred, r.obj): r.n_support
           for r in read_current_version(spark, target).collect()}
    assert got == {("a", "r", "b"): 3, ("c", "r", "d"): 1,
                   ("e", "r", "f"): 1}
    # crash-replay of the committed batch 1: pointer already names it
    sink(_rows(spark, [("a", "r", "b", 1), ("e", "r", "f", 1)]), 1)
    got2 = {(r.subj, r.pred, r.obj): r.n_support
            for r in read_current_version(spark, target).collect()}
    assert got2 == got
    # GC keeps at most the committed version and its parent
    vdirs = [d for d in os.listdir(target) if d.startswith("v")]
    assert "v1" in vdirs and len(vdirs) <= 2


def test_incremental_sink_crash_before_commit(spark, tmp_path):
    """A staged-but-uncommitted version (crash between the parquet write
    and the pointer flip) is invisible to readers and harmlessly
    overwritten by the replay."""
    target = str(tmp_path / "edges")
    sink = incremental_agg_sink(spark, target,
                                ["subj", "pred", "obj"], ["n_support"])
    sink(_rows(spark, [("a", "r", "b", 1)]), 0)
    # simulate the crash window: v1 written, _CURRENT still points at v0
    _rows(spark, [("z", "z", "z", 99)]).write.mode("overwrite") \
        .parquet(os.path.join(target, "v1"))
    cur = read_current_version(spark, target)
    assert [(r.subj, r.n_support) for r in cur.collect()] == [("a", 1)]
    sink(_rows(spark, [("a", "r", "b", 1)]), 1)  # the replay
    got = {(r.subj, r.pred, r.obj): r.n_support
           for r in read_current_version(spark, target).collect()}
    assert got == {("a", "r", "b"): 2}


def test_incremental_sink_min_max_cols(spark, tmp_path):
    """min/max measures merge associatively across batches alongside sums
    (the node-table shape: additive counts + min-observed surface)."""
    target = str(tmp_path / "nodes")
    sink = incremental_agg_sink(
        spark, target, ["k"], ["n"], min_cols=["lo"], max_cols=["hi"])
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "k string, n long, lo string, hi int")
    sink(mk([("a", 1, "m", 5), ("a", 1, "b", 9)]), 0)
    sink(mk([("a", 1, "z", 2), ("b", 1, "q", 1)]), 1)
    got = {r.k: (r.n, r.lo, r.hi)
           for r in read_current_version(spark, target).collect()}
    assert got == {"a": (3, "b", 9), "b": (1, "q", 1)}


def test_merge_additive_sql_min_max():
    sql = merge_additive_sql("kg.nodes", "v", ["k"], ["n"],
                             min_cols=["lo"], max_cols=["hi"])
    assert ("t.n = t.n + s.n, t.lo = LEAST(t.lo, s.lo), "
            "t.hi = GREATEST(t.hi, s.hi)") in sql


def test_stream_kg_nodes_equals_batch(spark, tiny_corpus, tmp_path):
    """Incrementally-maintained node table == batch aggregate of the same
    chunk→alias-link extraction."""
    from usc_ds_relationextraction_spark.sources import synthetic as syn
    from usc_ds_relationextraction_spark.streaming import ingest
    from usc_ds_relationextraction_spark.functions.tokenize import (
        pos_tags_col, tokens_col)
    from usc_ds_relationextraction_spark.operators.mentions import (
        np_chunks_col)

    src = str(tmp_path / "src")
    tiny_corpus.repartition(3).write.mode("overwrite").parquet(src)
    q = ingest.stream_kg_nodes(spark, src, str(tmp_path / "ckpt"),
                               str(tmp_path / "nodes"))
    q.awaitTermination(180)
    got = {r.entity_id: (r.n_mentions, r.first_surface, r.entity_type)
           for r in read_current_version(
               spark, str(tmp_path / "nodes")).collect()}
    al = syn.kb_aliases(spark).select(
        F.col("alias").alias("surface"), "entity_id", "entity_type") \
        .dropDuplicates(["surface", "entity_id"])
    batch = (spark.read.parquet(src)
             .withColumn("toks", tokens_col("text"))
             .withColumn("pos", pos_tags_col("toks"))
             .withColumn("chunk", F.explode(np_chunks_col("toks", "pos")))
             .select(F.col("chunk.surface").alias("surface"))
             .join(F.broadcast(al), on="surface")
             .groupBy("entity_id")
             .agg(F.count(F.lit(1)).alias("n_mentions"),
                  F.min("surface").alias("first_surface"),
                  F.min("entity_type").alias("entity_type")))
    want = {r.entity_id: (r.n_mentions, r.first_surface, r.entity_type)
            for r in batch.collect()}
    assert got == want and len(want) > 0


def test_stream_kg_edges_equals_batch(spark, tiny_corpus, tmp_path):
    """readStream → triple evidence → incremental merge across ≥2
    micro-batches == one batch aggregate over the same extraction."""
    from usc_ds_relationextraction_spark.sources import synthetic as syn
    from usc_ds_relationextraction_spark.streaming import ingest

    src = str(tmp_path / "src")
    # several input files so maxFilesPerTrigger=1 yields several batches
    tiny_corpus.repartition(4).write.mode("overwrite").parquet(src)
    q = ingest.stream_kg_edges(spark, src, str(tmp_path / "ckpt"),
                               str(tmp_path / "edges"))
    q.awaitTermination(180)
    n_batches = len(os.listdir(os.path.join(str(tmp_path / "ckpt"),
                                            "commits")))
    assert n_batches >= 2, "merge path must actually iterate"
    got = {(r.subj, r.pred, r.obj): r.n_support
           for r in read_current_version(
               spark, str(tmp_path / "edges")).collect()}
    batch = ingest.turn_local_triples_join(
        spark.read.parquet(src), syn.kb_aliases(spark),
        syn.kb_facts(spark)) \
        .groupBy("subj", "pred", "obj") \
        .agg(F.count(F.lit(1)).alias("n_support"))
    want = {(r.subj, r.pred, r.obj): r.n_support for r in batch.collect()}
    assert got == want and len(want) > 0


def test_batch_split_invariance_property(spark, tmp_path):
    """Property (hypothesis): ANY split of the evidence rows into ordered
    batches folds to the same final table — merge-associativity is the
    whole correctness argument for incremental maintenance, so it gets a
    randomized check, not just the two hand-picked splits above."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rows = [("a", "r", "b"), ("a", "r", "b"), ("c", "r", "d"),
            ("a", "r", "b"), ("c", "r", "d"), ("e", "r", "f"),
            ("e", "r", "f"), ("a", "q", "b")]
    want = {}
    for s, p, o in rows:
        want[(s, p, o)] = want.get((s, p, o), 0) + 1
    case = [0]

    @settings(max_examples=5, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(cuts=st.lists(st.integers(1, len(rows) - 1),
                         min_size=0, max_size=3, unique=True))
    def check(cuts):
        case[0] += 1
        target = str(tmp_path / f"edges{case[0]}")
        sink = incremental_agg_sink(spark, target,
                                    ["subj", "pred", "obj"], ["n_support"])
        bounds = [0] + sorted(cuts) + [len(rows)]
        for i in range(len(bounds) - 1):
            chunk = rows[bounds[i]:bounds[i + 1]]
            sink(_rows(spark, [(s, p, o, 1) for s, p, o in chunk]), i)
        got = {(r.subj, r.pred, r.obj): r.n_support
               for r in read_current_version(spark, target).collect()}
        assert got == want

    check()


def test_fresh_checkpoint_restart_raises(spark, tmp_path):
    """Round-3 advisor (medium): a stream restarting with a FRESH
    checkpoint resets batch ids to 0; the replay guard must fail loudly
    instead of silently dropping batches until ids catch up."""
    import pytest
    target = str(tmp_path / "edges")
    sink = incremental_agg_sink(spark, target,
                                ["subj", "pred", "obj"], ["n_support"])
    sink(_rows(spark, [("a", "r", "b", 1)]), 0)
    sink(_rows(spark, [("a", "r", "b", 1)]), 1)
    with pytest.raises(RuntimeError, match="fresh checkpoint"):
        sink(_rows(spark, [("x", "r", "y", 1)]), 0)


def test_stream_identity_mismatch_raises(spark, tmp_path):
    import pytest
    target = str(tmp_path / "edges")
    a = incremental_agg_sink(spark, target, ["subj", "pred", "obj"],
                             ["n_support"], stream_id="ckpt-A")
    a(_rows(spark, [("a", "r", "b", 1)]), 0)
    b = incremental_agg_sink(spark, target, ["subj", "pred", "obj"],
                             ["n_support"], stream_id="ckpt-B")
    with pytest.raises(RuntimeError, match="belongs to stream"):
        b(_rows(spark, [("x", "r", "y", 1)]), 0)


def test_same_stream_batch0_replay_skips(spark, tmp_path):
    """With a recorded identity, the genuine crash-replay of batch 0 by
    the SAME stream stays a silent exactly-once skip."""
    target = str(tmp_path / "edges")
    sink = incremental_agg_sink(spark, target, ["subj", "pred", "obj"],
                                ["n_support"], stream_id="ckpt-A")
    sink(_rows(spark, [("a", "r", "b", 1)]), 0)
    sink(_rows(spark, [("a", "r", "b", 1)]), 0)  # replay, not a restart
    got = {(r.subj, r.pred, r.obj): r.n_support
           for r in read_current_version(spark, target).collect()}
    assert got == {("a", "r", "b"): 1}


def test_keep_versions_gc(spark, tmp_path):
    """keep_versions widens the reader/GC race window for long-lived
    read_current_version consumers (round-3 advisor, low)."""
    target = str(tmp_path / "edges")
    sink = incremental_agg_sink(spark, target, ["subj", "pred", "obj"],
                                ["n_support"], stream_id="c",
                                keep_versions=3)
    for b in range(4):
        sink(_rows(spark, [("a", "r", "b", 1)]), b)
    vdirs = sorted(d for d in os.listdir(target) if d.startswith("v")
                   and d[1:].isdigit())
    assert vdirs == ["v1", "v2", "v3"]
