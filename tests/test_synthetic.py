"""Generator invariants: schema, determinism, ordering (FIXTURES.md §1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from usc_ds_relationextraction_spark.sources import synthetic as syn


def test_schema(tiny_corpus):
    assert [f.name for f in tiny_corpus.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    types = {f.name: f.dataType.simpleString() for f in tiny_corpus.schema.fields}
    assert types["turn_idx"] == "int"
    assert types["ts"] == "timestamp"


def test_turn_idx_dense_and_ts_monotonic(tiny_corpus):
    agg = tiny_corpus.groupBy("conv_id").agg(
        F.count("*").alias("n"),
        F.max("turn_idx").alias("mx"),
        F.min("turn_idx").alias("mn"),
        (F.count("*") == F.size(F.collect_set("turn_idx"))).alias("uniq"),
    ).collect()
    for r in agg:
        assert r["mn"] == 0 and r["mx"] == r["n"] - 1 and r["uniq"]
    # ts strictly increasing within conv
    from pyspark.sql import Window
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = (tiny_corpus.withColumn("prev", F.lag("ts").over(w))
           .where(F.col("prev").isNotNull() & (F.col("ts") <= F.col("prev")))
           .count())
    assert bad == 0


def test_determinism_under_repartition(spark, tiny_corpus):
    again = syn.transcripts(spark, 20).repartition(13)
    a = sorted(map(tuple, tiny_corpus.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_kb_dims(spark):
    al = syn.kb_aliases(spark)
    assert al.count() == 200  # 100 entities x (canonical + lowercase)
    fc = syn.kb_facts(spark)
    assert fc.select("relation").distinct().count() == 4
    # alias surfaces unique per (alias, entity)
    assert al.distinct().count() == al.count()


def test_entity_names_unique(spark):
    rows = syn.entity_rows()
    names = [r[1] for r in rows]
    assert len(set(names)) == len(names)
