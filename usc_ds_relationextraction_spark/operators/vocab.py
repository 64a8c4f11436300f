"""Vocabulary encoding (SURVEY.md A1/P7/P8).

The reference assigns dense first-seen-order integer ids in a single
process (``ner_feature.py:72-93``) — inherently sequential.  Dense ids
only mattered there for C-array indexing (``hplelib.cpp``); our embeddings
are keyed DataFrame rows, so we use **deterministic portable hash ids**
(:func:`..functions.hashing.h64` of the name): no global sort, no
single-partition ``row_number`` bottleneck, identical ids on any cluster
size — and reproducible inside DuckDB for the correctness oracle.

Frequency filtering (P7, ``ner_feature.py:214-247``: keep freq>=min) and
the train-vocab gate (P8, ``ner_feature.py:74-81``: unknown test features
dropped) are plain aggregations / semi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h64


def build_vocab(mention_features: DataFrame, feature_col: str = "feature",
                min_freq: int = 1) -> DataFrame:
    """Exploded (mention_key, feature) rows → (feature_id, name, freq).

    ``freq`` counts occurrences across mentions (reference counts every
    emission; we count per-mention once after array_distinct — the filter
    threshold semantics match for min_freq=1, the reference's setting).
    """
    vocab = (
        mention_features.groupBy(feature_col)
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= min_freq)
        .select(h64(F.col(feature_col)).alias("feature_id"),
                F.col(feature_col).alias("name"), "freq")
    )
    return vocab


def gate_to_vocab(mention_features: DataFrame, vocab: DataFrame,
                  feature_col: str = "feature") -> DataFrame:
    """P8: keep only features present in the (train) vocab — left-semi."""
    return mention_features.join(
        F.broadcast(vocab.select(F.col("name").alias(feature_col))),
        on=feature_col, how="left_semi")


def build_type_vocab(mention_labels: DataFrame, label_col: str = "label") -> DataFrame:
    """(mention_key, label) rows → (type_id, name, freq); must contain None."""
    return (
        mention_labels.groupBy(label_col)
        .agg(F.count("*").alias("freq"))
        .select(h64(F.col(label_col)).alias("type_id"),
                F.col(label_col).alias("name"), "freq")
    )
