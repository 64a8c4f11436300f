"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct.  The decode/feature-extract step is a Pandas UDF over
``mapInPandas`` — the real Spark-side machinery (schema, Arrow batch shape,
partitioning) is implemented and tested; the actual codec call is STUBBED
(this container ships no image/audio libraries): ``decode_stub`` derives a
deterministic fake (width, height, n_frames, mean_luma) from the payload
bytes, and a real deployment swaps `_decode_one` for PIL/torchaudio/ffmpeg
without touching any Spark code.

Plan shape at 100 TB: binary columns never pass through the JVM row format
twice — mapInPandas streams Arrow record batches; per-batch byte budget is
controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch`` and the
upstream ``maxPartitionBytes``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id bigint, media binary, media_type string, "
                "n_bytes int")
FEATURE_SCHEMA = ("doc_id bigint, media_type string, n_bytes int, "
                  "width int, height int, n_frames int, mean_luma int")


def ingest_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a media table from the documents fixture: payload = utf-8
    bytes of the text (a stand-in blob; real pipelines read files/object
    store), media_type round-robin by doc_id."""
    mt = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("media"),
        mt.alias("media_type"),
        F.octet_length(F.col(text_col)).cast("int").alias("n_bytes"))


def _decode_one(payload: bytes, media_type: str) -> tuple[int, int, int, int]:
    """STUB decoder — deterministic fake features from payload bytes.

    Replace with PIL.Image.open / soundfile / av in a real deployment.
    Raises NotImplementedError for unknown media types (the documented
    stub-contract).
    """
    if media_type not in ("image/png", "audio/wav", "video/mp4"):
        raise NotImplementedError(f"no decoder for {media_type}")
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if media_type == "image/png" else 1 + h[2] % 120
    mean_luma = (sum(payload[:256]) // max(min(len(payload), 256), 1)) & 0xFF
    return width, height, n_frames, mean_luma


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract over Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            feats = [
                _decode_one(bytes(p), mt)
                for p, mt in zip(b["media"].values, b["media_type"].values)
            ]
            out = pd.DataFrame(
                feats, columns=["width", "height", "n_frames", "mean_luma"])
            out.insert(0, "n_bytes", b["n_bytes"].values)
            out.insert(0, "media_type", b["media_type"].values)
            out.insert(0, "doc_id", b["doc_id"].values)
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
