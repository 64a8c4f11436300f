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


PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG frame-header (SOFn) markers carrying dimensions: C0-CF minus the
# non-frame C4 (DHT), C8 (JPG extension), CC (DAC)
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def parse_png_dims(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from the IHDR chunk — pure-Python, no codec.

    PNG layout is fixed: 8-byte signature, then the IHDR chunk whose
    4-byte big-endian width/height sit at byte offsets 16 and 20."""
    import struct
    if len(payload) < 24 or not payload.startswith(PNG_SIG):
        return None
    if payload[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", payload[16:24])
    return (w, h)


def parse_jpeg_dims(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from the first SOFn marker — pure-Python segment
    walk (SOI, then length-prefixed segments until a frame header)."""
    import struct
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xFF:          # fill byte
            pos += 1
            continue
        if 0xD0 <= marker <= 0xD9:  # standalone RSTn/SOI/EOI: no length
            pos += 2
            continue
        seg_len = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        if marker in _JPEG_SOF:
            if pos + 9 > n:
                return None
            h, w = struct.unpack(">HH", payload[pos + 5:pos + 9])
            return (w, h)
        pos += 2 + seg_len
    return None


def parse_wav_meta(payload: bytes) -> tuple[int, int, int] | None:
    """(sample_rate, channels, n_frames) from a RIFF/WAVE chunk walk —
    pure-Python, no codec.  Walks length-prefixed (little-endian,
    word-aligned) chunks for ``fmt `` (channels at chunk offset +2,
    sample rate at +4, block align at +12) and ``data`` (frame count =
    payload size / block align)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        return None
    pos, n = 12, len(payload)
    sr = ch = ba = data_sz = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        sz = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if cid == b"fmt " and sz >= 16 and pos + 8 + 14 <= n:
            # sz >= 16: a PCM fmt chunk is at least 16 bytes; a
            # malformed shorter declaration would otherwise read the
            # NEXT chunk's bytes as sample_rate/block_align and return
            # garbage instead of the None-fallback contract
            ch = int.from_bytes(payload[pos + 10:pos + 12], "little")
            sr = int.from_bytes(payload[pos + 12:pos + 16], "little")
            ba = int.from_bytes(payload[pos + 20:pos + 22], "little")
        elif cid == b"data":
            data_sz = sz
        pos += 8 + sz + (sz & 1)    # RIFF chunks are word-aligned
    if sr is None or not ba or data_sz is None:
        return None
    return (sr, ch, data_sz // ba)


def parse_mp4_meta(payload: bytes) -> tuple[int, int] | None:
    """(timescale, duration) from the ISO-BMFF ``moov``/``mvhd`` box walk
    — pure-Python, big-endian size-prefixed boxes, mvhd v0 and v1."""
    def walk(start: int, end: int) -> tuple[int, int] | None:
        pos = start
        while pos + 8 <= end:
            size = int.from_bytes(payload[pos:pos + 4], "big")
            typ = payload[pos + 4:pos + 8]
            if size < 8 or pos + size > end:
                return None
            if typ == b"moov":
                r = walk(pos + 8, pos + size)
                if r is not None:
                    return r
            elif typ == b"mvhd" and pos + 8 + 4 <= end:
                ver = payload[pos + 8]
                body = pos + 12       # after version + flags
                if ver == 0 and body + 16 <= end:
                    ts = int.from_bytes(payload[body + 8:body + 12], "big")
                    du = int.from_bytes(payload[body + 12:body + 16], "big")
                    return (ts, du)
                if ver == 1 and body + 28 <= end:
                    ts = int.from_bytes(payload[body + 16:body + 20], "big")
                    du = int.from_bytes(payload[body + 20:body + 28], "big")
                    return (ts, du)
                return None
            pos += size
        return None
    return walk(0, len(payload))


def _decode_one(payload: bytes, media_type: str) -> tuple[int, int, int, int]:
    """Decode real PNG/JPEG headers (pure-Python dimension extraction);
    deterministic hash-derived fallback for payloads that are not real
    media (the synthetic text-blob fixtures) — a real deployment swaps
    the fallback for PIL/soundfile/av without touching any Spark code.
    Raises NotImplementedError for unknown media types (the documented
    contract)."""
    if media_type not in ("image/png", "image/jpeg", "audio/wav",
                          "video/mp4"):
        raise NotImplementedError(f"no decoder for {media_type}")
    mean_luma = (sum(payload[:256]) // max(min(len(payload), 256), 1)) & 0xFF
    if media_type == "image/png":
        dims = parse_png_dims(payload)
        if dims is not None:
            return dims[0], dims[1], 1, mean_luma
    elif media_type == "image/jpeg":
        dims = parse_jpeg_dims(payload)
        if dims is not None:
            return dims[0], dims[1], 1, mean_luma
    elif media_type == "audio/wav":
        meta = parse_wav_meta(payload)
        if meta is not None:
            return 0, 0, meta[2], mean_luma
    elif media_type == "video/mp4":
        meta = parse_mp4_meta(payload)
        if meta is not None:
            return 0, 0, meta[1], mean_luma
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if media_type in ("image/png", "image/jpeg") \
        else 1 + h[2] % 120
    return width, height, n_frames, mean_luma


def tiny_png(width: int, height: int, seed: int = 0) -> bytes:
    """A complete, valid 8-bit grayscale PNG built with the stdlib only
    (zlib-compressed scanlines + CRC chunks) — real-image fixtures for
    the decoder without any codec dependency."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((seed + x + y) % 256 for x in range(width))
        for y in range(height))
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def tiny_jpeg_header(width: int, height: int) -> bytes:
    """SOI + APP0(JFIF) + SOF0 prefix — enough of a real JPEG for header
    parsing (fixtures exercise the segment walk, not entropy decoding)."""
    import struct
    app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00")
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", height, width) + b"\x01\x01\x11\x00")
    return b"\xff\xd8" + app0 + sof0


def tiny_wav(sample_rate: int, channels: int, n_frames: int,
             seed: int = 0) -> bytes:
    """A complete, valid 16-bit PCM WAV built with the stdlib only —
    real-audio fixtures for the chunk walk without any codec."""
    import struct
    bits = 16
    ba = channels * bits // 8
    data = bytes((seed + i) % 251 for i in range(n_frames * ba))
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * ba, ba, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


_MP4_MATRIX = (b"\x00\x01\x00\x00" + b"\x00" * 4 * 2
               + b"\x00" * 4 + b"\x00\x01\x00\x00" + b"\x00" * 4
               + b"\x00" * 4 * 2 + b"\x40\x00\x00\x00")


def tiny_mp4(timescale: int, duration: int) -> bytes:
    """A minimal, structurally valid ISO-BMFF file (ftyp + moov/mvhd v0)
    — real-video fixtures for the box walk."""
    import struct
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    mvhd = (struct.pack(">I", 108) + b"mvhd"
            + b"\x00\x00\x00\x00"                    # version 0 + flags
            + struct.pack(">II", 0, 0)               # creation/modification
            + struct.pack(">II", timescale, duration)
            + struct.pack(">I", 0x00010000)          # rate 1.0
            + struct.pack(">H", 0x0100)              # volume 1.0
            + b"\x00" * 10                           # reserved
            + _MP4_MATRIX
            + b"\x00" * 24                           # pre_defined
            + struct.pack(">I", 2))                  # next_track_id
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov


# audio/video decode output: one unified row shape (mp4 maps
# sample_rate := mvhd timescale, n_frames := mvhd duration ticks).
# sample_rate/n_frames/duration_ms are bigint: mvhd timescale is a
# full u32, mvhd v1 durations are u64 ticks, and a 4 GiB WAV data
# chunk at block_align 1 exceeds 2^31 frames — int32 columns would
# make the decoder overflow its own schema on real media under ANSI.
AV_FEATURE_SCHEMA = ("doc_id bigint, media_type string, "
                     "sample_rate bigint, channels int, n_frames bigint, "
                     "duration_ms bigint, n_bytes bigint")


def decode_av_features(media: DataFrame) -> DataFrame:
    """mapInPandas audio/video header decode over Arrow binary batches —
    the WAV/MP4 sibling of :func:`decode_features` (same plan shape;
    real chunk/box walks, no codec)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            rows = []
            for p, mt in zip(b["media"].values, b["media_type"].values):
                p = bytes(p)
                if mt == "audio/wav":
                    sr, ch, nf = parse_wav_meta(p) or (0, 0, 0)
                    rows.append((sr, ch, nf,
                                 nf * 1000 // sr if sr else 0))
                elif mt == "video/mp4":
                    ts, du = parse_mp4_meta(p) or (0, 0)
                    rows.append((ts, 0, du,
                                 du * 1000 // ts if ts else 0))
                else:
                    raise NotImplementedError(f"no A/V decoder for {mt}")
            out = pd.DataFrame(rows, columns=[
                "sample_rate", "channels", "n_frames", "duration_ms"])
            out.insert(0, "media_type", b["media_type"].values)
            out.insert(0, "doc_id", b["doc_id"].values)
            out["n_bytes"] = b["n_bytes"].values
            yield out

    return media.mapInPandas(run, schema=AV_FEATURE_SCHEMA)


def ensure_av_fixture(spark, sf_dir: str, n_rows: int = 200) -> str:
    """Idempotent real WAV/MP4 media fixture (even doc_id → WAV, odd →
    MP4); parameters hash-derived so the oracle can re-derive them from
    the committed bytes alone."""
    import os

    from ..functions.hashing import h64_py
    from ..sources.synthetic import fixture_dir
    out = os.path.abspath(fixture_dir(sf_dir))
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "media_av.parquet")
    marker = os.path.join(out, "_DONE_media_av")
    if os.path.exists(marker):
        return path
    rows = []
    for i in range(n_rows):
        if i % 2 == 0:
            sr = 8000 + (h64_py(f"wav|{i}|sr") % 8) * 1000
            ch = 1 + h64_py(f"wav|{i}|ch") % 2
            nf = 1 + h64_py(f"wav|{i}|nf") % 500
            p = tiny_wav(sr, ch, nf, seed=i)
            rows.append((i, bytearray(p), "audio/wav", len(p)))
        else:
            ts = 1000 * (1 + h64_py(f"mp4|{i}|ts") % 90)
            du = 1 + h64_py(f"mp4|{i}|du") % (10 * ts)
            p = tiny_mp4(ts, du)
            rows.append((i, bytearray(p), "video/mp4", len(p)))
    spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(path)
    with open(marker, "w") as f:
        f.write("ok\n")
    return path


def ensure_media_fixture(spark, sf_dir: str, n_rows: int = 200) -> str:
    """Idempotent real-PNG media fixture next to the synthetic transcript
    fixtures (its own marker; oracles read the same parquet)."""
    import os

    from ..functions.hashing import h64_py
    from ..sources.synthetic import fixture_dir
    out = os.path.abspath(fixture_dir(sf_dir))
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "media_png.parquet")
    marker = os.path.join(out, "_DONE_media")
    if os.path.exists(marker):
        return path
    rows = []
    for i in range(n_rows):
        w = 1 + h64_py(f"png|{i}|w") % 32
        h = 1 + h64_py(f"png|{i}|h") % 32
        p = tiny_png(w, h, seed=i)
        rows.append((i, bytearray(p), "image/png", len(p)))
    spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(path)
    with open(marker, "w") as f:
        f.write("ok\n")
    return path


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
