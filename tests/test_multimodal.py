"""Real PNG/JPEG header parsing + decode fallback contract."""

from __future__ import annotations

import pytest

from usc_ds_relationextraction_spark.operators.multimodal import (
    _decode_one, parse_jpeg_dims, parse_png_dims, tiny_jpeg_header,
    tiny_png)


def test_png_roundtrip_dims():
    for w, h in [(1, 1), (17, 5), (255, 31), (300, 2)]:
        assert parse_png_dims(tiny_png(w, h, seed=w)) == (w, h)


def test_png_is_valid_zlib():
    import struct
    import zlib
    p = tiny_png(7, 3, seed=1)
    # IDAT payload decompresses to height*(1+width) filtered scanlines
    idat_at = p.index(b"IDAT")
    ln = struct.unpack(">I", p[idat_at - 4:idat_at])[0]
    raw = zlib.decompress(p[idat_at + 4:idat_at + 4 + ln])
    assert len(raw) == 3 * (1 + 7)


def test_jpeg_header_dims():
    for w, h in [(1, 1), (640, 480), (65535, 1)]:
        assert parse_jpeg_dims(tiny_jpeg_header(w, h)) == (w, h)


def test_jpeg_walks_past_non_frame_segments():
    import struct
    # insert a DHT (C4: no dims) and a comment before the SOF0
    hdr = tiny_jpeg_header(99, 44)
    soi, rest = hdr[:2], hdr[2:]
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x01"
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    assert parse_jpeg_dims(soi + dht + com + rest) == (99, 44)


def test_parsers_reject_non_media():
    assert parse_png_dims(b"not a png at all, just text") is None
    assert parse_jpeg_dims(b"plain text") is None
    assert parse_png_dims(b"") is None
    assert parse_jpeg_dims(b"\xff\xd8") is None  # SOI only


def test_decode_one_real_beats_fallback():
    png = tiny_png(12, 34, seed=9)
    w, h, frames, _ = _decode_one(png, "image/png")
    assert (w, h, frames) == (12, 34, 1)
    jpg = tiny_jpeg_header(56, 78)
    w, h, frames, _ = _decode_one(jpg, "image/jpeg")
    assert (w, h, frames) == (56, 78, 1)


def test_decode_one_fallback_and_contract():
    # non-media payload labeled as image: deterministic hash fallback
    w, h, frames, luma = _decode_one(b"just text", "image/png")
    assert 64 <= w < 256 and 64 <= h < 256 and frames == 1
    assert 0 <= luma <= 255
    with pytest.raises(NotImplementedError):
        _decode_one(b"x", "model/gltf")

def test_wav_roundtrip_meta():
    from usc_ds_relationextraction_spark.operators.multimodal import (
        parse_wav_meta, tiny_wav)
    for sr, ch, nf in [(8000, 1, 1), (44100, 2, 500), (16000, 2, 37)]:
        assert parse_wav_meta(tiny_wav(sr, ch, nf, seed=nf)) == (sr, ch, nf)


def test_wav_walks_past_extra_chunks():
    import struct
    from usc_ds_relationextraction_spark.operators.multimodal import (
        parse_wav_meta, tiny_wav)
    # splice a LIST chunk (odd size -> word-align padding) before fmt
    p = tiny_wav(22050, 1, 9, seed=3)
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = p[:12] + lst + p[12:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    assert parse_wav_meta(spliced) == (22050, 1, 9)


def test_wav_rejects_short_fmt_chunk():
    import struct
    from usc_ds_relationextraction_spark.operators.multimodal import (
        parse_wav_meta)
    # fmt declares sz=4 (< the 16-byte PCM minimum): the old fixed-offset
    # read would decode the following data chunk's header bytes as
    # sample_rate/block_align and return garbage instead of None
    body = (b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
            + b"data" + struct.pack("<I", 8) + b"\x00" * 8)
    p = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert parse_wav_meta(p) is None


def test_mp4_roundtrip_meta():
    from usc_ds_relationextraction_spark.operators.multimodal import (
        parse_mp4_meta, tiny_mp4)
    for ts, du in [(1000, 1), (90000, 123456), (600, 0)]:
        assert parse_mp4_meta(tiny_mp4(ts, du)) == (ts, du)


def test_mp4_mvhd_v1():
    import struct
    from usc_ds_relationextraction_spark.operators.multimodal import (
        parse_mp4_meta)
    mvhd = (struct.pack(">I", 120) + b"mvhd" + b"\x01\x00\x00\x00"
            + struct.pack(">QQIQ", 0, 0, 48000, 7 * 48000)
            + b"\x00" * 80)
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    assert parse_mp4_meta(ftyp + moov) == (48000, 7 * 48000)


def test_av_parsers_reject_non_media():
    from usc_ds_relationextraction_spark.operators.multimodal import (
        parse_mp4_meta, parse_wav_meta)
    assert parse_wav_meta(b"RIFFxxxx") is None
    assert parse_wav_meta(b"plain text that is long enough") is None
    assert parse_mp4_meta(b"\x00\x00\x00\x08free") is None
    assert parse_mp4_meta(b"") is None


def test_decode_one_av():
    from usc_ds_relationextraction_spark.operators.multimodal import (
        _decode_one, tiny_mp4, tiny_wav)
    w, h, frames, _ = _decode_one(tiny_wav(8000, 2, 41), "audio/wav")
    assert (w, h, frames) == (0, 0, 41)
    w, h, frames, _ = _decode_one(tiny_mp4(90000, 777), "video/mp4")
    assert (w, h, frames) == (0, 0, 777)
