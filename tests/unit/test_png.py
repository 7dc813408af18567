"""Real PNG decode (corpus/png.py) + the real-media Arrow path.

The decoder is exercised against genuine compressed bytes: round trips
through every filter type and color layout, an INDEPENDENTLY
hand-assembled PNG (struct+zlib in the test, not the encoder under
test), hostile-byte rejections, and the Spark-side fixture/decode pair
whose pixel rule is analytic."""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.png import (
    PngError,
    decode_png,
    encode_png,
)

SIG = b"\x89PNG\r\n\x1a\n"


def _px(w, h, ch, fn):
    return bytes(fn(r, c, k) & 0xFF for r in range(h) for c in range(w) for k in range(ch))


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_round_trip_each_filter(ft):
    px = _px(11, 7, 1, lambda r, c, k: r * 31 + c * 17)
    data = encode_png(px, 11, 7, channels=1, filter_cycle=(ft,))
    assert decode_png(data) == (11, 7, 1, px)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_round_trip_color_layouts_all_filters(ch):
    px = _px(9, 10, ch, lambda r, c, k: (r + 1) * (c + 3) * (k + 7))
    data = encode_png(px, 9, 10, channels=ch)  # cycles 0..4
    assert decode_png(data) == (9, 10, ch, px)


def test_decode_hand_assembled_png():
    """A PNG built in the test with raw struct/zlib — independent of
    encode_png — decodes to the stated pixels (2x2 gray, Up filter on
    row 1)."""
    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    # pixels: row0 = [10, 20]; row1 = [30, 40]
    raw = bytes([0, 10, 20]) + bytes([2, 20, 20])  # row1 Up-filtered
    data = (
        SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert decode_png(data) == (2, 2, 1, bytes([10, 20, 30, 40]))


def test_ancillary_chunks_skipped():
    px = _px(4, 4, 1, lambda r, c, k: r * 4 + c)
    data = encode_png(px, 4, 4)
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = 8 + 12 + 13
    body = b"comment\x00hello"
    text = (
        struct.pack(">I", len(body)) + b"tEXt" + body
        + struct.pack(">I", zlib.crc32(b"tEXt" + body) & 0xFFFFFFFF)
    )
    spliced = data[:ihdr_end] + text + data[ihdr_end:]
    assert decode_png(spliced) == (4, 4, 1, px)


def test_hostile_bytes_rejected():
    px = _px(4, 4, 1, lambda r, c, k: c)
    good = encode_png(px, 4, 4)
    with pytest.raises(PngError, match="signature"):
        decode_png(b"GIF89a" + good)
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # inside IDAT body → CRC check fires
    with pytest.raises(PngError, match="CRC"):
        decode_png(bytes(corrupt))
    with pytest.raises(PngError, match="truncated|missing"):
        decode_png(good[:-20])
    # 16-bit depth and Adam7 are out of scope, loudly
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = SIG + struct.pack(">I", 13) + b"IHDR" + ihdr16 + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr16) & 0xFFFFFFFF
    )
    with pytest.raises(PngError, match="bit depth"):
        decode_png(bad)


def test_attach_and_decode_png_stats_spark(spark):
    """Distributed real-PNG fixture → distributed real decode: the
    recovered pixel sums equal the analytic rule, and the payloads are
    genuine PNGs (magic + decodable off-Spark)."""
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_png_media,
        decode_png_stats,
    )

    docs = spark.createDataFrame(
        [(i, f"document body {i}") for i in range(20)],
        "doc_id long, text string",
    )
    media = attach_png_media(docs)
    rows = media.collect()
    assert all(bytes(r.payload)[:8] == SIG for r in rows)
    got = {r.media_id: r for r in decode_png_stats(media).collect()}
    import hashlib

    for i in range(20):
        dig = hashlib.md5(f"document body {i}".encode()).digest()
        want = sum((dig[c] + r) % 256 for r in range(8) for c in range(16))
        g = got[f"m{i}"]
        assert (g.width, g.height, g.channels, g.pixel_sum) == (16, 8, 1, want)


def test_decode_media_real_path_png_and_refusal(spark):
    """decode_media(fake=False): PNG payloads produce band features
    from REAL pixels; a JPEG payload raises NotImplementedError."""
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_png_media,
        decode_media,
    )

    docs = spark.createDataFrame([(1, "hello png")], "doc_id long, text string")
    media = attach_png_media(docs)
    frames = decode_media(media, frames_per_item=2, fake=False).collect()
    assert [f.frame_idx for f in frames] == [0, 1]
    import hashlib

    dig = hashlib.md5(b"hello png").digest()
    sums = [
        float(sum((dig[c] + r) % 256 for r in rows for c in range(16)))
        for rows in ((0, 1, 2, 3), (4, 5, 6, 7))
    ]
    for f, want in zip(frames, sums):
        assert f.feature == [16.0, 8.0, want, 64.0]

    jpeg = spark.createDataFrame(
        [("j1", b"\xff\xd8\xff\xe0 not really")], "media_id string, payload binary"
    )
    with pytest.raises(Exception, match="PNG only|NotImplementedError"):
        decode_media(jpeg, fake=False).collect()
