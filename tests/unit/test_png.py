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
    # illegal depth/color combos are rejected loudly (4-bit RGB)
    ihdr4rgb = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    bad = SIG + struct.pack(">I", 13) + b"IHDR" + ihdr4rgb + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr4rgb) & 0xFFFFFFFF
    )
    with pytest.raises(PngError, match="bit depth"):
        decode_png(bad)


_PAL = bytes(
    b for i in range(16) for b in (i * 17 & 0xFF, i * 33 & 0xFF, i * 53 & 0xFF)
)
_TRNS = bytes(255 - i * 16 for i in range(16))


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (5, 3), (8, 8), (13, 11)])
@pytest.mark.parametrize("ch", [1, 3, 4])
def test_adam7_equals_progressive(w, h, ch):
    """Adam7 decode reproduces the same pixels as the non-interlaced
    encoding of the same image — including sizes below one 8×8 tile,
    where several passes are EMPTY and must consume no stream bytes."""
    px = _px(w, h, ch, lambda r, c, k: (r + 1) * (c + 3) * (k + 7))
    assert decode_png(encode_png(px, w, h, channels=ch, interlace=True)) == (
        w, h, ch, px,
    )


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_sub_byte_gray_scales_to_full_range(depth):
    """1/2/4-bit grayscale unpacks MSB-first and scales by
    255/(2^depth-1) — so 1-bit decodes to exactly {0, 255}."""
    mx = (1 << depth) - 1
    vals = bytes((r + c) % (mx + 1) for r in range(5) for c in range(9))
    got = decode_png(encode_png(vals, 9, 5, depth=depth))
    assert got == (9, 5, 1, bytes(v * 255 // mx for v in vals))


def test_16bit_high_byte_reduction():
    """16-bit samples (gray and RGB) reduce to the high byte — the
    standard 8-bit approximation of v·255/65535."""
    for ch in (1, 3):
        vals = [
            ((r * 4099 + c * 259 + k * 33) * 97) & 0xFFFF
            for r in range(4) for c in range(6) for k in range(ch)
        ]
        buf = b"".join(struct.pack(">H", v) for v in vals)
        assert decode_png(encode_png(buf, 6, 4, channels=ch, depth=16)) == (
            6, 4, ch, bytes(v >> 8 for v in vals),
        )


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_palette_expansion(depth):
    """Indexed color at every legal depth expands through PLTE to RGB;
    out-of-range indices are impossible by construction here, so the
    result is the exact palette triple per pixel."""
    n = min(16, 1 << depth)
    pal = _PAL[:n * 3]
    idx = bytes((r * 7 + c) % n for r in range(6) for c in range(10))
    got = decode_png(encode_png(idx, 10, 6, depth=depth, palette=pal))
    want = bytes(b for i in idx for b in pal[i * 3:i * 3 + 3])
    assert got == (10, 6, 3, want)


def test_palette_trns_alpha_and_short_trns():
    """tRNS adds a per-entry alpha channel (RGBA output); entries past
    the tRNS length default to opaque 255."""
    idx = bytes((r + c) % 16 for r in range(8) for c in range(16))
    full = decode_png(
        encode_png(idx, 16, 8, depth=4, palette=_PAL, trns=_TRNS)
    )
    assert full[:3] == (16, 8, 4)
    want = bytes(
        b
        for i in idx
        for b in (_PAL[i * 3], _PAL[i * 3 + 1], _PAL[i * 3 + 2], _TRNS[i])
    )
    assert full[3] == want
    short = decode_png(
        encode_png(idx, 16, 8, depth=4, palette=_PAL, trns=_TRNS[:4])
    )
    for i, v in enumerate(idx):
        assert short[3][i * 4 + 3] == (_TRNS[v] if v < 4 else 255)


def test_palette_adam7_combined():
    """The harness fixture shape: 4-bit palette + tRNS + Adam7 + the
    all-five filter cycle, decoded against the analytic rule."""
    idx = bytes((r * 3 + c) % 16 for r in range(8) for c in range(16))
    data = encode_png(
        idx, 16, 8, depth=4, palette=_PAL, trns=_TRNS, interlace=True
    )
    w, h, ch, px = decode_png(data)
    assert (w, h, ch) == (16, 8, 4)
    want = bytes(
        b
        for i in idx
        for b in (_PAL[i * 3], _PAL[i * 3 + 1], _PAL[i * 3 + 2], _TRNS[i])
    )
    assert px == want


def test_palette_and_trns_errors():
    idx = bytes(16)
    with pytest.raises(PngError, match="illegal"):
        encode_png(idx, 4, 4, depth=16, palette=_PAL)
    with pytest.raises(PngError, match="tRNS"):
        encode_png(idx, 4, 4, channels=1, trns=b"\x00")
    # palette image whose PLTE chunk is missing
    data = bytearray(encode_png(idx, 4, 4, depth=8, palette=_PAL[:48]))
    plte_at = data.find(b"PLTE") - 4
    (plen,) = struct.unpack(">I", data[plte_at:plte_at + 4])
    del data[plte_at:plte_at + 12 + plen]
    with pytest.raises(PngError, match="missing PLTE"):
        decode_png(bytes(data))
    # index beyond the palette: 8-bit index 200 into a 16-entry PLTE
    hot = bytearray(idx)
    hot[5] = 200
    with pytest.raises(PngError, match="out of range"):
        decode_png(encode_png(bytes(hot), 4, 4, depth=8, palette=_PAL))


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

    # JPEG is real now (corpus/jpeg.py) — the refusal path belongs to
    # formats that genuinely need external codecs, e.g. Ogg Vorbis
    ogg = spark.createDataFrame(
        [("o1", b"OggS\x00\x02 not a real stream")],
        "media_id string, payload binary",
    )
    with pytest.raises(Exception, match="external codecs|NotImplementedError"):
        decode_media(ogg, fake=False).collect()


def test_attach_palette_media_full_stats_spark(spark):
    """Distributed palette/Adam7 fixture → distributed full decode: the
    RGBA pixel sum AND the position-weighted sum equal the analytic
    rule (the weighted sum is what a wrong deinterlace would break),
    and the payloads are genuine interlaced palette PNGs."""
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_png_palette_media,
        decode_png_full_stats,
    )

    docs = spark.createDataFrame(
        [(i, f"palette doc {i}") for i in range(12)],
        "doc_id long, text string",
    )
    media = attach_png_palette_media(docs)
    for r in media.collect():
        payload = bytes(r.payload)
        assert payload[:8] == SIG
        assert payload[28] == 1  # IHDR interlace byte (sig+len+type+12)
        assert b"PLTE" in payload and b"tRNS" in payload
    got = {r.media_id: r for r in decode_png_full_stats(media).collect()}
    import hashlib

    for i in range(12):
        dig = hashlib.md5(f"palette doc {i}".encode()).digest()
        tot = wtot = 0
        for r in range(8):
            for c in range(16):
                v = (dig[c] + r) % 16
                s = (
                    v * 17
                    + (v * 33) % 256
                    + (v * 53) % 256
                    + 255
                    - v * 16
                )
                tot += s
                wtot += (r * 16 + c + 1) * s
        g = got[f"m{i}"]
        assert (
            g.width, g.height, g.channels, g.pixel_sum, g.weighted_sum
        ) == (16, 8, 4, tot, wtot)
