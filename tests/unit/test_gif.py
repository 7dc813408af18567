"""Real GIF codec (corpus/gif.py) + the real-media Arrow path.

Fourth real codec: genuine variable-width LZW in both directions
(width growth to 12 bits, CLEAR on table overflow), interlace row
permutation, GCE transparency, hostile-byte refusals, and the
Spark-side fixture/decode pair whose index rule is analytic."""

from __future__ import annotations

import hashlib
import random
import struct

import pytest

from who_focus_crawler_spark.corpus.gif import (
    GifError,
    decode_gif,
    encode_gif,
)

_PAL = bytes(
    b for i in range(16) for b in (i * 17 & 0xFF, i * 33 & 0xFF, i * 53 & 0xFF)
)


def _expand(idx: bytes, pal: bytes) -> bytes:
    return bytes(b for i in idx for b in pal[i * 3:i * 3 + 3])


def test_round_trip_plain():
    idx = bytes((r + c) % 16 for r in range(8) for c in range(16))
    assert decode_gif(encode_gif(idx, 16, 8, _PAL)) == (
        16, 8, 3, _expand(idx, _PAL),
    )


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (16, 8), (13, 11), (5, 17)])
def test_interlaced_equals_progressive(w, h):
    """The 4-pass interlace is a pure row permutation: decoding the
    interlaced encoding must equal the progressive one at every
    size, including heights smaller than the first pass stride."""
    idx = bytes((r * 3 + c) % 16 for r in range(h) for c in range(w))
    assert decode_gif(encode_gif(idx, w, h, _PAL, interlace=True)) == (
        decode_gif(encode_gif(idx, w, h, _PAL))
    )


def test_transparency_rgba():
    idx = bytes((r + c) % 16 for r in range(8) for c in range(16))
    w, h, ch, px = decode_gif(encode_gif(idx, 16, 8, _PAL, transparent=5))
    assert ch == 4
    for i, v in enumerate(idx):
        assert px[i * 4 + 3] == (0 if v == 5 else 255)
        assert px[i * 4:i * 4 + 3] == _PAL[v * 3:v * 3 + 3]


def test_lzw_width_growth_and_clear_cycles():
    """A 30k-pixel random 256-color image forces the LZW width from 9
    through 12 bits and multiple CLEAR/table-rebuild cycles; the round
    trip must still be exact."""
    pal = bytes((i * 7 + j) & 0xFF for i in range(256) for j in range(3))
    rng = random.Random(42)
    idx = bytes(rng.randrange(256) for _ in range(200 * 150))
    assert decode_gif(encode_gif(idx, 200, 150, pal)) == (
        200, 150, 3, _expand(idx, pal),
    )


def test_two_entry_palette_min_code_size_floor():
    """1-bit images still use the spec's minimum LZW code size of 2."""
    p2 = b"\x00\x00\x00\xff\xff\xff"
    idx = bytes((r ^ c) & 1 for r in range(9) for c in range(7))
    data = encode_gif(idx, 7, 9, p2)
    assert decode_gif(data) == (7, 9, 3, _expand(idx, p2))


def test_encoder_deterministic():
    idx = bytes((r * 5 + c) % 16 for r in range(8) for c in range(16))
    assert encode_gif(idx, 16, 8, _PAL, interlace=True) == encode_gif(
        idx, 16, 8, _PAL, interlace=True
    )


def test_hostile_bytes_rejected():
    idx = bytes((r + c) % 16 for r in range(8) for c in range(16))
    good = encode_gif(idx, 16, 8, _PAL)
    with pytest.raises(GifError, match="signature"):
        decode_gif(b"NOTGIF" + good[6:])
    with pytest.raises(GifError, match="truncated"):
        decode_gif(b"GIF89a" + b"\x00" * 5)
    with pytest.raises(GifError):
        decode_gif(good[: len(good) // 2])
    # trailer with no image
    bare = good[:13 + 48] + b"\x3b"
    with pytest.raises(GifError, match="trailer"):
        decode_gif(bare)
    # animation sub-frame (image smaller than the canvas) refuses
    sub = bytearray(good)
    at = sub.index(0x2C, 13 + 48)
    struct.pack_into("<HH", sub, at + 5, 8, 4)  # shrink w,h fields
    with pytest.raises(GifError, match="canvas|pixels"):
        decode_gif(bytes(sub))


def test_encoder_validation():
    with pytest.raises(GifError, match="index buffer"):
        encode_gif(b"\x00" * 10, 4, 4, _PAL)
    with pytest.raises(GifError, match="palette"):
        encode_gif(b"\x00" * 16, 4, 4, b"\x00\x01")
    with pytest.raises(GifError, match="transparent"):
        encode_gif(b"\x00" * 16, 4, 4, _PAL, transparent=99)


def test_attach_gif_media_full_stats_spark(spark):
    """Distributed interlaced-GIF fixture → distributed real LZW
    decode: RGBA pixel sum AND position-weighted sum equal the
    analytic rule (the weighted sum is what a wrong deinterlace row
    permutation would break)."""
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_gif_media,
        decode_gif_full_stats,
    )

    docs = spark.createDataFrame(
        [(i, f"gif doc {i}") for i in range(12)],
        "doc_id long, text string",
    )
    media = attach_gif_media(docs)
    for r in media.collect():
        payload = bytes(r.payload)
        assert payload[:6] == b"GIF89a"
        assert payload[13 + 48 + 8 + 9] & 0x40  # interlace flag set
    got = {r.media_id: r for r in decode_gif_full_stats(media).collect()}
    for i in range(12):
        dig = hashlib.md5(f"gif doc {i}".encode()).digest()
        tot = wtot = 0
        for r in range(8):
            for c in range(16):
                v = (dig[c] + r) % 16
                s = (
                    v * 17 + (v * 33) % 256 + (v * 53) % 256
                    + (0 if v == 5 else 255)
                )
                tot += s
                wtot += (r * 16 + c + 1) * s
        g = got[f"m{i}"]
        assert (
            g.width, g.height, g.channels, g.pixel_sum, g.weighted_sum
        ) == (16, 8, 4, tot, wtot)


def test_decode_media_real_path_gif(spark):
    """decode_media(fake=False) dispatches GIF payloads to the real
    LZW decoder: band features carry exact RGBA sums per band."""
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_gif_media,
        decode_media,
    )

    docs = spark.createDataFrame([(1, "hello gif")], "doc_id long, text string")
    media = attach_gif_media(docs)
    frames = decode_media(media, frames_per_item=2, fake=False).collect()
    assert [f.frame_idx for f in frames] == [0, 1]
    dig = hashlib.md5(b"hello gif").digest()
    for f, rows in zip(frames, ((0, 1, 2, 3), (4, 5, 6, 7))):
        want = sum(
            (lambda v: v * 17 + (v * 33) % 256 + (v * 53) % 256
             + (0 if v == 5 else 255))((dig[c] + r) % 16)
            for r in rows for c in range(16)
        )
        assert f.feature == [16.0, 8.0, float(want), 256.0]
