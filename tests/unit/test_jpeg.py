"""Real baseline-JPEG codec (corpus/jpeg.py) + the real-media Arrow path.

Third real codec after PNG/WAV. JPEG is lossy, so round trips assert
BOUNDED reconstruction error (constant blocks are DC-only and recover
near-exactly; smooth surfaces stay within a few levels; the harness
fixture rule is wrap-free and pinned at its measured bound). The
decoder is also exercised against precise refusals for everything
outside baseline 4:4:4 scope — a crawler decodes hostile bytes."""

from __future__ import annotations

import hashlib
import struct

import pytest

from who_focus_crawler_spark.corpus.jpeg import (
    _HUFF_AC_CHROMA,
    _HUFF_AC_LUMA,
    _HUFF_DC_CHROMA,
    _HUFF_DC_LUMA,
    JpegError,
    _canonical_decoder,
    decode_jpeg,
    encode_jpeg,
)


def _max_err(a: bytes, b: bytes) -> int:
    assert len(a) == len(b)
    return max(abs(x - y) for x, y in zip(a, b))


def test_constant_gray_block_near_exact():
    """A constant block is DC-only: quantization touches one
    coefficient, so reconstruction is within a single level."""
    px = bytes([77] * 64)
    w, h, ch, out = decode_jpeg(encode_jpeg(px, 8, 8, 1))
    assert (w, h, ch) == (8, 8, 1)
    assert _max_err(px, out) <= 1


def test_constant_rgb_block_near_exact():
    px = bytes([120, 64, 200] * 64)
    w, h, ch, out = decode_jpeg(encode_jpeg(px, 8, 8, 3))
    assert (w, h, ch) == (8, 8, 3)
    assert _max_err(px, out) <= 2


@pytest.mark.parametrize("w,h", [(8, 8), (13, 11), (16, 8), (7, 3), (1, 1)])
def test_gray_gradient_bounded(w, h):
    """Smooth gradients (and edge-replicated partial blocks) stay
    within a tight bound at the Annex-K luma table."""
    px = bytes(min(255, 40 + r * 6 + c * 3) for r in range(h) for c in range(w))
    dw, dh, ch, out = decode_jpeg(encode_jpeg(px, w, h, 1))
    assert (dw, dh, ch) == (w, h, 1)
    assert _max_err(px, out) <= 12


def test_rgb_smooth_bounded():
    px = bytes(
        min(255, 30 + r * 4 + c * 3 + k * 20)
        for r in range(16) for c in range(16) for k in range(3)
    )
    w, h, ch, out = decode_jpeg(encode_jpeg(px, 16, 16, 3))
    assert (w, h, ch) == (16, 16, 3)
    assert _max_err(px, out) <= 16


def test_fixture_rule_within_tolerance():
    """The harness fixture rule (md5 byte mod 240 + r, wrap-free):
    measured max error over the sf0.01 corpus is 13; pin a sample of
    docs at the committed tolerance 24."""
    for i in range(25):
        dig = hashlib.md5(f"doc {i}".encode()).digest()
        px = bytes(dig[c % 16] % 240 + r for r in range(8) for c in range(16))
        w, h, ch, out = decode_jpeg(encode_jpeg(px, 16, 8, 1))
        assert (w, h, ch) == (16, 8, 1)
        assert _max_err(px, out) <= 24


def test_encoder_deterministic():
    px = bytes((r * 31 + c * 17) % 256 for r in range(8) for c in range(16))
    assert encode_jpeg(px, 16, 8, 1) == encode_jpeg(px, 16, 8, 1)


def test_annex_tables_are_valid_prefix_codes():
    """The four shipped Huffman specs are well-formed (counts match
    symbol lists, Kraft inequality holds) — decode correctness never
    depends on their exact identity since DHT travels in the file, but
    malformed specs would break both directions."""
    for bits, vals in (
        _HUFF_DC_LUMA, _HUFF_DC_CHROMA, _HUFF_AC_LUMA, _HUFF_AC_CHROMA,
    ):
        table = _canonical_decoder(bits, vals)
        assert len(table) == len(vals)
    assert len(_HUFF_AC_LUMA[1]) == 162
    assert len(_HUFF_AC_CHROMA[1]) == 162


def test_hostile_bytes_rejected():
    px = bytes(range(64))
    good = encode_jpeg(px, 8, 8, 1)
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"\x89PNG" + good)
    # baseline marker patched to progressive
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(JpegError, match="progressive"):
        decode_jpeg(prog)
    # DRI segment spliced in before SOS
    at = good.find(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 8)
    with pytest.raises(JpegError, match="DRI"):
        decode_jpeg(good[:at] + dri + good[at:])
    # entropy stream cut mid-MCU (SOS header is 10 bytes; +2 leaves
    # two bytes of entropy for a block that needs five)
    with pytest.raises(JpegError, match="truncated|invalid"):
        decode_jpeg(good[: at + 12])


def test_attach_jpeg_media_stats_spark(spark):
    """Distributed real-JPEG fixture → distributed real decode: every
    payload is a genuine baseline JPEG (SOI/JFIF magic + decodable
    off-Spark) and the recovered pixels sit inside the committed
    error bound vs the analytic source rule."""
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_jpeg_media,
        decode_jpeg_stats,
    )

    docs = spark.createDataFrame(
        [(i, f"jpeg doc {i}") for i in range(15)],
        "doc_id long, text string",
    )
    media = attach_jpeg_media(docs)
    for r in media.collect():
        payload = bytes(r.payload)
        assert payload[:4] == b"\xff\xd8\xff\xe0"
        assert decode_jpeg(payload)[:3] == (16, 8, 1)
    stats = decode_jpeg_stats(media).collect()
    assert len(stats) == 15
    for g in stats:
        assert (g.width, g.height, g.channels) == (16, 8, 1)
        assert g.within_tol and g.max_err <= 24


def test_decode_media_real_path_jpeg(spark):
    """decode_media(fake=False) dispatches JPEG payloads to the real
    baseline decoder: band features carry the recovered pixel sums,
    which must sit within the bound of the analytic source bands."""
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_jpeg_media,
        decode_media,
    )

    docs = spark.createDataFrame([(1, "hello jpeg")], "doc_id long, text string")
    media = attach_jpeg_media(docs).select(
        "media_id", "kind", "payload", "byte_len", "meta_json"
    )
    frames = decode_media(media, frames_per_item=2, fake=False).collect()
    assert [f.frame_idx for f in frames] == [0, 1]
    dig = hashlib.md5(b"hello jpeg").digest()
    for f, rows in zip(frames, ((0, 1, 2, 3), (4, 5, 6, 7))):
        want = sum(dig[c % 16] % 240 + r for r in rows for c in range(16))
        assert f.feature[0] == 16.0 and f.feature[1] == 8.0
        assert f.feature[3] == 64.0
        assert abs(f.feature[2] - want) <= 24 * 64
