"""Real baseline-JPEG codec (corpus/jpeg.py) + the real-media Arrow path.

Third real codec after PNG/WAV. JPEG is lossy, so round trips assert
BOUNDED reconstruction error (constant blocks are DC-only and recover
near-exactly; smooth surfaces stay within a few levels; the harness
fixture rule is wrap-free and pinned at its measured bound). Round 5
extends scope to chroma subsampling (4:2:0/4:2:2/4:4:0) and DRI/RSTn
restart intervals, and late round 5 adds FULL progressive (SOF2)
decode — spectral selection + successive approximation — pinned by
BIT-IDENTITY against the baseline decode of the same source (same
quantized coefficients ⇒ same pixels, a far stronger oracle than a
tolerance). The decoder is still exercised against precise refusals
for arithmetic coding / 12-bit — a crawler decodes hostile bytes."""

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
    # baseline marker patched to progressive: SOF2 now DECODES (round
    # 5), but a baseline scan header is malformed under progressive
    # rules (a DC scan with Se=63) — still a TYPED rejection
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(JpegError, match="Se=0|band|scan"):
        decode_jpeg(prog)
    # arithmetic coding stays a precise refusal
    arith = good.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(JpegError, match="arithmetic"):
        decode_jpeg(arith)
    at = good.find(b"\xff\xda")
    # a one-MCU image never reaches a restart boundary, so a spliced
    # DRI is harmless — it must now DECODE (round 5 added DRI/RSTn)
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 8)
    assert decode_jpeg(good[:at] + dri + good[at:])[:3] == (8, 8, 1)
    # but a multi-MCU stream whose declared interval promises RSTn
    # that never arrive is a typed desync rejection
    big = encode_jpeg(bytes(range(128)) + bytes(range(128)), 16, 16, 1)
    at16 = big.find(b"\xff\xda")
    dri1 = b"\xff\xdd" + struct.pack(">HH", 4, 1)
    with pytest.raises(JpegError, match="desync|truncated|invalid"):
        decode_jpeg(big[:at16] + dri1 + big[at16:])
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


# ------------------------------------------------------------- round 5:
# chroma subsampling (4:2:0 / 4:2:2 / 4:4:0) + DRI/RSTn restart
# intervals — the real web's dominant JPEG layout.

def _rgb_rule(seed: bytes, w: int, h: int) -> bytes:
    """The 4:2:0 fixture rule: luma from md5 bytes (wrap-free), chroma
    tint constant within each 2×2 group so box-downsample +
    replication-upsample are exact."""
    dig = hashlib.md5(seed).digest()
    px = bytearray()
    for r in range(h):
        for c in range(w):
            v = dig[c % 16] % 200 + r
            t = ((r // 2) + (c // 2)) * 2
            px += bytes((v, v, min(255, v + t)))
    return bytes(px)


@pytest.mark.parametrize("sub", ["420", "422", "440"])
@pytest.mark.parametrize("w,h", [(16, 16), (17, 13), (1, 1), (33, 9)])
def test_subsampled_round_trip_bounded(sub, w, h):
    """Subsampled encodes decode within the quantization bound at
    every edge-case geometry (partial MCUs on both axes, 1×1)."""
    px = _rgb_rule(f"{sub}-{w}x{h}".encode(), w, h)
    dw, dh, ch, out = decode_jpeg(encode_jpeg(px, w, h, 3, subsampling=sub))
    assert (dw, dh, ch) == (w, h, 3)
    assert _max_err(px, out) <= 16


def test_420_wire_format_declares_sampling_factors():
    """The 4:2:0 stream really carries 0x22/0x11 sampling factors in
    SOF0 (not a 4:4:4 stream in disguise) and is SMALLER than the
    4:4:4 encode of the same pixels — the entire point of
    subsampling."""
    px = _rgb_rule(b"wire", 32, 32)
    b420 = encode_jpeg(px, 32, 32, 3, subsampling="420")
    b444 = encode_jpeg(px, 32, 32, 3)
    at = b420.find(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) nc(1), then id/samp/qt per comp
    assert b420[at + 11] == 0x22  # Y: 2x2
    assert b420[at + 14] == 0x11  # Cb: 1x1
    assert b420[at + 17] == 0x11  # Cr: 1x1
    assert len(b420) < len(b444)


@pytest.mark.parametrize("ri", [1, 2, 3, 7])
def test_restart_interval_round_trip(ri):
    """DRI/RSTn streams decode identically to their source bound; the
    wire carries a DRI segment and (for small intervals) real RSTn
    markers with cyclic indices."""
    px = _rgb_rule(b"restart", 32, 32)
    b = encode_jpeg(px, 32, 32, 3, subsampling="420", restart_interval=ri)
    assert b.find(b"\xff\xdd") != -1
    w, h, ch, out = decode_jpeg(b)
    assert (w, h, ch) == (32, 32, 3)
    assert _max_err(px, out) <= 16


def test_restart_dc_reset_is_load_bearing():
    """Corrupting one RSTn index desyncs the modulo-8 sequence and
    must be a TYPED, immediate rejection (no resync scan)."""
    px = _rgb_rule(b"desync", 32, 32)
    b = encode_jpeg(px, 32, 32, 3, subsampling="420", restart_interval=1)
    at = b.find(b"\xff\xd0", b.find(b"\xff\xda"))
    assert at != -1
    bad = b[:at + 1] + b"\xd5" + b[at + 2:]
    with pytest.raises(JpegError, match="desync"):
        decode_jpeg(bad)


def test_fill_bytes_and_standalone_markers_accepted():
    """T.81 B.1.1.2: 0xFF fill bytes may pad before any marker, and
    TEM (0x01) is a standalone length-less marker — both were
    misparsed as length-bearing segments before round 5 (ADVICE r4)."""
    good = encode_jpeg(bytes(range(64)), 8, 8, 1)
    at = good.find(b"\xff\xdb")
    assert decode_jpeg(good[:at] + b"\xff\xff\xff" + good[at:])[:3] == (8, 8, 1)
    assert decode_jpeg(good[:at] + b"\xff\x01" + good[at:])[:3] == (8, 8, 1)
    # a stray RSTn between segments is standalone too
    assert decode_jpeg(good[:at] + b"\xff\xd3" + good[at:])[:3] == (8, 8, 1)


def test_attach_jpeg420_media_stats_spark(spark):
    """Distributed 4:2:0 fixture → distributed real decode: payloads
    carry SOF0 sampling factors 0x22 + a DRI segment, and recovered
    RGB sits inside the committed bound vs the analytic rule."""
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_jpeg420_media,
        decode_jpeg420_stats,
    )

    docs = spark.createDataFrame(
        [(i, f"jpeg420 doc {i}") for i in range(12)],
        "doc_id long, text string",
    )
    media = attach_jpeg420_media(docs)
    for r in media.collect():
        payload = bytes(r.payload)
        assert payload[:4] == b"\xff\xd8\xff\xe0"
        assert payload.find(b"\xff\xdd") != -1
        assert decode_jpeg(payload)[:3] == (16, 16, 3)
    stats = decode_jpeg420_stats(media).collect()
    assert len(stats) == 12
    for g in stats:
        assert (g.width, g.height, g.channels) == (16, 16, 3)
        assert g.within_tol and g.max_err <= 28


def test_refusal_classifier_categories(spark):
    """classify_media_refusals maps the six-way fixture to its frozen
    categories — arithmetic-coded JPEG is 'unsupported:jpeg-feature',
    never 'malformed:jpeg' (progressive DECODES since round 5 and so
    left the refusal taxonomy)."""
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_refusal_media,
        classify_media_refusals,
    )

    docs = spark.createDataFrame(
        [(i, f"refusal doc {i}") for i in range(12)],
        "doc_id long, text string",
    )
    rows = classify_media_refusals(attach_refusal_media(docs)).collect()
    got = {int(r.media_id[1:]) % 6: (r.fmt, r.refusal) for r in rows}
    assert got[0] == ("png", "ok")
    assert got[1] == ("jpeg", "ok")
    assert got[2] == ("jpeg", "unsupported:jpeg-feature")
    assert got[3] == ("wav", "ok")
    assert got[4] == ("mp4", "unsupported:video")
    assert got[5] == ("ogg", "unsupported:compressed-audio")


# ------------------------------------------------------------- round 5b:
# full progressive (SOF2). The oracle is EXACT: both encoders quantize
# identically, so the progressive stream must decode to pixels
# bit-identical to the baseline stream's.

def test_progressive_bit_identical_to_baseline():
    from who_focus_crawler_spark.corpus.jpeg import encode_jpeg_progressive

    for w, h in [(8, 8), (16, 16), (17, 13), (1, 1), (33, 9)]:
        for ch, subs in ((1, ["444"]), (3, ["444", "420", "422"])):
            for sub in subs:
                for ri in (0, 2):
                    if ch == 1:
                        dig = hashlib.md5(f"{w}x{h}".encode()).digest()
                        px = bytes(
                            dig[c % 16] % 240 + r
                            for r in range(h) for c in range(w)
                        )
                    else:
                        px = _rgb_rule(f"p{w}x{h}{sub}".encode(), w, h)
                    base = decode_jpeg(
                        encode_jpeg(
                            px, w, h, ch, subsampling=sub,
                            restart_interval=ri,
                        )
                    )
                    prog = decode_jpeg(
                        encode_jpeg_progressive(
                            px, w, h, ch, subsampling=sub,
                            restart_interval=ri,
                        )
                    )
                    assert base == prog, (w, h, ch, sub, ri)


def test_progressive_bit_identical_on_hostile_content():
    """Noise/stripes/checkerboards drive long zero runs, ZRL inside
    refinement scans, multi-block EOB runs and dense coefficients —
    every entropy path of Annex G, still bit-identical."""
    import random

    from who_focus_crawler_spark.corpus.jpeg import encode_jpeg_progressive

    rnd = random.Random(20260821)
    for _ in range(15):
        w, hgt = rnd.randrange(1, 41), rnd.randrange(1, 41)
        ch = rnd.choice([1, 3])
        sub = "444" if ch == 1 else rnd.choice(["444", "420", "440"])
        ri = rnd.choice([0, 1, 3])
        kind = rnd.choice(["noise", "stripes", "checker"])
        n = w * hgt * ch
        if kind == "noise":
            px = bytes(rnd.randrange(256) for _ in range(n))
        elif kind == "stripes":
            px = bytes(255 if (i // ch // w) % 2 else 0 for i in range(n))
        else:
            px = bytes(
                255 if ((i // ch) % w + (i // ch) // w) % 2 else 0
                for i in range(n)
            )
        a = decode_jpeg(
            encode_jpeg(px, w, hgt, ch, subsampling=sub, restart_interval=ri)
        )
        b = decode_jpeg(
            encode_jpeg_progressive(
                px, w, hgt, ch, subsampling=sub, restart_interval=ri
            )
        )
        assert a == b, (w, hgt, ch, sub, ri, kind)


def test_progressive_wire_format():
    """The stream really is progressive: SOF2 marker, multiple SOS
    segments (DC first + DC refine + per-comp AC first + AC refine),
    and the refinement scans carry successive-approximation Ah/Al."""
    from who_focus_crawler_spark.corpus.jpeg import encode_jpeg_progressive

    px = _rgb_rule(b"wirefmt", 16, 16)
    b = encode_jpeg_progressive(px, 16, 16, 3, subsampling="420")
    assert b.find(b"\xff\xc2") != -1 and b.find(b"\xff\xc0") == -1
    assert b.count(b"\xff\xda") == 8  # 2 DC + 3 AC-first + 3 AC-refine
