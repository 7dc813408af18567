"""Real WAV decode (corpus/wav.py) + the real-media Arrow path.

Audio twin of test_png.py: round trips through both bit depths and
multi-channel layouts, an INDEPENDENTLY hand-assembled RIFF clip
(struct in the test, not the encoder under test), hostile-byte
rejections, and the Spark-side fixture/decode pair whose sample rule
is analytic."""

from __future__ import annotations

import hashlib
import struct

import pytest

from who_focus_crawler_spark.corpus.wav import (
    WavError,
    decode_wav,
    encode_wav,
)


def _rule(text: str, n: int = 64) -> list[int]:
    dig = hashlib.md5(text.encode()).digest()
    return [((dig[i % 16] * 257 + i * 31) % 65536) - 32768 for i in range(n)]


@pytest.mark.parametrize("bits", [8, 16])
@pytest.mark.parametrize("channels", [1, 2, 4])
def test_round_trip_layouts(bits, channels):
    lo, hi = (0, 255) if bits == 8 else (-32768, 32767)
    samples = [
        (lo + (i * 7919) % (hi - lo + 1)) for i in range(channels * 9)
    ]
    data = encode_wav(samples, 22050, channels=channels, bits=bits)
    assert decode_wav(data) == (22050, channels, bits, samples)


def test_extreme_values_round_trip():
    s = [0, -1, 32767, -32768, 1, -2]
    assert decode_wav(encode_wav(s, 44100, channels=2))[3] == s


@pytest.mark.parametrize("bits", [24, 32])
@pytest.mark.parametrize("channels", [1, 2, 6])
def test_round_trip_deep_int_layouts(bits, channels):
    """24-bit (packed 3-byte) and 32-bit signed PCM round-trip,
    including both range extremes."""
    lo = -(1 << (bits - 1))
    hi = (1 << (bits - 1)) - 1
    samples = [lo, hi] + [
        ((i * 7919263) % (hi - lo + 1)) + lo for i in range(channels * 9 - 2)
    ]
    data = encode_wav(samples, 48000, channels=channels, bits=bits)
    assert decode_wav(data) == (48000, channels, bits, samples)


@pytest.mark.parametrize("bits", [32, 64])
def test_round_trip_float_layouts(bits):
    """IEEE float PCM (format tag 3) with a mandatory fact chunk —
    values chosen exactly representable at float32."""
    samples = [0.5, -0.25, 1.0, -1.0, 0.0, 0.125, 2.0, -0.0625]
    data = encode_wav(samples, 96000, channels=2, bits=bits, float_fmt=True)
    assert b"fact" in data
    assert decode_wav(data) == (96000, 2, bits, samples)


@pytest.mark.parametrize("float_fmt,bits", [(False, 24), (False, 16), (True, 32)])
def test_extensible_wrapping(float_fmt, bits):
    """WAVE_FORMAT_EXTENSIBLE resolves the effective tag from the
    SubFormat GUID; the outer tag is 0xFFFE and the payload round-trips
    identically to the plain-tag encoding."""
    if float_fmt:
        samples = [0.5, -0.5, 0.25, -1.0]
    else:
        lo = -(1 << (bits - 1))
        samples = [lo, -lo - 1, 0, 42]
    data = encode_wav(
        samples, 44100, channels=2, bits=bits,
        float_fmt=float_fmt, extensible=True,
    )
    assert struct.unpack("<H", data[20:22])[0] == 0xFFFE
    plain = encode_wav(
        samples, 44100, channels=2, bits=bits, float_fmt=float_fmt
    )
    assert decode_wav(data) == decode_wav(plain)


def test_extensible_guid_and_depth_errors():
    bad = bytearray(
        encode_wav([1, 2, 3, 4], 8000, channels=2, bits=24, extensible=True)
    )
    g = bad.find(b"\xaa\x00\x38\x9b\x71")
    bad[g] ^= 0xFF
    with pytest.raises(WavError, match="GUID"):
        decode_wav(bytes(bad))
    with pytest.raises(WavError, match="float"):
        encode_wav([1], 8000, bits=24, float_fmt=True)
    mp3 = bytearray(encode_wav([1, 2], 8000))
    struct.pack_into("<H", mp3, 20, 85)  # WAVE_FORMAT_MPEGLAYER3
    with pytest.raises(WavError, match="format tag 85"):
        decode_wav(bytes(mp3))


def test_decode_hand_assembled_wav():
    """A RIFF clip built in the test with raw struct — independent of
    encode_wav — decodes to the stated samples, with an unknown LIST
    chunk and an odd-sized data chunk (pad byte) in the walk."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    frames = bytes([1, 2, 3])  # odd length -> RIFF pad byte
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 4) + b"INFO"  # skipped chunk
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 3) + frames + b"\x00"
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_wav(data) == (8000, 1, 8, [1, 2, 3])


def test_signed_16bit_little_endian():
    """-2 stored LE as FE FF: the unpack must be signed and LE."""
    data = encode_wav([-2], 8000, channels=1, bits=16)
    assert data[-2:] == b"\xfe\xff"
    assert decode_wav(data)[3] == [-2]


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda d: b"", "signature"),
        (lambda d: b"RIFX" + d[4:], "signature"),
        (lambda d: d[:4] + struct.pack("<I", 10**9) + d[8:], "exceeds"),
        # cut inside the fmt body (RIFF size patched to stay in range)
        (
            lambda d: d[:4] + struct.pack("<I", 22) + d[8:30],
            "truncated",
        ),
        # format tag 2 = ADPCM (compressed — still refused)
        (lambda d: d[:20] + b"\x02" + d[21:], "format tag"),
        # tag 3 (float) is now supported — but never at 16 bits
        (lambda d: d[:20] + b"\x03" + d[21:], "float PCM"),
        # bits 24 unsupported
        (lambda d: d[:34] + b"\x18" + d[35:], "bit depth|block align"),
        # drop the final byte of the final 16-bit frame (RIFF + data
        # sizes patched consistently): data is no longer whole frames
        (
            lambda d: d[:4] + struct.pack("<I", len(d) - 9) + d[8:40]
            + struct.pack("<I", len(d) - 45) + d[44:-1],
            "whole number",
        ),
    ],
)
def test_hostile_bytes_rejected(mutate, msg):
    good = encode_wav(list(range(-8, 8)), 8000, channels=1, bits=16)
    with pytest.raises(WavError, match=msg):
        decode_wav(mutate(good))


def test_missing_chunks_rejected():
    with pytest.raises(WavError, match="missing fmt"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    with pytest.raises(WavError, match="missing data"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_encoder_rejects_partial_frames():
    with pytest.raises(WavError, match="whole number"):
        encode_wav([1, 2, 3], 8000, channels=2)


def test_attach_and_decode_wav_stats_spark(spark):
    """Distributed real-WAV fixture → distributed real decode: the
    recovered sample sums equal the analytic rule, and the payloads
    are genuine RIFF clips (magic + decodable off-Spark)."""
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_wav_media,
        decode_wav_stats,
    )

    docs = spark.createDataFrame(
        [(i, f"document body {i}") for i in range(20)],
        "doc_id long, text string",
    )
    media = attach_wav_media(docs)
    rows = media.collect()
    for r in rows:
        p = bytes(r.payload)
        assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
        assert decode_wav(p)[:3] == (8000, 1, 16)
    got = {r.media_id: r for r in decode_wav_stats(media).collect()}
    for i in range(20):
        want = sum(_rule(f"document body {i}"))
        g = got[f"m{i}"]
        assert (
            g.sample_rate, g.channels, g.bits, g.n_samples, g.sample_sum
        ) == (8000, 1, 16, 64, want)


def test_decode_media_real_path_wav(spark):
    """decode_media(fake=False): WAV payloads produce time-band
    features from REAL samples through the same mapInArrow path as
    PNG — mixed-format media tables dispatch per payload."""
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_wav_media,
        decode_media,
    )

    docs = spark.createDataFrame(
        [(1, "hello wav")], "doc_id long, text string"
    )
    media = attach_wav_media(docs)
    frames = decode_media(media, frames_per_item=2, fake=False).collect()
    assert [f.frame_idx for f in frames] == [0, 1]
    s = _rule("hello wav")
    for f, band in zip(frames, (s[:32], s[32:])):
        assert f.feature == [8000.0, 64.0, float(sum(band)), 32.0]


def test_attach_wav24_media_full_stats_spark(spark):
    """Distributed extensible-24-bit fixture → distributed full decode:
    sample sum AND position-weighted sum equal the analytic rule (the
    weighted sum is what a wrong interleave or 3-byte unpack would
    break), and the payloads are genuine WAVE_FORMAT_EXTENSIBLE RIFF."""
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_wav24_media,
        decode_wav_full_stats,
    )

    docs = spark.createDataFrame(
        [(i, f"studio clip {i}") for i in range(10)],
        "doc_id long, text string",
    )
    media = attach_wav24_media(docs)
    for r in media.collect():
        payload = bytes(r.payload)
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        assert struct.unpack("<H", payload[20:22])[0] == 0xFFFE
    got = {r.media_id: r for r in decode_wav_full_stats(media).collect()}
    for i in range(10):
        dig = hashlib.md5(f"studio clip {i}".encode()).digest()
        vals = [
            ((dig[j % 16] * 65793 + j * 4099) % (1 << 24)) - (1 << 23)
            for j in range(128)
        ]
        g = got[f"m{i}"]
        assert (
            g.sample_rate, g.channels, g.bits, g.n_samples,
            g.sample_sum, g.weighted_sum,
        ) == (
            48000, 2, 24, 128,
            sum(vals), sum((j + 1) * v for j, v in enumerate(vals)),
        )
