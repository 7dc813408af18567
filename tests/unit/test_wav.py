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
        # format tag 3 = IEEE float PCM
        (lambda d: d[:20] + b"\x03" + d[21:], "format tag"),
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
