"""Hostile-byte fuzz: decoders fail TYPED, bounded, and fast.

A crawler's media decode stage feeds on arbitrary bytes from the web.
Three properties matter and this file pins all of them on
deterministic mutation corpora (fixed seeds — reproducible):

1. TYPED failure — every malformed payload either decodes or raises
   the codec's own error class (PngError/GifError/JpegError/WavError),
   never a leaked ``struct.error`` / ``zlib.error`` / ``IndexError``
   that would crash an executor batch with an undiagnosable trace.
   (The initial fuzz of this suite FOUND four such leaks: truncated
   PNG chunk CRCs, truncated GIF image descriptors, truncated JPEG
   DHT/SOF headers, and zlib errors through PNG inflate.)
2. BOUNDED allocation — a lying IHDR/SOF0/descriptor with gigapixel
   dimensions (or a deflate bomb behind a valid-CRC IDAT) must be
   refused by the MAX_PIXELS cap / bounded inflate, not serviced with
   a multi-GB allocation before the stream inevitably runs dry.
3. FAST failure — no mutated payload may take pathologically long to
   reject (each decode is wall-clocked).
"""

from __future__ import annotations

import hashlib
import random
import struct
import time
import zlib

import pytest

from who_focus_crawler_spark.corpus.gif import GifError, decode_gif, encode_gif
from who_focus_crawler_spark.corpus.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from who_focus_crawler_spark.corpus.png import PngError, decode_png, encode_png
from who_focus_crawler_spark.corpus.wav import WavError, decode_wav, encode_wav

_PAL = bytes(
    b for i in range(16) for b in (i * 17 & 0xFF, i * 33 & 0xFF, i * 53 & 0xFF)
)
_DIG = hashlib.md5(b"fuzz corpus").digest()
_PX = bytes((_DIG[c % 16] + r) % 256 for r in range(8) for c in range(16))
_IDX = bytes((_DIG[c % 16] + r) % 16 for r in range(8) for c in range(16))
_S16 = [((_DIG[i % 16] * 257 + i * 31) % 65536) - 32768 for i in range(64)]
_PX3 = bytes((_DIG[(3 * i) % 16] + i) % 256 for i in range(16 * 16 * 3))


def _refix_png_crcs(b: bytearray) -> bytearray:
    """Recompute chunk CRCs so body mutations survive the CRC gate and
    reach the inflate / unfilter layers."""
    out = bytearray(b[:8])
    pos = 8
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", bytes(b[pos:pos + 4]))
        ctype = bytes(b[pos + 4:pos + 8])
        body = bytes(b[pos + 8:pos + 8 + ln])
        if len(body) != ln or pos + 12 + ln > len(b):
            out += b[pos:]
            break
        out += b[pos:pos + 8 + ln] + struct.pack(
            ">I", zlib.crc32(ctype + body) & 0xFFFFFFFF
        )
        pos += 12 + ln
    return out


def _mutations(good: bytes, rng: random.Random, n: int, refix=None):
    for _ in range(n):
        b = bytearray(good)
        op = rng.randrange(4 if refix else 3)
        if op == 0:
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1:
            del b[rng.randrange(1, len(b)):]
        elif op == 2:
            at = rng.randrange(len(b))
            b[at:at] = bytes(
                rng.randrange(256) for _ in range(rng.randint(1, 8))
            )
        else:
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            b = refix(b)
        yield bytes(b)


@pytest.mark.parametrize(
    "name,good,dec,err,refix",
    [
        ("png", encode_png(_PX, 16, 8), decode_png, PngError, _refix_png_crcs),
        (
            "png-pal",
            encode_png(
                _IDX, 16, 8, depth=4, palette=_PAL,
                trns=b"\x80" * 4, interlace=True,
            ),
            decode_png,
            PngError,
            _refix_png_crcs,
        ),
        (
            "gif",
            encode_gif(_IDX, 16, 8, _PAL, transparent=5, interlace=True),
            decode_gif,
            GifError,
            None,
        ),
        ("jpeg", encode_jpeg(_PX, 16, 8, 1), decode_jpeg, JpegError, None),
        (
            "jpeg-420ri",
            encode_jpeg(
                _PX3, 16, 16, 3, subsampling="420", restart_interval=1
            ),
            decode_jpeg,
            JpegError,
            None,
        ),
        (
            "jpeg-prog",
            encode_jpeg_progressive(
                _PX3, 16, 16, 3, subsampling="420", restart_interval=2
            ),
            decode_jpeg,
            JpegError,
            None,
        ),
        ("wav", encode_wav(_S16, 8000), decode_wav, WavError, None),
        (
            "wav-ext",
            encode_wav(_S16[:32], 48000, channels=2, bits=24, extensible=True),
            decode_wav,
            WavError,
            None,
        ),
    ],
)
def test_hostile_mutations_fail_typed_and_fast(name, good, dec, err, refix):
    rng = random.Random(20260821)
    for payload in _mutations(good, rng, 1200, refix):
        t0 = time.time()
        try:
            dec(payload)
        except err:
            pass  # the contract: the codec's OWN error class
        assert time.time() - t0 < 2.0, f"{name}: slow reject"


def test_gigapixel_headers_refused_without_allocation():
    """Lying geometry headers hit the pixel cap immediately."""
    # PNG: 60000x60000 gray IHDR with a valid CRC
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    t0 = time.time()
    with pytest.raises(PngError, match="pixel cap"):
        decode_png(png)
    # JPEG: SOF0 declaring 60000x60000
    good = bytearray(encode_jpeg(_PX, 16, 8, 1))
    at = good.find(b"\xff\xc0")
    struct.pack_into(">HH", good, at + 5, 60000, 60000)
    with pytest.raises(JpegError, match="pixel cap"):
        decode_jpeg(bytes(good))
    # GIF: canvas and descriptor both 60000x60000
    g = bytearray(encode_gif(_IDX, 16, 8, _PAL))
    struct.pack_into("<HH", g, 6, 60000, 60000)
    d = g.find(b"\x2c", 13 + 48)
    struct.pack_into("<HH", g, d + 5, 60000, 60000)
    with pytest.raises(GifError, match="pixel cap"):
        decode_gif(bytes(g))
    assert time.time() - t0 < 2.0  # refused, not serviced


def test_png_deflate_bomb_bounded():
    """A valid-CRC IDAT that inflates far past the image's stated size
    is stopped by the bounded inflate, not materialized."""
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * (32 * 1024 * 1024), 9)  # 32 MB of zeros

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    t0 = time.time()
    with pytest.raises(PngError, match="inflated size"):
        decode_png(data)
    assert time.time() - t0 < 2.0
