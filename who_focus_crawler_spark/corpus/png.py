"""Real PNG decode (and a deterministic encoder), stdlib-only.

The container ships no image codecs (no PIL/ffmpeg — SURVEY.md probe
P5), but PNG needs nothing beyond ``zlib``: 8-byte signature, chunked
container with CRC-32, IHDR geometry, concatenated IDAT streams
deflate-compressed, and five per-scanline byte filters (None/Sub/Up/
Average/Paeth). This module implements that — so ONE real media format
is decoded end-to-end through the engine's Arrow batch plumbing with
REAL pixel data, while formats that genuinely need external codecs
(JPEG entropy coding, video) keep the explicit NotImplementedError in
corpus/multimodal.py.

Scope: bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced — the layouts a crawler actually emits when
archiving decoded thumbnails. Palette (type 3), 1/2/4/16-bit depths
and Adam7 raise ``PngError`` with a precise message.

The encoder exists for deterministic fixtures and round-trip proofs:
fixed zlib level, no ancillary chunks, and a selectable per-row filter
cycle so tests exercise every unfilter path against real compressed
bytes.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed or out-of-scope PNG."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse + inflate + unfilter: returns (width, height, channels,
    pixels) with ``pixels`` laid out row-major, ``channels`` bytes per
    pixel. Chunk CRCs are verified (a crawler decodes hostile bytes)."""
    if data[:8] != _SIG:
        raise PngError("bad PNG signature")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    seen_ihdr = seen_iend = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise PngError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise PngError(f"bit depth {depth} unsupported (8 only)")
            if color not in _CHANNELS:
                raise PngError(
                    f"color type {color} unsupported (palette needs PLTE)"
                )
            if comp != 0 or filt != 0:
                raise PngError("non-standard compression/filter method")
            if interlace != 0:
                raise PngError("Adam7 interlacing unsupported")
            channels = _CHANNELS[color]
            seen_ihdr = True
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped by the loop
    if not (seen_ihdr and seen_iend and idat):
        raise PngError("missing IHDR/IDAT/IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise PngError(
            f"inflated size {len(raw)} != {(stride + 1) * height}"
        )
    bpp = channels
    out = bytearray(stride * height)
    prev_off = -1
    for r in range(height):
        ft = raw[r * (stride + 1)]
        line_off = r * (stride + 1) + 1
        o = r * stride
        if ft == 0:
            out[o:o + stride] = raw[line_off:line_off + stride]
        elif ft == 1:  # Sub
            for i in range(stride):
                a = out[o + i - bpp] if i >= bpp else 0
                out[o + i] = (raw[line_off + i] + a) & 0xFF
        elif ft == 2:  # Up
            if prev_off < 0:
                out[o:o + stride] = raw[line_off:line_off + stride]
            else:
                for i in range(stride):
                    out[o + i] = (raw[line_off + i] + out[prev_off + i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = out[o + i - bpp] if i >= bpp else 0
                b = out[prev_off + i] if prev_off >= 0 else 0
                out[o + i] = (raw[line_off + i] + ((a + b) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = out[o + i - bpp] if i >= bpp else 0
                b = out[prev_off + i] if prev_off >= 0 else 0
                c = out[prev_off + i - bpp] if (prev_off >= 0 and i >= bpp) else 0
                out[o + i] = (raw[line_off + i] + _paeth(a, b, c)) & 0xFF
        else:
            raise PngError(f"unknown filter type {ft} on row {r}")
        prev_off = o
    return width, height, channels, bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    filter_cycle: tuple[int, ...] = (0, 1, 2, 3, 4),
) -> bytes:
    """Deterministic encoder (fixtures + round-trip proofs): bit depth
    8, color type from ``channels``, zlib level 6, zero ancillary
    chunks — byte-identical across runs and machines. ``filter_cycle``
    assigns row r the filter ``filter_cycle[r % len]``, so a cycle of
    all five exercises every decoder unfilter path in one image."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngError(f"pixel buffer {len(pixels)} != {stride * height}")
    bpp = channels
    lines = bytearray()
    for r in range(height):
        ft = filter_cycle[r % len(filter_cycle)]
        o = r * stride
        po = o - stride
        lines.append(ft)
        for i in range(stride):
            x = pixels[o + i]
            a = pixels[o + i - bpp] if i >= bpp else 0
            b = pixels[po + i] if r > 0 else 0
            c = pixels[po + i - bpp] if (r > 0 and i >= bpp) else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = x - a
            elif ft == 2:
                v = x - b
            elif ft == 3:
                v = x - ((a + b) >> 1)
            elif ft == 4:
                v = x - _paeth(a, b, c)
            else:
                raise PngError(f"bad filter {ft}")
            lines.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _chunk(b"IEND", b"")
    )
