"""Real PNG decode (and a deterministic encoder), stdlib-only.

The container ships no image codecs (no PIL/ffmpeg — SURVEY.md probe
P5), but PNG needs nothing beyond ``zlib``: 8-byte signature, chunked
container with CRC-32, IHDR geometry, concatenated IDAT streams
deflate-compressed, and five per-scanline byte filters (None/Sub/Up/
Average/Paeth). This module implements that — so ONE real media format
is decoded end-to-end through the engine's Arrow batch plumbing with
REAL pixel data, while formats that genuinely need external codecs
(video, compressed audio) keep the explicit NotImplementedError in
corpus/multimodal.py (baseline JPEG is real too — corpus/jpeg.py).

Scope (completed round 4): ALL static-PNG layouts — color types 0
(gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); bit depths
1/2/4/8/16 in their per-type legal combinations; PLTE palette expansion
with optional tRNS alpha; and Adam7 interlacing (each of the seven
passes is an independently filtered sub-image). Decoded output is
always 8-bit samples: 16-bit inputs reduce to the high byte (the
standard 8-bit approximation, v >> 8), sub-byte grayscale scales by
255/(2^depth - 1), palette indices expand to RGB (RGBA when tRNS is
present). Animated PNG is out of scope (acTL/fcTL are ancillary and
skipped; the decode yields the static IDAT image, which is what the
spec mandates for APNG-unaware readers).

The encoder exists for deterministic fixtures and round-trip proofs:
fixed zlib level, no ancillary chunks beyond an optional tRNS, and a
selectable per-row filter cycle so tests exercise every unfilter path
against real compressed bytes. It covers the same layouts the decoder
does (palette, sub-byte, 16-bit, Adam7).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
# hostile-byte DoS guard: a lying IHDR (or a deflate bomb) must not make
# the decoder allocate gigabytes before any consistency check fires —
# the same reason libpng ships default memory limits and browsers cap
# decoded dimensions. 2^26 pixels = 256 MB of RGBA, far above any
# fixture and most real thumbnails/page images.
MAX_PIXELS = 1 << 26
# samples per pixel BEFORE palette expansion (a palette pixel is one
# index sample; expansion to RGB(A) happens after unfiltering)
_RAW_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_LEGAL_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}
# Adam7 pass geometry: (x_off, y_off, x_step, y_step), spec §8.2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


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


def _segments(
    width: int, height: int, interlace: int
) -> tuple[tuple[int, int, int, int, int, int], ...]:
    """Image segments as (x_off, y_off, x_step, y_step, w, h): one
    full-frame segment when non-interlaced, else the non-empty Adam7
    passes in order. Each segment's scanlines are filtered
    independently (the filter context resets at every pass)."""
    if interlace == 0:
        return ((0, 0, 1, 1, width, height),)
    if interlace != 1:
        raise PngError(f"interlace method {interlace} invalid")
    segs = []
    for xo, yo, xs, ys in _ADAM7:
        w = (width - xo + xs - 1) // xs
        h = (height - yo + ys - 1) // ys
        if w > 0 and h > 0:
            segs.append((xo, yo, xs, ys, w, h))
    return tuple(segs)


def _unfilter(
    raw: bytes, pos: int, stride: int, bpp: int, height: int
) -> tuple[bytearray, int]:
    """Reverse the five per-scanline filters over one independently
    filtered segment (the whole image, or one Adam7 pass) starting at
    ``pos`` in the inflated stream. ``bpp`` is the filter's byte
    distance (max(1, channels*depth//8) — sub-byte rows filter at
    distance 1 per the spec). Returns (unfiltered packed rows, next
    read position)."""
    need = (stride + 1) * height
    if pos + need > len(raw):
        raise PngError(
            f"inflated size {len(raw)} < {pos + need} for segment at {pos}"
        )
    out = bytearray(stride * height)
    prev_off = -1
    for r in range(height):
        ft = raw[pos + r * (stride + 1)]
        line_off = pos + r * (stride + 1) + 1
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
    return out, pos + need


def _row_samples(
    rows: bytearray, r: int, stride: int, width: int, channels: int, depth: int
) -> bytes:
    """Per-pixel raw sample values (one byte each) for one unfiltered
    packed scanline: depth 8 is the identity, depth 16 takes the high
    byte (≈ v*255/65535), sub-byte depths unpack MSB-first. Sub-byte
    values stay in 0..2^depth-1 here — grayscale scaling and palette
    lookup happen after the scatter."""
    row = rows[r * stride:(r + 1) * stride]
    n = width * channels
    if depth == 8:
        return bytes(row[:n])
    if depth == 16:
        return bytes(row[2 * i] for i in range(n))
    per = 8 // depth
    mask = (1 << depth) - 1
    return bytes(
        (row[x // per] >> (8 - depth * (x % per + 1))) & mask for x in range(n)
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse + inflate + unfilter (+ deinterlace + palette-expand):
    returns (width, height, channels, pixels) with ``pixels`` laid out
    row-major, ``channels`` bytes per pixel, 8-bit samples. Chunk CRCs
    are verified (a crawler decodes hostile bytes)."""
    if data[:8] != _SIG:
        raise PngError("bad PNG signature")
    pos = 8
    width = height = depth = color = interlace = -1
    idat = bytearray()
    plte: bytes | None = None
    trns: bytes | None = None
    seen_ihdr = seen_iend = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise PngError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            if len(body) != 13:
                raise PngError(f"IHDR length {len(body)} != 13")
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if color not in _RAW_CHANNELS:
                raise PngError(f"color type {color} invalid")
            if depth not in _LEGAL_DEPTHS[color]:
                raise PngError(
                    f"bit depth {depth} illegal for color type {color}"
                )
            if comp != 0 or filt != 0:
                raise PngError("non-standard compression/filter method")
            if width < 1 or height < 1:
                raise PngError(f"empty image {width}x{height}")
            if width * height > MAX_PIXELS:
                raise PngError(
                    f"image {width}x{height} exceeds decoder pixel cap"
                )
            seen_ihdr = True
        elif ctype == b"PLTE":
            if length % 3 or length == 0:
                raise PngError(f"PLTE length {length} not a positive ×3")
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, acTL, ...) are skipped
    if not (seen_ihdr and seen_iend and idat):
        raise PngError("missing IHDR/IDAT/IEND")
    if color == 3 and plte is None:
        raise PngError("palette image missing PLTE")
    if trns is not None and color != 3:
        # gray/RGB tRNS (a single transparent color) is a different
        # mechanism; refuse loudly rather than silently dropping alpha
        raise PngError(f"tRNS for color type {color} unsupported")
    rc = _RAW_CHANNELS[color]
    segs = _segments(width, height, interlace)
    expected = sum(
        ((w * rc * depth + 7) // 8 + 1) * h for *_, w, h in segs
    )
    try:
        # bounded inflate: a deflate bomb stops at expected+1 bytes
        # instead of materializing its full output
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as e:  # hostile bytes must fail TYPED
        raise PngError(f"IDAT inflate failed: {e}")
    samples = bytearray(width * height * rc)
    pos = 0
    for xo, yo, xs, ys, w, h in segs:
        stride = (w * rc * depth + 7) // 8
        bpp = max(1, rc * depth // 8)
        rows, pos = _unfilter(raw, pos, stride, bpp, h)
        for j in range(h):
            vals = _row_samples(rows, j, stride, w, rc, depth)
            base = (yo + j * ys) * width * rc
            for i in range(w):
                off = base + (xo + i * xs) * rc
                samples[off:off + rc] = vals[i * rc:(i + 1) * rc]
    if pos != len(raw):
        raise PngError(f"inflated size {len(raw)} != {pos}")
    if color == 3:
        n_entries = len(plte) // 3
        alpha = None
        if trns is not None:
            if len(trns) > n_entries:
                raise PngError(
                    f"tRNS has {len(trns)} entries > palette {n_entries}"
                )
            alpha = trns + b"\xff" * (n_entries - len(trns))
        ch = 3 if alpha is None else 4
        out = bytearray(width * height * ch)
        o = 0
        for idx in samples:
            if idx >= n_entries:
                raise PngError(
                    f"palette index {idx} out of range ({n_entries} entries)"
                )
            p = idx * 3
            out[o:o + 3] = plte[p:p + 3]
            if alpha is not None:
                out[o + 3] = alpha[idx]
            o += ch
        return width, height, ch, bytes(out)
    if depth in (1, 2, 4):
        mx = (1 << depth) - 1
        return width, height, 1, bytes(v * 255 // mx for v in samples)
    return width, height, rc, bytes(samples)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _pack_row(vals: list[int], depth: int) -> bytes:
    """Pack per-pixel sample values into a scanline at ``depth`` bits
    per sample, MSB-first, final partial byte zero-padded."""
    if depth == 8:
        for v in vals:
            if not 0 <= v <= 255:
                raise PngError(f"sample {v} exceeds 8-bit range")
        return bytes(vals)
    per = 8 // depth
    mask = (1 << depth) - 1
    out = bytearray((len(vals) + per - 1) // per)
    for x, v in enumerate(vals):
        if v > mask:
            raise PngError(f"sample {v} exceeds {depth}-bit range")
        out[x // per] |= (v & mask) << (8 - depth * (x % per + 1))
    return bytes(out)


def _filter_rows(
    rows: list[bytes], bpp: int, filter_cycle: tuple[int, ...]
) -> bytearray:
    """Apply the per-row filter cycle to one segment's packed
    scanlines; the previous-row context starts empty (segments —
    passes — are filtered independently)."""
    out = bytearray()
    for r, row in enumerate(rows):
        ft = filter_cycle[r % len(filter_cycle)]
        prev = rows[r - 1] if r > 0 else None
        out.append(ft)
        for i, x in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i] if prev is not None else 0
            c = prev[i - bpp] if (prev is not None and i >= bpp) else 0
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
            out.append(v & 0xFF)
    return out


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    filter_cycle: tuple[int, ...] = (0, 1, 2, 3, 4),
    *,
    depth: int = 8,
    palette: bytes | None = None,
    trns: bytes | None = None,
    interlace: bool = False,
) -> bytes:
    """Deterministic encoder (fixtures + round-trip proofs): zlib level
    6, no ancillary chunks (beyond tRNS when given) — byte-identical
    across runs and machines. ``filter_cycle`` assigns row r of each
    segment the filter ``filter_cycle[r % len]``, so a cycle of all
    five exercises every decoder unfilter path in one image.

    Layouts: ``palette`` (raw RGB triples, ≤ 2^depth entries) switches
    to color type 3 with ``pixels`` holding ONE INDEX PER BYTE
    (pre-packing; depth 1/2/4/8); otherwise color type follows
    ``channels`` (1/2/3/4 → gray/GA/RGB/RGBA). ``depth`` 1/2/4 is
    grayscale-or-palette only with one sample value per input byte;
    ``depth`` 16 expects big-endian sample PAIRS in ``pixels``.
    ``interlace`` emits Adam7 passes (independently filtered)."""
    if palette is not None:
        color = 3
        if len(palette) % 3 or not palette:
            raise PngError(f"palette length {len(palette)} not a positive ×3")
        if len(palette) // 3 > (1 << depth):
            raise PngError(
                f"palette {len(palette) // 3} entries > 2^{depth}"
            )
    else:
        color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
        if trns is not None:
            raise PngError(f"tRNS for color type {color} unsupported")
    if depth not in _LEGAL_DEPTHS[color]:
        raise PngError(f"bit depth {depth} illegal for color type {color}")
    rc = _RAW_CHANNELS[color]
    bps = 2 if depth == 16 else 1  # input bytes per sample
    expect = width * height * rc * bps
    if len(pixels) != expect:
        raise PngError(f"pixel buffer {len(pixels)} != {expect}")
    bpp = max(1, rc * depth // 8)
    stream = bytearray()
    for xo, yo, xs, ys, w, h in _segments(
        width, height, 1 if interlace else 0
    ):
        rows = []
        for j in range(h):
            y = yo + j * ys
            if depth == 16:
                row = b"".join(
                    pixels[((y * width + xo + i * xs) * rc + k) * 2:
                           ((y * width + xo + i * xs) * rc + k) * 2 + 2]
                    for i in range(w)
                    for k in range(rc)
                )
            else:
                row = _pack_row(
                    [
                        pixels[(y * width + xo + i * xs) * rc + k]
                        for i in range(w)
                        for k in range(rc)
                    ],
                    depth,
                )
            rows.append(row)
        stream += _filter_rows(rows, bpp, filter_cycle)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color, 0, 0, 1 if interlace else 0
    )
    out = _SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette)
        if trns is not None:
            out += _chunk(b"tRNS", trns)
    return out + _chunk(b"IDAT", zlib.compress(bytes(stream), 6)) + _chunk(
        b"IEND", b""
    )
