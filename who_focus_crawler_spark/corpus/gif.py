"""Real GIF decode (and a deterministic LZW encoder), stdlib-only.

The classic web-image trio is PNG (corpus/png.py), JPEG
(corpus/jpeg.py) and GIF — and GIF needs no external codec either:
a byte-level container (logical screen descriptor, color tables,
sub-block chains) plus LZW with variable code width, both plain
bit-twiddling. This module implements real LZW in both directions, so
every image format a 1990s-to-today crawl actually archives decodes
for real; corpus/multimodal.py's NotImplementedError now covers only
video and compressed audio.

Scope: GIF87a/GIF89a, global and local color tables, interlaced and
progressive row order, transparency via the 89a Graphic Control
Extension (decoded as RGBA), first image of an animation (the
standard thumbnail semantics). Malformed containers, LZW code
overflows and truncated sub-block chains raise ``GifError`` with a
precise message — a crawler decodes hostile bytes.

The encoder exists for deterministic fixtures and round-trip proofs:
genuine variable-width LZW (dictionary growth, CLEAR on table
overflow), optional interlace and transparency, no extensions beyond
the GCE — byte-identical across runs and machines.
"""

from __future__ import annotations

import struct

__all__ = ["GifError", "decode_gif", "encode_gif"]

# interlace passes: (row offset, row step) in order
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))
# hostile-byte DoS guard (see corpus/png.py MAX_PIXELS)
MAX_PIXELS = 1 << 26


class GifError(ValueError):
    """Malformed or out-of-scope GIF."""


# ------------------------------------------------------------------- LZW
def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """Variable-width LZW per the GIF spec: codes are packed LSB-first;
    CLEAR resets the dictionary, END terminates; the code width grows
    when the next dictionary slot crosses a power of two (max 12)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # dictionary as bytes entries; rebuilt on CLEAR
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise GifError("LZW stream ended without END code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise GifError(f"first LZW code {code} not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError(f"LZW code {code} beyond table {len(table)}")
        if len(table) == (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
        if len(out) > n_pixels:
            raise GifError(
                f"LZW produced {len(out)} pixels for a {n_pixels}-pixel image"
            )
    if len(out) != n_pixels:
        raise GifError(f"LZW produced {len(out)} of {n_pixels} pixels")
    return bytes(out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Genuine variable-width LZW (not the uncompressed-GIF trick):
    dictionary of index strings, CLEAR emitted when the table reaches
    4096 entries, width grows with the table exactly as the decoder
    expects."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = end + 1
    emit(clear)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            # decoder widens when its table len hits 1<<width; its table
            # lags ours by one entry, hence the +1 alignment
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = fresh()
            next_code = end + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------------ codec
def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse + LZW-decode + deinterlace + palette-expand the FIRST
    image: returns (width, height, channels, pixels) row-major 8-bit,
    RGB — or RGBA when the 89a Graphic Control Extension declares a
    transparent index."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("bad GIF signature")
    if len(data) < 13:
        raise GifError("truncated logical screen descriptor")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct: bytes | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos:pos + 3 * n]
        if len(gct) != 3 * n:
            raise GifError("truncated global color table")
        pos += 3 * n
    transparent = -1
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise GifError("no image data before trailer")
        if block == 0x21:  # extension
            if pos >= len(data):
                raise GifError("truncated extension")
            label = data[pos]
            pos += 1
            sub: list[bytes] = []
            while True:
                if pos >= len(data):
                    raise GifError("truncated extension sub-blocks")
                n = data[pos]
                pos += 1
                if n == 0:
                    break
                sub.append(data[pos:pos + n])
                if len(sub[-1]) != n:
                    raise GifError("truncated extension sub-block")
                pos += n
            if label == 0xF9 and sub:  # Graphic Control Extension
                gce = sub[0]
                if len(gce) >= 4 and gce[0] & 0x01:
                    transparent = gce[3]
            continue
        if block != 0x2C:
            raise GifError(f"unknown block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise GifError("truncated image descriptor")
        left, top, w, h, ipack = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        if w < 1 or h < 1:
            raise GifError("empty image descriptor")
        if w * h > MAX_PIXELS:
            raise GifError(f"image {w}x{h} exceeds decoder pixel cap")
        if left or top or w != sw or h != sh:
            # partial-canvas frames only matter for animation composition
            raise GifError(
                "image does not cover the canvas (animation sub-frame)"
            )
        ct = gct
        if ipack & 0x80:
            n = 2 << (ipack & 0x07)
            ct = data[pos:pos + 3 * n]
            if len(ct) != 3 * n:
                raise GifError("truncated local color table")
            pos += 3 * n
        if ct is None:
            raise GifError("no color table (neither global nor local)")
        interlaced = bool(ipack & 0x40)
        if pos >= len(data):
            raise GifError("missing LZW minimum code size")
        mcs = data[pos]
        pos += 1
        # the GIF spec caps the color table at 256 entries, so a
        # well-formed minimum code size is at most 8 (ADVICE r4:
        # 9-11 are only producible by hostile input — reject early)
        if not 2 <= mcs <= 8:
            raise GifError(f"LZW minimum code size {mcs} out of range")
        lzw = bytearray()
        while True:
            if pos >= len(data):
                raise GifError("truncated image sub-blocks")
            n = data[pos]
            pos += 1
            if n == 0:
                break
            chunk = data[pos:pos + n]
            if len(chunk) != n:
                raise GifError("truncated image sub-block")
            lzw += chunk
            pos += n
        indices = _lzw_decode(bytes(lzw), mcs, w * h)
        if interlaced:
            rows = []
            for off, step in _INTERLACE:
                rows.extend(range(off, h, step))
            deinter = bytearray(w * h)
            for src, dst in enumerate(rows):
                deinter[dst * w:(dst + 1) * w] = indices[src * w:(src + 1) * w]
            indices = bytes(deinter)
        n_entries = len(ct) // 3
        ch = 4 if transparent >= 0 else 3
        out = bytearray(w * h * ch)
        o = 0
        for idx in indices:
            if idx >= n_entries:
                raise GifError(
                    f"color index {idx} out of range ({n_entries} entries)"
                )
            p = idx * 3
            out[o:o + 3] = ct[p:p + 3]
            if ch == 4:
                out[o + 3] = 0 if idx == transparent else 255
            o += ch
        return w, h, ch, bytes(out)
    raise GifError("missing image descriptor")


def encode_gif(
    indices: bytes,
    width: int,
    height: int,
    palette: bytes,
    *,
    transparent: int = -1,
    interlace: bool = False,
) -> bytes:
    """Deterministic GIF89a encoder (fixtures + round-trip proofs):
    one image, global color table, genuine variable-width LZW; no
    extensions except the GCE when ``transparent`` names an index.
    ``palette`` is raw RGB triples (padded to a power-of-two entry
    count); ``indices`` one color index per pixel, row-major."""
    if len(indices) != width * height:
        raise GifError(f"index buffer {len(indices)} != {width * height}")
    if len(palette) % 3 or not palette:
        raise GifError(f"palette length {len(palette)} not a positive ×3")
    n_entries = len(palette) // 3
    if n_entries > 256:
        raise GifError(f"palette {n_entries} entries > 256")
    bits = max(1, (n_entries - 1).bit_length())
    full = 3 * (1 << bits)
    table = palette + b"\x00" * (full - len(palette))
    mcs = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    out += table
    if transparent >= 0:
        if transparent >= n_entries:
            raise GifError(f"transparent index {transparent} out of range")
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    if interlace:
        rows = []
        for off, step in _INTERLACE:
            rows.extend(range(off, height, step))
        indices = b"".join(
            indices[r * width:(r + 1) * width] for r in rows
        )
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height,
                       0x40 if interlace else 0)
    out += bytes([mcs])
    lzw = _lzw_encode(indices, mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
