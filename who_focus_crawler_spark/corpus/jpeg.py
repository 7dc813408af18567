"""Real baseline-JPEG decode (and a deterministic encoder), stdlib-only.

PNG (corpus/png.py) and WAV (corpus/wav.py) made lossless image and
audio real; this module makes the web's dominant LOSSY image format
real. Baseline sequential JPEG (ITU-T T.81) needs no external codec —
only arithmetic: marker segments, quantization tables, canonical
Huffman entropy coding with 0xFF byte stuffing, zigzag scan, 8×8
DCT/IDCT, and YCbCr↔RGB conversion. All of that is ~arithmetic over
``struct``-parsed bytes, implemented here; what stays behind the
explicit NotImplementedError in corpus/multimodal.py is now only
video and compressed audio (entropy formats that genuinely need
ffmpeg-class decoders).

Scope: baseline DCT (SOF0) AND full progressive (SOF2 — spectral
selection + successive approximation, DC/AC first and refinement
scans, EOB-run coding; round 5), 8-bit precision, grayscale or YCbCr
with ARBITRARY per-component sampling factors 1–4 (so 4:4:4, 4:2:2,
4:4:0 and the real web's dominant 4:2:0 all decode), and DRI/RSTn
restart intervals with typed, bounded desync rejection. Arithmetic
coding, hierarchical modes and 12-bit precision raise ``JpegError``
with a precise message — a crawler decodes hostile bytes and must say
exactly why it refused. The marker walk follows T.81 B.1.1.2: any
number of 0xFF fill bytes may precede a marker, and TEM (0x01) plus
stray RSTn are standalone (length-less) markers.

JPEG is lossy, so round-trip equality is bounded, not exact: the
decoder recovers pixels within a quantization-error bound of the
encoder's input (tests pin the empirical bound; the harness oracle
states the bound as value-exact booleans, the same pattern as the HLL
error-bound queries). Subsampled chroma adds a second bounded step:
the encoder box-averages each hmax×vmax pixel group and the decoder
replicates the recovered sample back — exact whenever chroma is
constant within the group (the 4:2:0 fixture's source rule guarantees
that by construction, so its bound stays quantization-only). Both
directions are deterministic — same bytes in, same bytes out across
runs (the only float dependency is libm's cosine of 64 fixed angles
plus IEEE-754 arithmetic, so in practice across machines too; the
bounded-error contract is robust to a last-ulp platform difference
regardless).

The Huffman tables written by the encoder follow the T.81 Annex K
layout; correctness does not depend on that choice, because the
decoder always rebuilds its codes from the DHT segments in the file
itself (any well-formed prefix code round-trips).
"""

from __future__ import annotations

import math
import struct

__all__ = [
    "JpegError",
    "decode_jpeg",
    "encode_jpeg",
    "encode_jpeg_progressive",
]

# hostile-byte DoS guard (see corpus/png.py MAX_PIXELS): a lying SOF0
# must not make the decoder allocate per-pixel float planes for
# gigapixel dimensions before the entropy stream inevitably runs dry
MAX_PIXELS = 1 << 26


class JpegError(ValueError):
    """Malformed or out-of-scope JPEG."""


# ----------------------------------------------------------------- tables
# zigzag scan order, generated (not transcribed): anti-diagonal d = r+c,
# even diagonals walk bottom-left→top-right, odd ones the reverse
_ZIGZAG: list[int] = []
for _d in range(15):
    _rng = range(max(0, _d - 7), min(_d, 7) + 1)
    for _r in (reversed(_rng) if _d % 2 == 0 else _rng):
        _ZIGZAG.append(_r * 8 + (_d - _r))
del _d, _rng, _r

# T.81 Annex K base quantization tables (quality ~50), row-major
_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# DCT basis: _COS[u][x] = cos((2x+1)uπ/16); _C[u] = 1/√2 for u=0 else 1
_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7


def _fdct_1d(v: list[float]) -> list[float]:
    return [
        0.5 * _C[u] * sum(v[x] * _COS[u][x] for x in range(8))
        for u in range(8)
    ]


def _idct_1d(f: list[float]) -> list[float]:
    return [
        sum(0.5 * _C[u] * f[u] * _COS[u][x] for u in range(8))
        for x in range(8)
    ]


def _dct_2d(block: list[float], one_d) -> list[float]:
    rows = [one_d(block[r * 8:r * 8 + 8]) for r in range(8)]
    cols = [one_d([rows[r][c] for r in range(8)]) for c in range(8)]
    return [cols[c][r] for r in range(8) for c in range(8)]


# ----------------------------------------------------------------- huffman
def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via the T.81 canonical walk."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


def _canonical_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial decoding."""
    if sum(bits) != len(vals):
        raise JpegError(
            f"DHT counts {sum(bits)} != {len(vals)} symbols"
        )
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            k += 1
            code += 1
        if code > (1 << ln):
            raise JpegError("DHT is not a prefix code (Kraft overflow)")
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def restart(self, n: int) -> None:
        """Byte-align (1-padded per spec) and emit RSTn. A restart
        marker is a REAL marker: its 0xFF is written raw, never
        stuffed — that asymmetry is exactly what lets the decoder
        resynchronize on it."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, 0xD0 + (n & 7)])

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise JpegError("entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise JpegError("entropy stream truncated at 0xFF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                elif 0xD0 <= nxt <= 0xD7:
                    raise JpegError(
                        f"RST{nxt - 0xD0} inside an entropy segment "
                        "(restart desync: marker before the declared "
                        "interval boundary)"
                    )
                else:
                    raise JpegError(
                        f"marker 0xff{nxt:02x} inside entropy stream"
                    )
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def sync_restart(self, n: int) -> None:
        """Consume the RSTn expected at a restart boundary: discard
        the partial byte (the encoder 1-padded it), then require the
        two marker bytes in modulo-8 sequence. Any other byte pair is
        a typed, immediate desync rejection — no resync scan, so a
        hostile stream costs O(1) here."""
        self.acc = 0
        self.n = 0
        if self.pos + 2 > len(self.data):
            raise JpegError("entropy stream truncated at restart boundary")
        b0, b1 = self.data[self.pos], self.data[self.pos + 1]
        if b0 != 0xFF or b1 != 0xD0 + (n & 7):
            raise JpegError(
                f"expected RST{n & 7} at restart boundary, "
                f"got 0x{b0:02x}{b1:02x} (restart desync)"
            )
        self.pos += 2

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code in entropy stream")

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1: sign-extend an s-bit magnitude value."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


# ----------------------------------------------------------------- encode
def _block_at(
    plane: list[float], pw: int, ph: int, bx: int, by: int
) -> list[float]:
    """Edge-replicated 8×8 sample grab from a row-major plane of
    dimensions pw×ph — partial blocks at the right/bottom edge repeat
    the last sample, the standard baseline padding choice."""
    block = []
    for yy in range(8):
        sy = min(by * 8 + yy, ph - 1)
        row = sy * pw
        for xx in range(8):
            block.append(plane[row + min(bx * 8 + xx, pw - 1)])
    return block


def _encode_block(
    samples: list[float],
    qt: list[int],
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    prev_dc: int,
    w: _BitWriter,
) -> int:
    coef = _dct_2d([s - 128.0 for s in samples], _fdct_1d)
    q = [int(round(coef[i] / qt[i])) for i in range(64)]
    zz = [q[_ZIGZAG[i]] for i in range(64)]
    diff = zz[0] - prev_dc
    s = _category(diff)
    code, ln = dc_codes[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for i in range(1, 64):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]  # ZRL
            w.write(zc, zl)
            run -= 16
        size = _category(zz[i])
        code, ln = ac_codes[(run << 4) | size]
        w.write(code, ln)
        w.write(zz[i] if zz[i] >= 0 else zz[i] + (1 << size) - 1, size)
        run = 0
    if run:
        ec, el = ac_codes[0x00]  # EOB
        w.write(ec, el)
    return zz[0]


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body



def _component_planes(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    subsampling: str,
) -> tuple[list[list[float]], list[tuple[int, int]], list[tuple[int, int]]]:
    """Shared encoder front half (baseline + progressive): RGB→YCbCr
    (or direct gray), chroma box-downsample per the subsampling mode.
    Returns (planes, per-component dims, per-component sampling
    factors)."""
    _SUB = {"444": (1, 1), "422": (2, 1), "440": (1, 2), "420": (2, 2)}
    if subsampling not in _SUB:
        raise JpegError(
            f"subsampling {subsampling!r} unsupported (444/422/440/420)"
        )
    sh, sv = _SUB[subsampling]
    if (sh, sv) != (1, 1) and channels == 1:
        raise JpegError(f"{subsampling} subsampling needs 3 channels")
    # component planes, level domain 0..255
    if channels == 1:
        planes: list[list[float]] = [[float(v) for v in pixels]]
    else:
        ys, cbs, crs = [], [], []
        for i in range(width * height):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            ys.append(0.299 * r + 0.587 * g + 0.114 * b)
            cbs.append(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)
            crs.append(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
        planes = [ys, cbs, crs]
    dims = [(width, height)] * channels
    sampling = [(1, 1)] * channels
    if channels == 3 and (sh, sv) != (1, 1):
        # luma keeps full resolution at factors (sh, sv); each chroma
        # sample is the box average of its up-to-sh×sv pixel group
        sampling = [(sh, sv), (1, 1), (1, 1)]
        cw = (width + sh - 1) // sh
        chh = (height + sv - 1) // sv
        for ci in (1, 2):
            src = planes[ci]
            ds = []
            for cy in range(chh):
                for cx in range(cw):
                    acc = cnt = 0
                    for dy in range(sv):
                        y = sv * cy + dy
                        if y >= height:
                            continue
                        for dx in range(sh):
                            x = sh * cx + dx
                            if x >= width:
                                continue
                            acc += src[y * width + x]
                            cnt += 1
                    ds.append(acc / cnt)
            planes[ci] = ds
            dims[ci] = (cw, chh)
    return planes, dims, sampling


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Deterministic baseline-JPEG encoder (fixtures + bounded
    round-trip proofs): Annex K quant + Huffman tables, minimal JFIF
    APP0 — byte-identical across runs and machines. ``pixels`` is
    row-major 8-bit gray (channels=1) or RGB (channels=3).

    ``subsampling`` is '444' (1×1 everywhere — the pre-round-5 wire
    format, byte-identical to it), or one of '422'/'440'/'420' (RGB
    only: luma at factors 2×1 / 1×2 / 2×2, chroma 1×1, each chroma
    sample the box average of its pixel group — 4:2:0 is the real
    web's dominant layout). ``restart_interval`` > 0 writes a DRI
    segment and
    emits RSTn every that-many MCUs, resetting the DC predictors —
    the real web's resilience feature, and the decoder's resync test
    surface."""
    if channels not in (1, 3):
        raise JpegError(f"channels {channels} unsupported (1 gray / 3 RGB)")
    if len(pixels) != width * height * channels:
        raise JpegError(
            f"pixel buffer {len(pixels)} != {width * height * channels}"
        )
    if width < 1 or height < 1:
        raise JpegError("empty image")
    if not 0 <= restart_interval <= 0xFFFF:
        raise JpegError(f"restart interval {restart_interval} out of range")
    planes, dims, sampling = _component_planes(
        pixels, width, height, channels, subsampling
    )
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    qts = [_QT_LUMA] + ([_QT_CHROMA] if channels == 3 else [])
    dc_specs = [_HUFF_DC_LUMA] + ([_HUFF_DC_CHROMA] if channels == 3 else [])
    ac_specs = [_HUFF_AC_LUMA] + ([_HUFF_AC_CHROMA] if channels == 3 else [])
    dc_codes = [_canonical_codes(*s) for s in dc_specs]
    ac_codes = [_canonical_codes(*s) for s in ac_specs]

    wtr = _BitWriter()
    prev = [0] * channels
    mcu_i = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                wtr.restart(rst)
                rst += 1
                prev = [0] * channels
            for comp in range(channels):
                t = 0 if comp == 0 else 1
                hi, vi = sampling[comp]
                pw, ph = dims[comp]
                for vv in range(vi):
                    for hh in range(hi):
                        block = _block_at(
                            planes[comp], pw, ph, mx * hi + hh, my * vi + vv
                        )
                        prev[comp] = _encode_block(
                            block, qts[t], dc_codes[t], ac_codes[t],
                            prev[comp], wtr,
                        )
            mcu_i += 1
    entropy = wtr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for t, qt in enumerate(qts):
        zz = bytes(qt[_ZIGZAG[i]] for i in range(64))
        out += _seg(0xFFDB, bytes([t]) + zz)
    comp_hdr = b"".join(
        struct.pack(
            "BBB",
            cid + 1,
            (sampling[cid][0] << 4) | sampling[cid][1],
            0 if cid == 0 else 1,
        )
        for cid in range(channels)
    )
    out += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, channels) + comp_hdr,
    )
    for t, (bits, vals) in enumerate(dc_specs):
        out += _seg(0xFFC4, bytes([t]) + bytes(bits) + bytes(vals))
    for t, (bits, vals) in enumerate(ac_specs):
        out += _seg(0xFFC4, bytes([0x10 | t]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    scan_hdr = b"".join(
        struct.pack("BB", cid + 1, 0 if cid == 0 else 0x11)
        for cid in range(channels)
    )
    out += _seg(0xFFDA, bytes([channels]) + scan_hdr + b"\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------------- decode
def _clamp(v: float) -> int:
    iv = int(round(v))
    return 0 if iv < 0 else 255 if iv > 255 else iv


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse markers + Huffman-decode + dequantize + IDCT (+ chroma
    upsample + YCbCr→RGB): returns (width, height, channels, pixels)
    row-major 8-bit. Tables come from the file's own DQT/DHT segments.
    Baseline sequential (SOF0), any per-component sampling factors
    1–4 (4:4:4 / 4:2:2 / 4:2:0 / 4:4:0), DRI/RSTn restart intervals;
    everything else refuses precisely. Subsampled components upsample
    by sample replication (nearest) — the bounded-error contract
    absorbs the upsampler choice."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("bad JPEG signature (no SOI)")
    pos = 2
    qts: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    width = height = -1
    restart_interval = 0
    comps: list[tuple[int, int, int, int]] = []  # (comp id, h, v, quant id)
    scan: list[tuple[int, int, int]] = []  # (comp idx, dc id, ac id)
    while pos < len(data):
        # T.81 B.1.1.2: a marker is 0xFF then a non-FF byte; any number
        # of extra 0xFF fill bytes may precede it (ADVICE r4: real
        # files pad with fill bytes and must not be misparsed)
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}, got {data[pos]:#x}")
        while pos < len(data) and data[pos] == 0xFF:
            pos += 1
        if pos >= len(data):
            raise JpegError("truncated at marker prefix")
        marker = data[pos]
        pos += 1
        if marker == 0x00:
            raise JpegError("stuffed 0xFF00 outside entropy stream")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: standalone markers, no length field
            continue
        if marker == 0xD9:  # EOI before SOS
            raise JpegError("EOI before scan data")
        if pos + 2 > len(data):
            raise JpegError(f"truncated segment 0xff{marker:02x}")
        (ln,) = struct.unpack(">H", data[pos:pos + 2])
        if ln < 2:
            raise JpegError(f"segment 0xff{marker:02x} length {ln} < 2")
        body = data[pos + 2:pos + ln]
        if len(body) != ln - 2:
            raise JpegError(f"truncated segment 0xff{marker:02x}")
        pos += ln
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                if pq != 0:
                    raise JpegError("16-bit quantization tables unsupported")
                zz = body[bp + 1:bp + 65]
                if len(zz) != 64:
                    raise JpegError("truncated DQT table")
                qt = [0] * 64
                for i in range(64):
                    qt[_ZIGZAG[i]] = zz[i]
                qts[tq] = qt
                bp += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            bp = 0
            while bp < len(body):
                if bp + 17 > len(body):
                    raise JpegError("truncated DHT table header")
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1:bp + 17])
                n = sum(bits)
                vals = list(body[bp + 17:bp + 17 + n])
                tab = _canonical_decoder(bits, vals)
                (ac_tabs if tc else dc_tabs)[th] = tab
                bp += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise JpegError("truncated SOF0 header")
            prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegError(f"precision {prec} unsupported (8 only)")
            if nc not in (1, 3):
                raise JpegError(f"{nc} components unsupported (1 or 3)")
            if width < 1 or height < 1:
                raise JpegError(f"empty image {width}x{height}")
            if width * height > MAX_PIXELS:
                raise JpegError(
                    f"image {width}x{height} exceeds decoder pixel cap"
                )
            if len(body) < 6 + 3 * nc:
                raise JpegError("truncated SOF0 component list")
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i:9 + 3 * i]
                h, v = samp >> 4, samp & 0x0F
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise JpegError(
                        f"sampling factors {h}x{v} out of T.81 range 1-4"
                    )
                if nc == 1:
                    # T.81 A.2: a single-component scan is
                    # non-interleaved — one data unit per block
                    # regardless of declared factors
                    h = v = 1
                comps.append((cid, h, v, tq))
        elif marker == 0xC2:  # SOF2 — hand off to the multi-scan path
            return _decode_progressive(data)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = (
                "arithmetic-coded"
                if marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
                else f"SOF{marker - 0xC0}"
            )
            raise JpegError(
                f"{kind} JPEG unsupported (baseline + progressive only)"
            )
        elif marker == 0xDD:  # DRI
            if len(body) != 2:
                raise JpegError("malformed DRI segment")
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xDA:  # SOS — entropy data follows
            if not body or len(body) < 1 + 2 * body[0]:
                raise JpegError("truncated SOS header")
            ns = body[0]
            if ns != len(comps):
                raise JpegError("scan components != frame components")
            for i in range(ns):
                sid, tt = body[1 + 2 * i:3 + 2 * i]  # length checked above
                idx = next(
                    (j for j, (cid, _, _, _) in enumerate(comps)
                     if cid == sid),
                    None,
                )
                if idx is None:
                    raise JpegError(f"scan references unknown component {sid}")
                scan.append((idx, tt >> 4, tt & 0x0F))
            break
        # APPn / COM / DNL / others: skipped
    if not comps or width < 0:
        raise JpegError("missing SOF0 frame header")
    if not scan:
        raise JpegError("missing SOS scan header")
    nc = len(comps)
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # per-component padded plane geometry (block grid = MCU grid × h×v)
    strides = [mcux * h * 8 for _, h, _, _ in comps]
    planes = [
        [0.0] * (mcux * h * 8 * mcuy * v * 8) for _, h, v, _ in comps
    ]
    rdr = _BitReader(data, pos)
    prev = [0] * nc
    mcu_i = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_i
                and mcu_i % restart_interval == 0
            ):
                rdr.sync_restart(rst)
                rst += 1
                prev = [0] * nc
            for comp, dc_id, ac_id in scan:
                try:
                    dc_tab = dc_tabs[dc_id]
                    ac_tab = ac_tabs[ac_id]
                    qt = qts[comps[comp][3]]
                except KeyError as e:
                    raise JpegError(f"scan references missing table {e}")
                _, hi, vi, _ = comps[comp]
                plane = planes[comp]
                stride = strides[comp]
                for vv in range(vi):
                    for hh in range(hi):
                        zz = [0] * 64
                        s = rdr.decode(dc_tab)
                        prev[comp] += _extend(rdr.bits(s), s)
                        zz[0] = prev[comp]
                        k = 1
                        while k < 64:
                            rs = rdr.decode(ac_tab)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise JpegError("AC run exceeds block")
                            zz[k] = _extend(rdr.bits(size), size)
                            k += 1
                        coef = [0.0] * 64
                        for i in range(64):
                            coef[_ZIGZAG[i]] = zz[i] * qt[_ZIGZAG[i]]
                        spatial = _dct_2d(coef, _idct_1d)
                        row0 = (my * vi + vv) * 8
                        col0 = (mx * hi + hh) * 8
                        for yy in range(8):
                            o = (row0 + yy) * stride + col0
                            for xx in range(8):
                                plane[o + xx] = spatial[yy * 8 + xx] + 128.0
            mcu_i += 1
    return width, height, nc, _planes_to_pixels(
        width, height, comps, strides, planes
    )


def _planes_to_pixels(
    width: int,
    height: int,
    comps: list[tuple[int, int, int, int]],
    strides: list[int],
    planes: list[list[float]],
) -> bytes:
    """Shared reconstruction tail (baseline + progressive): replication
    upsample each component to full resolution at lookup time — sample
    (y·v/vmax, x·h/hmax), integer floor — then YCbCr→RGB for 3
    components or direct clamp for grayscale."""
    nc = len(comps)
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    out = bytearray(width * height * nc)
    if nc == 1:
        p = planes[0]
        stride = strides[0]
        for y in range(height):
            for x in range(width):
                out[y * width + x] = _clamp(p[y * stride + x])
    else:
        (_, hy, vy, _), (_, hcb, vcb, _), (_, hcr, vcr, _) = comps
        py, pcb, pcr = planes
        sy_, scb_, scr_ = strides
        for y in range(height):
            ry = (y * vy // vmax) * sy_
            rcb = (y * vcb // vmax) * scb_
            rcr = (y * vcr // vmax) * scr_
            for x in range(width):
                yv = py[ry + x * hy // hmax]
                cb = pcb[rcb + x * hcb // hmax] - 128.0
                cr = pcr[rcr + x * hcr // hmax] - 128.0
                o = (y * width + x) * 3
                out[o] = _clamp(yv + 1.402 * cr)
                out[o + 1] = _clamp(yv - 0.344136 * cb - 0.714136 * cr)
                out[o + 2] = _clamp(yv + 1.772 * cb)
    return bytes(out)


# ------------------------------------------------------------- progressive
# SOF2 progressive JPEG (T.81 Annex G): the dominant large-image layout
# on the real web. Coefficients arrive over MULTIPLE scans — spectral
# selection splits the zigzag band, successive approximation splits the
# bit-planes — and every scan is its own Huffman-entropy segment with
# its own (Ss, Se, Ah, Al) parameters, EOB-run coding and restart
# intervals. The decoder accumulates per-component coefficient arrays
# (zigzag-indexed) and reconstructs once at EOI. Because quantization
# is identical, a progressive stream of the same source decodes to
# pixels BIT-IDENTICAL to the baseline stream's — the round-trip tests
# pin exactly that equality, a far stronger oracle than a tolerance.

def _parse_dqt(body: bytes, qts: dict[int, list[int]]) -> None:
    bp = 0
    while bp < len(body):
        pq, tq = body[bp] >> 4, body[bp] & 0x0F
        if pq != 0:
            raise JpegError("16-bit quantization tables unsupported")
        zz = body[bp + 1:bp + 65]
        if len(zz) != 64:
            raise JpegError("truncated DQT table")
        qt = [0] * 64
        for i in range(64):
            qt[_ZIGZAG[i]] = zz[i]
        qts[tq] = qt
        bp += 65


def _parse_dht(
    body: bytes,
    dc_tabs: dict[int, dict[tuple[int, int], int]],
    ac_tabs: dict[int, dict[tuple[int, int], int]],
) -> None:
    bp = 0
    while bp < len(body):
        if bp + 17 > len(body):
            raise JpegError("truncated DHT table header")
        tc, th = body[bp] >> 4, body[bp] & 0x0F
        bits = list(body[bp + 1:bp + 17])
        n = sum(bits)
        vals = list(body[bp + 17:bp + 17 + n])
        tab = _canonical_decoder(bits, vals)
        (ac_tabs if tc else dc_tabs)[th] = tab
        bp += 17 + n


def _decode_progressive(data: bytes) -> tuple[int, int, int, bytes]:
    """Multi-scan SOF2 decode: full spectral selection + successive
    approximation (DC first/refine, AC first/refine with EOB runs),
    DRI/RSTn inside any scan, tables redefinable between scans."""
    pos = 2
    qts: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    width = height = -1
    restart_interval = 0
    comps: list[tuple[int, int, int, int]] = []
    coefs: list[list[list[int]]] = []  # per comp, per block, zigzag[64]
    geom: dict = {}
    saw_scan = False
    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}, got {data[pos]:#x}")
        while pos < len(data) and data[pos] == 0xFF:
            pos += 1
        if pos >= len(data):
            raise JpegError("truncated at marker prefix")
        marker = data[pos]
        pos += 1
        if marker == 0x00:
            raise JpegError("stuffed 0xFF00 outside entropy stream")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise JpegError(f"truncated segment 0xff{marker:02x}")
        (ln,) = struct.unpack(">H", data[pos:pos + 2])
        if ln < 2:
            raise JpegError(f"segment 0xff{marker:02x} length {ln} < 2")
        body = data[pos + 2:pos + ln]
        if len(body) != ln - 2:
            raise JpegError(f"truncated segment 0xff{marker:02x}")
        pos += ln
        if marker == 0xDB:
            _parse_dqt(body, qts)
        elif marker == 0xC4:
            _parse_dht(body, dc_tabs, ac_tabs)
        elif marker == 0xC2:  # SOF2 frame header
            if comps:
                raise JpegError("multiple SOF markers")
            if len(body) < 6:
                raise JpegError("truncated SOF2 header")
            prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegError(f"precision {prec} unsupported (8 only)")
            if nc not in (1, 3):
                raise JpegError(f"{nc} components unsupported (1 or 3)")
            if width < 1 or height < 1:
                raise JpegError(f"empty image {width}x{height}")
            if width * height > MAX_PIXELS:
                raise JpegError(
                    f"image {width}x{height} exceeds decoder pixel cap"
                )
            if len(body) < 6 + 3 * nc:
                raise JpegError("truncated SOF2 component list")
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i:9 + 3 * i]
                h, v = samp >> 4, samp & 0x0F
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise JpegError(
                        f"sampling factors {h}x{v} out of T.81 range 1-4"
                    )
                if nc == 1:
                    h = v = 1
                comps.append((cid, h, v, tq))
            hmax = max(h for _, h, _, _ in comps)
            vmax = max(v for _, _, v, _ in comps)
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            geom = {"hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy}
            for _, h, v, _ in comps:
                # padded block grid (interleaved scans address the MCU
                # grid); non-interleaved scans cover the bw×bh subset
                coefs.append(
                    [[0] * 64 for _ in range(mcux * h * mcuy * v)]
                )
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("mixed/other SOF marker in progressive stream")
        elif marker == 0xDD:
            if len(body) != 2:
                raise JpegError("malformed DRI segment")
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xDA:  # one scan
            if not comps:
                raise JpegError("SOS before SOF2 frame header")
            if not body or len(body) < 4 + 2 * body[0]:
                raise JpegError("truncated SOS header")
            ns = body[0]
            scan: list[tuple[int, int, int]] = []
            for i in range(ns):
                sid, tt = body[1 + 2 * i:3 + 2 * i]
                idx = next(
                    (j for j, (cid, _, _, _) in enumerate(comps)
                     if cid == sid),
                    None,
                )
                if idx is None:
                    raise JpegError(
                        f"scan references unknown component {sid}"
                    )
                scan.append((idx, tt >> 4, tt & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ax = body[3 + 2 * ns]
            ah, al = ax >> 4, ax & 0x0F
            pos = _progressive_scan(
                data, pos, comps, coefs, geom, scan, ss, se, ah, al,
                dc_tabs, ac_tabs, width, height, restart_interval,
            )
            saw_scan = True
        # APPn / COM / others skipped
    if not comps:
        raise JpegError("missing SOF2 frame header")
    if not saw_scan:
        raise JpegError("missing SOS scan header")
    # reconstruct: dequantize + IDCT every (padded-grid) block
    nc = len(comps)
    mcux, mcuy = geom["mcux"], geom["mcuy"]
    strides = [mcux * h * 8 for _, h, _, _ in comps]
    planes: list[list[float]] = []
    for c, (cid, h, v, tq) in enumerate(comps):
        if tq not in qts:
            raise JpegError(f"component references missing DQT {tq}")
        qt = qts[tq]
        pbw, pbh = mcux * h, mcuy * v
        stride = pbw * 8
        plane = [0.0] * (stride * pbh * 8)
        for bi, zz in enumerate(coefs[c]):
            coef = [0.0] * 64
            for i in range(64):
                coef[_ZIGZAG[i]] = zz[i] * qt[_ZIGZAG[i]]
            spatial = _dct_2d(coef, _idct_1d)
            by, bx = divmod(bi, pbw)
            row0, col0 = by * 8, bx * 8
            for yy in range(8):
                o = (row0 + yy) * stride + col0
                for xx in range(8):
                    plane[o + xx] = spatial[yy * 8 + xx] + 128.0
        planes.append(plane)
    return width, height, nc, _planes_to_pixels(
        width, height, comps, strides, planes
    )


def _progressive_scan(
    data: bytes,
    pos: int,
    comps,
    coefs,
    geom,
    scan,
    ss: int,
    se: int,
    ah: int,
    al: int,
    dc_tabs,
    ac_tabs,
    width: int,
    height: int,
    restart_interval: int,
) -> int:
    """Entropy-decode ONE progressive scan in place; returns the byte
    position after the scan's (byte-aligned) entropy segment."""
    if not (0 <= ss <= 63 and ss <= se <= 63):
        raise JpegError(f"spectral band {ss}..{se} out of range")
    rdr = _BitReader(data, pos)
    hmax, vmax = geom["hmax"], geom["vmax"]
    mcux, mcuy = geom["mcux"], geom["mcuy"]
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    def refine_nonzero(blk, k):
        if rdr.bit():
            if (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1

    def ac_first(blk):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = rdr.decode(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += rdr.bits(r)
                return
            k += r
            if k > se:
                raise JpegError("AC run exceeds spectral band")
            blk[k] = _extend(rdr.bits(s), s) * p1
            k += 1

    def ac_refine(blk):
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = rdr.decode(ac_tab)
                r, s = rs >> 4, rs & 0x0F
                if s:
                    if s != 1:
                        raise JpegError(
                            "refinement AC magnitude must be 1"
                        )
                    val = p1 if rdr.bit() else m1
                else:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += rdr.bits(r)
                        break
                    val = 0  # ZRL: pass 16 zero-history positions
                while k <= se:
                    if blk[k] != 0:
                        refine_nonzero(blk, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val:
                    if k > se:
                        raise JpegError("refinement run exceeds band")
                    blk[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    refine_nonzero(blk, k)
                k += 1
            eobrun -= 1

    interleaved = len(scan) > 1
    if interleaved and (ss != 0 or se != 0):
        raise JpegError("progressive interleaved scan must be DC-only")
    if ss == 0 and se != 0:
        raise JpegError("DC scan must have Se=0 (no DC/AC mix)")
    if ss == 0 and ah == 0:
        for _ci, dc_id, _ac in scan:
            if dc_id not in dc_tabs:
                raise JpegError(f"scan references missing DC table {dc_id}")
    if ss > 0:  # AC scans (first AND refinement) need the AC table
        _ci, _dc, ac_id = scan[0]
        if ac_id not in ac_tabs:
            raise JpegError(f"scan references missing AC table {ac_id}")
        ac_tab = ac_tabs[ac_id]
    prev = [0] * len(comps)
    rst = 0
    unit = 0

    def maybe_restart():
        nonlocal rst, prev, eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            rdr.sync_restart(rst)
            rst += 1
            prev = [0] * len(comps)
            eobrun = 0

    if interleaved or ss == 0:
        # DC scan (interleaved over MCUs, or a single component's
        # blocks — iterate the right geometry either way)
        if interleaved:
            units = [("mcu", my, mx) for my in range(mcuy)
                     for mx in range(mcux)]
        else:
            ci = scan[0][0]
            _, h, v, _ = comps[ci]
            bw = ((width * h + hmax - 1) // hmax + 7) // 8
            bh = ((height * v + vmax - 1) // vmax + 7) // 8
            units = [("blk", by, bx) for by in range(bh)
                     for bx in range(bw)]
        for kind, a, b in units:
            maybe_restart()
            if kind == "mcu":
                my, mx = a, b
                targets = []
                for ci, dc_id, _ac in scan:
                    _, h, v, _ = comps[ci]
                    pbw = mcux * h
                    for vv in range(v):
                        for hh in range(h):
                            targets.append(
                                (ci, dc_id,
                                 (my * v + vv) * pbw + (mx * h + hh))
                            )
            else:
                ci, dc_id, _ac = scan[0]
                _, h, v, _ = comps[ci]
                pbw = mcux * h
                targets = [(ci, dc_id, a * pbw + b)]
            for ci, dc_id, bi in targets:
                blk = coefs[ci][bi]
                if ah == 0:  # DC first: diff-coded, point-transformed
                    s = rdr.decode(dc_tabs[dc_id])
                    prev[ci] += _extend(rdr.bits(s), s)
                    blk[0] = prev[ci] * p1
                else:  # DC refinement: one raw bit per block
                    blk[0] |= rdr.bit() * p1
            unit += 1
    else:
        # AC scan: single component, raster over its bw×bh blocks
        ci = scan[0][0]
        _, h, v, _ = comps[ci]
        pbw = mcux * h
        bw = ((width * h + hmax - 1) // hmax + 7) // 8
        bh = ((height * v + vmax - 1) // vmax + 7) // 8
        body = ac_first if ah == 0 else ac_refine
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                body(coefs[ci][by * pbw + bx])
                unit += 1
    # byte-align: the partial byte is padding; rdr.pos is the next
    # whole-byte position, where the following marker begins
    return rdr.pos


# progressive encoder's AC spec: a uniform 8-bit canonical code over
# every symbol the scans can emit — EOBn (r 0..14), ZRL, and (r,s) for
# s 1..10. The Annex-K AC tables are Kraft-FULL at 16 bits and cannot
# absorb the 14 EOBn symbols, and compression efficiency is irrelevant
# for deterministic fixtures: any well-formed prefix code round-trips
# because DHT travels in the file. 176 symbols at 8 bits (176 ≤ 256).
_HUFF_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [r << 4 for r in range(15)] + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)],
)
assert sum(_HUFF_AC_PROG[0]) == len(_HUFF_AC_PROG[1]) == 176


def _tz(v: int, al: int) -> int:
    """T.81 AC point transform: divide by 2^Al truncating toward zero."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def encode_jpeg_progressive(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Deterministic PROGRESSIVE (SOF2) encoder exercising every decode
    path: an interleaved DC first scan at Al=1, a DC refinement scan
    (raw bits), per-component AC first scans over the full 1–63 band at
    Al=1 (EOB-run coded), and per-component AC refinement scans at
    Al=0 (correction bits + buffered EOB-run bits) — i.e. real
    successive approximation on both DC and AC, the layout libjpeg's
    default progressive script produces. Quantization is IDENTICAL to
    ``encode_jpeg``, so decoding this stream yields pixels
    BIT-IDENTICAL to decoding the baseline stream of the same source —
    the tests pin that exact equality."""
    if channels not in (1, 3):
        raise JpegError(f"channels {channels} unsupported (1 gray / 3 RGB)")
    if len(pixels) != width * height * channels:
        raise JpegError(
            f"pixel buffer {len(pixels)} != {width * height * channels}"
        )
    if width < 1 or height < 1:
        raise JpegError("empty image")
    if not 0 <= restart_interval <= 0xFFFF:
        raise JpegError(f"restart interval {restart_interval} out of range")
    planes, dims, sampling = _component_planes(
        pixels, width, height, channels, subsampling
    )
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    qts = [_QT_LUMA] + ([_QT_CHROMA] if channels == 3 else [])

    # quantized zigzag coefficient blocks per component, padded grid
    blocks: list[list[list[int]]] = []
    for comp in range(channels):
        t = 0 if comp == 0 else 1
        hi, vi = sampling[comp]
        pw, ph = dims[comp]
        qt = qts[t]
        comp_blocks = []
        for by in range(mcuy * vi):
            for bx in range(mcux * hi):
                samples = _block_at(planes[comp], pw, ph, bx, by)
                coef = _dct_2d([s - 128.0 for s in samples], _fdct_1d)
                q = [int(round(coef[i] / qt[i])) for i in range(64)]
                comp_blocks.append([q[_ZIGZAG[i]] for i in range(64)])
        blocks.append(comp_blocks)

    dc_specs = [_HUFF_DC_LUMA] + (
        [_HUFF_DC_CHROMA] if channels == 3 else []
    )
    dc_codes = [_canonical_codes(*s) for s in dc_specs]
    ac_codes = _canonical_codes(*_HUFF_AC_PROG)

    def comp_band_dims(comp: int) -> tuple[int, int, int]:
        hi, vi = sampling[comp]
        bw = ((width * hi + hmax - 1) // hmax + 7) // 8
        bh = ((height * vi + vmax - 1) // vmax + 7) // 8
        return bw, bh, mcux * hi

    # ---- scan bodies -----------------------------------------------
    def dc_first_scan(al: int) -> bytes:
        w = _BitWriter()
        prev = [0] * channels
        unit = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and unit and unit % restart_interval == 0:
                    w.restart(rst)
                    rst += 1
                    prev = [0] * channels
                for comp in range(channels):
                    t = 0 if comp == 0 else 1
                    hi, vi = sampling[comp]
                    pbw = mcux * hi
                    for vv in range(vi):
                        for hh in range(hi):
                            bi = (my * vi + vv) * pbw + (mx * hi + hh)
                            v = blocks[comp][bi][0] >> al  # DC: floor shift
                            diff = v - prev[comp]
                            prev[comp] = v
                            s = _category(diff)
                            code, ln = dc_codes[t][s]
                            w.write(code, ln)
                            if s:
                                w.write(
                                    diff if diff >= 0
                                    else diff + (1 << s) - 1,
                                    s,
                                )
                unit += 1
        return w.flush()

    def dc_refine_scan(al: int) -> bytes:
        w = _BitWriter()
        unit = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and unit and unit % restart_interval == 0:
                    w.restart(rst)
                    rst += 1
                for comp in range(channels):
                    hi, vi = sampling[comp]
                    pbw = mcux * hi
                    for vv in range(vi):
                        for hh in range(hi):
                            bi = (my * vi + vv) * pbw + (mx * hi + hh)
                            w.write((blocks[comp][bi][0] >> al) & 1, 1)
                unit += 1
        return w.flush()

    def ac_first_scan(comp: int, ss: int, se: int, al: int) -> bytes:
        w = _BitWriter()
        bw, bh, pbw = comp_band_dims(comp)
        eobrun = 0

        def flush_eobrun():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = ac_codes[r << 4]
                w.write(code, ln)
                if r:
                    w.write(eobrun - (1 << r), r)
                eobrun = 0

        unit = 0
        rst = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    flush_eobrun()
                    w.restart(rst)
                    rst += 1
                blk = blocks[comp][by * pbw + bx]
                band = [_tz(blk[k], al) for k in range(ss, se + 1)]
                last = -1
                for i, v in enumerate(band):
                    if v:
                        last = i
                if last < 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
                    unit += 1
                    continue
                flush_eobrun()
                run = 0
                for i in range(last + 1):
                    v = band[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        w.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = ac_codes[(run << 4) | s]
                    w.write(code, ln)
                    w.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < se - ss:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
                unit += 1
        flush_eobrun()
        return w.flush()

    def ac_refine_scan(comp: int, ss: int, se: int, ah: int, al: int) -> bytes:
        w = _BitWriter()
        bw, bh, pbw = comp_band_dims(comp)
        eobrun = 0
        be_bits: list[int] = []

        def flush_eobrun():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = ac_codes[r << 4]
                w.write(code, ln)
                if r:
                    w.write(eobrun - (1 << r), r)
                for b in be_bits:
                    w.write(b, 1)
                be_bits.clear()
                eobrun = 0

        unit = 0
        rst = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    flush_eobrun()
                    w.restart(rst)
                    rst += 1
                blk = blocks[comp][by * pbw + bx]
                absv = [abs(_tz(blk[k], al)) for k in range(ss, se + 1)]
                eobpos = -1
                for i, v in enumerate(absv):
                    if v == 1:
                        eobpos = i
                run = 0
                br: list[int] = []
                for i in range(se - ss + 1):
                    v = absv[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15 and i <= eobpos:
                        flush_eobrun()
                        code, ln = ac_codes[0xF0]
                        w.write(code, ln)
                        run -= 16
                        for b in br:
                            w.write(b, 1)
                        br.clear()
                    if v > 1:  # history-nonzero: correction bit
                        br.append(v & 1)
                        continue
                    # newly nonzero at this approximation stage
                    flush_eobrun()
                    code, ln = ac_codes[(run << 4) | 1]
                    w.write(code, ln)
                    w.write(1 if blk[ss + i] > 0 else 0, 1)
                    for b in br:
                        w.write(b, 1)
                    br.clear()
                    run = 0
                if run > 0 or br:
                    eobrun += 1
                    be_bits.extend(br)
                    if eobrun == 0x7FFF:
                        flush_eobrun()
                unit += 1
        flush_eobrun()
        return w.flush()

    # ---- assemble the stream ---------------------------------------
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for t, qt in enumerate(qts):
        zz = bytes(qt[_ZIGZAG[i]] for i in range(64))
        out += _seg(0xFFDB, bytes([t]) + zz)
    comp_hdr = b"".join(
        struct.pack(
            "BBB",
            cid + 1,
            (sampling[cid][0] << 4) | sampling[cid][1],
            0 if cid == 0 else 1,
        )
        for cid in range(channels)
    )
    out += _seg(
        0xFFC2,
        struct.pack(">BHHB", 8, height, width, channels) + comp_hdr,
    )
    for t, (bits, vals) in enumerate(dc_specs):
        out += _seg(0xFFC4, bytes([t]) + bytes(bits) + bytes(vals))
    out += _seg(
        0xFFC4,
        bytes([0x10])
        + bytes(_HUFF_AC_PROG[0])
        + bytes(_HUFF_AC_PROG[1]),
    )
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))

    def sos(comps_tt: list[tuple[int, int]], ss, se, ah, al, body):
        hdr = bytes([len(comps_tt)])
        for cid, tt in comps_tt:
            hdr += struct.pack("BB", cid + 1, tt)
        hdr += bytes([ss, se, (ah << 4) | al])
        return _seg(0xFFDA, hdr) + body

    all_dc = [(c, (0 if c == 0 else 1) << 4) for c in range(channels)]
    out += sos(all_dc, 0, 0, 0, 1, dc_first_scan(1))
    out += sos(all_dc, 0, 0, 1, 0, dc_refine_scan(0))
    for c in range(channels):
        out += sos([(c, 0x00)], 1, 63, 0, 1, ac_first_scan(c, 1, 63, 1))
    for c in range(channels):
        out += sos([(c, 0x00)], 1, 63, 1, 0, ac_refine_scan(c, 1, 63, 1, 0))
    out += b"\xff\xd9"
    return bytes(out)
