"""Real WAV (RIFF PCM) decode and a deterministic encoder, stdlib-only.

PNG made IMAGE real (corpus/png.py); this module makes AUDIO real. A
canonical PCM WAV needs nothing beyond ``struct``: the RIFF container
("RIFF" + size + "WAVE"), a chunk walk, the ``fmt `` block (format tag,
channel count, sample rate, bit depth) and the raw little-endian sample
frames in ``data``. Decoding that is a full, real audio codec for the
format crawlers actually archive uncompressed audio in — while formats
that genuinely need external codecs (MP3/AAC/Vorbis entropy decoding,
video) keep the explicit NotImplementedError in corpus/multimodal.py
(baseline JPEG is real too — corpus/jpeg.py).

Scope (completed round 4): every uncompressed WAV layout —

- format tag 1, integer PCM at 8 (unsigned) / 16 / 24 / 32 bits
  (signed LE; 24-bit is the packed 3-byte layout studio tools emit),
- format tag 3, IEEE float PCM at 32 / 64 bits,
- format tag 0xFFFE, WAVE_FORMAT_EXTENSIBLE: the GUID sub-format
  resolves to integer or float PCM and is validated against the fixed
  KSDATAFORMAT tail bytes — the container multi-channel/high-depth
  recorders actually write,

any channel count and sample rate. Compressed tags raise ``WavError``
with a precise message. Chunk sizes are validated and unknown chunks
(LIST, fact, cue, ...) are skipped, including the RIFF odd-size pad
byte — a crawler decodes hostile bytes.

The encoder exists for deterministic fixtures and round-trip proofs:
canonical chunk order (fmt, fact for non-PCM per the spec, then data),
no other ancillary chunks — byte-identical across runs and machines.
"""

from __future__ import annotations

import struct

_PCM_TAG = 1
_FLOAT_TAG = 3
_EXTENSIBLE_TAG = 0xFFFE
# KSDATAFORMAT_SUBTYPE_* GUID: first two bytes carry the real format
# tag, the remaining fourteen are fixed (00000000-0010-8000-00aa00389b71)
_GUID_TAIL = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
_INT_BITS = (8, 16, 24, 32)
_FLOAT_BITS = (32, 64)


class WavError(ValueError):
    """Malformed or out-of-scope WAV."""


def _resolve_extensible(body: bytes, length: int) -> int:
    """WAVE_FORMAT_EXTENSIBLE: the effective format tag lives in the
    first two bytes of the SubFormat GUID; the other fourteen must be
    the fixed KSDATAFORMAT tail."""
    if length < 40:
        raise WavError(f"extensible fmt chunk too short ({length} bytes)")
    (cb_size,) = struct.unpack("<H", body[16:18])
    if cb_size < 22:
        raise WavError(f"extensible cbSize {cb_size} < 22")
    guid = body[24:40]
    if guid[2:] != _GUID_TAIL:
        raise WavError(f"unknown SubFormat GUID {guid.hex()}")
    (sub_tag,) = struct.unpack("<H", guid[:2])
    return sub_tag


def decode_wav(data: bytes) -> tuple[int, int, int, list]:
    """Parse the RIFF container and decode PCM frames: returns
    (sample_rate, channels, bits, samples) with ``samples`` the
    interleaved frame values — unsigned 0..255 for 8-bit, signed ints
    for 16/24/32-bit integer PCM, Python floats for IEEE float PCM,
    exactly as stored."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("bad RIFF/WAVE signature")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise WavError(f"RIFF size {riff_size} exceeds payload")
    pos = 12
    rate = channels = bits = -1
    block_align = -1
    tag = -1
    frames: bytes | None = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise WavError(f"truncated {cid!r} chunk")
        pos += 8 + length + (length & 1)  # RIFF pads odd chunks
        if cid == b"fmt ":
            if length < 16:
                raise WavError(f"fmt chunk too short ({length} bytes)")
            tag, channels, rate, _byte_rate, block_align, bits = (
                struct.unpack("<HHIIHH", body[:16])
            )
            if tag == _EXTENSIBLE_TAG:
                tag = _resolve_extensible(body, length)
            if tag == _PCM_TAG:
                if bits not in _INT_BITS:
                    raise WavError(
                        f"bit depth {bits} unsupported for integer PCM "
                        f"(8/16/24/32)"
                    )
            elif tag == _FLOAT_TAG:
                if bits not in _FLOAT_BITS:
                    raise WavError(
                        f"bit depth {bits} unsupported for float PCM "
                        f"(32/64)"
                    )
            else:
                raise WavError(
                    f"format tag {tag} unsupported (integer/float PCM only)"
                )
            if channels < 1:
                raise WavError("zero channels")
            if block_align != channels * (bits // 8):
                raise WavError(
                    f"block align {block_align} != channels*bytes "
                    f"({channels * (bits // 8)})"
                )
        elif cid == b"data":
            frames = body
        # unknown chunks (LIST, fact, cue , ...) are skipped by the loop
    if bits < 0:
        raise WavError("missing fmt chunk")
    if frames is None:
        raise WavError("missing data chunk")
    width = bits // 8
    if len(frames) % (channels * width):
        raise WavError(
            f"data size {len(frames)} not a whole number of frames"
        )
    n = len(frames) // width
    if tag == _FLOAT_TAG:
        samples = list(struct.unpack(f"<{n}{'f' if bits == 32 else 'd'}", frames))
    elif bits == 16:
        samples = list(struct.unpack(f"<{n}h", frames))
    elif bits == 32:
        samples = list(struct.unpack(f"<{n}i", frames))
    elif bits == 24:
        samples = [
            int.from_bytes(frames[3 * i:3 * i + 3], "little", signed=True)
            for i in range(n)
        ]
    else:
        samples = list(frames)
    return rate, channels, bits, samples


def encode_wav(
    samples: list,
    sample_rate: int,
    channels: int = 1,
    bits: int = 16,
    *,
    float_fmt: bool = False,
    extensible: bool = False,
) -> bytes:
    """Deterministic canonical encoder (fixtures + round-trip proofs):
    fmt (then fact for non-PCM, per the spec), then data; no other
    chunks. ``samples`` are interleaved frame values and must be a
    whole number of frames. ``float_fmt`` switches to IEEE float PCM
    (bits 32/64); ``extensible`` wraps either tag in
    WAVE_FORMAT_EXTENSIBLE with the canonical KSDATAFORMAT GUID."""
    if float_fmt:
        if bits not in _FLOAT_BITS:
            raise WavError(
                f"bit depth {bits} unsupported for float PCM (32/64)"
            )
    elif bits not in _INT_BITS:
        raise WavError(
            f"bit depth {bits} unsupported for integer PCM (8/16/24/32)"
        )
    if channels < 1 or len(samples) % channels:
        raise WavError(
            f"{len(samples)} samples not a whole number of "
            f"{channels}-channel frames"
        )
    width = bits // 8
    if float_fmt:
        frames = struct.pack(
            f"<{len(samples)}{'f' if bits == 32 else 'd'}", *samples
        )
    elif bits == 16:
        frames = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 32:
        frames = struct.pack(f"<{len(samples)}i", *samples)
    elif bits == 24:
        frames = b"".join(
            int(s).to_bytes(3, "little", signed=True) for s in samples
        )
    else:
        frames = bytes(samples)
    block_align = channels * width
    inner_tag = _FLOAT_TAG if float_fmt else _PCM_TAG
    base = struct.pack(
        "<HHIIHH",
        _EXTENSIBLE_TAG if extensible else inner_tag,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    if extensible:
        fmt = base + struct.pack(
            "<HHI", 22, bits, 0
        ) + struct.pack("<H", inner_tag) + _GUID_TAIL
    else:
        fmt = base
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if float_fmt:  # fact chunk is mandatory for non-PCM formats
        body += b"fact" + struct.pack("<II", 4, len(samples) // channels)
    body += b"data" + struct.pack("<I", len(frames)) + frames
    if len(frames) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body
