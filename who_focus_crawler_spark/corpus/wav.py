"""Real WAV (RIFF PCM) decode and a deterministic encoder, stdlib-only.

PNG made IMAGE real (corpus/png.py); this module makes AUDIO real. A
canonical PCM WAV needs nothing beyond ``struct``: the RIFF container
("RIFF" + size + "WAVE"), a chunk walk, the ``fmt `` block (format tag,
channel count, sample rate, bit depth) and the raw little-endian sample
frames in ``data``. Decoding that is a full, real audio codec for the
format crawlers actually archive uncompressed audio in — while formats
that genuinely need external codecs (MP3/AAC/Vorbis entropy decoding)
keep the explicit NotImplementedError in corpus/multimodal.py.

Scope: format tag 1 (integer PCM), bit depth 8 (unsigned) or 16
(signed LE), any channel count/sample rate. Compressed format tags,
float PCM (tag 3) and extensible (tag 0xFFFE) raise ``WavError`` with a
precise message. Chunk sizes are validated and unknown chunks (LIST,
fact, ...) are skipped, including the RIFF odd-size pad byte — a
crawler decodes hostile bytes.

The encoder exists for deterministic fixtures and round-trip proofs:
canonical chunk order (fmt then data), no ancillary chunks —
byte-identical across runs and machines.
"""

from __future__ import annotations

import struct

_PCM_TAG = 1


class WavError(ValueError):
    """Malformed or out-of-scope WAV."""


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """Parse the RIFF container and decode PCM frames: returns
    (sample_rate, channels, bits, samples) with ``samples`` the
    interleaved frame values — signed ints for 16-bit, unsigned 0..255
    for 8-bit, exactly as stored."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("bad RIFF/WAVE signature")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise WavError(f"RIFF size {riff_size} exceeds payload")
    pos = 12
    rate = channels = bits = -1
    block_align = -1
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
            if tag != _PCM_TAG:
                raise WavError(
                    f"format tag {tag} unsupported (integer PCM only)"
                )
            if bits not in (8, 16):
                raise WavError(f"bit depth {bits} unsupported (8/16 only)")
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
    if bits == 16:
        samples = list(
            struct.unpack(f"<{len(frames) // 2}h", frames)
        )
    else:
        samples = list(frames)
    return rate, channels, bits, samples


def encode_wav(
    samples: list[int],
    sample_rate: int,
    channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Deterministic canonical encoder (fixtures + round-trip proofs):
    fmt then data, integer PCM, no ancillary chunks. ``samples`` are
    interleaved frame values and must be a whole number of frames."""
    if bits not in (8, 16):
        raise WavError(f"bit depth {bits} unsupported (8/16 only)")
    if channels < 1 or len(samples) % channels:
        raise WavError(
            f"{len(samples)} samples not a whole number of "
            f"{channels}-channel frames"
        )
    width = bits // 8
    if bits == 16:
        frames = struct.pack(f"<{len(samples)}h", *samples)
    else:
        frames = bytes(samples)
    block_align = channels * width
    fmt = struct.pack(
        "<HHIIHH",
        _PCM_TAG,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + frames
        + (b"\x00" if len(frames) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
